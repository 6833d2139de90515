"""Sweep XLA TPU compiler options on the recorded benchmark itself.

Each variant runs `bench.py` in a FRESH process with TRICOLO_XLA_OPTS set
(steps._compiler_options merges it over the shipped defaults), so every
datapoint is measured by exactly the methodology the driver records:
two-point (2N−N) timing, median over --pairs estimates, idle-guarded.
One variant = one cold remote compile through the tunnel (~4-8 min).

Usage:
    python scripts/sweep_step_flags.py                     # built-in wave
    python scripts/sweep_step_flags.py '{"xla_tpu_scoped_vmem_limit_kib":"28672"}' ...
    python scripts/sweep_step_flags.py --out /tmp/sweep.jsonl

Results append to --out as JSONL: {"opts": {...}, "pairs_per_sec": N}.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

# Built-in wave: the scheduling/fusion flag families the round-4 verdict
# asked to sweep on the per-sample windowed program, plus a finer
# scoped-VMEM grid around the round-4 optimum (16:2429, 32:2508-2525,
# 48:2461 — the peak may sit off the probed powers of two).
DEFAULT_WAVE = [
    {"xla_tpu_scoped_vmem_limit_kib": "28672"},
    {"xla_tpu_scoped_vmem_limit_kib": "36864"},
    {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    {"xla_tpu_rwb_fusion": "false"},
    {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"},
]


def run_variant(opts: dict, bench_args: list[str]) -> dict:
    env = dict(os.environ)
    env["TRICOLO_XLA_OPTS"] = json.dumps(opts)
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), *bench_args],
        env=env,
        capture_output=True,
        text=True,
        cwd=str(REPO),
    )
    row = {"opts": opts, "rc": proc.returncode}
    for line in proc.stdout.strip().splitlines()[::-1]:
        try:
            parsed = json.loads(line)
            row["pairs_per_sec"] = parsed["value"]
            break
        except (json.JSONDecodeError, KeyError):
            continue
    if "pairs_per_sec" not in row:
        row["stderr_tail"] = proc.stderr.strip().splitlines()[-3:]
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="*", help="JSON option dicts")
    ap.add_argument("--out", default="/tmp/sweep_step_flags.jsonl")
    ap.add_argument(
        "--bench-arg",
        action="append",
        default=[],
        help="extra args forwarded to bench.py (e.g. --bench-arg=--pairs=3)",
    )
    args = ap.parse_args()
    variants = [json.loads(v) for v in args.variants] or DEFAULT_WAVE
    with open(args.out, "a") as f:
        for opts in variants:
            row = run_variant(opts, args.bench_arg)
            f.write(json.dumps(row) + "\n")
            f.flush()
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
