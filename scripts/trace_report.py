"""Summarize a jax.profiler trace: device time per model component.

Parses the trace-viewer JSON (vm.trace.json.gz) that `jax.profiler.trace`
writes, takes the device "XLA Ops" track, and buckets op durations by the
`tf_op` scope path (jit(train_step)/.../module/submodule/op). Divide by
the number of traced steps to get ms/step.

Usage:
  python scripts/trace_report.py /tmp/xtrace --steps 5 [--depth 3] [--top 30]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, required=True)
    ap.add_argument("--depth", type=int, default=3,
                    help="tf_op scope components to keep as the bucket key")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    paths = glob.glob(f"{args.trace_dir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        raise SystemExit(f"no trace.json.gz under {args.trace_dir}")
    data = json.load(gzip.open(sorted(paths)[-1]))

    # device pid: process named /device:TPU:* ; XLA Ops tid
    pid = tid = None
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "/device:" in e["args"].get("name", ""):
                pid = e["pid"]
    for e in data["traceEvents"]:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e["pid"] == pid and e["args"].get("name") == "XLA Ops"):
            tid = e["tid"]
    if pid is None or tid is None:
        raise SystemExit("no device XLA Ops track found in trace")

    buckets = collections.Counter()
    total = 0.0
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") != pid or e.get("tid") != tid:
            continue
        dur = e.get("dur", 0)
        total += dur
        tf_op = e.get("args", {}).get("tf_op", "")
        # strip the jit(...) root and the jvp/transpose marker into a
        # fwd/bwd prefix so forward and backward cost split per module
        parts = [p for p in tf_op.split("/") if p]
        if parts and parts[0].startswith("jit("):
            parts = parts[1:]
        phase = "fwd"
        if parts and parts[0].startswith("transpose"):
            phase, parts = "bwd", parts[1:]
        elif parts and parts[0].startswith("jvp"):
            parts = parts[1:]
        key = phase + " " + "/".join(parts[: args.depth]) if parts else (
            phase + " <" + e["name"].split(".")[0] + ">")
        buckets[key] += dur
    ms = 1000 * args.steps
    print(f"total device time: {total / ms:.2f} ms/step "
          f"({args.steps} steps traced)")
    for key, dur in buckets.most_common(args.top):
        print(f"{dur / ms:8.3f} ms  {key}")


if __name__ == "__main__":
    main()
