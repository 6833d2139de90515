"""Roofline analysis of a traced train step: how close is each hot op —
and the whole step — to the chip's bandwidth/compute floor?

For every op on the device "XLA Ops" track this reads the profiler's
`bytes_accessed` and `model_flops`, computes the achieved HBM bandwidth
and FLOP rate, and the *roofline lower bound* for that op:

    t_min = max(bytes / PEAK_BW, flops / PEAK_FLOPS)

Summing t_min over all ops gives the speed-of-light step time for this
exact HLO program (same ops, perfect kernels, zero gaps); the ratio
actual/Σt_min is the headroom factor left in kernel tuning alone —
anything beyond it requires *removing bytes or FLOPs* (different
algorithm, fusion, or dtype), not faster kernels.

Usage:
  python scripts/roofline_report.py /tmp/xtrace --steps 20 [--top 25]

Peak numbers default to TPU v5e (197 bf16 TFLOP/s, 819 GB/s HBM);
override with --peak-tflops / --peak-gbps for other chips.
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
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="chip peak bf16 TFLOP/s (v5e: 197)")
    ap.add_argument("--peak-gbps", type=float, default=819.0,
                    help="chip peak HBM GB/s (v5e: 819)")
    args = ap.parse_args()

    paths = glob.glob(f"{args.trace_dir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        raise SystemExit(f"no trace.json.gz under {args.trace_dir}")
    data = json.load(gzip.open(sorted(paths)[-1]))

    pid = tid = None
    for e in data["traceEvents"]:
        if (e.get("ph") == "M" and e.get("name") == "process_name"
                and "/device:" in e["args"].get("name", "")):
            pid = e["pid"]
    for e in data["traceEvents"]:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e["pid"] == pid and e["args"].get("name") == "XLA Ops"):
            tid = e["tid"]
    if pid is None or tid is None:
        raise SystemExit("no device XLA Ops track found in trace")

    peak_bw = args.peak_gbps * 1e9          # bytes/s
    peak_fl = args.peak_tflops * 1e12       # flop/s

    # Aggregate per HLO op name (stable across steps).
    agg: dict[str, list] = {}
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") != pid or e.get("tid") != tid:
            continue
        a = e.get("args", {})
        rec = agg.setdefault(e["name"], [0.0, 0, 0, a.get("tf_op", "")])
        rec[0] += e.get("dur", 0)  # us
        rec[1] = int(a.get("bytes_accessed", 0) or 0)
        rec[2] = int(a.get("model_flops", 0) or 0)

    total_us = sum(r[0] for r in agg.values())
    total_min_us = 0.0
    rows = []
    for name, (us, byts, flops, tf_op) in agg.items():
        per_call_us = us / args.steps
        # bytes/model_flops are per execution; per step the op may run
        # once (they all do in a single jit step), so per-step = per-call.
        t_bw_us = byts / peak_bw * 1e6
        t_fl_us = flops / peak_fl * 1e6
        t_min_us = max(t_bw_us, t_fl_us)
        total_min_us += t_min_us
        bound = "BW " if t_bw_us >= t_fl_us else "FLOP"
        eff = t_min_us / per_call_us if per_call_us else 0.0
        rows.append((per_call_us, t_min_us, eff, bound, name, tf_op))

    rows.sort(key=lambda r: -r[0])
    actual_ms = total_us / 1e3 / args.steps
    sol_ms = total_min_us / 1e3
    print(f"actual device time : {actual_ms:7.2f} ms/step")
    print(f"roofline floor     : {sol_ms:7.2f} ms/step "
          f"(Σ max(bytes/{args.peak_gbps:.0f} GB/s, "
          f"flops/{args.peak_tflops:.0f} TF/s) per op)")
    print(f"kernel-tuning headroom: {actual_ms / sol_ms:.2f}x "
          f"(step is at {100 * sol_ms / actual_ms:.0f}% of the floor "
          f"for THIS op list; further wins need fewer bytes/FLOPs)")
    print()
    print(f"{'ms/step':>8} {'floor':>7} {'%SoL':>5} bound  op  [scope]")
    for per_call_us, t_min_us, eff, bound, name, tf_op in rows[: args.top]:
        scope = "/".join(p for p in tf_op.split("/") if p)[:80]
        print(f"{per_call_us / 1e3:8.3f} {t_min_us / 1e3:7.3f} "
              f"{100 * eff:4.0f}% {bound:5} {name[:28]:28} {scope}")


if __name__ == "__main__":
    main()
