"""Dense vs masked (submanifold-faithful) BatchNorm decision experiment.

The single riskiest divergence from the reference is BN semantics: spconv's
BatchNorm1d normalizes over *active voxel sites only* (reference
sparse_cnn.py:11-40), while the dense TPU stack defaults to all-site
statistics. Round-2's experiment (36 synthetic queries) was too noisy to
decide; this one runs on the structured synthetic dataset
(data/structured.py — captions determine shape attributes, so retrieval
metrics carry signal), with ≥3 seeds × 20 epochs × both modes, and reports
means ± spread.

Usage (real TPU, ~25 min including two compiles; or +platform=cpu slow):

    python scripts/bn_experiment.py [--seeds 123 231 312] [--epochs 20]
        [--out experiments/bn_experiment.json] [--models 300]

Writes one JSON with per-run epoch curves and a final summary table, and
prints the PARITY.md-ready markdown.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

METRICS = ("RR@1", "RR@5", "NDCG@5", "MRR")


def run_one(
    mode: str,
    seed: int,
    epochs: int,
    models: int,
    out_root: str,
    extra: list[str] = (),
    tag: str = "",
) -> dict:
    import numpy as np

    from tricolo_tpu.config import load_config
    from tricolo_tpu.data import DataModule
    from tricolo_tpu.training.trainer import Trainer

    overrides = [
        "data=structured",
        f"data.num_models={models}",
        "model.voxel_encoder=VoxelCNNEncoder",
        "precision.compute_dtype=bfloat16",
        f"train_seed={seed}",
        f"trainer.max_epochs={epochs}",
        "trainer.check_val_every_n_epoch=2",
        "trainer.profiler=none",
        "logger.backend=jsonl",
        f"project_root_path={out_root}",
        f"experiment_name=bn_{mode}{tag}_s{seed}",
        "checkpoint_monitor.save_top_k=0",
    ]
    # Both arms explicit: the config DEFAULT flipped to masked_bn=true when
    # this experiment picked masked as the flagship semantics — relying on
    # the default would silently run the dense arm masked on a rerun.
    overrides.append(
        "model.modules.VoxelCNNEncoder.masked_bn="
        + ("true" if mode == "masked" else "false")
    )
    overrides.extend(extra)
    cfg = load_config(overrides)
    trainer = Trainer(cfg)
    tic = time.time()
    trainer.fit(DataModule(cfg))
    wall = time.time() - tic

    # Per-epoch val metrics from the always-on JSONL log.
    curve = []
    metrics_path = os.path.join(cfg.logger.save_dir, "metrics.jsonl")
    with open(metrics_path) as f:
        for line in f:
            row = json.loads(line)
            if "val_eval/RR@5" in row:
                curve.append(
                    {
                        "epoch": row["epoch"],
                        **{m: row[f"val_eval/{m}"] for m in METRICS},
                        "val_loss": row.get(
                            "val_loss/total_loss", float("nan")
                        ),
                    }
                )
    final = curve[-1] if curve else {}
    best_rr5_epoch = max(curve, key=lambda r: r["RR@5"]) if curve else {}
    print(
        f"[{mode} seed={seed}] {wall:.0f}s  final "
        + " ".join(f"{m}={final.get(m, float('nan')):.2f}" for m in METRICS)
    )
    return {
        "mode": mode,
        "seed": seed,
        "wall_sec": wall,
        "curve": curve,
        "final": final,
        "best_by_rr5": best_rr5_epoch,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[123, 231, 312])
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--models", type=int, default=300)
    ap.add_argument("--out", default="experiments/bn_experiment.json")
    ap.add_argument("--modes", nargs="+", default=["dense", "masked"])
    ap.add_argument(
        "--tag",
        default="",
        help="experiment-name suffix so A/B arms (e.g. --extra "
        "precision.compute_dtype=float32 --tag _f32) don't collide",
    )
    ap.add_argument(
        "--extra",
        nargs="*",
        default=[],
        help="additional config overrides, e.g. +platform=cpu data.voxel_size=32",
    )
    args = ap.parse_args()

    # No persistent compilation cache on the TPU backend: warm-cache reads
    # hung the tunneled axon runtime in round 3 (see bench.py note). The
    # in-process jit cache still dedups across seeds of the same mode
    # when runs share a process — which they do here.

    for override in args.extra:
        if override == "+platform=cpu":
            os.environ.setdefault(
                "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
            )
            import jax

            jax.config.update("jax_platforms", "cpu")

    import numpy as np

    out_root = os.path.join(os.path.dirname(args.out) or ".", "bn_runs")
    runs = []
    for mode in args.modes:
        for seed in args.seeds:
            runs.append(
                run_one(
                    mode, seed, args.epochs, args.models, out_root,
                    [o for o in args.extra if o != "+platform=cpu"],
                    args.tag,
                )
            )

    summary = {}
    for mode in args.modes:
        finals = [r["final"] for r in runs if r["mode"] == mode and r["final"]]
        bests = [r["best_by_rr5"] for r in runs if r["mode"] == mode and r["best_by_rr5"]]
        summary[mode] = {
            f"final_{m}": {
                "mean": float(np.mean([f[m] for f in finals])),
                "std": float(np.std([f[m] for f in finals])),
                "values": [f[m] for f in finals],
            }
            for m in METRICS
        }
        summary[mode]["best_RR@5"] = {
            "mean": float(np.mean([b["RR@5"] for b in bests])),
            "std": float(np.std([b["RR@5"] for b in bests])),
        }

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"runs": runs, "summary": summary, "args": vars(args)}, f, indent=2)

    print("\n## BN experiment summary (final epoch, mean ± std over seeds)\n")
    print("| Mode | " + " | ".join(METRICS) + " | best RR@5 |")
    print("|---|" + "---|" * (len(METRICS) + 1))
    for mode in args.modes:
        s = summary[mode]
        cells = [
            f"{s[f'final_{m}']['mean']:.2f} ± {s[f'final_{m}']['std']:.2f}"
            for m in METRICS
        ]
        cells.append(
            f"{s['best_RR@5']['mean']:.2f} ± {s['best_RR@5']['std']:.2f}"
        )
        print(f"| {mode} | " + " | ".join(cells) + " |")
    print(f"\nwritten: {args.out}")


if __name__ == "__main__":
    main()
