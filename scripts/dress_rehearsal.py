"""Reference-cardinality dress rehearsal (round-5 verdict item 3).

Generates a synthetic Text2Shape-chair_table-shaped dataset at the REAL
split sizes — ~6.8k train models / ~34k train captions, ~1.5k val models /
~7.4k val captions, vocab 3588 (reference eval_retrieval.py:20,62 and
config/data/text2shape_chair_table.yaml:15) — in the exact on-disk layout
the production loader consumes (exp_data/{cat}/{model}.npz + *_map.json),
then drives the STANDARD train.py CLI on it for a few epochs and reports
the numbers the north-star run needs to know: whole-split RAM load time and
peak RSS, wall-clock per epoch, eval-matrix time, checkpoint size/time, and
that the auto tile budget fits without truncation.

Usage:
    python scripts/dress_rehearsal.py generate [--root /tmp/tricolo_dress]
    python scripts/dress_rehearsal.py run      [--root ...] [--epochs 2]
    python scripts/dress_rehearsal.py report   [--root ...]

`run` shells out to the unmodified train.py under /usr/bin/time -v; `report`
parses the training log + metrics.jsonl into a PARITY.md-ready table.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import re
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Reference cardinality (chair_table): models per split from the released
# val counts (~1486 models / 7424 captions, eval_retrieval.py:20,62) and
# the published train/val/test ratio of the Text2Shape split.
SPLITS = {
    "train": {"models": 6777, "captions_per_model": 5},
    "val": {"models": 1486, "captions_per_model": 5},
}
VOCAB = 3588
CATEGORIES = ("03001627", "04379243")  # chair, table
STORED_VIEWS = 6
STORED_VIEW_SIZE = 224
VOXEL_D = 64


def _one_model(rng, model_id: str):
    """One model's npz payload: solid-ellipsoid voxel64 RGBA + 6 smooth
    synthetic views (gradients compress like renders; pixel content is
    irrelevant to the systems questions this rehearsal answers)."""
    import numpy as np

    D = VOXEL_D
    # Occupancy distribution around the realistic solid median (~8k sites
    # at 64³, tail to ~25k — PERF.md occupancy datapoints).
    n_target = int(rng.lognormal(np.log(8000), 0.35))
    n_target = int(np.clip(n_target, 2500, 26000))
    z, y, x = np.ogrid[0:D, 0:D, 0:D]
    base_r = (n_target * 3.0 / (4.0 * np.pi)) ** (1.0 / 3.0)
    c = rng.uniform(0.35 * D, 0.65 * D, 3)
    r = base_r * rng.uniform(0.8, 1.25, 3)
    mask = (
        ((z - c[0]) / r[0]) ** 2 + ((y - c[1]) / r[1]) ** 2 + ((x - c[2]) / r[2]) ** 2
    ) <= 1.0
    rgb_base = rng.integers(40, 216, 3, dtype=np.uint8)
    vox = np.zeros((4, D, D, D), np.uint8)
    for ch in range(3):
        vox[ch][mask] = rgb_base[ch]
    vox[3][mask] = 255

    S = STORED_VIEW_SIZE
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32) / S
    views = np.empty((STORED_VIEWS, 3, S, S), np.uint8)
    for v in range(STORED_VIEWS):
        phase = 2 * np.pi * v / STORED_VIEWS
        shade = 0.5 + 0.5 * np.sin(2 * np.pi * xx + phase) * np.cos(np.pi * yy)
        for ch in range(3):
            views[v, ch] = (shade * float(rgb_base[ch])).astype(np.uint8)
    return vox, views


def generate(root: pathlib.Path, seed: int = 0):
    import numpy as np

    exp = root / "text2shape-data" / "chair_table" / "preprocessed" / "exp_data"
    exp.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    t0 = time.time()
    n_total = 0
    for split, spec in SPLITS.items():
        rows = []
        for i in range(spec["models"]):
            cat = CATEGORIES[i % 2]
            model_id = f"{split}{i:06x}"
            npz_path = exp / cat / f"{model_id}.npz"
            npz_path.parent.mkdir(exist_ok=True)
            if not npz_path.exists():
                vox, views = _one_model(rng, model_id)
                np.savez_compressed(
                    npz_path, **{f"voxel{VOXEL_D}": vox, "images": views}
                )
            for _ in range(spec["captions_per_model"]):
                n_tok = int(rng.integers(8, 21))
                tokens = rng.integers(1, VOCAB, n_tok).tolist()
                rows.append(
                    {
                        "model_id": model_id,
                        "category": cat,
                        "caption": " ".join(f"w{t}" for t in tokens),
                        "tokens": tokens,
                    }
                )
            n_total += 1
            if n_total % 500 == 0:
                print(
                    f"  {n_total} models, {time.time() - t0:.0f}s elapsed",
                    flush=True,
                )
        with open(exp / f"{split}_map.json", "w") as f:
            json.dump(rows, f)
        print(
            f"{split}: {spec['models']} models, {len(rows)} captions "
            f"({time.time() - t0:.0f}s total)",
            flush=True,
        )
    du = subprocess.run(
        ["du", "-sh", str(exp)], capture_output=True, text=True
    ).stdout.split()[0]
    print(f"dataset on disk: {du} at {exp}")


def run(root: pathlib.Path, epochs: int, extra: list[str]):
    logp = root / "train_log.txt"
    cmd = [
        sys.executable,
        str(REPO / "train.py"),
        "data=text2shape_chair_table",
        f"data.dataset_root_path={root}",
        "model.voxel_encoder=VoxelCNNEncoder",
        "model.image_encoder=MVCNNEncoder",
        f"trainer.max_epochs={epochs}",
        "trainer.check_val_every_n_epoch=1",
        "experiment_name=dress_rehearsal",
        f"project_root_path={root}",
        "data.num_workers=8",
        *extra,
    ]
    print(" ".join(cmd), flush=True)
    t0 = time.time()
    with open(logp, "w") as log:
        rc = subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT).returncode
    wall = time.time() - t0
    # Peak RSS of the (finished) child via getrusage — /usr/bin/time is not
    # installed everywhere; emit its line format so report() parses either.
    import resource

    peak_kb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
    with open(logp, "a") as log:
        log.write(f"\n\tMaximum resident set size (kbytes): {peak_kb}\n")
        log.write(
            "\tElapsed (wall clock) time (h:mm:ss or m:ss): "
            f"{int(wall // 60)}:{wall % 60:05.2f}\n"
        )
    print(f"train.py rc={rc} wall={wall:.0f}s; log: {logp}")
    return rc


def report(root: pathlib.Path):
    log = (root / "train_log.txt").read_text()
    out = {}
    m = re.search(r"Maximum resident set size \(kbytes\): (\d+)", log)
    if m:
        out["peak_rss_gb"] = round(int(m.group(1)) / 1e6, 2)
    m = re.search(r"Elapsed \(wall clock\) time.*: (.+)", log)
    if m:
        out["total_wall"] = m.group(1).strip()
    for phase in ("train", "validate", "checkpoint", "data_load"):
        m = re.search(rf"^\s*{phase}\s+([\d.]+)s", log, re.M)
        if m:
            out[f"{phase}_s"] = float(m.group(1))
    metrics_path = (
        root / "output" / "Text2ShapeChairTable" / "dress_rehearsal"
        / "training" / "metrics.jsonl"
    )
    epochs = {}
    steps = []
    vals = []
    if metrics_path.exists():
        for line in metrics_path.read_text().splitlines():
            row = json.loads(line)
            if "val_eval/RR@5" in row:
                epochs[row["epoch"]] = {
                    k.split("/")[-1]: round(v, 2)
                    for k, v in row.items()
                    if k.startswith("val_eval/")
                }
                vals.append(row)
            elif "train_loss/total_loss" in row and "time" in row:
                steps.append(row)
    out["val_epochs"] = epochs
    # Step pace from the metric timestamps (logged every N steps): the
    # dev-box number is tunnel-H2D-dominated and HIGHLY variable — report
    # the distribution, not a single mean.
    if len(steps) >= 2:
        import numpy as np

        paces = [
            (b["time"] - a["time"]) / (b["step"] - a["step"])
            for a, b in zip(steps, steps[1:])
            if b["step"] > a["step"]
        ]
        out["s_per_step"] = {
            "median": round(float(np.median(paces)), 1),
            "min": round(min(paces), 1),
            "max": round(max(paces), 1),
        }
    # Eval-matrix wall: gap between the last train-step log of an epoch
    # and that epoch's val metrics line (embedding extraction over the
    # full val split + ranking matrix + metric reduction). Upper bound:
    # the gap also contains the ≤(log-interval−1) tail train steps of
    # the epoch.
    evals = []
    for v in vals:
        prior = [s for s in steps if s["time"] < v["time"]]
        if prior:
            evals.append(round(v["time"] - prior[-1]["time"], 1))
    if evals:
        out["eval_wall_s"] = evals
    ckpt_dir = metrics_path.parent
    if ckpt_dir.exists():
        out["ckpt_mb"] = [
            round(os.path.getsize(ckpt_dir / f) / 1e6, 1)
            for f in os.listdir(ckpt_dir)
            if f.endswith(".ckpt")
        ]
    print(json.dumps(out, indent=2))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=("generate", "run", "report"))
    ap.add_argument("--root", default="/tmp/tricolo_dress")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--extra", nargs="*", default=[])
    args = ap.parse_args()
    root = pathlib.Path(args.root)
    if args.cmd == "generate":
        generate(root)
    elif args.cmd == "run":
        raise SystemExit(run(root, args.epochs, args.extra))
    else:
        report(root)


if __name__ == "__main__":
    main()
