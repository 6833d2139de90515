"""Loader-included training throughput (SURVEY hard part iv).

bench.py times the compiled device step on two pre-staged batches; this
script instead drives the REAL input pipeline — dataset __getitem__, fixed-
shape collate (+ host densify in dense mode), the one-deep prefetch thread,
H2D transfer — at reference scale (batch 128, 6 views × {image_size}², 64³
voxels at realistic solid occupancy from the structured primitive dataset),
and reports steps/sec over full epochs next to the pre-staged number. The
gap, if any, is the input pipeline's cost.

Run on the TPU:  python scripts/bench_loader.py [--image-size 128]
(NOTE: this box exposes ONE CPU core through the tunnel; a real TPU host
has dozens — the host-side numbers here are a worst-case floor.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--models", type=int, default=300)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--modes", nargs="+", default=["dense", "packed"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    # No persistent compilation cache on the TPU backend (warm reads hung
    # the tunneled runtime in round 3 — see bench.py note).

    from tricolo_tpu.config import load_config
    from tricolo_tpu.data import DataModule
    from tricolo_tpu.models.tricolo_net import TriCoLoNet
    from tricolo_tpu.parallel import make_mesh, replicated_sharding, shard_batch
    from tricolo_tpu.training import TrainState, make_optimizer, make_train_step
    from tricolo_tpu.data.device_prep import prepare_device_batch

    results = {}
    for mode in args.modes:
        cfg = load_config(
            [
                "data=structured",
                f"data.num_models={args.models}",
                f"data.image_size={args.image_size}",
                "data.num_views=6",
                "data.voxel_size=64",
                "data.batch_size=128",
                f"data.voxel_transfer={mode}",
                "model.image_encoder=MVCNNEncoder",
                "model.voxel_encoder=VoxelCNNEncoder",
                "precision.compute_dtype=bfloat16",
            ]
        )
        dm = DataModule(cfg)
        dm.setup("fit")
        loader = dm.train_loader()
        mesh = make_mesh(cfg.parallel.data_parallel)
        model = TriCoLoNet.from_config(cfg)
        tx = make_optimizer(cfg)
        step = make_train_step(model, tx, cfg)

        peek = loader.peek()
        init_batch = prepare_device_batch(
            {k: jnp.asarray(v) for k, v in peek.items() if isinstance(v, np.ndarray)},
            cfg.data.voxel_size,
        )
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), init_batch)
        state = jax.device_put(
            TrainState.create(variables, tx), replicated_sharding(mesh)
        )
        rng = jax.random.PRNGKey(0)
        lr = cfg.optimizer.lr

        # Warmup epoch: compile + caches hot.
        loader.set_epoch(0)
        n_steps = 0
        for batch in loader:
            state, losses = step(state, shard_batch(batch, mesh), lr, rng)
            n_steps += 1
        float(losses["train_loss/total_loss"])

        # Pre-staged (bench.py-style) number with two staged batches.
        staged = []
        it = iter(loader)
        staged.append(shard_batch(next(it), mesh))
        staged.append(shard_batch(next(it), mesh))
        del it
        for i in range(3):
            state, losses = step(state, staged[i % 2], lr, rng)
        float(losses["train_loss/total_loss"])
        tic = time.perf_counter()
        n = 14
        for i in range(n):
            state, losses = step(state, staged[i % 2], lr, rng)
        float(losses["train_loss/total_loss"])
        prestaged_ms = (time.perf_counter() - tic) / n * 1000

        # Loader-included epochs (prefetch thread on).
        tic = time.perf_counter()
        total = 0
        for epoch in range(1, args.epochs + 1):
            loader.set_epoch(epoch)
            for batch in loader:
                state, losses = step(state, shard_batch(batch, mesh), lr, rng)
                total += 1
        float(losses["train_loss/total_loss"])
        loader_ms = (time.perf_counter() - tic) / total * 1000

        # Host-only cost of the same epochs (no device work).
        tic = time.perf_counter()
        host_batches = 0
        for epoch in range(1, args.epochs + 1):
            loader.set_epoch(epoch)
            for batch in loader:
                host_batches += 1
        host_ms = (time.perf_counter() - tic) / host_batches * 1000

        results[mode] = {
            "prestaged_ms_per_step": round(prestaged_ms, 1),
            "loader_included_ms_per_step": round(loader_ms, 1),
            "host_pipeline_ms_per_batch": round(host_ms, 1),
            "steps_per_epoch": n_steps,
            "pairs_per_sec_loader_included": round(128 * 1000 / loader_ms, 1),
        }
        print(json.dumps({"mode": mode, **results[mode]}), flush=True)

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
