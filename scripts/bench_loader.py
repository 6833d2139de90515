"""Loader-INCLUDED throughput: does the input pipeline keep the chip fed?

bench.py deliberately pre-stages device batches (its metric is the
steady-state compiled step). This harness measures the other half — the
host path the trainer actually runs: dataset __getitem__ → collate
(densify / windowing in the prefetch thread) → BatchIterator prefetch →
shard_batch H2D → train_step, over an epoch of synthetic data at the
reference scale (batch 128, 6 views × 128², 64³ voxels, realistic solid
~8k-site occupancy per shape; reference config/data/base.yaml:5-11).

Two measurements, printed as one JSON line each:

* ``host``: BatchIterator production rate alone (prefetch thread doing
  collate + windowing/densify), no device in the loop. The pipeline keeps
  a chip fed iff ms/batch here < the device step time (73.6 ms for the
  flagship at round 3). Runs on any backend.
* ``e2e`` (--device): the full loop incl. shard_batch and the train step.
  NOTE: on this dev box the TPU sits behind a network tunnel, so H2D
  costs wall-clock that PCIe-attached production hosts do not pay;
  bytes/batch for each transfer mode are printed so the reader can check
  the real budget (PCIe v4 x16 ≈ 25 GB/s: even the dense 171 MB/batch is
  ~7 ms).

Usage:
  python scripts/bench_loader.py --mode host --voxel-transfer windowed_compact
  python scripts/bench_loader.py --mode e2e  --voxel-transfer packed
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class _EllipsoidDataset:
    """In-memory items at reference scale in the GeneralDataset contract.

    ``n_items`` distinct solid-ellipsoid shapes (~``n_points``·0.8 occupied
    sites each) cycled to ``length`` — collate cost per batch is identical
    to distinct data, without holding an epoch of images in RAM.
    """

    def __init__(self, cfg, n_items: int, length: int, n_points: int):
        # Shared "representative solid occupancy" definition — the same
        # generator (incl. its overflow guard) bench.py's pre-staged
        # batches use, so device-only and loader-included benches measure
        # identical data.
        from __graft_entry__ import ellipsoid_sample

        d = cfg.data
        rng = np.random.default_rng(0)
        self.max_voxel_points = n_points
        self.length = length
        self.items = []
        for i in range(n_items):
            flat, rgb = ellipsoid_sample(rng, d.voxel_size, n_points)
            self.items.append(
                {
                    "model_id": f"synthetic_{i:04d}",
                    "category": "synthetic",
                    "tokens": rng.integers(1, d.vocab_size, 16).astype(np.int32),
                    "images": rng.integers(
                        0, 256,
                        (d.num_views, d.image_size, d.image_size, 3),
                        dtype=np.uint8,
                    ),
                    # collate's packed path reads per-item unpadded arrays
                    "voxel_flat": flat[flat != 0xFFFFFFFF],
                    "voxel_rgb": rgb[flat != 0xFFFFFFFF],
                }
            )

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, i: int) -> dict:
        return self.items[i % len(self.items)]


def batch_bytes(batch: dict) -> int:
    return sum(
        v.nbytes for v in batch.values() if isinstance(v, np.ndarray)
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("host", "e2e"), default="host")
    ap.add_argument(
        "--voxel-transfer",
        default="windowed_compact",
        choices=("packed", "dense", "windowed", "windowed_compact"),
    )
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from __graft_entry__ import _flagship_cfg
    from tricolo_tpu.data.loader import BatchIterator

    n_points = 8192
    cfg = _flagship_cfg(
        extra=[
            f"data.batch_size={args.batch_size}",
            f"data.voxel_transfer={args.voxel_transfer}",
        ]
    )
    dataset = _EllipsoidDataset(
        cfg, n_items=256, length=args.steps * args.batch_size, n_points=n_points
    )
    # Fit the tile budgets to the data the way bench.py does: the global
    # device-side budget (full-windowed mode) gets +25% headroom; the
    # per-sample windowed_compact budget k fits the measured max exactly
    # (the production loader's tile_budget="auto" rule).
    from tricolo_tpu.ops.tile_sparse import (
        host_sample_tile_counts,
        host_tile_count,
        sample_tile_budget,
    )

    probe = BatchIterator(
        dataset, args.batch_size, drop_last=True, prefetch=False,
        voxel_transfer="packed", voxel_size=cfg.data.voxel_size,
    ).peek()
    worst = host_tile_count(probe["voxel_flat"], cfg.data.voxel_size)
    tg3 = (cfg.data.voxel_size // 8) ** 3
    budget = -(-int(worst * 1.25) // 256) * 256
    frac = min(1.0, budget / (args.batch_size * tg3))
    cfg.model.modules.VoxelCNNEncoder.tile_budget_frac = frac
    tile_rows = sample_tile_budget(
        "auto", tg3,
        max(host_sample_tile_counts(probe["voxel_flat"], cfg.data.voxel_size)),
    )
    # Same halo rule as DataModule (single definition in ops/tile_sparse).
    from tricolo_tpu.ops.tile_sparse import windowed_halo

    halo = windowed_halo(
        cfg.model.modules.VoxelCNNEncoder.get("tile_sparse_blocks", 2)
    )

    def make_iter():
        return BatchIterator(
            dataset,
            args.batch_size,
            shuffle=True,
            drop_last=True,
            prefetch=True,
            voxel_transfer=args.voxel_transfer,
            voxel_size=cfg.data.voxel_size,
            tile_budget=tile_rows,
            windowed_halo=halo,
        )

    if args.mode == "host":
        # One warm pass primes allocator/page cache, second is timed
        # per-batch (median is the steady-state figure; single large
        # outliers are allocator page-faults on this 1-core box).
        it = make_iter()
        first = next(iter(it))
        nbytes = batch_bytes(first)
        for _ in it:
            pass
        times = []
        t_last = time.perf_counter()
        for _ in make_iter():
            t = time.perf_counter()
            times.append(t - t_last)
            t_last = t
        times_ms = np.sort(np.array(times) * 1e3)
        med = float(np.median(times_ms))
        print(
            json.dumps(
                {
                    "metric": "loader_host_ms_per_batch_median",
                    "voxel_transfer": args.voxel_transfer,
                    "value": round(med, 1),
                    "p90": round(float(times_ms[int(0.9 * (len(times_ms) - 1))]), 1),
                    "mean": round(float(times_ms.mean()), 1),
                    "batches": len(times),
                    "h2d_mb_per_batch": round(nbytes / 1e6, 1),
                    "pairs_per_sec_host_only": round(args.batch_size * 1e3 / med, 1),
                }
            )
        )
        return

    # e2e: full training loop off the iterator (see tunnel caveat above).
    import jax

    from tricolo_tpu.models.tricolo_net import TriCoLoNet
    from tricolo_tpu.parallel import make_mesh, replicated_sharding, shard_batch
    from tricolo_tpu.training import TrainState, make_optimizer, make_train_step

    mesh = make_mesh(cfg.parallel.data_parallel)
    model = TriCoLoNet.from_config(cfg)
    tx = make_optimizer(cfg)
    train_step = make_train_step(model, tx, cfg)

    from tricolo_tpu.data.device_prep import prepare_device_batch

    it = make_iter()
    first_host = next(iter(it))
    nbytes = batch_bytes(first_host)
    first = shard_batch(first_host, mesh)
    import jax.numpy as jnp

    init_batch = prepare_device_batch(
        {k: jnp.asarray(v) for k, v in first.items() if not isinstance(v, (list, int))},
        cfg.data.voxel_size,
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), init_batch)
    state = jax.device_put(
        TrainState.create(variables, tx), replicated_sharding(mesh)
    )
    rng = jax.random.PRNGKey(0)
    lr = cfg.optimizer.lr

    # Warmup/compile on the first batch, then time a full epoch through
    # the real iterator.
    for _ in range(2):
        state, losses = train_step(state, first, lr, rng)
    float(losses["train_loss/total_loss"])

    tic = time.perf_counter()
    n = 0
    for host_batch in make_iter():
        state, losses = train_step(state, shard_batch(host_batch, mesh), lr, rng)
        n += 1
    float(losses["train_loss/total_loss"])
    elapsed = time.perf_counter() - tic
    print(
        json.dumps(
            {
                "metric": "loader_included_pairs_per_sec",
                "voxel_transfer": args.voxel_transfer,
                "value": round(n * args.batch_size / elapsed, 1),
                "ms_per_step": round(1e3 * elapsed / n, 1),
                "h2d_mb_per_batch": round(nbytes / 1e6, 1),
                "batches": n,
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
