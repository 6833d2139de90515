"""Compile-time diagnostic for the train-step program variants.

The 128³ windowed_compact program exceeded a 25-minute remote compile on the
tunneled v5e without finishing (PERF.md round 3), while the dense 128³
program compiles in minutes. This script isolates whether the blow-up is
intrinsic to the XLA pipeline (it would reproduce on the CPU backend, whose
compiler shares the platform-independent optimization passes where scatter/
pad canonicalization lives) or an artifact of the tunnel/TPU backend.

Runs AOT ``.lower()`` (trace → StableHLO) and ``.compile()`` separately per
config and prints wall times plus the module's jaxpr/HLO sizes.

Usage:  python scripts/compile_diag.py [--configs 64w,128d,128w,128wn]
"""

from __future__ import annotations

import jax

jax.config.update("jax_platforms", "cpu")  # before any backend init

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


CONFIGS = {
    # name: (voxel_size, batch, transfer, remat)
    "64w": (64, 128, "windowed_compact", False),
    "128d": (128, 32, "dense", True),
    "128w": (128, 32, "windowed_compact", True),
    "128wn": (128, 32, "windowed_compact", False),
}


def build_case(voxel_size: int, batch: int, transfer: str, remat: bool):
    from __graft_entry__ import _flagship_cfg, _host_batch
    from tricolo_tpu.models.tricolo_net import TriCoLoNet
    from tricolo_tpu.training import TrainState, make_optimizer, make_train_step

    cfg = _flagship_cfg(
        extra=[
            f"data.voxel_size={voxel_size}",
            f"data.batch_size={batch}",
            f"data.voxel_transfer={transfer}",
            f"precision.remat_voxel={'true' if remat else 'false'}",
        ]
    )
    n_points = 8192 * (voxel_size**3) // (64**3)
    host = _host_batch(cfg, n_points=n_points, seed=0)

    halo = 3
    if transfer == "dense":
        from tricolo_tpu.data.device_prep import densify_on_host

        host["voxel_grid"] = densify_on_host(
            host.pop("voxel_flat"), host.pop("voxel_rgb"), voxel_size
        )
    elif transfer == "windowed_compact":
        from tricolo_tpu.data.device_prep import windowed_compact_on_host
        from tricolo_tpu.ops.tile_sparse import (
            host_sample_tile_counts,
            sample_tile_budget,
        )

        tg3 = (voxel_size // 8) ** 3
        k = sample_tile_budget(
            "auto", tg3,
            max(host_sample_tile_counts(host["voxel_flat"], voxel_size)),
        )
        rows, local_ids, _ = windowed_compact_on_host(
            host.pop("voxel_flat"), host.pop("voxel_rgb"), voxel_size, k,
            halo=halo,
        )
        host["voxel_rows"] = rows
        host["voxel_row_ids"] = local_ids

    model = TriCoLoNet.from_config(cfg)
    tx = make_optimizer(cfg)
    step = make_train_step(model, tx, cfg)

    # Abstract state: eval_shape through init + TrainState.create — no real
    # compute, so the 128³ cases don't pay a CPU forward pass here.
    from tricolo_tpu.data.device_prep import prepare_device_batch

    batch_shapes = {
        k: jax.ShapeDtypeStruct(np.shape(v), np.asarray(v).dtype)
        for k, v in host.items()
    }
    rng = jax.random.PRNGKey(0)
    variables = jax.eval_shape(
        lambda r, b: model.init(
            r, prepare_device_batch(b, voxel_size)
        ),
        rng,
        batch_shapes,
    )
    state = jax.eval_shape(lambda v: TrainState.create(v, tx), variables)
    return step, state, batch_shapes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="64w,128d,128w")
    args = ap.parse_args()

    for name in args.configs.split(","):
        voxel_size, batch, transfer, remat = CONFIGS[name]
        print(f"== {name}: {voxel_size}^3 b{batch} {transfer} remat={remat}",
              flush=True)
        tic = time.perf_counter()
        step, state, batch_shapes = build_case(voxel_size, batch, transfer, remat)
        print(f"   build (host batch + eval_shape): {time.perf_counter()-tic:.1f}s",
              flush=True)

        tic = time.perf_counter()
        lowered = step.lower(
            state, batch_shapes, 3.5e-4, jax.ShapeDtypeStruct((2,), np.uint32)
        )
        t_lower = time.perf_counter() - tic
        text = lowered.as_text()
        print(
            f"   lower: {t_lower:.1f}s, stablehlo {len(text) / 1e6:.1f} MB,"
            f" {text.count(chr(10))} lines",
            flush=True,
        )

        tic = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - tic
        try:
            mem = compiled.memory_analysis()
            extra = f", temp {mem.temp_size_in_bytes / 2**30:.2f} GiB"
        except Exception:
            extra = ""
        print(f"   compile: {t_compile:.1f}s{extra}", flush=True)


if __name__ == "__main__":
    main()
