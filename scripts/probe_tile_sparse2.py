"""Round-2 probes: the windowed-reshape gather + full sparse block stack.

Measures, at flagship scale (B=128, 64³, realistic ~9% solid occupancy):
  1. gather_tiles fwd / VJP (the formulation that replaced the 37/95 ms
     vmapped dynamic_slice + scatter-add)
  2. the composed tile-sparse blocks 1+2 (gather→conv→masked BN/pool→
     scatter, via VoxelCNNEncoder) fwd+bwd vs the dense masked path
  3. the current flagship (dense, unmasked hybrid BN) voxel encoder for
     the end-to-end calculus

Run: python scripts/probe_tile_sparse2.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from scripts.bench_util import timeit
from scripts.probe_tile_sparse import make_mask, B, D

from tricolo_tpu.models.voxel_cnn import VoxelCNNEncoder
from tricolo_tpu.ops.tile_sparse import active_tile_ids, gather_tiles, tile_counts


def main():
    rng = np.random.default_rng(0)
    mask_np = make_mask(rng)
    dtype = jnp.bfloat16
    vox_np = np.zeros((B, D, D, D, 4), np.float32)
    vox_np[..., :3] = rng.random((B, D, D, D, 3)) * mask_np[..., None]
    vox_np[..., 3] = mask_np
    vox = jnp.asarray(vox_np, dtype)
    mask = jnp.asarray(mask_np.astype(np.float32), dtype)

    n_active = int(
        np.asarray(tile_counts(jnp.asarray(mask_np.astype(np.float32)), 8)).sum()
    )
    budget = -(-n_active // 1024) * 1024
    print(f"active tiles {n_active}, budget {budget}")

    x4 = vox  # (B,64,64,64,4)
    f_ids = jax.jit(lambda m: active_tile_ids(m, 8, budget))
    ids = f_ids(mask)
    t = timeit(f_ids, (mask,), 20)
    print(f"[1] tile ids: {t:.2f} ms")

    f_gather = jax.jit(lambda x, i: gather_tiles(x, i, 8, 1))
    t = timeit(f_gather, (x4, ids), 20)
    print(f"[2a] windowed gather fwd (T,10³,4): {t:.2f} ms (was 37.1)")

    def gloss(x):
        return jnp.sum(gather_tiles(x, ids, 8, 1).astype(jnp.float32) ** 2)

    f_gvjp = jax.jit(jax.grad(gloss))
    t = timeit(f_gvjp, (x4,), 20)
    print(f"[2b] windowed gather fwd+VJP: {t:.2f} ms (VJP alone was 95.1)")

    # 32-channel block-2-scale gather (t=4, halo=1 → 6³ windows, 3.4× dup)
    x32 = jnp.asarray(rng.random((B, 32, 32, 32, 32)).astype(np.float32), dtype)
    f_gather2 = jax.jit(lambda x, i: gather_tiles(x, i, 4, 1))
    t = timeit(f_gather2, (x32, ids), 20)
    print(f"[2c] block-2 gather fwd (T,6³,32): {t:.2f} ms (was 10.6)")

    def gloss2(x):
        return jnp.sum(gather_tiles(x, ids, 4, 1).astype(jnp.float32) ** 2)

    t = timeit(jax.jit(jax.grad(gloss2)), (x32,), 20)
    print(f"[2d] block-2 gather fwd+VJP: {t:.2f} ms (VJP alone was 95.1)")

    # --- full voxel encoders, fwd+bwd ------------------------------------
    def bench_encoder(name, enc, x):
        variables = enc.init(jax.random.PRNGKey(0), x, True)

        def loss(params, stats):
            out, mut = enc.apply(
                {"params": params, "batch_stats": stats}, x, True,
                mutable=["batch_stats"],
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        f = jax.jit(jax.grad(loss))
        t = timeit(f, (variables["params"], variables["batch_stats"]), 10)
        print(f"[3] {name}: {t:.2f} ms fwd+bwd")
        return t

    common = dict(voxel_size=64, ef_dim=32, z_dim=512, out_dim=512, dtype=dtype)
    bench_encoder(
        "dense unmasked hybrid (flagship today)",
        VoxelCNNEncoder(**common, masked_bn=False),
        vox[..., :3],
    )
    bench_encoder(
        "dense masked (spconv-faithful)",
        VoxelCNNEncoder(**common, masked_bn=True),
        vox,
    )
    for blocks in (1, 2, 3):
        bench_encoder(
            f"tile-sparse masked, {blocks} sparse block(s)",
            VoxelCNNEncoder(
                **common,
                masked_bn=True,
                tile_sparse=True,
                tile_sparse_blocks=blocks,
                tile_budget_frac=budget / (B * 512),
            ),
            vox,
        )


if __name__ == "__main__":
    main()
