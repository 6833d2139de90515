"""Probe: the windowed (host-halo'd rows) sparse voxel encoder on-chip.

Compares fwd+bwd of the windowed block-1-sparse masked encoder against
the dense masked hybrid (60.7 ms) and the unmasked flagship (58.3 ms),
at flagship scale with realistic solid occupancy.
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
from tricolo_tpu.data.device_prep import pack_sparse_voxels, windowed_on_host


def main():
    rng = np.random.default_rng(0)
    mask_np = make_mask(rng)
    dtype = jnp.bfloat16

    # pack the ellipsoid occupancy into the loader contract, then window
    n_pad = int(max(mask_np.sum(axis=(1, 2, 3))))
    n_pad = -(-n_pad // 512) * 512
    flat = np.full((B, n_pad), 0xFFFFFFFF, np.uint32)
    rgb = np.zeros((B, n_pad), np.uint32)
    for b in range(B):
        coords = np.argwhere(mask_np[b]).astype(np.uint8)
        feats = rng.integers(0, 256, (len(coords), 3), dtype=np.uint8)
        flat[b], rgb[b] = pack_sparse_voxels(coords, feats, n_pad)
    import time

    tic = time.time()
    windows, occ = windowed_on_host(flat, rgb, D)
    host_ms = (time.time() - tic) * 1000
    frac = min(1.0, (-(-int(occ.sum()) // 256) * 256) / (B * 512))
    print(
        f"host windowing {host_ms:.0f} ms/batch (1 core); active frac {frac:.3f}",
        flush=True,
    )
    windows_d = jnp.asarray(windows)
    occ_d = jnp.asarray(occ)

    enc = VoxelCNNEncoder(
        voxel_size=D, ef_dim=32, z_dim=512, out_dim=512, dtype=dtype,
        masked_bn=True, tile_sparse=True, tile_budget_frac=frac,
    )
    variables = enc.init(jax.random.PRNGKey(0), None, True, True, windows_d, occ_d)

    def loss(params, stats, w, o):
        out, _ = enc.apply(
            {"params": params, "batch_stats": stats}, None, True, True, w, o,
            mutable=["batch_stats"],
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    f = jax.jit(jax.grad(loss))
    t = timeit(f, (variables["params"], variables["batch_stats"], windows_d, occ_d), 10)
    print(f"[enc] windowed sparse block-1 masked: {t:.2f} ms fwd+bwd", flush=True)


if __name__ == "__main__":
    main()
