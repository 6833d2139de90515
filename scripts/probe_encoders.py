"""End-to-end voxel-encoder variants, fwd+bwd, on the chip.

Fixes probe_tile_sparse2's flaw (inputs captured as jit constants blew the
remote-compile request size); inputs are arguments here.

Variants: dense unmasked hybrid (flagship today), dense masked with the
new hybrid backward, dense masked with the plain composition, tile-sparse
1/2 blocks. Plus the full Tri(I+V) step at masked vs unmasked.
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
from tricolo_tpu.ops.tile_sparse import tile_counts


def bench_encoder(name, enc, x, iters=10):
    variables = enc.init(jax.random.PRNGKey(0), x, True)

    def loss(params, stats, x):
        out, mut = enc.apply(
            {"params": params, "batch_stats": stats}, x, True,
            mutable=["batch_stats"],
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    f = jax.jit(jax.grad(loss))
    t = timeit(f, (variables["params"], variables["batch_stats"], x), iters)
    print(f"[enc] {name}: {t:.2f} ms fwd+bwd", flush=True)
    return t


def main():
    rng = np.random.default_rng(0)
    mask_np = make_mask(rng)
    dtype = jnp.bfloat16
    vox_np = np.zeros((B, D, D, D, 4), np.float32)
    vox_np[..., :3] = rng.random((B, D, D, D, 3)) * mask_np[..., None]
    vox_np[..., 3] = mask_np
    vox = jnp.asarray(vox_np, dtype)
    n_active = int(
        np.asarray(tile_counts(jnp.asarray(mask_np.astype(np.float32)), 8)).sum()
    )
    frac = min(1.0, (-(-n_active // 256) * 256) / (B * 512))
    print(f"active tiles {n_active} (budget frac {frac:.3f})", flush=True)

    common = dict(voxel_size=64, ef_dim=32, z_dim=512, out_dim=512, dtype=dtype)
    bench_encoder(
        "dense unmasked hybrid (flagship today)",
        VoxelCNNEncoder(**common, masked_bn=False),
        vox[..., :3],
    )
    bench_encoder(
        "dense masked HYBRID backward",
        VoxelCNNEncoder(**common, masked_bn=True),
        vox,
    )
    bench_encoder(
        "dense masked plain composition",
        VoxelCNNEncoder(**common, masked_bn=True, fused_bn_pool=False),
        vox,
    )
    for blocks in (1, 2):
        bench_encoder(
            f"tile-sparse masked {blocks} block(s) (patches windowing)",
            VoxelCNNEncoder(
                **common,
                masked_bn=True,
                tile_sparse=True,
                tile_sparse_blocks=blocks,
                tile_budget_frac=frac,
            ),
            vox,
        )


if __name__ == "__main__":
    main()
