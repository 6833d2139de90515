"""Probe: halo-window extraction as a depthwise identity convolution.

Every explicit gather/scatter formulation for halo'd tile windows measured
10-100× off bandwidth (PERF.md round 3), and Mosaic DMA refuses unaligned
second-minor slices. But window extraction IS a convolution: jax's
`conv_general_dilated_patches` extracts (s,s,s) patches at stride t as a
depthwise identity conv — the systolic/vector units do the data movement,
no scatter/gather at all, and the VJP (overlap-add of patches) is the
transposed conv XLA already knows how to lower.

Measures patches fwd / VJP at block-1/2/3 scale plus the row-take of
active rows, on the real chip.
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
from tricolo_tpu.ops.tile_sparse import active_tile_ids, tile_counts


def patches_rows(x, tile, halo):
    """(B, G, G, G, C) → (B·tg³, s, s, s, C) halo'd windows via depthwise
    identity conv (conv_general_dilated_patches)."""
    Bb, G, _, _, C = x.shape
    tg = G // tile
    s = tile + 2 * halo
    p = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=(s, s, s),
        window_strides=(tile, tile, tile),
        padding=((halo, halo),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    # output (B, tg, tg, tg, C·s³) with feature dim ordered (C, sz, sy, sx)
    p = p.reshape(Bb * tg**3, C, s, s, s)
    return jnp.moveaxis(p, 1, -1)


def main():
    rng = np.random.default_rng(0)
    mask_np = make_mask(rng)
    dtype = jnp.bfloat16
    mask = jnp.asarray(mask_np.astype(np.float32), dtype)
    n_active = int(np.asarray(tile_counts(mask, 8)).sum())
    budget = -(-n_active // 1024) * 1024
    print(f"active {n_active}, budget {budget}", flush=True)
    ids = jax.jit(lambda m: active_tile_ids(m, 8, budget))(mask)

    cases = [
        ("block1 (64³,C4,t8,s10)", (B, 64, 4), 8, 1),
        ("block2 (32³,C32,t4,s6)", (B, 32, 32), 4, 1),
        ("block3 (16³,C64,t2,s4)", (B, 16, 64), 2, 1),
    ]
    for name, (bb, g, c), tile, halo in cases:
        x = jnp.asarray(rng.random((bb, g, g, g, c)).astype(np.float32), dtype)
        f = jax.jit(lambda x: patches_rows(x, tile, halo))
        t = timeit(f, (x,), 10)
        rows = f(x)
        print(f"[p] patches {name}: {t:.2f} ms → rows {rows.shape}", flush=True)

        def loss(x):
            return jnp.sum(patches_rows(x, tile, halo).astype(jnp.float32) ** 2)

        t = timeit(jax.jit(jax.grad(loss)), (x,), 10)
        print(f"[p] patches+VJP {name}: {t:.2f} ms", flush=True)

        def take(rows, ids):
            valid = ids < rows.shape[0]
            out = rows[jnp.where(valid, ids, 0)]
            return out * valid[:, None, None, None, None].astype(out.dtype)

        ft = jax.jit(lambda x, i: take(patches_rows(x, tile, halo), i))
        t = timeit(ft, (x, ids), 10)
        print(f"[p] patches+take {name}: {t:.2f} ms", flush=True)

        def loss2(x):
            return jnp.sum(take(patches_rows(x, tile, halo), ids).astype(jnp.float32) ** 2)

        t = timeit(jax.jit(jax.grad(loss2)), (x,), 10)
        print(f"[p] patches+take fwd+VJP {name}: {t:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
