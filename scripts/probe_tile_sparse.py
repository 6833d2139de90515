"""Primitive-cost probes for the tile-sparse (submanifold-faithful) voxel path.

The voxel encoder spends 57 of the 87.7 ms flagship step; blocks 1-2 are 48
of those and compute mostly on empty space (~10% solid occupancy → ~15-30%
of 8³ tiles contain any active site). Under the *masked* (spconv-faithful)
semantics — activations hard-zeroed at inactive sites — restricting compute
to active tiles is EXACT: every active site lives in an active tile, conv
at active sites only reads the 1-voxel halo, and everything outside is zero.

This script measures each candidate primitive on the real chip before any
design is committed (the repo's scatter/pool history shows formulation
choice decides everything):

  1. active-tile extraction (mask → sorted tile ids, static budget)
  2. halo gather: vmapped dynamic_slice (T,10,10,10,C) from padded NDHWC
  3. tile conv VALID vs the dense 64³ conv (fwd, fwd+dW)
  4. masked BN/relu/pool on gathered tiles (fwd+bwd) vs dense masked
  5. scatter back to dense: NDHWC row-scatter vs tiled-layout set-scatter
  6. block-2 shapes: (T,6,6,6,32) gather + VJP (overlap-add) cost

Run on the TPU: python scripts/probe_tile_sparse.py
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from scripts.bench_util import timeit

B, D, CIN, C1, C2 = 128, 64, 4, 32, 64
TILE = 8
TG = D // TILE  # 8 tiles per axis
NT = TG**3  # 512 tiles/sample


def make_mask(rng) -> np.ndarray:
    """Realistic solid occupancy: random solid ellipsoids, ~8-12% fill."""
    z, y, x = np.ogrid[0:D, 0:D, 0:D]
    masks = []
    for _ in range(B):
        c = rng.uniform(0.35 * D, 0.65 * D, 3)
        r = rng.uniform(0.22 * D, 0.33 * D, 3)
        m = (
            ((z - c[0]) / r[0]) ** 2
            + ((y - c[1]) / r[1]) ** 2
            + ((x - c[2]) / r[2]) ** 2
        ) <= 1.0
        masks.append(m)
    return np.stack(masks)


def tile_ids_from_mask(mask, budget):
    """mask (B,D,D,D) bool → sorted active-tile ids (budget,) int32 into
    B·NT, padded with B·NT."""
    tiled = mask.reshape(B, TG, TILE, TG, TILE, TG, TILE)
    any_site = tiled.any(axis=(2, 4, 6)).reshape(-1)  # (B·NT,)
    (ids,) = jnp.nonzero(any_site, size=budget, fill_value=B * NT)
    return ids.astype(jnp.int32)


def starts_from_ids(ids):
    """Tile id → (b, z0, y0, x0) slice starts into the 1-padded grid.
    Padding tiles (id == B·NT) clamp to tile 0 of sample 0 — their gathered
    values are killed by the gathered mask being zero there… they are NOT
    zero for sample 0 tile 0; callers must mask by validity."""
    valid = ids < B * NT
    safe = jnp.where(valid, ids, 0)
    b = safe // NT
    t = safe % NT
    tz, rem = t // (TG * TG), t % (TG * TG)
    ty, tx = rem // TG, rem % TG
    return b, tz * TILE, ty * TILE, tx * TILE, valid


def halo_gather(padded, ids, halo, tile):
    """(T, tile+2·halo, …, C) via vmapped dynamic_slice from padded NDHWC."""
    b, z0, y0, x0, valid = starts_from_ids(ids)
    size = tile + 2 * halo
    C = padded.shape[-1]

    def one(bb, zz, yy, xx):
        return jax.lax.dynamic_slice(
            padded, (bb, zz, yy, xx, 0), (1, size, size, size, C)
        )[0]

    out = jax.vmap(one)(b, z0, y0, x0)
    return out * valid[:, None, None, None, None].astype(out.dtype)


def center_gather_rows(dense_rows, ids):
    """Row-take of contiguous tiles from tiled layout (B·NT+1, tile³·C)."""
    return dense_rows[ids]


def main():
    rng = np.random.default_rng(0)
    mask_np = make_mask(rng)
    frac_sites = mask_np.mean()
    tiled = mask_np.reshape(B, TG, TILE, TG, TILE, TG, TILE)
    active = tiled.any(axis=(2, 4, 6))
    frac_tiles = active.mean()
    n_active = int(active.sum())
    budget = int(np.ceil(n_active / 1024) * 1024)
    print(
        f"occupancy: {frac_sites:.3f} sites, {frac_tiles:.3f} tiles "
        f"({n_active} active tiles, budget {budget})"
    )

    dtype = jnp.bfloat16
    x_dense = jnp.asarray(
        rng.standard_normal((B, D, D, D, CIN)).astype(np.float32)
        * mask_np[..., None],
        dtype,
    )
    mask = jnp.asarray(mask_np)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 3, CIN, C1)) * 0.1, dtype)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 3, C1, C2)) * 0.05, dtype)
    scale1 = jnp.ones((C1,), jnp.float32)
    bias1 = jnp.zeros((C1,), jnp.float32)

    dimn = dict(window_strides=(1, 1, 1), padding="VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    # ---- 1. tile-id extraction --------------------------------------------
    f_ids = jax.jit(lambda m: tile_ids_from_mask(m, budget))
    t = timeit(f_ids, (mask,), 20)
    print(f"[1] tile ids from mask: {t:.2f} ms")
    ids = f_ids(mask)

    # ---- 2. halo gather block-1 scale -------------------------------------
    pad1 = jnp.pad(x_dense, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    f_gather1 = jax.jit(lambda p, i: halo_gather(p, i, 1, TILE))
    t = timeit(f_gather1, (pad1, ids), 20)
    gb = budget * 10**3 * CIN * 2 / 1e9
    print(f"[2] halo gather (T,10,10,10,{CIN}): {t:.2f} ms ({gb:.3f} GB out)")
    x_tiles = f_gather1(pad1, ids)

    # ---- 3. conv: dense vs tiles ------------------------------------------
    f_conv_dense = jax.jit(
        lambda x, w: jax.lax.conv_general_dilated(
            jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))), w, **dimn
        )
    )
    t = timeit(f_conv_dense, (x_dense, w1), 10)
    print(f"[3a] dense conv1 fwd 64³ {CIN}->{C1}: {t:.2f} ms")

    def conv_dense_loss(x, w):
        return jnp.sum(f_conv_dense(x, w).astype(jnp.float32) ** 2)

    f_conv_dense_dw = jax.jit(jax.grad(conv_dense_loss, argnums=1))
    t = timeit(f_conv_dense_dw, (x_dense, w1), 10)
    print(f"[3b] dense conv1 dW: {t:.2f} ms")

    f_conv_tiles = jax.jit(
        lambda x, w: jax.lax.conv_general_dilated(x, w, **dimn)
    )
    t = timeit(f_conv_tiles, (x_tiles, w1), 10)
    print(f"[3c] tile conv1 fwd (T,10³,{CIN})->(T,8³,{C1}): {t:.2f} ms")

    def conv_tiles_loss(x, w):
        return jnp.sum(f_conv_tiles(x, w).astype(jnp.float32) ** 2)

    f_conv_tiles_dw = jax.jit(jax.grad(conv_tiles_loss, argnums=1))
    t = timeit(f_conv_tiles_dw, (x_tiles, w1), 10)
    print(f"[3d] tile conv1 dW: {t:.2f} ms")

    y_tiles = f_conv_tiles(x_tiles, w1)  # (T,8,8,8,32)

    # ---- 4. masked BN/relu/pool on tiles vs dense --------------------------
    from tricolo_tpu.ops.fused_bn_pool import masked_bn_relu_pool

    m_dense = mask[..., None].astype(dtype)
    y_dense = f_conv_dense(x_dense, w1)
    m_tiles = halo_gather(
        jnp.pad(m_dense, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))), ids, 0, TILE
    )

    def mbn_loss(y, s, b, m):
        pooled, mean, var, pm = masked_bn_relu_pool(y, s, b, m)
        return jnp.sum(pooled.astype(jnp.float32) ** 2)

    f_mbn_dense = jax.jit(jax.grad(mbn_loss, argnums=(0, 1, 2)))
    t = timeit(f_mbn_dense, (y_dense, scale1, bias1, m_dense), 10)
    print(f"[4a] dense masked BN/relu/pool fwd+bwd 64³x{C1}: {t:.2f} ms")

    f_mbn_tiles = jax.jit(jax.grad(mbn_loss, argnums=(0, 1, 2)))
    t = timeit(f_mbn_tiles, (y_tiles, scale1, bias1, m_tiles), 10)
    print(f"[4b] tile masked BN/relu/pool fwd+bwd (T,8³,{C1}): {t:.2f} ms")

    # ---- 5. scatter back to dense -----------------------------------------
    pooled_tiles = jnp.asarray(
        rng.standard_normal((budget, 4, 4, 4, C1)).astype(np.float32), dtype
    )
    D2 = D // 2
    TG2, TILE2 = TG, TILE // 2

    def scatter_rows_ndhwc(tiles, ids):
        b, z0, y0, x0, valid = starts_from_ids(ids)
        z0, y0, x0 = z0 // 2, y0 // 2, x0 // 2
        dz, dy, dx = jnp.mgrid[0:TILE2, 0:TILE2, 0:TILE2]
        row = (
            (b[:, None, None, None] * D2 + z0[:, None, None, None] + dz)
            * D2
            + (y0[:, None, None, None] + dy)
        ) * D2 + (x0[:, None, None, None] + dx)
        trash = B * D2**3 + jnp.arange(budget) * TILE2**3
        row = jnp.where(
            valid[:, None, None, None],
            row,
            trash[:, None, None, None]
            + (dz * TILE2 + dy) * TILE2
            + dx,
        )
        buf = jnp.zeros((B * D2**3 + budget * TILE2**3, C1), tiles.dtype)
        buf = buf.at[row.reshape(-1)].set(
            tiles.reshape(-1, C1), unique_indices=True
        )
        return buf[: B * D2**3].reshape(B, D2, D2, D2, C1)

    f_scat_rows = jax.jit(scatter_rows_ndhwc)
    t = timeit(f_scat_rows, (pooled_tiles, ids), 10)
    print(f"[5a] NDHWC row-scatter (T,4³,{C1})→(B,32³,{C1}): {t:.2f} ms")

    def scatter_tiled(tiles, ids):
        buf = jnp.zeros((B * NT + budget, TILE2**3 * C1), tiles.dtype)
        safe = jnp.where(ids < B * NT, ids, B * NT + jnp.arange(budget))
        buf = buf.at[safe].set(
            tiles.reshape(budget, -1),
            indices_are_sorted=True,
            unique_indices=True,
        )
        t8 = buf[: B * NT].reshape(B, TG2, TG2, TG2, TILE2, TILE2, TILE2, C1)
        return jnp.transpose(t8, (0, 1, 4, 2, 5, 3, 6, 7)).reshape(
            B, D2, D2, D2, C1
        )

    f_scat_tiled = jax.jit(scatter_tiled)
    t = timeit(f_scat_tiled, (pooled_tiles, ids), 10)
    print(f"[5b] tiled set-scatter + transpose: {t:.2f} ms")
    np.testing.assert_array_equal(
        np.asarray(f_scat_rows(pooled_tiles, ids), np.float32),
        np.asarray(f_scat_tiled(pooled_tiles, ids), np.float32),
    )
    print("    (5a == 5b verified)")

    # ---- 6. block-2 gather + VJP ------------------------------------------
    x2_dense = f_scat_tiled(pooled_tiles, ids)
    pad2 = jnp.pad(x2_dense, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))

    def gather2(p):
        b, z0, y0, x0, valid = starts_from_ids(ids)

        def one(bb, zz, yy, xx):
            return jax.lax.dynamic_slice(
                p, (bb, zz // 2, yy // 2, xx // 2, 0), (1, 6, 6, 6, C1)
            )[0]

        out = jax.vmap(one)(b, z0, y0, x0)
        return out * valid[:, None, None, None, None].astype(out.dtype)

    f_gather2 = jax.jit(gather2)
    t = timeit(f_gather2, (pad2,), 10)
    print(f"[6a] block-2 halo gather (T,6³,{C1}): {t:.2f} ms")

    def g2_loss(p):
        return jnp.sum(gather2(p).astype(jnp.float32) ** 2)

    f_g2_vjp = jax.jit(jax.grad(g2_loss))
    t = timeit(f_g2_vjp, (pad2,), 10)
    print(f"[6b] block-2 halo gather VJP (overlap scatter-add): {t:.2f} ms")

    # block-2 conv on tiles vs dense for scale
    x2_tiles = f_gather2(pad2)
    f_conv2_tiles = jax.jit(
        lambda x, w: jax.lax.conv_general_dilated(x, w, **dimn)
    )
    t = timeit(f_conv2_tiles, (x2_tiles, w2), 10)
    print(f"[6c] tile conv2 fwd (T,6³,{C1})->(T,4³,{C2}): {t:.2f} ms")
    f_conv2_dense = jax.jit(
        lambda x, w: jax.lax.conv_general_dilated(
            jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))), w, **dimn
        )
    )
    t = timeit(f_conv2_dense, (x2_dense, w2), 10)
    print(f"[6d] dense conv2 fwd 32³ {C1}->{C2}: {t:.2f} ms")

    def conv2d_loss(x, w):
        return jnp.sum(f_conv2_dense(x, w).astype(jnp.float32) ** 2)

    f_conv2_dense_grads = jax.jit(jax.grad(conv2d_loss, argnums=(0, 1)))
    t = timeit(f_conv2_dense_grads, (x2_dense, w2), 10)
    print(f"[6e] dense conv2 dX+dW: {t:.2f} ms")

    def conv2t_loss(x, w):
        return jnp.sum(f_conv2_tiles(x, w).astype(jnp.float32) ** 2)

    f_conv2_tiles_grads = jax.jit(jax.grad(conv2t_loss, argnums=(0, 1)))
    t = timeit(f_conv2_tiles_grads, (x2_tiles, w2), 10)
    print(f"[6f] tile conv2 dX+dW (tile-domain only): {t:.2f} ms")


if __name__ == "__main__":
    main()
