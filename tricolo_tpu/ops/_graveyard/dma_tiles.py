"""Pallas DMA tile gather/scatter: HBM→HBM strided copies at dynamic offsets.

The tile-sparse voxel path needs two data movers no XLA formulation handles
well (all measured on v5e at block-1 scale, T≈12k tiles of (10,10,10,4)
bf16, PERF.md round 3):

  * gather active tiles + halo from the dense grid — vmapped dynamic_slice
    37 ms, windowed-reshape + row-take 84 ms (tiny lane dims poison every
    XLA layout);
  * scatter pooled tiles back to dense — NDHWC row-scatter 112 ms,
    tiled-layout set-scatter + transpose 10 ms.

Both are pure data movement (~100-300 MB) that the DMA engines could do
at bandwidth, independent of vector-lane layout. These kernels issue one
strided HBM→HBM copy per tile from scalar-prefetched offsets
(PrefetchScalarGridSpec), G tiles per grid step with a G-deep in-flight
window.

STATUS (round 3, measured): **not compilable on real v5e.** Mosaic
requires HBM ``memref_slice`` shapes/offsets aligned to the (8,128)
packed tiling on the two minor dims; a t³ tile slice at an arbitrary
spatial offset violates it ("Slice shape along dimension 3 must be
aligned to tiling (8), but is 10"). Kept as interpret-mode kernels
(tests exercise the semantics) pending Mosaic support for unaligned HBM
slicing; the production tile movers are the host windowing path
(data/device_prep windowed/_compact) and ops/tile_sparse's XLA
formulations.

Padding ids are routed to an all-zero extra sample appended to the source
(gather) / a discarded extra sample (scatter), so no masking pass is
needed.

CPU fallback: `interpret=True` runs the same kernels under the Pallas
interpreter (tests); the XLA formulations in ops/tile_sparse.py remain the
non-TPU production path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _starts_from_ids(ids, batch, tg, tile, pad_sample):
    """(T,) tile ids → (T, 4) int32 [b, z0, y0, x0]; padding ids map to
    tile (0,0,0) of the all-zero ``pad_sample``."""
    n = batch * tg**3
    valid = ids < n
    safe = jnp.where(valid, ids, 0)
    b = jnp.where(valid, safe // tg**3, pad_sample)
    t = jnp.where(valid, safe % tg**3, 0)
    tz = t // (tg * tg)
    rem = t % (tg * tg)
    ty, tx = rem // tg, rem % tg
    return jnp.stack(
        [b, tz * tile, ty * tile, tx * tile], axis=1
    ).astype(jnp.int32)


def _gather_kernel(starts_ref, src_ref, out_ref, sems, *, G: int, s: int):
    g = pl.program_id(0)
    dmas = []
    for j in range(G):
        t = g * G + j
        dma = pltpu.make_async_copy(
            src_ref.at[
                pl.ds(starts_ref[t, 0], 1),
                pl.ds(starts_ref[t, 1], s),
                pl.ds(starts_ref[t, 2], s),
                pl.ds(starts_ref[t, 3], s),
                :,
            ],
            out_ref.at[pl.ds(t, 1)],
            sems.at[j],
        )
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()


def dma_gather_tiles(
    x: jax.Array,
    ids: jax.Array,
    tile: int,
    halo: int = 0,
    group: int = 64,
    interpret: bool | None = None,
) -> jax.Array:
    """(T, s, s, s, C) halo'd tile gather from (B, D, D, D, C) via DMA.

    Forward only (wrap in the custom-VJP of tile_sparse.gather_tiles for
    gradients). Padding ids yield all-zero tiles.
    """
    B, D, _, _, C = x.shape
    tg = D // tile
    s = tile + 2 * halo
    T = ids.shape[0]
    while T % group:
        group //= 2
    # halo border + one all-zero sample at index B for padding ids
    xp = jnp.pad(x, ((0, 1), (halo, halo), (halo, halo), (halo, halo), (0, 0)))
    starts = _starts_from_ids(ids, B, tg, tile, pad_sample=B)
    return pl.pallas_call(
        partial(_gather_kernel, G=group, s=s),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T // group,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((group,))],
        ),
        out_shape=jax.ShapeDtypeStruct((T, s, s, s, C), x.dtype),
        interpret=_use_interpret(interpret),
    )(starts, xp)


def _scatter_kernel(starts_ref, tiles_ref, dense_ref, out_ref, sems, *, G, t_sz):
    # dense_ref is aliased onto out_ref (input_output_aliases) — the zeros
    # background arrives in place; each tile is one strided DMA write.
    del dense_ref
    g = pl.program_id(0)
    dmas = []
    for j in range(G):
        t = g * G + j
        dma = pltpu.make_async_copy(
            tiles_ref.at[pl.ds(t, 1)],
            out_ref.at[
                pl.ds(starts_ref[t, 0], 1),
                pl.ds(starts_ref[t, 1], t_sz),
                pl.ds(starts_ref[t, 2], t_sz),
                pl.ds(starts_ref[t, 3], t_sz),
                :,
            ],
            sems.at[j],
        )
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()


def dma_scatter_tiles(
    tiles: jax.Array,
    ids: jax.Array,
    batch: int,
    grid: int,
    group: int = 64,
    interpret: bool | None = None,
) -> jax.Array:
    """(T, t, t, t, C) disjoint tiles → dense (B, grid, grid, grid, C)
    zeros background, via per-tile DMA writes into an in-place buffer.

    Padding ids write into a discarded extra sample.
    """
    T, t_sz = tiles.shape[0], tiles.shape[1]
    C = tiles.shape[-1]
    tg = grid // t_sz
    while T % group:
        group //= 2
    dense = jnp.zeros((batch + 1, grid, grid, grid, C), tiles.dtype)
    starts = _starts_from_ids(ids, batch, tg, t_sz, pad_sample=batch)
    out = pl.pallas_call(
        partial(_scatter_kernel, G=group, t_sz=t_sz),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T // group,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((group,))],
        ),
        out_shape=jax.ShapeDtypeStruct((batch + 1, grid, grid, grid, C), tiles.dtype),
        input_output_aliases={2: 0},
        interpret=_use_interpret(interpret),
    )(starts, tiles, dense)
    return out[:batch]
