"""Tile-sparse compute for the submanifold-faithful voxel encoder.

The reference's spconv stack computes only at active voxel sites
(sparse_cnn.py:11-40). The dense TPU rebuild computes everywhere — fine at
64³ when BN statistics span all sites, but under the *masked* (spconv-
faithful) semantics — activations hard-zeroed at inactive sites, BN
statistics over active sites only — whole-grid compute is provably wasted:
every active site lives in a tile that contains one, a 3³ conv at an
active site reads at most a 1-voxel halo around its tile, and everything
outside active tiles is exactly zero through the entire stack.

This module restricts blocks to the active tiles:

  dense grid → [active tile ids from the occupancy mask]
             → gather (T, t+2, t+2, t+2, C) tiles with halo
             → conv VALID (same kernel parameters as the dense path)
             → masked BN / ReLU / MaxPool on tiles (stats are sums over
               active sites — all inside gathered tiles, so identical to
               the dense masked stats)
             → scatter (T, t/2, t/2, t/2, C) back to the half-resolution
               dense grid (zeros background)

EXACT vs the dense masked path (tested): not an approximation. The active
tile set is computed once from the INPUT occupancy and reused at every
level — submanifold convs never dilate the active set, and 2³ pooling maps
a tile to the same tile index at half resolution.

Formulations are chosen by measurement (PERF.md round 3, v5e probes):

* gather: a dense *windowed view* — overlapping (t+2)³ windows at stride t
  built from three axis-wise pad+reshape+concat passes — followed by ONE
  contiguous row-take of the active rows (s³·C ≈ 4-8 KB each). The naive
  vmapped dynamic_slice gather measured 37 ms at block-1 scale and its
  autodiff VJP (element scatter-add) 95 ms; this formulation costs a few
  dense passes (~2-4 ms) + a fast row gather, and its hand-written VJP is
  a unique-row scatter + `jax.linear_transpose` of the windowing (dense
  overlap-adds).
* scatter: rows into a tiled-layout buffer with sorted+unique promises,
  then a free-form transpose to NDHWC (10 ms at block-1 scale vs 112 ms
  for the NDHWC row-scatter).

Static shapes: the number of active tiles is data-dependent, so a static
``budget`` bounds it (jnp.nonzero(size=...)); batches whose active-tile
count exceeds the budget lose their highest-index tiles (documented, like
data.voxel_max_points truncation — the trainer warns when the budget
looks too small; see VoxelCNNEncoder.tile_budget_frac).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def host_sample_tile_counts(flat_u32, voxel_size: int, tile: int = 8):
    """Per-sample active-tile counts of a packed host batch (numpy).
    flat_u32: (B, N) packed x|y|z site words with 0xFFFFFFFF padding
    (device_prep convention). Returns an int list of length B."""
    import numpy as np

    counts = []
    tg = voxel_size // tile
    for row in flat_u32:
        sites = row[row != np.uint32(0xFFFFFFFF)]
        x = (sites >> 16) & 0xFF
        y = (sites >> 8) & 0xFF
        z = sites & 0xFF
        tid = ((x // tile) * tg + (y // tile)) * tg + (z // tile)
        counts.append(len(np.unique(tid)))
    return counts


def host_tile_count(flat_u32, voxel_size: int, tile: int = 8) -> int:
    """Total active tiles in a packed host batch (numpy, for the trainer's
    budget diagnostic)."""
    return int(sum(host_sample_tile_counts(flat_u32, voxel_size, tile)))


def tile_counts(mask: jax.Array, tile: int) -> jax.Array:
    """Per-sample active-tile counts (B,) — for budget diagnostics."""
    B, D = mask.shape[0], mask.shape[1]
    tg = D // tile
    tiled = mask.reshape(B, tg, tile, tg, tile, tg, tile)
    return jnp.sum(jnp.any(tiled > 0, axis=(2, 4, 6)), axis=(1, 2, 3))


def tile_budget(frac: float, batch: int, tg3: int) -> int:
    """The static GLOBAL active-tile budget: ceil(frac·batch·tg3/256)·256,
    clamped to the physical tile count.

    Used by the device-side compactions — the dense-input tile-sparse plan
    and the full-windowed transfer's on-device row take — and the
    trainer's truncation canary; single definition so they agree. (The
    windowed_compact host path budgets PER SAMPLE instead:
    sample_tile_budget below.)
    """
    budget = -(-int(frac * batch * tg3) // 256) * 256
    return min(budget, batch * tg3)


def sample_tile_budget(budget, tg3: int, max_tiles: int | None = None) -> int:
    """The PER-SAMPLE active-tile row budget k for windowed_compact.

    The compacted rows carry a per-sample axis ((B, k, s³) — so batch
    shards carry their own rows under a data-parallel mesh, and the
    tile→grid scatter stays shard-local), so the budget is per sample:

    * ``budget`` int > 0 — explicit row count per sample (overflow policy
      is the loader's ``data.tile_overflow``: error | truncate);
    * ``"auto"`` / None — fitted: the split's measured max per-sample
      active-tile count (``max_tiles``), which makes truncation impossible
      for that split by construction.

    k is NOT rounded up beyond a floor of 8: it is a middle dim of the
    (B, k, s³) rows — the lane/sublane dims are inside s³·C — so padding
    it buys no layout alignment and every extra row is pure wasted sparse
    compute (an 8-multiple k measured ~0.5 ms/step at flagship scale).
    Clamped to the physical tg³. Single definition for every
    producer/consumer — host collate (data/loader.py), bench.py and the
    dryrun must derive the SAME k or host row shapes stop matching the
    encoder's static shapes.
    """
    if isinstance(budget, (int, float)) and not isinstance(budget, bool):
        k = int(budget)
        if k <= 0:
            raise ValueError(f"tile_budget must be positive, got {budget}")
    else:
        if max_tiles is None:
            raise ValueError(
                "tile_budget='auto' needs the split's measured max per-"
                "sample tile count (dataset.max_voxel_tiles)"
            )
        k = int(max_tiles)
    return min(max(8, k), tg3)


def windowed_halo(tile_sparse_blocks: int) -> int:
    """Halo width for host-windowed rows, from the encoder's sparse depth.

    Single definition for every producer (DataModule, bench.py,
    scripts/bench_loader.py): ≥2 sparse blocks need each tile's full
    block-2 input support (14³ rows, halo 3); 1 block needs 10³ (halo 1).
    The windowed encoder derives its depth from the row length, so it
    caps sparse depth at 2 — DataModule warns when tile_sparse_blocks
    asks for more under a windowed transfer.
    """
    return 3 if int(tile_sparse_blocks) >= 2 else 1


def active_tile_ids(mask: jax.Array, tile: int, budget: int) -> jax.Array:
    """Sorted ids of tiles containing ≥1 active site.

    mask: (B, D, D, D) or (B, D, D, D, 1), nonzero = active. Returns
    (budget,) int32 ids into the flattened (B·tg³) tile grid, ascending,
    padded with B·tg³ (the "no tile" sentinel).
    """
    if mask.ndim == 5:
        mask = mask[..., 0]
    B, D = mask.shape[0], mask.shape[1]
    tg = D // tile
    tiled = mask.reshape(B, tg, tile, tg, tile, tg, tile)
    any_site = jnp.any(tiled > 0, axis=(2, 4, 6)).reshape(-1)
    (ids,) = jnp.nonzero(any_site, size=budget, fill_value=B * tg**3)
    return ids.astype(jnp.int32)


def _window_axis(x: jax.Array, axis: int, tile: int, halo: int) -> jax.Array:
    """Overlapping windows of size tile+2·halo at stride ``tile`` along
    ``axis``: (…, D, …) → (…, tg, s, …). Pure pad+reshape+slice+concat —
    linear, dense, transposable."""
    D = x.shape[axis]
    tg = D // tile
    s = tile + 2 * halo
    if halo == 0:
        return x.reshape(*x.shape[:axis], tg, tile, *x.shape[axis + 1 :])
    pad = [(0, 0)] * x.ndim
    pad[axis] = (halo, tile - halo)  # window tg-1 reads halo past the end
    xp = jnp.pad(x, pad)

    def take(start, length):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(start, start + tg * tile)
        chunk = xp[tuple(idx)].reshape(
            *x.shape[:axis], tg, tile, *x.shape[axis + 1 :]
        )
        sub = [slice(None)] * chunk.ndim
        sub[axis + 1] = slice(0, length)
        return chunk[tuple(sub)]

    # window k = padded positions [k·t, k·t + s): the aligned t-chunk plus
    # the first 2·halo of the next aligned chunk.
    return jnp.concatenate([take(0, tile), take(tile, 2 * halo)], axis=axis + 1)


def _window_rows_reshape(x: jax.Array, tile: int, halo: int) -> jax.Array:
    """Windowing via axis-wise pad+reshape+concat (reference formulation;
    measured 84 ms at block-1 scale on v5e — small-channel minor dims
    poison every XLA layout)."""
    B, D, _, _, C = x.shape
    tg = D // tile
    s = tile + 2 * halo
    w = _window_axis(x, 1, tile, halo)  # (B, tg, s, D, D, C)
    w = _window_axis(w, 3, tile, halo)  # (B, tg, s, tg, s, D, C)
    w = _window_axis(w, 5, tile, halo)  # (B, tg, s, tg, s, tg, s, C)
    w = jnp.transpose(w, (0, 1, 3, 5, 2, 4, 6, 7))
    return w.reshape(B * tg**3, s, s, s, C)


def _window_rows_patches(x: jax.Array, tile: int, halo: int) -> jax.Array:
    """Windowing as a depthwise identity convolution
    (conv_general_dilated_patches): the conv units do the data movement —
    no gather, no layout-hostile concats — and the linear transpose is the
    transposed conv XLA already lowers well."""
    B, D, _, _, C = x.shape
    tg = D // tile
    s = tile + 2 * halo
    if halo == 0:
        # plain tiling — the reshape path is free of overlaps and cheap
        return _window_rows_reshape(x, tile, halo)
    p = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=(s, s, s),
        window_strides=(tile, tile, tile),
        padding=((halo, halo),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    # (B, tg, tg, tg, C·s³) with the feature dim ordered (C, sz, sy, sx)
    p = p.reshape(B * tg**3, C, s, s, s)
    return jnp.moveaxis(p, 1, -1)


# Selected by measurement on the target backend (PERF.md round 3): the
# patches (depthwise-conv) variant looked promising but measured 52 ms fwd
# and 5.9 s (!) for the transposed conv in backward on v5e; the reshape
# formulation is bad (84 ms at block-1 scale) but strictly the least bad
# differentiable option. Device-side halo'd tile gather at small C has no
# fast formulation on this stack — the production answer is host-side
# windowing (voxel_transfer=windowed); this path remains for correctness
# tests and non-TPU backends.
_window_rows = _window_rows_reshape


def gather_tiles(
    x: jax.Array, ids: jax.Array, tile: int, halo: int = 0
) -> jax.Array:
    """(T, s, s, s, C) tile gather from (B, D, D, D, C), s = tile+2·halo.

    Padding ids return all-zero tiles. Differentiable in x (custom VJP:
    unique-row scatter + linear transpose of the windowing)."""
    return _gather_tiles(x, ids, tile, halo, x.shape[0], x.shape[1], x.shape[-1])


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _gather_tiles(x, ids, tile, halo, batch, grid, channels):
    out, _ = _gather_fwd(x, ids, tile, halo, batch, grid, channels)
    return out


def _take_rows(rows: jax.Array, ids: jax.Array, n_rows: int) -> jax.Array:
    valid = ids < n_rows
    safe = jnp.where(valid, ids, 0)
    out = rows[safe]
    return out * valid.reshape((-1,) + (1,) * (rows.ndim - 1)).astype(out.dtype)


def _gather_fwd(x, ids, tile, halo, batch, grid, channels):
    rows = _window_rows(x, tile, halo)
    out = _take_rows(rows, ids, rows.shape[0])
    return out, ids


def _gather_bwd(tile, halo, batch, grid, channels, residuals, dy):
    ids = residuals
    n_rows = batch * (grid // tile) ** 3
    T = ids.shape[0]
    # Active dy rows land at their tile's row; padding ids land in per-tile
    # trash rows beyond n_rows (kept unique + ascending for the scatter
    # promises), which the slice below discards.
    safe = jnp.where(ids < n_rows, ids, n_rows + jnp.arange(T, dtype=ids.dtype))
    buf = jnp.zeros((n_rows + T, *dy.shape[1:]), dy.dtype)
    buf = buf.at[safe].set(dy, indices_are_sorted=True, unique_indices=True)
    d_rows = buf[:n_rows]
    x_shape = (batch, grid, grid, grid, channels)
    window = partial(_window_rows, tile=tile, halo=halo)
    (dx,) = jax.linear_transpose(
        window, jax.ShapeDtypeStruct(x_shape, dy.dtype)
    )(d_rows)
    return dx, None


_gather_tiles.defvjp(_gather_fwd, _gather_bwd)


# Layout used by scatter_tiles when the caller doesn't pass one. A module
# global (like fused_bn_pool.ROUTING) so perf A/Bs can flip it without
# config plumbing; change the default only with an end-to-end bench.
#   "transpose": set-scatter into tile-major rows + free-form transpose to
#     NDHWC (the round-3 measured pick at block-1 scale).
#   "lines": scatter directly into NDHWC line segments — no transpose pass
#     (the trace's reshape pair runs at ~3× its bandwidth floor).
SCATTER_LAYOUT = "transpose"


def scatter_tiles(
    tiles: jax.Array,
    ids: jax.Array,
    batch: int,
    grid: int,
    layout: str | None = None,
) -> jax.Array:
    """(T, t, t, t, C) disjoint tiles → dense (B, grid, grid, grid, C),
    zeros background. Padding ids (≥ B·tg³) are dropped.

    Two exact layouts (``layout`` or the module SCATTER_LAYOUT global):

    * "transpose": each tile is one contiguous row of a (B·tg³ + T, t³·C)
      buffer, written with sorted+unique index promises (ascending active
      ids; per-tile trash rows for padding), then a free-form transpose to
      NDHWC. The autodiff VJP is the corresponding row-gather.
    * "lines": in NDHWC a tile occupies t² contiguous line segments of
      t·C elements (full W-extent of the tile × channels) — at the
      flagship shapes t·C = 2·64 = 4·32 = 128, exactly one vreg lane row.
      For fixed intra-tile (dz, hy) the segment index is monotonic in the
      tile id, so t² sorted+unique row-scatters build the NDHWC buffer
      with NO transpose pass. Falls back to "transpose" when t·C < 128
      (sub-lane rows are the measured scatter pathology — module header).
    """
    if layout is None:
        layout = SCATTER_LAYOUT
    if layout == "lines" and tiles.shape[1] * tiles.shape[-1] >= 128:
        return _scatter_tiles_lines(tiles, ids, batch, grid)
    T, tile = tiles.shape[0], tiles.shape[1]
    C = tiles.shape[-1]
    tg = grid // tile
    n_rows = batch * tg**3
    safe = jnp.where(ids < n_rows, ids, n_rows + jnp.arange(T, dtype=ids.dtype))
    buf = jnp.zeros((n_rows + T, tile**3 * C), tiles.dtype)
    buf = buf.at[safe].set(
        tiles.reshape(T, -1), indices_are_sorted=True, unique_indices=True
    )
    t8 = buf[:n_rows].reshape(batch, tg, tg, tg, tile, tile, tile, C)
    return jnp.transpose(t8, (0, 1, 4, 2, 5, 3, 6, 7)).reshape(
        batch, grid, grid, grid, C
    )


def scatter_tiles_ps(
    tiles: jax.Array,
    local_ids: jax.Array,
    grid: int,
    layout: str | None = None,
) -> jax.Array:
    """Per-sample tile scatter: (B, k, t, t, t, C) disjoint tiles with
    (B, k) LOCAL tile ids (ascending per sample, in [0, tg³); padding ≥
    tg³) → dense (B, grid, grid, grid, C), zeros background.

    The windowed_compact layout carries a per-sample axis so batch shards
    carry their own rows under a data-parallel mesh; this scatter stays
    shard-local because every target row of sample b belongs to sample b.
    The sorted+unique index promises survive per-sample compaction by
    giving each sample its own trash region INSIDE the flat buffer
    (row b·(tg³+k)+tg³+j), keeping the flattened index vector globally
    ascending — a tail trash region (the global scatter_tiles trick) would
    interleave descending across samples and break the promise silently.

    Layouts mirror scatter_tiles: "transpose" (rows + free-form transpose),
    "lines" (direct NDHWC line segments, per-(dz,hy) scatters), plus
    "hybrid" — the transpose FORWARD (the measured fwd winner) with the
    line-gather BACKWARD (d_tiles read straight out of NDHWC dy as
    per-(dz,hy) 128-wide line rows, skipping the inverse free-form
    transpose — the one sub-50%-of-roofline op left in the flagship
    backward). All exact; pick by end-to-end bench.
    """
    if layout is None:
        layout = SCATTER_LAYOUT
    wide = tiles.shape[2] * tiles.shape[-1] >= 128
    if layout == "lines" and wide:
        return _scatter_tiles_lines_ps(tiles, local_ids, grid)
    if layout == "hybrid" and wide:
        return _scatter_tiles_hybrid_ps(tiles, local_ids, grid)
    return _transpose_scatter_ps(tiles, local_ids, grid)


def _transpose_scatter_ps(tiles, local_ids, grid):
    B, k, tile = tiles.shape[0], tiles.shape[1], tiles.shape[2]
    C = tiles.shape[-1]
    tg = grid // tile
    n = tg**3
    stride = n + k
    j = jnp.arange(k, dtype=local_ids.dtype)[None, :]
    safe = jnp.where(local_ids < n, local_ids, n + j)
    flat_idx = (
        jnp.arange(B, dtype=local_ids.dtype)[:, None] * stride + safe
    ).reshape(-1)
    buf = jnp.zeros((B * stride, tile**3 * C), tiles.dtype)
    buf = buf.at[flat_idx].set(
        tiles.reshape(B * k, -1), indices_are_sorted=True, unique_indices=True
    )
    t8 = buf.reshape(B, stride, -1)[:, :n].reshape(
        B, tg, tg, tg, tile, tile, tile, C
    )
    return jnp.transpose(t8, (0, 1, 4, 2, 5, 3, 6, 7)).reshape(
        B, grid, grid, grid, C
    )


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _scatter_tiles_hybrid_ps(tiles, local_ids, grid):
    out, _ = _hybrid_ps_fwd(tiles, local_ids, grid)
    return out


def _hybrid_ps_fwd(tiles, local_ids, grid):
    return _transpose_scatter_ps(tiles, local_ids, grid), (
        local_ids,
        tiles.shape,
    )


_scatter_tiles_hybrid_ps.defvjp(
    _hybrid_ps_fwd, lambda grid, res, dy: _lines_ps_bwd(grid, res, dy)
)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _scatter_tiles_lines_ps(tiles, local_ids, grid):
    out, _ = _lines_ps_fwd(tiles, local_ids, grid)
    return out


def _ps_line_index(local_ids, tile, tg, grid):
    """Per-sample NDHWC line-segment index for a LOCAL tile id at fixed
    intra-tile (dz, hy): monotonic in the id (same dominance argument as
    _line_ids, without the sample term)."""
    tx = local_ids % tg
    r = local_ids // tg
    ty = r % tg
    tz = r // tg
    return tz, ty, tx


def _lines_ps_fwd(tiles, local_ids, grid):
    B, k, tile = tiles.shape[0], tiles.shape[1], tiles.shape[2]
    C = tiles.shape[-1]
    tg = grid // tile
    n = tg**3
    lines_per_sample = grid * grid * tg
    stride = lines_per_sample + k
    tz, ty, tx = _ps_line_index(local_ids, tile, tg, grid)
    valid = local_ids < n
    j = jnp.arange(k, dtype=local_ids.dtype)[None, :]
    b = jnp.arange(B, dtype=local_ids.dtype)[:, None]
    src = tiles.reshape(B * k, tile, tile, tile * C)
    buf = jnp.zeros((B * stride, tile * C), tiles.dtype)
    for dz in range(tile):
        for hy in range(tile):
            line = ((tile * tz + dz) * grid + tile * ty + hy) * tg + tx
            line = jnp.where(valid, line, lines_per_sample + j)
            buf = buf.at[(b * stride + line).reshape(-1)].set(
                src[:, dz, hy], indices_are_sorted=True, unique_indices=True
            )
    out = buf.reshape(B, stride, tile * C)[:, :lines_per_sample].reshape(
        B, grid, grid, grid, C
    )
    return out, (local_ids, tiles.shape)


def _lines_ps_bwd(grid, residuals, dy):
    local_ids, tiles_shape = residuals
    B, k, tile = tiles_shape[0], tiles_shape[1], tiles_shape[2]
    C = tiles_shape[-1]
    tg = grid // tile
    n = tg**3
    lines_per_sample = grid * grid * tg
    lines = dy.reshape(B * lines_per_sample, tile * C)
    tz, ty, tx = _ps_line_index(local_ids, tile, tg, grid)
    valid = local_ids < n
    b = jnp.arange(B, dtype=local_ids.dtype)[:, None]
    parts = []
    for dz in range(tile):
        for hy in range(tile):
            line = ((tile * tz + dz) * grid + tile * ty + hy) * tg + tx
            flat = jnp.where(
                valid, b * lines_per_sample + line, B * lines_per_sample
            ).reshape(-1)
            parts.append(_take_rows(lines, flat, B * lines_per_sample))
    d_tiles = jnp.stack(parts, axis=1).reshape(tiles_shape)
    return d_tiles, None


_scatter_tiles_lines_ps.defvjp(_lines_ps_fwd, _lines_ps_bwd)


def _line_ids(ids: jax.Array, tile: int, tg: int, grid: int):
    """Decompose ascending tile ids into per-(dz, hy) NDHWC line-segment
    ids. For fixed (dz, hy): line = ((b·grid + t·tz + dz)·grid + t·ty +
    hy)·tg + tx, monotonic in id = ((b·tg + tz)·tg + ty)·tg + tx because
    each coefficient dominates the maximum of the lower-order terms
    (tile·tg = grid ≥ tg)."""
    tx = ids % tg
    r = ids // tg
    ty = r % tg
    r = r // tg
    tz = r % tg
    b = r // tg
    return b, tz, ty, tx


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _scatter_tiles_lines(tiles, ids, batch, grid):
    out, _ = _lines_fwd(tiles, ids, batch, grid)
    return out


def _lines_fwd(tiles, ids, batch, grid):
    T, tile = tiles.shape[0], tiles.shape[1]
    C = tiles.shape[-1]
    tg = grid // tile
    n_rows = batch * tg**3
    n_lines = batch * grid * grid * tg
    b, tz, ty, tx = _line_ids(ids, tile, tg, grid)
    valid = ids < n_rows
    trash = n_lines + jnp.arange(T, dtype=ids.dtype)
    src = tiles.reshape(T, tile, tile, tile * C)
    buf = jnp.zeros((n_lines + T, tile * C), tiles.dtype)
    for dz in range(tile):
        for hy in range(tile):
            line = ((b * grid + tile * tz + dz) * grid + tile * ty + hy) * tg + tx
            line = jnp.where(valid, line, trash)
            buf = buf.at[line].set(
                src[:, dz, hy], indices_are_sorted=True, unique_indices=True
            )
    out = buf[:n_lines].reshape(batch, grid, grid, grid, C)
    return out, (ids, tiles.shape)


def _lines_bwd(batch, grid, residuals, dy):
    ids, tiles_shape = residuals
    T, tile = tiles_shape[0], tiles_shape[1]
    C = tiles_shape[-1]
    tg = grid // tile
    n_rows = batch * tg**3
    n_lines = batch * grid * grid * tg
    lines = dy.reshape(n_lines, tile * C)
    b, tz, ty, tx = _line_ids(ids, tile, tg, grid)
    valid = ids < n_rows
    parts = []
    for dz in range(tile):
        for hy in range(tile):
            line = ((b * grid + tile * tz + dz) * grid + tile * ty + hy) * tg + tx
            parts.append(_take_rows(lines, jnp.where(valid, line, n_lines), n_lines))
    d_tiles = jnp.stack(parts, axis=1).reshape(tiles_shape)
    return d_tiles, None


_scatter_tiles_lines.defvjp(_lines_fwd, _lines_bwd)
