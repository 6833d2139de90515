"""Device-side batch preparation: runs *inside* the jitted step.

The host ships compact batches (uint8 images, padded sparse voxels); these
functions expand them on device where HBM bandwidth is cheap relative to
PCIe/host transfers:

* `normalize_images` — uint8 → float, /255 and CLIP-stat normalization
  (the reference does this per-item on the host, general_dataset.py:87-89);
* `densify_voxels` — scatter padded sparse (coords, feats, mask) into the
  dense (B, D, D, D, 3) grid the VoxelCNN consumes (the dense analogue of
  building a SparseConvTensor, reference sparse_cnn.py:46-47 +
  data_module.py:52-64). Occupied sites get RGB/255; empty sites zeros.

Both are pure jax functions: XLA fuses the normalization into the first conv
and lowers the scatter to an efficient one-hot add.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .datasets import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD


def normalize_images(images_u8: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(..., H, W, 3) uint8 → normalized float with CLIP statistics."""
    mean = jnp.asarray(CLIP_IMAGE_MEAN, dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, dtype)
    x = images_u8.astype(dtype) / 255.0
    return (x - mean) / std


VOXEL_PAD_SENTINEL = np.uint32(0xFFFFFFFF)
# Byte 3 of a packed RGB word flags the site as occupied (alpha>0 in the
# source RGBA grid) — needed because RGB (0,0,0) is a legal occupied color.
VOXEL_OCCUPIED_BIT = np.uint32(1 << 24)


def pack_sparse_voxels(coords: "np.ndarray", feats: "np.ndarray", n_pad: int):
    """Host-side packing of one sample's sparse voxels (numpy).

    coords (N, 3) uint8 sorted-unique grid indices (the order `nonzero`
    yields), feats (N, 3) uint8 RGB → (flat (n_pad,) uint32 with 0xFFFFFFFF
    padding, rgb (n_pad,) uint32 r|g<<8|b<<16). The flat index stays sorted
    with padding at the end — the property the device scatter exploits.
    """
    n = min(coords.shape[0], n_pad)
    c = coords[:n].astype(np.uint32)
    f = feats[:n].astype(np.uint32)
    flat = np.full(n_pad, VOXEL_PAD_SENTINEL, dtype=np.uint32)
    rgb = np.zeros(n_pad, dtype=np.uint32)
    # Flattened with x slowest — matches the (D, D, D) reshape below.
    flat[:n] = (c[:, 0] * 256 + c[:, 1]) * 256 + c[:, 2]
    # Bit 24 = occupancy: the reference's active-site rule is alpha>0
    # (general_dataset.py:46-51), so occupied pure-black voxels must stay
    # distinguishable from empty space after densification.
    rgb[:n] = f[:, 0] | (f[:, 1] << 8) | (f[:, 2] << 16) | VOXEL_OCCUPIED_BIT
    return flat, rgb


def densify_voxels(
    flat_u32: jax.Array,
    rgb_u32: jax.Array,
    voxel_size: int,
    dtype=jnp.float32,
    with_mask: bool = False,
) -> jax.Array:
    """Packed sparse batch → dense (B, D, D, D, 3) float grid.

    TPU-tuned formulation (3.3× faster than a naive batched 4-D
    scatter-add on v5e): one uint32 word per occupied site carrying packed
    RGB, set-scattered into a flat (B·D³,) grid with
    ``indices_are_sorted=True``/``unique_indices=True`` — guarantees the
    host packing provides (sites come from `nonzero` on a dense grid, so
    they are sorted and unique; padding is the max-uint sentinel, which
    stays sorted at the end and drops as out-of-bounds). The RGB unpack and
    /255 normalization are elementwise passes XLA fuses into the consumer.

    Because voxels are *input data*, this op needs no gradient — it sits
    outside every differentiation path.
    """
    batch, n_points = flat_u32.shape
    d3 = voxel_size * voxel_size * voxel_size
    stride = d3 + n_points  # d3 real slots + a per-sample trash region

    # Host flat index uses a fixed 256 stride per axis; rebase to D strides.
    x = (flat_u32 >> 16) & 0xFF
    y = (flat_u32 >> 8) & 0xFF
    z = flat_u32 & 0xFF
    local = (
        x.astype(jnp.int32) * voxel_size + y.astype(jnp.int32)
    ) * voxel_size + z.astype(jnp.int32)
    # Padded entries land in the sample's trash region at distinct slots
    # (d3 + point index) — the flattened index vector is then genuinely
    # sorted AND unique, which the promises below require: real sites come
    # sorted/unique from `nonzero`, padding sits at the end of each sample
    # with increasing slots, and sample bases increase by `stride`.
    point_pos = jnp.arange(n_points, dtype=jnp.int32)[None, :]
    local = jnp.where(flat_u32 == VOXEL_PAD_SENTINEL, d3 + point_pos, local)
    base = jnp.arange(batch, dtype=jnp.int32)[:, None] * stride
    idx = (base + local).reshape(-1)

    grid = jnp.zeros((batch * stride,), jnp.uint32)
    grid = grid.at[idx].set(
        rgb_u32.reshape(-1), indices_are_sorted=True, unique_indices=True
    )
    grid = grid.reshape(batch, stride)[:, :d3]
    grid = grid.reshape(batch, voxel_size, voxel_size, voxel_size)
    return unpack_dense_voxels(grid, dtype, with_mask)


def unpack_windowed_rows(rows_u32: jax.Array, dtype=jnp.float32):
    """Packed u32 window rows → (rgb0 float (..., 4), mask float (..., 1)).

    The windowed encoder's input unpack, shaped for the conv directly:
    the 4th input channel is the ZERO pad channel
    (padded_rgb_conv_kernel_init), NOT the occupancy bit — emitting it
    here (one multi-output elementwise pass) instead of
    stack→slice→pad over `unpack_dense_voxels`'s 4-channel output saves
    two full materializations of the row tensor (~9 → 5 channel-planes
    of HBM writes at flagship scale; the round-4 trace priced the old
    chain at 1.9 ms/step).
    """
    zero = jnp.zeros(rows_u32.shape, dtype)
    x = jnp.stack(
        [
            (rows_u32 & 0xFF).astype(dtype) / 255.0,
            ((rows_u32 >> 8) & 0xFF).astype(dtype) / 255.0,
            ((rows_u32 >> 16) & 0xFF).astype(dtype) / 255.0,
            zero,
        ],
        axis=-1,
    )
    mask = ((rows_u32 >> 24) & 0x1).astype(dtype)[..., None]
    return x, mask


def unpack_dense_voxels(
    grid_u32: jax.Array, dtype=jnp.float32, with_mask: bool = False
) -> jax.Array:
    """Dense packed-RGB grid (B, D, D, D) uint32 → (B, D, D, D, 3) float/255.

    The device half of the ``data.voxel_transfer=dense`` path: the host
    ships the already-dense grid (the scatter in `densify_voxels` costs
    ~6.6 ms/step on a v5e and vanishes when the host does it during
    prefetch — H2D of the 134 MB/batch grid overlaps with compute on real
    hosts). Elementwise; XLA fuses it into the first conv.

    ``with_mask`` appends a 4th channel: the 0/1 occupancy flag from the
    packed word's bit 24 (the reference alpha>0 active-site rule) — used by
    the submanifold-faithful masked-BN mode. Packed data written before the
    occupancy bit existed yields an all-zero mask; masked_bn requires
    repacked data.
    """
    channels = [
        (grid_u32 & 0xFF).astype(dtype) / 255.0,
        ((grid_u32 >> 8) & 0xFF).astype(dtype) / 255.0,
        ((grid_u32 >> 16) & 0xFF).astype(dtype) / 255.0,
    ]
    if with_mask:
        channels.append(((grid_u32 >> 24) & 0x1).astype(dtype))
    return jnp.stack(channels, axis=-1)


def densify_on_host(
    flat_u32: "np.ndarray", rgb_u32: "np.ndarray", voxel_size: int
) -> "np.ndarray":
    """Host twin of the device scatter: packed sparse → (B, D, D, D) uint32.

    Used by the collate path when ``data.voxel_transfer=dense``; runs in the
    prefetch thread, overlapped with device compute. Dispatches to the C++
    sweep when available (~5× the numpy put_along_axis path — the prefetch
    thread must outpace the ~88 ms device step) with numpy as fallback.
    """
    from .. import native

    if native.available():
        return native.packed_to_dense(flat_u32, rgb_u32, voxel_size)
    batch, _ = flat_u32.shape
    d3 = voxel_size * voxel_size * voxel_size
    x = (flat_u32 >> 16) & 0xFF
    y = (flat_u32 >> 8) & 0xFF
    z = flat_u32 & 0xFF
    local = (
        x.astype(np.int64) * voxel_size + y.astype(np.int64)
    ) * voxel_size + z.astype(np.int64)
    # Slot d3 swallows padding AND out-of-range coordinates, matching the
    # C++ sweep's silent-skip behavior for malformed (non-sentinel) sites.
    grid = np.zeros((batch, d3 + 1), np.uint32)
    out_of_range = (x >= voxel_size) | (y >= voxel_size) | (z >= voxel_size)
    local = np.where((flat_u32 == VOXEL_PAD_SENTINEL) | out_of_range, d3, local)
    np.put_along_axis(grid, local, rgb_u32, axis=1)
    return grid[:, :d3].reshape(batch, voxel_size, voxel_size, voxel_size)


def windowed_on_host(
    flat_u32: "np.ndarray",
    rgb_u32: "np.ndarray",
    voxel_size: int,
    tile: int = 8,
    halo: int = 1,
):
    """Host twin of the (nonexistent-on-device) halo'd tile gather:
    packed sparse → (B·tg³, s³) u32 window rows + per-tile occupancy.

    The voxel_transfer=windowed path: every device-side halo'd tile gather
    formulation measured 10-100× off bandwidth (PERF.md round 3), so the
    prefetch thread materializes each tile's (tile+2·halo)³ window while
    packing — a site lands in its home tile's window plus the halos of up
    to 7 neighbors. C++ fast path with a vectorized numpy fallback.
    """
    from .. import native

    if native.available():
        return native.packed_to_windowed(flat_u32, rgb_u32, voxel_size, tile, halo)
    batch, _ = flat_u32.shape
    tg = voxel_size // tile
    s = tile + 2 * halo
    tg3, s3 = tg**3, s**3
    rows = np.zeros(batch * tg3 * s3, np.uint32)
    occ = np.zeros(batch * tg3, np.uint8)
    b_idx = np.broadcast_to(
        np.arange(batch, dtype=np.int64)[:, None], flat_u32.shape
    )
    v = np.stack(
        [(flat_u32 >> 16) & 0xFF, (flat_u32 >> 8) & 0xFF, flat_u32 & 0xFF]
    ).astype(np.int64)
    valid = (flat_u32 != VOXEL_PAD_SENTINEL) & (v < voxel_size).all(axis=0)
    home = v // tile
    mod = v % tile
    # Per axis: neighbor window (mutually exclusive directions for
    # halo ≤ tile/2), or -1 when the site reaches no neighbor.
    nbr = np.where(
        (mod < halo) & (home > 0),
        home - 1,
        np.where((mod >= tile - halo) & (home + 1 < tg), home + 1, -1),
    )
    occ_idx = (b_idx * tg3 + (home[0] * tg + home[1]) * tg + home[2])[valid]
    occ[occ_idx] = 1
    for pick in range(8):
        use_nbr = np.array(
            [(pick >> 2) & 1, (pick >> 1) & 1, pick & 1], bool
        ).reshape(3, 1, 1)
        w = np.where(use_nbr, nbr, home)
        sel = valid & (w >= 0).all(axis=0)
        local = v - (w * tile - halo)
        idx = (
            (b_idx * tg3 + (w[0] * tg + w[1]) * tg + w[2]) * s3
            + (local[0] * s + local[1]) * s
            + local[2]
        )
        np.put(rows, idx[sel], rgb_u32[sel])
    return rows.reshape(batch * tg3, s3), occ


def windowed_compact_on_host(
    flat_u32: "np.ndarray",
    rgb_u32: "np.ndarray",
    voxel_size: int,
    k: int,
    tile: int = 8,
    halo: int = 1,
):
    """Compacted windowed transfer, PER-SAMPLE layout: rows for ONLY each
    sample's active tiles.

    Returns (rows (B, k, s³) u32, local_ids (B, k) i32, counts (B,) i32).
    Each sample's rows cover its first ``k`` active tiles in ascending
    tile-id order — the same nonzero(size=k) truncation rule the device
    applies to full windows — with zero rows / tg³-sentinel ids as padding;
    ``counts`` holds each sample's TOTAL active tiles so callers detect
    truncation (count > k). The per-sample axis is what makes the layout
    mesh-shardable: batch shards carry their own rows, and the tile→grid
    scatter (ops/tile_sparse.scatter_tiles_ps) stays shard-local. vs
    ``windowed_on_host`` this writes and ships only the active ~10-25% of
    rows, and the encoder consumes them directly with no on-device row
    take (voxel_transfer=windowed_compact).
    """
    from .. import native

    if native.available():
        return native.packed_to_windowed_compact(
            flat_u32, rgb_u32, voxel_size, k, tile, halo
        )
    rows_full, occ = windowed_on_host(flat_u32, rgb_u32, voxel_size, tile, halo)
    batch = flat_u32.shape[0]
    tg3 = (voxel_size // tile) ** 3
    rows_full = rows_full.reshape(batch, tg3, -1)
    occ = occ.reshape(batch, tg3)
    rows = np.zeros((batch, k, rows_full.shape[-1]), np.uint32)
    local_ids = np.full((batch, k), tg3, np.int32)
    counts = np.empty(batch, np.int32)
    for b in range(batch):
        (ids,) = np.nonzero(occ[b])
        counts[b] = len(ids)
        ids = ids[:k]
        rows[b, : len(ids)] = rows_full[b, ids]
        local_ids[b, : len(ids)] = ids
    return rows, local_ids, counts


def prepare_device_batch(
    batch: dict, voxel_size: int, dtype=jnp.float32, voxel_mask: bool = False
) -> dict:
    """Expand a host batch into the tensor dict TriCoLoNet consumes.

    Keys passed through: tokens, clip_embeddings_img/text. Keys produced:
    images (normalized float) when raw images are present, voxels (dense
    float grid) when sparse voxels are present — with a 4th occupancy
    channel when ``voxel_mask`` (the masked-BN mode's alpha>0 active-site
    mask; VoxelCNNEncoder splits it off before the convs).
    """
    out: dict = {"tokens": batch["tokens"]}
    if "images" in batch:
        out["images"] = normalize_images(batch["images"], dtype)
    if "voxel_windows" in batch:
        # Windowed transfer: the rows stay packed u32 — the tile-sparse
        # encoder unpacks AFTER taking the active rows (~19% of the data).
        out["voxel_windows"] = batch["voxel_windows"]
        out["voxel_tile_occ"] = batch["voxel_tile_occ"]
    elif "voxel_rows" in batch:
        # Compacted windowed transfer: per-sample host-compacted active
        # rows (B, k, s³) + their local tile ids (B, k) — consumed by the
        # encoder as-is (no on-device row take); rows shard with samples.
        out["voxel_rows"] = batch["voxel_rows"]
        out["voxel_row_ids"] = batch["voxel_row_ids"]
    elif "voxel_grid" in batch:
        out["voxels"] = unpack_dense_voxels(batch["voxel_grid"], dtype, voxel_mask)
    elif "voxel_flat" in batch:
        out["voxels"] = densify_voxels(
            batch["voxel_flat"], batch["voxel_rgb"], voxel_size, dtype, voxel_mask
        )
    for key in ("clip_embeddings_img", "clip_embeddings_text"):
        if key in batch:
            out[key] = batch[key]
    return out
