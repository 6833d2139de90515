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

from .datasets import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD


def normalize_images(images_u8: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(..., H, W, 3) uint8 → normalized float with CLIP statistics."""
    mean = jnp.asarray(CLIP_IMAGE_MEAN, dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, dtype)
    x = images_u8.astype(dtype) / 255.0
    return (x - mean) / std


def densify_voxels(
    coords_u8: jax.Array,
    feats_u8: jax.Array,
    mask: jax.Array,
    voxel_size: int,
    dtype=jnp.float32,
) -> jax.Array:
    """Padded sparse batch → dense (B, D, D, D, 3) float grid.

    coords (B, N, 3) uint8 grid indices, feats (B, N, 3) uint8 RGB, mask
    (B, N) validity. Padded entries carry zero features and scatter-add
    zeros at site (0,0,0) — a no-op, so real data there is preserved.
    Duplicate real coords never occur (they come from a dense grid's nonzero
    sites).
    """
    batch, n_points, _ = coords_u8.shape
    coords = coords_u8.astype(jnp.int32)
    feats = feats_u8.astype(dtype) / 255.0
    feats = feats * mask[..., None].astype(dtype)

    batch_idx = jnp.broadcast_to(jnp.arange(batch)[:, None], (batch, n_points))
    dense = jnp.zeros((batch, voxel_size, voxel_size, voxel_size, 3), dtype)
    return dense.at[
        batch_idx, coords[..., 0], coords[..., 1], coords[..., 2]
    ].add(feats, mode="drop")


def prepare_device_batch(batch: dict, voxel_size: int, dtype=jnp.float32) -> dict:
    """Expand a host batch into the tensor dict TriCoLoNet consumes.

    Keys passed through: tokens, clip_embeddings_img/text. Keys produced:
    images (normalized float) when raw images are present, voxels (dense
    float grid) when sparse voxels are present.
    """
    out: dict = {"tokens": batch["tokens"]}
    if "images" in batch:
        out["images"] = normalize_images(batch["images"], dtype)
    if "voxel_coords" in batch:
        out["voxels"] = densify_voxels(
            batch["voxel_coords"],
            batch["voxel_feats"],
            batch["voxel_mask"],
            voxel_size,
            dtype,
        )
    for key in ("clip_embeddings_img", "clip_embeddings_text"):
        if key in batch:
            out[key] = batch[key]
    return out
