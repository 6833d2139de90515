"""Semi-hard triplet loss — vectorized TPU rewrite of the reference's loop.

Behavioral parity with tricolo/loss/triplet.py:103-125: positives are the
diagonal cross-modal pairs (i, i); a negative (i, j), j≠i is *semi-hard* when
d_ii < d_ij < d_ii + margin, contributing d_ii − d_ij + margin. If no
semi-hard pair exists in the batch, *hard* negatives (d_ij < d_ii) are used
instead. The loss is the mean over selected pairs.

The reference computes this with an O(B²) Python double loop on device
tensors; here it is a fully vectorized masked reduction (two (B, B) masks, a
`jnp.where` select) that XLA fuses into a couple of VPU passes — no
data-dependent shapes, so it jits cleanly.

The pairwise-distance formula replicates the reference's quirk
(triplet.py:20-45): the row/column squared-norm terms are transposed relative
to the textbook formula. Since inputs are L2-normalized by the encoders the
two coincide (all norms are 1), and we keep the reference's exact expression
including the zero-clamp and the masked-sqrt epsilon.

Divergence (documented): an all-pairs-empty batch (every d_ij ≥ d_ii,
none strictly smaller) crashes the reference with a division by zero; here it
yields 0.0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_distances(zis: jax.Array, zls: jax.Array, squared: bool = False) -> jax.Array:
    """Reference `_pairwise_distances` (triplet.py:11-45), exact numerics."""
    dot = zls @ zis.T
    a_sq = jnp.sum(zls * zls, axis=1)  # diag(zls zlsᵀ)
    b_sq = jnp.sum(zis * zis, axis=1)  # diag(zis zisᵀ)
    # Reference quirk: a_sq broadcasts over rows (unsqueeze(0)), b_sq over
    # columns (unsqueeze(1)).
    distances = a_sq[None, :] - 2.0 * dot + b_sq[:, None]
    distances = jnp.maximum(distances, 0.0)
    if not squared:
        zero_mask = (distances == 0.0).astype(distances.dtype)
        distances = distances + zero_mask * 1e-16
        distances = (1.0 - zero_mask) * jnp.sqrt(distances)
    return distances


def triplet_loss(zis: jax.Array, zls: jax.Array, margin: float = 0.025) -> jax.Array:
    zis = zis.astype(jnp.float32)
    zls = zls.astype(jnp.float32)
    distances = pairwise_distances(zis, zls)
    batch = distances.shape[0]

    d_pos = jnp.diag(distances)[:, None]  # d_ii per anchor row
    off_diag = ~jnp.eye(batch, dtype=bool)

    semi_hard = off_diag & (d_pos < distances) & (distances < d_pos + margin)
    hard = off_diag & (distances < d_pos)

    terms = d_pos - distances + margin

    semi_count = jnp.sum(semi_hard)
    hard_count = jnp.sum(hard)
    semi_sum = jnp.sum(jnp.where(semi_hard, terms, 0.0))
    hard_sum = jnp.sum(jnp.where(hard, terms, 0.0))

    use_semi = semi_count > 0
    total = jnp.where(use_semi, semi_sum, hard_sum)
    count = jnp.where(use_semi, semi_count, hard_count)
    return total / jnp.maximum(count, 1)
