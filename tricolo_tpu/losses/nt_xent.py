"""Bidirectional NT-Xent (InfoNCE) contrastive loss.

Numerics match the reference exactly (tricolo/loss/nt_xent.py:15-74):
both sides are L2-normalized (redundantly — the encoders already normalize;
replicated because the CLIP heads do *not* normalize), logits are z_i z_jᵀ/τ
in both directions, targets are the identity, the soft cross-entropy reduces
as sum(-target·logprob)/B, and the two directions combine as
α·loss_ab + (1−α)·loss_ba with τ=0.1, α=0.25 at the shipped defaults.

TPU scaling — global negatives
------------------------------
The reference's negatives are in-batch only on a single device
(nt_xent.py:59-69; the repo has no all_gather anywhere). Under pjit-style
data parallelism this loss is written over the *global* batch: the caller
passes batch-sharded embeddings and XLA inserts the ICI all-gathers needed by
the (B_global × B_global) logits contraction automatically. At global batch
== reference batch (128) this is numerically the reference loss; with more
chips it is a strict upgrade (more negatives per step).

An explicit `shard_map` formulation (ring all-gather on the data axis, each
chip computing its logit rows) lives in tricolo_tpu.parallel.collectives and
is tested for equivalence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.common import l2_normalize


def soft_xent(targets: jax.Array, logits: jax.Array) -> jax.Array:
    """sum(-targets * log_softmax(logits)) / batch (reference nt_xent.py:15-22)."""
    logprobs = jax.nn.log_softmax(logits, axis=1)
    return -(targets * logprobs).sum() / logits.shape[0]


def nt_xent_loss(
    zis: jax.Array,
    zjs: jax.Array,
    temperature: float = 0.1,
    alpha_weight: float = 0.25,
    norm: bool = True,
) -> jax.Array:
    """NT-Xent between two modality embedding batches of shape (B, D)."""
    zis = zis.astype(jnp.float32)
    zjs = zjs.astype(jnp.float32)
    if norm:
        zis = l2_normalize(zis)
        zjs = l2_normalize(zjs)

    batch = zis.shape[0]
    labels = jnp.eye(batch, dtype=jnp.float32)

    logits_ab = (zis @ zjs.T) / temperature
    logits_ba = (zjs @ zis.T) / temperature

    loss_a = soft_xent(labels, logits_ab)
    loss_b = soft_xent(labels, logits_ba)
    return alpha_weight * loss_a + (1.0 - alpha_weight) * loss_b
