"""Explicit-collective contrastive loss over the data-parallel mesh.

The primary training path relies on pjit: embeddings are batch-sharded, the
NT-Xent logits contraction is over the global batch, and XLA inserts the ICI
all-gathers itself. This module provides the *explicit* `shard_map`
formulation of the same computation — useful both as a scalability tool
(each chip holds only its logit rows, avoiding a replicated (B,B) matrix at
very large global batches) and as an executable specification that the
automatic path is tested against.

Per-chip computation (mathematically identical to the reference loss at
global batch == reference batch; reference nt_xent.py:54-74):

    gather zjs over the mesh → zjs_global (B_global, D)
    logits_local = zis_local @ zjs_globalᵀ / τ           (B_local, B_global)
    per-row soft-xent vs one-hot(global row index), summed locally
    psum over chips, ÷ B_global

and symmetrically for the ba direction; combined α·ab + (1−α)·ba.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 top-level API; the experimental alias warns and will go away
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..models.common import l2_normalize
from .mesh import DATA_AXIS


def _local_direction_loss(z_local, z_other_global, temperature, axis_name):
    """Local rows' summed -log p(correct) for one direction; psum outside."""
    n_local = z_local.shape[0]
    my_index = jax.lax.axis_index(axis_name)
    row_offset = my_index * n_local

    logits = (z_local @ z_other_global.T) / temperature  # (B_local, B_global)
    logprobs = jax.nn.log_softmax(logits, axis=1)
    # Correct column for local row i is row_offset + i.
    cols = row_offset + jnp.arange(n_local)
    return -jnp.sum(jnp.take_along_axis(logprobs, cols[:, None], axis=1))


def make_local_nt_xent(
    mesh: Mesh,
    temperature: float = 0.1,
    alpha_weight: float = 0.25,
    norm: bool = True,
):
    """Per-device in-batch negatives (``parallel.global_negatives=false``).

    Each chip computes the reference NT-Xent over only its local batch
    shard and losses average across the mesh — the behavior a DDP port of
    the reference would exhibit (negatives never cross devices,
    nt_xent.py:59-69). Provided for ablations; the global-negative loss is
    the default and the strict upgrade.
    """
    from ..losses.nt_xent import nt_xent_loss

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        out_specs=P(),
    )
    def loss_fn(zis_local, zjs_local):
        local = nt_xent_loss(zis_local, zjs_local, temperature, alpha_weight, norm)
        return jax.lax.pmean(local, DATA_AXIS)

    return loss_fn


def make_global_nt_xent(
    mesh: Mesh,
    temperature: float = 0.1,
    alpha_weight: float = 0.25,
    norm: bool = True,
):
    """Build the shard_map global-negative NT-Xent over ``mesh``.

    Returns a function (zis, zjs) → scalar, where both inputs are
    (B_global, D) arrays sharded along ``DATA_AXIS``. Differentiable —
    shard_map is transparent to autodiff, and the gradient collectives are
    the transposes of the gathers.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        out_specs=P(),
    )
    def loss_fn(zis_local, zjs_local):
        zis_local = zis_local.astype(jnp.float32)
        zjs_local = zjs_local.astype(jnp.float32)
        if norm:
            zis_local = l2_normalize(zis_local)
            zjs_local = l2_normalize(zjs_local)

        zis_global = jax.lax.all_gather(zis_local, DATA_AXIS, tiled=True)
        zjs_global = jax.lax.all_gather(zjs_local, DATA_AXIS, tiled=True)
        batch_global = zis_global.shape[0]

        local_a = _local_direction_loss(zis_local, zjs_global, temperature, DATA_AXIS)
        local_b = _local_direction_loss(zjs_local, zis_global, temperature, DATA_AXIS)

        loss_a = jax.lax.psum(local_a, DATA_AXIS) / batch_global
        loss_b = jax.lax.psum(local_b, DATA_AXIS) / batch_global
        return alpha_weight * loss_a + (1.0 - alpha_weight) * loss_b

    return loss_fn
