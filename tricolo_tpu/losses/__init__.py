"""Contrastive losses and the pairwise combination rule.

`pairwise_losses` reproduces the reference's multi-modal loss assembly
(tricolo/model/tricolo_net.py:56-65): the configured loss is applied to every
pair of present modality features in insertion order (text→image→voxel) and
per-pair values are logged under `{a}_{b}_loss` with `total_loss` the sum.
"""

from __future__ import annotations

from itertools import combinations
from typing import Callable

import jax

from .nt_xent import nt_xent_loss, soft_xent
from .triplet import pairwise_distances, triplet_loss

__all__ = [
    "nt_xent_loss",
    "soft_xent",
    "triplet_loss",
    "pairwise_distances",
    "pairwise_losses",
    "make_loss_fn",
]


def make_loss_fn(cfg) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Build the configured pairwise loss (reference config.yaml:96-104)."""
    name = cfg.loss.name
    if name == "NTXentLoss":
        params = cfg.loss.NTXentLoss
        temperature, alpha = params.temperature, params.alpha_weight
        if params.get("use_pallas", False):
            # Blocked online-softmax kernel: O(B²) logits never reach HBM —
            # for very large global batches (ops/nt_xent_pallas.py); exact
            # value/grad parity with the plain loss is tested.
            from ..ops import pallas_nt_xent_loss

            return lambda a, b: pallas_nt_xent_loss(a, b, temperature, alpha)
        return lambda a, b: nt_xent_loss(a, b, temperature, alpha)
    if name == "TripletLoss":
        margin = cfg.loss.TripletLoss.margin
        return lambda a, b: triplet_loss(a, b, margin)
    raise ValueError(f"unknown loss: {name}")


def pairwise_losses(loss_fn, output: dict, prefix: str) -> dict:
    """Sum the loss over all pairs of present modality features."""
    if len(output) < 2:
        raise ValueError(
            "contrastive training needs at least two modalities; configure an "
            "image and/or voxel encoder alongside the text encoder"
        )
    loss_dict = {}
    for key_a, key_b in combinations(output.keys(), 2):
        # "text_features" → "text" (reference strips the 9-char suffix).
        loss_name = f"{prefix}/{key_a[:-9]}_{key_b[:-9]}_loss"
        loss_dict[loss_name] = loss_fn(output[key_a], output[key_b])
    loss_dict[f"{prefix}/total_loss"] = sum(loss_dict.values())
    return loss_dict
