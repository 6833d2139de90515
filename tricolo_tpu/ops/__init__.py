"""Pallas TPU kernels."""

from .fused_bn_pool import (
    fused_bn_relu_pool,
    inference_bn_relu_pool,
    reference_bn_relu_pool,
)
from .nt_xent_pallas import pallas_nt_xent_loss

__all__ = [
    "fused_bn_relu_pool",
    "inference_bn_relu_pool",
    "pallas_nt_xent_loss",
    "reference_bn_relu_pool",
]
