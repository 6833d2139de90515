"""Pallas TPU kernels."""

from .nt_xent_pallas import pallas_nt_xent_loss

__all__ = ["pallas_nt_xent_loss"]
