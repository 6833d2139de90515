"""Shared model building blocks and torch-compatible initializers.

The reference's encoders inherit PyTorch's default layer initializations
(uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) for Linear/GRU, N(0,1) for
Embedding, Kaiming for convs). Matching these distributions matters for
metric parity on the small-model recipes, so we provide them explicitly
instead of relying on flax defaults.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear weight default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    ``shape`` is flax layout (fan_in, fan_out).
    """
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.ConvNd weight default: Kaiming-uniform(a=sqrt(5)).

    Equivalent to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with
    fan_in = in_channels * prod(kernel_size). ``shape`` is flax layout
    (*kernel_spatial, in_ch, out_ch).
    """
    receptive = 1
    for dim in shape[:-2]:
        receptive *= dim
    fan_in = shape[-2] * receptive
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchLinear(nn.Module):
    """nn.Linear with torch default init."""

    features: int
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        layer = nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        return layer(x)


class MLPHead(nn.Module):
    """Linear → ReLU → [Dropout] → Linear projection head.

    Used by every encoder: MVCNN/VoxelCNN use dropout=0 (reference
    mv_cnn.py:22-26, sparse_cnn.py:40-44); the CLIP heads use dropout=0.1
    (clip_text.py:9-14, clip_img.py:11-16).
    """

    hidden_dim: int
    out_dim: int
    dropout: float = 0.0
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = TorchLinear(self.hidden_dim, dtype=self.dtype, param_dtype=self.param_dtype)(x)
        x = nn.relu(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = TorchLinear(self.out_dim, dtype=self.dtype, param_dtype=self.param_dtype)(x)
        return x


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2 normalization matching torch.nn.functional.normalize (eps=1e-12)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def fold_views(x: jax.Array) -> jax.Array:
    """(B, V, ...) → (B·V, ...) view folding for shared per-view backbones."""
    return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])
