"""Trainable MLP heads over frozen, precached CLIP features.

The reference's CLIP encoders only ever exercise the precached path: the
frozen ViT-L/14 features are extracted offline (extract_clip_feats.py:13-45)
and the "encoders" reduce to MLP(Linear(768→512) → ReLU → Dropout(0.1) →
Linear(512→512)) over the cached batch features (clip_text.py:16-22,
clip_img.py:18-25 — the live encode paths are commented out upstream and
crash without the cache). Note the heads do *not* L2-normalize their output,
unlike the other encoders — replicated here.

The image cache holds the mean over views of per-view CLIP image embeddings;
the text cache is keyed by model_id, so all captions of a shape share the
embedding of the *last* caption seen (extract_clip_feats.py:39-40) — that
quirk lives in the extraction tool, not here.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import MLPHead


class CLIPTextEncoder(nn.Module):
    """tokens are unused; consumes precached text features (B, feature_dim)."""

    out_dim: int = 512
    feature_dim: int = 768
    dropout: float = 0.1
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, clip_text_features: jax.Array, *, deterministic: bool = True) -> jax.Array:
        out = MLPHead(
            self.out_dim, self.out_dim, dropout=self.dropout,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(clip_text_features, deterministic=deterministic)
        return out.astype(jnp.float32)


class CLIPImageEncoder(nn.Module):
    """Consumes precached mean-view image features (B, feature_dim)."""

    out_dim: int = 512
    num_views: int = 6
    feature_dim: int = 768
    dropout: float = 0.1
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, clip_image_features: jax.Array, *, deterministic: bool = True) -> jax.Array:
        out = MLPHead(
            self.out_dim, self.out_dim, dropout=self.dropout,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(clip_image_features, deterministic=deterministic)
        return out.astype(jnp.float32)
