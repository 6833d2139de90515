"""Multi-view CNN image encoder with max view-pooling.

Capability parity with the reference MVCNN (tricolo/model/module/img_encoder/
mv_cnn.py:9-33): a shared single-view ResNet backbone runs over the
view-folded batch (B·V, H, W, 3); pooled per-view features are reshaped to
(B, V, C) and reduced by an element-wise max over views; the result passes
through the replaced classifier Linear(feature_dim→z_dim) and an MLP
(z_dim→out→out), then L2 normalization.

TPU design: views fold into the batch dimension so every conv sees a single
large NHWC batch (B·V = 768 at the reference recipe) — exactly the shape the
MXU wants; the view max is a cheap VPU reduce that XLA fuses with the
surrounding reshapes.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import MLPHead, TorchLinear, fold_views, l2_normalize
from .efficientnet import EfficientNet
from .resnet import ResNet


class MVCNNEncoder(nn.Module):
    """Image encoder: (B, V, H, W, 3) → L2-normalized (B, out_dim)."""

    num_views: int = 6
    z_dim: int = 512
    out_dim: int = 512
    cnn_name: str = "resnet18"
    dtype: Any = None
    param_dtype: Any = jnp.float32
    # ResNet stem bn1→relu→maxpool via the hybrid hand-derived backward
    # (ops/fused_bn_pool.hybrid_bn_relu_pool2d); ignored for EfficientNet.
    # Off by default — measured slower end-to-end (PERF.md round 3).
    hybrid_stem: bool = False
    # ResNet stem conv as a space-to-depth 4×4/1 conv (resnet.S2DStemConv);
    # exactly equivalent, same parameter tree. Ignored for EfficientNet.
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, images: jax.Array, *, train: bool = False, deterministic: bool = True) -> jax.Array:
        batch, views = images.shape[:2]
        x = fold_views(images)  # (B·V, H, W, 3)
        # Backbone dispatch mirrors the reference's SVCNN cnn_name switch
        # (mv_cnn.py:44-60: resnet18/34/50 or efficientnet_b0/b3).
        if self.cnn_name.startswith("efficientnet"):
            backbone = EfficientNet(
                cnn_name=self.cnn_name, dtype=self.dtype,
                param_dtype=self.param_dtype, name="backbone",
            )
        else:
            backbone = ResNet(
                cnn_name=self.cnn_name, dtype=self.dtype,
                param_dtype=self.param_dtype, hybrid_stem=self.hybrid_stem,
                s2d_stem=self.s2d_stem,
                name="backbone",
            )
        features = backbone(x, train=train)
        features = features.reshape(batch, views, -1)
        pooled = jnp.max(features, axis=1)  # element-wise max over views
        z = TorchLinear(self.z_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc")(pooled)
        out = MLPHead(self.out_dim, self.out_dim, dtype=self.dtype, param_dtype=self.param_dtype)(
            z, deterministic=deterministic
        )
        return l2_normalize(out.astype(jnp.float32))
