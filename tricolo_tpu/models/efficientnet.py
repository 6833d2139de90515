"""EfficientNet-B0/B3 backbone (NHWC, bfloat16-friendly).

The reference's MVCNN optionally uses efficientnet_pytorch B0/B3 as the
shared single-view CNN (reference mv_cnn.py:53-60: features via
``extract_features`` + global average pooling, feature dims 1280/1536).
This is the standard compound-scaled architecture: conv stem → 7 stages of
MBConv blocks (expansion, depthwise k×k, squeeze-excitation 0.25, linear
projection, stochastic-depth residuals) → 1×1 head conv → global pool.
B3 applies width 1.2 / depth 1.4 with the usual filter rounding.

BN uses efficientnet_pytorch's settings (momentum 0.99 in flax terms,
eps 1e-3); activations are SiLU; stochastic depth ramps to
``drop_connect_rate`` across block depth and is disabled in eval.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import torch_conv_kernel_init

# (expand_ratio, kernel, stride, in_channels, out_channels, repeats) — base B0.
_BASE_BLOCKS = (
    (1, 3, 1, 32, 16, 1),
    (6, 3, 2, 16, 24, 2),
    (6, 5, 2, 24, 40, 2),
    (6, 3, 2, 40, 80, 3),
    (6, 5, 1, 80, 112, 3),
    (6, 5, 2, 112, 192, 4),
    (6, 3, 1, 192, 320, 1),
)

_SCALING = {
    # name: (width_mult, depth_mult)
    "efficientnet_b0": (1.0, 1.0),
    "efficientnet_b3": (1.2, 1.4),
}


def _round_filters(filters: int, width_mult: float, divisor: int = 8) -> int:
    filters *= width_mult
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:  # never round down by more than 10%
        new += divisor
    return int(new)


def _round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


def efficientnet_feature_dim(name: str) -> int:
    width, _ = _SCALING[name]
    return _round_filters(1280, width)


class MBConv(nn.Module):
    in_channels: int
    out_channels: int
    expand_ratio: int
    kernel: int
    strides: int
    drop_rate: float = 0.0
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        conv = lambda f, k, s, groups, name: nn.Conv(
            f, (k, k), strides=(s, s), padding="SAME", use_bias=False,
            feature_group_count=groups, kernel_init=torch_conv_kernel_init,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        residual = x
        mid = self.in_channels * self.expand_ratio
        if self.expand_ratio != 1:
            x = nn.silu(norm("bn_expand")(conv(mid, 1, 1, 1, "expand")(x)))
        x = nn.silu(
            norm("bn_depthwise")(
                conv(mid, self.kernel, self.strides, mid, "depthwise")(x)
            )
        )

        # Squeeze-excitation over the block's *input* channel budget.
        se_dim = max(1, int(self.in_channels * 0.25))
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = nn.Conv(
            se_dim, (1, 1), kernel_init=torch_conv_kernel_init,
            dtype=self.dtype, param_dtype=self.param_dtype, name="se_reduce",
        )(pooled)
        se = nn.Conv(
            mid, (1, 1), kernel_init=torch_conv_kernel_init,
            dtype=self.dtype, param_dtype=self.param_dtype, name="se_expand",
        )(nn.silu(se))
        x = x * jax.nn.sigmoid(se)

        x = norm("bn_project")(conv(self.out_channels, 1, 1, 1, "project")(x))

        if self.strides == 1 and self.in_channels == self.out_channels:
            if train and self.drop_rate > 0.0:
                # Stochastic depth (drop-connect): per-sample Bernoulli on
                # the residual branch, rescaled to keep expectations.
                keep = 1.0 - self.drop_rate
                rng = self.make_rng("dropout")
                mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
                x = x * mask.astype(x.dtype) / keep
            x = x + residual.astype(x.dtype)
        return x


class EfficientNet(nn.Module):
    """Backbone: (N, H, W, 3) NHWC → pooled features (N, feature_dim)."""

    cnn_name: str = "efficientnet_b0"
    drop_connect_rate: float = 0.2
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        width, depth = _SCALING[self.cnn_name]
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        x = x.astype(self.dtype or jnp.float32)
        stem = _round_filters(32, width)
        x = nn.Conv(
            stem, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
            kernel_init=torch_conv_kernel_init, dtype=self.dtype,
            param_dtype=self.param_dtype, name="stem_conv",
        )(x)
        x = nn.silu(norm("stem_bn")(x))

        total_blocks = sum(_round_repeats(r, depth) for *_, r in _BASE_BLOCKS)
        block_idx = 0
        for stage, (expand, kernel, stride, c_in, c_out, repeats) in enumerate(
            _BASE_BLOCKS
        ):
            c_in = _round_filters(c_in, width)
            c_out = _round_filters(c_out, width)
            for rep in range(_round_repeats(repeats, depth)):
                x = MBConv(
                    in_channels=c_in if rep == 0 else c_out,
                    out_channels=c_out,
                    expand_ratio=expand,
                    kernel=kernel,
                    strides=stride if rep == 0 else 1,
                    drop_rate=self.drop_connect_rate * block_idx / total_blocks,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"block{stage + 1}_{rep}",
                )(x, train=train)
                block_idx += 1

        head = _round_filters(1280, width)
        x = nn.Conv(
            head, (1, 1), use_bias=False, kernel_init=torch_conv_kernel_init,
            dtype=self.dtype, param_dtype=self.param_dtype, name="head_conv",
        )(x)
        x = nn.silu(norm("head_bn")(x))
        return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# Pretrained-weight conversion (efficientnet_pytorch state_dict naming).
#
# The reference loads `EfficientNet.from_pretrained('efficientnet-b0'/'b3')`
# (reference mv_cnn.py:53-58). Offline conversion mirrors the torchvision
# ResNet path (models/resnet.py): map the state_dict into this module's
# variable tree, save with resnet.save_pretrained, and point
# ``model.modules.MVCNNEncoder.pretrained_path`` at the npz — the Trainer
# graft (training/trainer.py) is format-generic and needs no dispatch.
# ---------------------------------------------------------------------------


def _assign(tree: dict, path, value):
    import numpy as np

    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = np.asarray(value)


def convert_efficientnet_state_dict(state_dict: dict, cnn_name: str = "efficientnet_b0"):
    """efficientnet_pytorch state_dict (numpy values) → (params, batch_stats).

    Key naming follows the lukemelas/EfficientNet-PyTorch layout: stem
    ``_conv_stem``/``_bn0``, flattened ``_blocks.{i}`` with
    ``_expand_conv/_bn0, _depthwise_conv/_bn1, _se_reduce, _se_expand,
    _project_conv/_bn2``, head ``_conv_head``/``_bn1``; the classifier
    ``_fc`` is dropped (the reference uses extract_features only).
    """
    width, depth = _SCALING[cnn_name]
    params: dict = {}
    stats: dict = {}

    def put_conv(torch_key: str, path, bias_key: str | None = None):
        _assign(params, path + ("kernel",), state_dict[torch_key].transpose(2, 3, 1, 0))
        if bias_key is not None:
            _assign(params, path + ("bias",), state_dict[bias_key])

    def put_bn(torch_prefix: str, path):
        _assign(params, path + ("scale",), state_dict[f"{torch_prefix}.weight"])
        _assign(params, path + ("bias",), state_dict[f"{torch_prefix}.bias"])
        _assign(stats, path + ("mean",), state_dict[f"{torch_prefix}.running_mean"])
        _assign(stats, path + ("var",), state_dict[f"{torch_prefix}.running_var"])

    put_conv("_conv_stem.weight", ("stem_conv",))
    put_bn("_bn0", ("stem_bn",))

    i = 0
    for stage, (expand, _k, _s, _cin, _cout, repeats) in enumerate(_BASE_BLOCKS):
        for rep in range(_round_repeats(repeats, depth)):
            src = f"_blocks.{i}."
            dst = f"block{stage + 1}_{rep}"
            if expand != 1:
                put_conv(src + "_expand_conv.weight", (dst, "expand"))
                put_bn(src + "_bn0", (dst, "bn_expand"))
            put_conv(src + "_depthwise_conv.weight", (dst, "depthwise"))
            put_bn(src + "_bn1", (dst, "bn_depthwise"))
            put_conv(src + "_se_reduce.weight", (dst, "se_reduce"), src + "_se_reduce.bias")
            put_conv(src + "_se_expand.weight", (dst, "se_expand"), src + "_se_expand.bias")
            put_conv(src + "_project_conv.weight", (dst, "project"))
            put_bn(src + "_bn2", (dst, "bn_project"))
            i += 1

    put_conv("_conv_head.weight", ("head_conv",))
    put_bn("_bn1", ("head_bn",))
    return params, stats
