"""ResNet-18/34/50 image backbone (NHWC, bfloat16-friendly) + torch converter.

Architecture matches torchvision's ResNet family, which the reference uses as
the shared single-view CNN inside MVCNN (tricolo/model/module/img_encoder/
mv_cnn.py:44-52 loads ImageNet-pretrained resnet18/34/50 and replaces `fc`).
The stack: 7×7/2 stem conv → BN → ReLU → 3×3/2 maxpool → 4 stages of
basic/bottleneck blocks → global average pool. The classifier `fc` is *not*
part of this module — MVCNN owns the z_dim projection (mv_cnn.py:22).

Pretrained ImageNet weights matter for the reference's retrieval parity, so
`convert_torchvision_state_dict` maps a torchvision `state_dict()` (loaded
host-side with CPU torch) onto this module's {params, batch_stats} pytrees.
There is no network access in the training environment, so the conversion is
an offline tool: run it once where weights are available, save with
`save_pretrained`, point `model.modules.MVCNNEncoder.pretrained_path` at the
file.
"""

from __future__ import annotations

from typing import Any, Sequence


import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import torch_conv_kernel_init


class StemBNReLUPool(nn.Module):
    """bn1 → ReLU → 3×3/2 maxpool with a hand-derived hybrid backward.

    Drop-in for the stem's nn.BatchNorm("bn1") + relu + max_pool chain:
    owns the same variable tree (params scale/bias, batch_stats mean/var
    under this module's name), so checkpoints interchange with the
    composed path. Train mode uses ops.fused_bn_pool.hybrid_bn_relu_pool2d
    (BN parameter grads at pooled resolution — see that op's docstring);
    eval mode normalizes with the running statistics. Same math as flax
    BatchNorm within one rounding (f32 statistics, compute in the input
    dtype), same running-stat update convention.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        from ..ops.fused_bn_pool import (
            hybrid_bn_relu_pool2d,
            inference_bn_relu_pool2d,
        )

        features = x.shape[-1]
        scale = self.param(
            "scale", nn.initializers.ones_init(), (features,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (features,), self.param_dtype
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        if train:
            pooled, mean, var = hybrid_bn_relu_pool2d(x, scale, bias, self.epsilon)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1.0 - self.momentum) * var
                )
        else:
            pooled = inference_bn_relu_pool2d(
                x, scale, bias, ra_mean.value, ra_var.value, self.epsilon
            )
        return pooled


class S2DStemConv(nn.Module):
    """The 7×7/2 stem conv computed as a 4×4/1 conv over space-to-depth input.

    The MLPerf-style TPU stem transform: XLA lowers a stride-2 Cin=3 7×7
    conv poorly (tiny contraction dim, strided windows), so rewrite it as an
    exactly-equivalent stride-1 conv over the 2×2 space-to-depth rearranged
    image — contraction dim 4·4·12 = 192 instead of 7·7·3 taps at stride 2.

    Exact equivalence: pad the 7×7 kernel to 8×8 with a zero top-left
    row/col (k8[u,v] = k7[u-1,v-1]); with input padding (4,2) per spatial
    axis, output o of the stride-2 8×8 conv reads original rows
    2o-4..2o+3 where the 2o-4 tap has zero weight — identical to
    k7/s2/p3. Every read is then 2-aligned, so the conv factors through
    space-to-depth: x(N,H,W,3) → (N,(H+6)/2,(W+6)/2,12) and
    k8(8,8,3,F) → (4,4,12,F) with matching (phase-major) channel order.

    Owns the SAME parameter ("kernel", (7,7,3,F)) as the plain nn.Conv
    stem, so checkpoints and converted torchvision weights interchange;
    the 8×8 pad/reshape runs on the 9 KB kernel per step (noise).
    """

    features: int = 64
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import jax

        kernel = self.param(
            "kernel", torch_conv_kernel_init, (7, 7, 3, self.features),
            self.param_dtype,
        )
        N, H, W, C = x.shape
        dtype = self.dtype or x.dtype
        if H % 2 or W % 2:
            # The s2d factoring needs even spatial dims; odd inputs take
            # the plain 7×7/s2/p3 conv over the same kernel (exactly the
            # reference stem) — a static-shape decision, so each jitted
            # program contains only one branch.
            return jax.lax.conv_general_dilated(
                x.astype(dtype),
                kernel.astype(dtype),
                window_strides=(2, 2),
                padding=[(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        k = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8,8,3,F)
        k = (
            k.reshape(4, 2, 4, 2, C, self.features)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * C, self.features)
        )
        xp = jnp.pad(x, ((0, 0), (4, 2), (4, 2), (0, 0)))
        hp, wp = (H + 6) // 2, (W + 6) // 2
        xs = (
            xp.reshape(N, hp, 2, wp, 2, C)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(N, hp, wp, 4 * C)
        )
        return jax.lax.conv_general_dilated(
            xs.astype(dtype),
            k.astype(dtype),
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = None
    param_dtype: Any = jnp.float32

    expansion: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2, use_bias=False,
            kernel_init=torch_conv_kernel_init, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name,
        )
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        residual = x
        y = conv(self.features, 3, self.strides, "conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = conv(self.features, 3, 1, "conv2")(y)
        y = norm("bn2")(y)
        if residual.shape != y.shape:
            residual = conv(self.features, 1, self.strides, "downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = None
    param_dtype: Any = jnp.float32

    expansion: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2, use_bias=False,
            kernel_init=torch_conv_kernel_init, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name,
        )
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        residual = x
        y = nn.relu(norm("bn1")(conv(self.features, 1, 1, "conv1")(x)))
        y = nn.relu(norm("bn2")(conv(self.features, 3, self.strides, "conv2")(y)))
        y = norm("bn3")(conv(self.features * self.expansion, 1, 1, "conv3")(y))
        if residual.shape != y.shape:
            residual = conv(self.features * self.expansion, 1, self.strides, "downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


_ARCHS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2), 512),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 512),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 2048),
}


def feature_dim(cnn_name: str) -> int:
    return _ARCHS[cnn_name][2]


class ResNet(nn.Module):
    """Backbone: (N, H, W, 3) NHWC → pooled features (N, feature_dim)."""

    cnn_name: str = "resnet18"
    dtype: Any = None
    param_dtype: Any = jnp.float32
    # hybrid_stem=True runs bn1→relu→maxpool through the hand-derived
    # hybrid backward (StemBNReLUPool); the default keeps the composed
    # flax chain — the hybrid LOSES ~45 pairs/s end-to-end (2350 vs 2395,
    # PERF.md round 3): XLA fuses the composed stem backward with the
    # conv gradients better than the hand-derived routing pass. Identical
    # variable tree and math either way; ships opt-in for study.
    hybrid_stem: bool = False
    # s2d_stem=True computes the stem conv as a 4×4/1 conv over 2×2
    # space-to-depth input (S2DStemConv) — exactly equivalent, same
    # parameter tree. Measured a wash end-to-end (2389.7 vs 2394.3
    # pairs/s back-to-back on v5e, PERF.md round 3): XLA's own lowering
    # of the 7×7/s2 stem is not a bottleneck at 128². Stays opt-in.
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        block_cls, stage_sizes, _ = _ARCHS[self.cnn_name]
        x = x.astype(self.dtype or jnp.float32)
        if self.s2d_stem:
            x = S2DStemConv(
                features=64, dtype=self.dtype, param_dtype=self.param_dtype,
                name="conv1",
            )(x)
        else:
            x = nn.Conv(
                64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
                kernel_init=torch_conv_kernel_init, dtype=self.dtype,
                param_dtype=self.param_dtype, name="conv1",
            )(x)
        if self.hybrid_stem:
            x = StemBNReLUPool(
                momentum=0.9, epsilon=1e-5, param_dtype=self.param_dtype,
                name="bn1",
            )(x, train=train)
        else:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, param_dtype=self.param_dtype, name="bn1",
            )(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, num_blocks in enumerate(stage_sizes):
            for block in range(num_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = block_cls(
                    64 * (2**stage), strides=strides, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"layer{stage + 1}_{block}",
                )(x, train=train)
        return jnp.mean(x, axis=(1, 2))  # global average pool


# ---------------------------------------------------------------------------
# torchvision weight conversion (offline tool; torch is CPU-only here)
# ---------------------------------------------------------------------------

def _assign(tree: dict, path: Sequence[str], value: np.ndarray):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = jnp.asarray(value)


def convert_torchvision_state_dict(state_dict: dict, cnn_name: str = "resnet18"):
    """Map a torchvision ResNet ``state_dict`` → (params, batch_stats).

    Conversions: conv weights OIHW → HWIO; BN weight/bias → scale/bias and
    running stats → batch_stats. The torchvision ``fc`` entries are ignored
    (the reference replaces fc with its own projection, mv_cnn.py:45).
    """
    block_cls, stage_sizes, _ = _ARCHS[cnn_name]
    params: dict = {}
    stats: dict = {}

    def put_conv(torch_key: str, path: Sequence[str]):
        w = np.asarray(state_dict[torch_key])
        _assign(params, [*path, "kernel"], w.transpose(2, 3, 1, 0))

    def put_bn(torch_prefix: str, path: Sequence[str]):
        _assign(params, [*path, "scale"], np.asarray(state_dict[f"{torch_prefix}.weight"]))
        _assign(params, [*path, "bias"], np.asarray(state_dict[f"{torch_prefix}.bias"]))
        _assign(stats, [*path, "mean"], np.asarray(state_dict[f"{torch_prefix}.running_mean"]))
        _assign(stats, [*path, "var"], np.asarray(state_dict[f"{torch_prefix}.running_var"]))

    put_conv("conv1.weight", ["conv1"])
    put_bn("bn1", ["bn1"])

    n_convs = 2 if block_cls is BasicBlock else 3
    for stage, num_blocks in enumerate(stage_sizes):
        for block in range(num_blocks):
            tprefix = f"layer{stage + 1}.{block}"
            fprefix = f"layer{stage + 1}_{block}"
            for conv_idx in range(1, n_convs + 1):
                put_conv(f"{tprefix}.conv{conv_idx}.weight", [fprefix, f"conv{conv_idx}"])
                put_bn(f"{tprefix}.bn{conv_idx}", [fprefix, f"bn{conv_idx}"])
            if f"{tprefix}.downsample.0.weight" in state_dict:
                put_conv(f"{tprefix}.downsample.0.weight", [fprefix, "downsample_conv"])
                put_bn(f"{tprefix}.downsample.1", [fprefix, "downsample_bn"])

    return params, stats


def save_pretrained(path: str, params: dict, batch_stats: dict):
    """Serialize converted weights to an .npz usable without torch."""
    flat = {}

    def flatten(prefix: str, tree: dict, out: dict):
        for key, value in tree.items():
            full = f"{prefix}/{key}" if prefix else key
            if isinstance(value, dict):
                flatten(full, value, out)
            else:
                out[full] = np.asarray(value)

    flatten("params", params, flat)
    flatten("batch_stats", batch_stats, flat)
    np.savez(path, **flat)


def load_pretrained(path: str):
    """Load weights saved by `save_pretrained` → (params, batch_stats)."""
    data = np.load(path)
    params: dict = {}
    stats: dict = {}
    for flat_key in data.files:
        parts = flat_key.split("/")
        target = params if parts[0] == "params" else stats
        _assign(target, parts[1:], data[flat_key])
    return params, stats
