"""Fused BatchNorm(train) → ReLU → MaxPool(2³) with a custom-VJP Pallas TPU kernel.

Why this exists: the voxel encoder's five [Conv3D → BN → ReLU → MaxPool(2)]
blocks (reference tricolo/model/module/voxel_encoder/sparse_cnn.py:11-44,
rebuilt densely in models/voxel_cnn.py) dominate the train-step backward.
XLA lowers the composed backward as select_and_scatter (maxpool) + separate
BN backward, costing ~6 full passes over the (B, 64³, C) activation for
block 1 alone (~24 ms of a 104 ms step on v5e, PERF.md). The information
actually needed is small: per-channel sums for the BN parameter grads and a
per-window argmax route for the pooled gradient — both recomputable from the
conv output `y` on the fly.

Dataflow (all bandwidth-optimal, nothing of activation size is ever saved
besides `y`, which the conv produced anyway):

  forward:   stats  = XLA reduce over y                       (1 read)
             pooled = Pallas: normalize→relu→window-max        (1 read, ⅛ write)
  backward:  K1 = Pallas: recompute a, route g, per-channel
                  Σdz (=dβ) and Σdz·ẑ (=dγ)                    (1 read + ⅛ read)
             K2 = Pallas: recompute route again, emit
                  dy = A·dz + B + C·ẑ                          (1 read + ⅛ read, 1 write)

The 2³ window never needs strided sublane access (which Mosaic lowers to
unsupported gathers — PERF.md "Mosaic probes"): the W-axis pair lives in the
*lane* dimension via the free XLA reshape (…, W, C) → (…, W/2, 2C) (row-major
identity), so pairing is a static lane slice [:, :C] / [:, C:]; the D/H pairs
live on untiled outer block dims. Gradient routing matches XLA's
select_and_scatter / torch's MaxPool exactly: the *first* maximum in window
scan order (dd, hh, ww) receives the gradient.

Numerics: statistics in f32; normalization as a = relu(y·mul + add) with
per-channel mul = γ·rsqrt(var+ε), add = β − mean·mul folded on host (same
within rounding as flax BatchNorm's (x−μ)·γ/σ+β). The plain-path twin in
`reference_bn_relu_pool` uses the identical formula so fused vs plain is a
pure compute-path toggle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _check_shapes(y, scale, bias):
    if y.ndim != 5:
        raise ValueError(f"expected (B, D, H, W, C) voxel activations, got {y.shape}")
    B, D, H, W, C = y.shape
    if D % 2 or H % 2 or W % 2:
        raise ValueError(f"spatial dims must be even for 2^3 pooling, got {y.shape}")
    if scale.shape != (C,) or bias.shape != (C,):
        raise ValueError(
            f"scale/bias must be ({C},), got {scale.shape}/{bias.shape}"
        )
    return B, D, H, W, C


def _block_d_pairs(D: int, requested: int) -> int:
    bd = min(requested, D // 2)
    while (D // 2) % bd:
        bd -= 1
    return bd


def _tile2(v):
    """Per-channel (C,) vector → (1, 2C) lane-tiled row matching the
    (…, W/2, 2C) view, whose lanes are [even-w channels | odd-w channels]."""
    return jnp.concatenate([v, v])[None, :]


# ---------------------------------------------------------------------------
# Kernels. Grid (B, D/2/bd); y viewed (B, D, H, W/2, 2C); g/out pooled
# (B, D/2, H/2, W/2, C). Each grid step loops over the bd·H/2 window cells of
# its block; the 8 window members of a cell are the lane halves of 4 rows.
# ---------------------------------------------------------------------------


def _fwd_kernel(y_ref, params_ref, out_ref, *, bd: int, C: int):
    H2 = out_ref.shape[2]
    mul2 = params_ref[0:1, :]
    add2 = params_ref[1:2, :]

    def cell(idx, _):
        dp, h2 = idx // H2, idx % H2
        m = None
        for dd in range(2):
            for hh in range(2):
                row = y_ref[0, 2 * dp + dd, 2 * h2 + hh]  # (W2, 2C)
                a = jnp.maximum(row * mul2 + add2, 0.0)
                m = a if m is None else jnp.maximum(m, a)
        out_ref[0, dp, h2] = jnp.maximum(m[:, :C], m[:, C:])
        return 0

    jax.lax.fori_loop(0, bd * H2, cell, 0, unroll=False)


def _window(y_ref, params_ref, g_ref, dp, h2, C):
    """Recompute the 8 window activations and the routed gradient.

    Returns (dz, zhat): two length-8 lists of (W2, C) arrays in window scan
    order r = dd·4 + hh·2 + ww; dz_r is g routed to the first max.
    """
    mul2 = params_ref[0:1, :]
    add2 = params_ref[1:2, :]
    inv = params_ref[2:3, :C]
    sub = params_ref[3:4, :C]

    halves = []  # (a_r, zhat_r) in scan order; a in f32 for the compares
    for dd in range(2):
        for hh in range(2):
            row = y_ref[0, 2 * dp + dd, 2 * h2 + hh]  # (W2, 2C)
            # Activation recomputed in the forward's dtype (identical
            # rounding → identical max selection), then widened: Mosaic has
            # no bf16 vector compare on v5e, and bf16→f32 is exact.
            a = jnp.maximum(row * mul2 + add2, 0.0).astype(jnp.float32)
            for sl in (slice(0, C), slice(C, 2 * C)):
                halves.append((a[:, sl], row[:, sl] * inv - sub))

    m = functools.reduce(jnp.maximum, [a for a, _ in halves])
    g_cell = g_ref[0, dp, h2]  # (W2, C)

    dz, zhat, taken = [], [], None
    for a, z in halves:
        hit = a == m if taken is None else jnp.logical_and(a == m, ~taken)
        taken = hit if taken is None else jnp.logical_or(taken, hit)
        # Pool routes to the first max of a = relu(a_pre); relu' then kills
        # the gradient when that max is the clamped zero (a_pre <= 0).
        live = jnp.logical_and(hit, a > 0)
        dz.append(jnp.where(live, g_cell, jnp.zeros_like(g_cell)))
        zhat.append(z)
    return dz, zhat


def _partials_kernel(y_ref, g_ref, params_ref, sums_ref, *, bd: int, C: int):
    H2 = g_ref.shape[2]

    def cell(idx, acc):
        dp, h2 = idx // H2, idx % H2
        dz, zhat = _window(y_ref, params_ref, g_ref, dp, h2, C)
        sdz = sum(jnp.sum(d.astype(jnp.float32), axis=0) for d in dz)
        sdzz = sum(
            jnp.sum(d.astype(jnp.float32) * z.astype(jnp.float32), axis=0)
            for d, z in zip(dz, zhat)
        )
        return acc + jnp.stack([sdz, sdzz])

    local = jax.lax.fori_loop(
        0, bd * H2, cell, jnp.zeros((2, C), jnp.float32), unroll=False
    )

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    sums_ref[...] += local


def _dy_kernel(y_ref, g_ref, params_ref, dy_ref, *, bd: int, C: int):
    H2 = g_ref.shape[2]
    A = params_ref[4:5, :C]
    Bc = params_ref[5:6, :C]
    Cc = params_ref[6:7, :C]

    def cell(idx, _):
        dp, h2 = idx // H2, idx % H2
        dz, zhat = _window(y_ref, params_ref, g_ref, dp, h2, C)
        for dd in range(2):
            for hh in range(2):
                r = dd * 4 + hh * 2
                even = A * dz[r] + Bc + Cc * zhat[r]
                odd = A * dz[r + 1] + Bc + Cc * zhat[r + 1]
                dy_ref[0, 2 * dp + dd, 2 * h2 + hh] = jnp.concatenate(
                    [even, odd], axis=-1
                ).astype(dy_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bd * H2, cell, 0, unroll=False)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _use_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _specs(B, D, H, W2, C2, C, bd):
    y_spec = pl.BlockSpec(
        (1, 2 * bd, H, W2, C2),
        lambda b, d: (b, d, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    pooled_spec = pl.BlockSpec(
        (1, bd, H // 2, W2, C), lambda b, d: (b, d, 0, 0, 0), memory_space=pltpu.VMEM
    )
    params_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid = (B, D // 2 // bd)
    return grid, y_spec, pooled_spec, params_spec


def _pallas_forward(y4, params, B, D, H, W2, C2, C, bd, interpret):
    grid, y_spec, pooled_spec, params_spec = _specs(B, D, H, W2, C2, C, bd)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, bd=bd, C=C),
        grid=grid,
        in_specs=[y_spec, params_spec],
        out_specs=pooled_spec,
        out_shape=jax.ShapeDtypeStruct((B, D // 2, H // 2, W2, C), y4.dtype),
        interpret=interpret,
    )(y4, params)


def _pallas_partials(y4, g, params, B, D, H, W2, C2, C, bd, interpret):
    grid, y_spec, pooled_spec, params_spec = _specs(B, D, H, W2, C2, C, bd)
    return pl.pallas_call(
        functools.partial(_partials_kernel, bd=bd, C=C),
        grid=grid,
        in_specs=[y_spec, pooled_spec, params_spec],
        out_specs=pl.BlockSpec((2, C), lambda b, d: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, C), jnp.float32),
        interpret=interpret,
    )(y4, g, params)


def _pallas_dy(y4, g, params, B, D, H, W2, C2, C, bd, interpret):
    grid, y_spec, pooled_spec, params_spec = _specs(B, D, H, W2, C2, C, bd)
    return pl.pallas_call(
        functools.partial(_dy_kernel, bd=bd, C=C),
        grid=grid,
        in_specs=[y_spec, pooled_spec, params_spec],
        out_specs=y_spec,
        out_shape=jax.ShapeDtypeStruct((B, D, H, W2, C2), y4.dtype),
        interpret=interpret,
    )(y4, g, params)


# ---------------------------------------------------------------------------
# Public op
# ---------------------------------------------------------------------------


def _stats(y, eps):
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=(0, 1, 2, 3))
    var = jnp.mean(jnp.square(yf), axis=(0, 1, 2, 3)) - jnp.square(mean)
    var = jnp.maximum(var, 0.0)
    invstd = jax.lax.rsqrt(var + eps)
    return mean, var, invstd


def _muladd(mean, invstd, scale, bias, dtype):
    mul = (scale.astype(jnp.float32) * invstd).astype(dtype)
    add = (bias.astype(jnp.float32) - mean * scale.astype(jnp.float32) * invstd).astype(
        dtype
    )
    return mul, add


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_bn_relu_pool(y, scale, bias, eps=1e-5, block_d_pairs=2, interpret=None):
    """BatchNorm(train stats) → ReLU → MaxPool(2,2,2) in one fused op.

    y: (B, D, H, W, C); scale/bias: (C,). Returns (pooled, mean, var) with
    pooled (B, D/2, H/2, W/2, C) in y.dtype and mean/var (C,) f32 batch
    statistics (for running-average updates). Differentiable in y, scale,
    bias — the VJP runs two bandwidth-optimal Pallas passes and matches the
    XLA composition's gradients (first-max pool routing) exactly.
    """
    out, _ = _fwd(y, scale, bias, eps, block_d_pairs, interpret)
    return out


def _fwd(y, scale, bias, eps, block_d_pairs, interpret):
    B, D, H, W, C = _check_shapes(y, scale, bias)
    bd = _block_d_pairs(D, block_d_pairs)
    interpret = _use_interpret(interpret)
    mean, var, invstd = _stats(y, eps)
    mul, add = _muladd(mean, invstd, scale, bias, y.dtype)
    params = jnp.concatenate([_tile2(mul), _tile2(add)], axis=0)
    y4 = y.reshape(B, D, H, W // 2, 2 * C)
    pooled = _pallas_forward(y4, params, B, D, H, W // 2, 2 * C, C, bd, interpret)
    residuals = (y, scale, bias, mean, invstd)
    return (pooled, mean, var), residuals


def _bwd(eps, block_d_pairs, interpret, residuals, cts):
    g_out, g_mean, g_var = cts
    y, scale, bias, mean, invstd = residuals
    B, D, H, W, C = y.shape
    bd = _block_d_pairs(D, block_d_pairs)
    interpret = _use_interpret(interpret)
    n = float(B * D * H * W)

    mul, add = _muladd(mean, invstd, scale, bias, y.dtype)
    inv = invstd.astype(y.dtype)
    sub = (mean * invstd).astype(y.dtype)
    y4 = y.reshape(B, D, H, W // 2, 2 * C)

    # Pass 1: per-channel Σdz and Σdz·ẑ (routed through relu+pool).
    k1_params = jnp.concatenate(
        [_tile2(mul), _tile2(add), _tile2(inv), _tile2(sub)], axis=0
    )
    sums = _pallas_partials(
        y4, g_out, k1_params, B, D, H, W // 2, 2 * C, C, bd, interpret
    )
    dbeta, dgamma = sums[0], sums[1]  # f32 (C,)

    # Pass 2: dy = A·dz + B + C·ẑ. A/B/C fold the BN backward through the
    # batch statistics plus any cotangents on the mean/var outputs (zero in
    # training use — running-stat updates aren't differentiated — but kept
    # exact for generality).
    scale32 = scale.astype(jnp.float32)
    A32 = scale32 * invstd
    B32 = -A32 * dbeta / n + g_mean / n
    C32 = -A32 * dgamma / n + 2.0 * g_var / (n * invstd)
    k2_params = jnp.concatenate(
        [
            _tile2(mul),
            _tile2(add),
            _tile2(inv),
            _tile2(sub),
            _tile2(A32.astype(y.dtype)),
            _tile2(B32.astype(y.dtype)),
            _tile2(C32.astype(y.dtype)),
        ],
        axis=0,
    )
    dy4 = _pallas_dy(y4, g_out, k2_params, B, D, H, W // 2, 2 * C, C, bd, interpret)
    dy = dy4.reshape(B, D, H, W, C)
    return dy, dgamma.astype(scale.dtype), dbeta.astype(bias.dtype)


fused_bn_relu_pool.defvjp(_fwd, _bwd)


def _relu_pool(y, mul, add):
    a = jnp.maximum(y * mul + add, 0.0)
    return jax.lax.reduce_window(
        a,
        -jnp.inf,
        jax.lax.max,
        (1, 2, 2, 2, 1),
        (1, 2, 2, 2, 1),
        "VALID",
    )


def reference_bn_relu_pool(y, scale, bias, eps=1e-5):
    """Plain-XLA twin of the fused op (identical formula, composed ops)."""
    mean, var, invstd = _stats(y, eps)
    mul, add = _muladd(mean, invstd, scale, bias, y.dtype)
    return _relu_pool(y, mul, add), mean, var


def inference_bn_relu_pool(y, scale, bias, mean, var, eps=1e-5):
    """Eval-mode path: normalize with running statistics, relu, pool."""
    invstd = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    mul, add = _muladd(mean.astype(jnp.float32), invstd, scale, bias, y.dtype)
    return _relu_pool(y, mul, add)
