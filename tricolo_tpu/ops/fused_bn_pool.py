"""Fused BatchNorm(train) → ReLU → MaxPool(2³) with a custom-VJP Pallas TPU kernel.

Why this exists: the voxel encoder's five [Conv3D → BN → ReLU → MaxPool(2)]
blocks (reference tricolo/model/module/voxel_encoder/sparse_cnn.py:11-44,
rebuilt densely in models/voxel_cnn.py) dominate the train-step backward.
XLA lowers the composed backward as select_and_scatter (maxpool) + separate
BN backward — ~6 full passes over the (B, 64³, C) activation for block 1
alone when measured standalone (~24 ms, PERF.md).

**Measured outcome (PERF.md "Fused BN-ReLU-pool Pallas kernels"): this op
beats the standalone XLA composition (≈22 vs ≈32 ms at block-1 scale) but
LOSES inside the full train program, where XLA fuses the BN backward into
the conv gradients and the normalize/relu into producers (1226 → ~1095
pairs/s end-to-end). It therefore ships opt-in
(model.modules.VoxelCNNEncoder.fused_bn_pool=true), value-and-grad exact,
as the starting point for a future conv-epilogue-level fusion.**

Key algorithmic choice: the forward saves the per-window **argmax** as a
bf16 scan-order index at pooled (⅛) resolution. The backward then needs NO activation recompute and
no compare cascade:

  dβ = Σ_{m>0} g               — pooled-resolution XLA reduction (~1 ms)
  dγ = Σ_{m>0} g·ẑ_argmax      — ditto
  dy = route(A·g·[m>0]) + B + C·ẑ   — ONE full-resolution Pallas pass:
       per window member r just (idx == r)·gA + B + C·(y·inv − sub),
       ≈6 bf16 ops/element, bandwidth-bound.

Layout: all 2³-window pairing happens in *free* XLA reshapes outside — y is
viewed as (B, D/2, 2, H/2, 2, W/2, 2C) (a row-major identity), so the kernel
only does static indexing on untiled outer dims (y[:, dd, :, hh]) and static
lane slices ([..., :C] / [..., C:]); no dynamic indexing, no strided sublane
access (which Mosaic lowers to unsupported gathers — PERF.md "Mosaic
probes"). Mosaic has no bf16 vector compare on v5e, so compares run on the
int16 bit patterns — exact for the non-negative relu outputs (IEEE ordering
of non-negatives == integer ordering of their bits).

Gradient routing matches XLA's select_and_scatter / torch's MaxPool exactly:
the *first* maximum in window scan order r = dd·4 + hh·2 + ww receives the
gradient (strictly-greater updates keep the earliest max), zeroed when the
max is the relu-clamped zero.

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
        raise ValueError(f"scale/bias must be ({C},), got {scale.shape}/{bias.shape}")
    return B, D, H, W, C


def _block_d_pairs(D: int, requested: int) -> int:
    bd = min(requested, D // 2)
    while (D // 2) % bd:
        bd -= 1
    return bd


def _fold(W: int, C: int) -> int:
    """W-elements folded into the lane dim. 128 lanes per vreg: folding
    F = 2·max(1, 64/C) w-positions gives F·C ≥ 128 lanes (measured 3×
    bandwidth vs the half-empty 2C=64 layout at C=32); capped at W."""
    F = 2 * max(1, 64 // C)
    while W % F or F > W:
        F //= 2
    return max(F, 2)


def _tileF(v, F: int):
    """Per-channel (C,) vector → (1, F·C) row matching the folded lane view
    (lanes are [w0 channels | w1 channels | … | w_{F-1} channels])."""
    return jnp.concatenate([v] * F)[None, :]


# ---------------------------------------------------------------------------
# Kernels. Grid (B, (D/2)/bd); y/dy blocks (bd, 2, H/2, 2, W/2, 2C);
# pooled-resolution blocks (bd, H/2, W/2, C); params resident (rows, 2C).
# ---------------------------------------------------------------------------


def _fwd_kernel(y_ref, params_ref, m_ref, idx_ref, *, C: int):
    """Normalize → relu → window max, tracking the first-argmax index.

    The activation is computed in the input dtype (identical rounding to the
    XLA twin); the compare/select cascade runs widened to f32 — Mosaic on
    v5e supports neither bf16 nor int16 vector compares, and mixing a
    f32-born i1 mask into bf16 selects trips an invalid-relayout error — so
    everything the mask touches stays f32 until the final store.
    """
    mulF = params_ref[0:1, :]
    addF = params_ref[1:2, :]
    pools = params_ref.shape[1] // (2 * C)

    m = [None] * pools
    idx = [None] * pools
    for dd in range(2):
        for hh in range(2):
            x = y_ref[:, dd, :, hh]  # (bd, H2, PW, F·C)
            a_full = jnp.maximum(x * mulF + addF, 0.0)
            for p in range(pools):
                for ww in range(2):
                    r = dd * 4 + hh * 2 + ww
                    lo = (2 * p + ww) * C
                    a = a_full[..., lo : lo + C].astype(jnp.float32)
                    tag = jnp.full(a.shape, float(r), jnp.float32)
                    if m[p] is None:
                        m[p], idx[p] = a, tag
                    else:
                        better = a > m[p]  # strict > keeps the first max
                        m[p] = jnp.where(better, a, m[p])
                        idx[p] = jnp.where(better, tag, idx[p])
    m_ref[...] = jnp.concatenate(m, axis=-1).astype(m_ref.dtype)
    idx_ref[...] = jnp.concatenate(idx, axis=-1).astype(idx_ref.dtype)


def _dy_kernel(y_ref, ga_ref, idx_ref, params_ref, dy_ref, *, C: int):
    """dy = (idx == r)·gA + B + C·ẑ per window member — one pass over y."""
    invF = params_ref[2:3, :]
    subF = params_ref[3:4, :]
    # Bc is pre-folded into ga on the host (ga' = A·g·[m>0] + Bc at pooled
    # resolution costs nothing there); the kernel computes
    # dy = select(idx==r, ga', Bc) + Cc·ẑ entirely in the input dtype —
    # only the pooled-resolution routing mask is widened to f32 (no bf16
    # vector compare on v5e).
    BcN = params_ref[4:5, :C]
    CcN = params_ref[5:6, :C]
    pools = params_ref.shape[1] // (2 * C)

    ga = ga_ref[...]  # A·g·[m>0] + Bc, pooled resolution, input dtype
    idx = idx_ref[...].astype(jnp.float32)

    for dd in range(2):
        for hh in range(2):
            x = y_ref[:, dd, :, hh]
            z_full = x * invF - subF
            parts = []
            for p in range(pools):
                ga_p = ga[..., p * C : (p + 1) * C]
                idx_p = idx[..., p * C : (p + 1) * C]
                for ww in range(2):
                    r = dd * 4 + hh * 2 + ww
                    lo = (2 * p + ww) * C
                    tag = jnp.full(idx_p.shape, float(r), jnp.float32)
                    base = jnp.where(
                        idx_p == tag, ga_p.astype(jnp.float32), BcN.astype(jnp.float32)
                    ).astype(ga_p.dtype)
                    parts.append(base + CcN * z_full[..., lo : lo + C])
            dy_ref[:, dd, :, hh] = jnp.concatenate(parts, axis=-1).astype(
                dy_ref.dtype
            )


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _use_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _specs(B, D, H, PW, CF, CP, bd):
    """Block specs for the folded views: y (B, D/2, 2, H/2, 2, PW, CF) with
    CF = F·C lanes, pooled (B, D/2, H/2, PW, CP) with CP = (F/2)·C lanes."""
    H2 = H // 2
    y_spec = pl.BlockSpec(
        (None, bd, 2, H2, 2, PW, CF),
        lambda b, d: (b, d, 0, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    pooled_spec = pl.BlockSpec(
        (None, bd, H2, PW, CP), lambda b, d: (b, d, 0, 0, 0), memory_space=pltpu.VMEM
    )
    params_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid = (B, D // 2 // bd)
    return grid, y_spec, pooled_spec, params_spec


def _pallas_forward(y7, params, B, D, H, PW, CF, C, bd, interpret):
    grid, y_spec, pooled_spec, params_spec = _specs(
        B, D, H, PW, CF, CF // 2, bd
    )
    pooled = jax.ShapeDtypeStruct((B, D // 2, H // 2, PW, CF // 2), y7.dtype)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, C=C),
        grid=grid,
        in_specs=[y_spec, params_spec],
        out_specs=(pooled_spec, pooled_spec),
        out_shape=(pooled, pooled),
        interpret=interpret,
    )(y7, params)


def _pallas_dy(y7, ga, idx, params, B, D, H, PW, CF, C, bd, interpret):
    grid, y_spec, pooled_spec, params_spec = _specs(
        B, D, H, PW, CF, CF // 2, bd
    )
    return pl.pallas_call(
        functools.partial(_dy_kernel, C=C),
        grid=grid,
        in_specs=[y_spec, pooled_spec, pooled_spec, params_spec],
        out_specs=y_spec,
        out_shape=jax.ShapeDtypeStruct(y7.shape, y7.dtype),
        # dy may overwrite y in place: y's only consumer is this op (the
        # conv backward needs the conv *input* and dy, never y), and the
        # aliased round-trip doubles effective HBM bandwidth (measured).
        # XLA inserts a copy automatically if y is in fact still live.
        input_output_aliases={0: 0},
        interpret=interpret,
    )(y7, ga, idx, params)


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


def _norm_params(mean, invstd, scale, bias, dtype, F):
    mul, add = _muladd(mean, invstd, scale, bias, dtype)
    inv = invstd.astype(dtype)
    sub = (mean * invstd).astype(dtype)
    return jnp.concatenate(
        [_tileF(mul, F), _tileF(add, F), _tileF(inv, F), _tileF(sub, F)], axis=0
    )


def _views(y, B, D, H, W, C):
    """Free reshapes to the folded kernel layouts."""
    F = _fold(W, C)
    PW = W // F
    y7 = y.reshape(B, D // 2, 2, H // 2, 2, PW, F * C)
    return F, PW, y7


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_bn_relu_pool(y, scale, bias, eps=1e-5, block_d_pairs=2, interpret=None):
    """BatchNorm(train stats) → ReLU → MaxPool(2,2,2) in one fused op.

    y: (B, D, H, W, C); scale/bias: (C,). Returns (pooled, mean, var) with
    pooled (B, D/2, H/2, W/2, C) in y.dtype and mean/var (C,) f32 batch
    statistics (for running-average updates). Differentiable in y, scale,
    bias — the VJP is one bandwidth-optimal Pallas pass (plus tiny
    pooled-resolution XLA reductions) and matches the XLA composition's
    gradients (first-max pool routing) exactly.
    """
    out, _ = _fwd(y, scale, bias, eps, block_d_pairs, interpret)
    return out


def _fwd(y, scale, bias, eps, block_d_pairs, interpret):
    B, D, H, W, C = _check_shapes(y, scale, bias)
    # The forward has small outputs, so twice the backward's block depth
    # still fits VMEM (the backward's full-size dy blocks do not, measured).
    bd = _block_d_pairs(D, 2 * block_d_pairs)
    interpret = _use_interpret(interpret)
    mean, var, invstd = _stats(y, eps)
    F, PW, y7 = _views(y, B, D, H, W, C)
    params = _norm_params(mean, invstd, scale, bias, y.dtype, F)
    pooled_f, idx_f = _pallas_forward(
        y7, params, B, D, H, PW, F * C, C, bd, interpret
    )
    pooled = pooled_f.reshape(B, D // 2, H // 2, W // 2, C)
    residuals = (y, pooled, idx_f, scale, bias, mean, invstd)
    return ((pooled, mean, var), residuals)


def _bwd_pieces(y, pooled, scale, bias, mean, invstd, cts):
    """Shared backward math: pooled-resolution BN parameter grads (argmax
    trick) plus the per-channel A/B/C routing constants and folded params.

    BN parameter grads come from the pooled-resolution argmax record: dz is
    nonzero only at each window's first max, where relu' = [pooled > 0]
    and — since pooled m = γ·ẑ + β there — ẑ = (m − β)/γ, recovered
    without any full-resolution pass. γ == 0 would make ẑ unrecoverable
    (and every dz-dependent grad 0·something anyway); guarded to 0.
    """
    g_out, g_mean, g_var = cts
    B, D, H, W, C = y.shape
    n = float(B * D * H * W)

    live = (pooled > 0).astype(jnp.float32)
    g32 = g_out.astype(jnp.float32) * live
    scale32 = scale.astype(jnp.float32)
    safe = jnp.where(scale32 == 0.0, 1.0, scale32)
    zmax = (pooled.astype(jnp.float32) - bias.astype(jnp.float32)) / safe
    zmax = jnp.where(scale32 == 0.0, 0.0, zmax)
    dbeta = jnp.sum(g32, axis=(0, 1, 2, 3))
    dgamma = jnp.sum(g32 * zmax, axis=(0, 1, 2, 3))

    # dy = route(A·g·[m>0]) + B + C·ẑ. B/C fold the BN backward through the
    # batch statistics plus any cotangents on the mean/var outputs (zero in
    # training use — running-stat updates aren't differentiated — but kept
    # exact for generality).
    A32 = scale32 * invstd
    B32 = -A32 * dbeta / n + g_mean / n
    C32 = -A32 * dgamma / n + 2.0 * g_var / (n * invstd)

    F, PW, y7 = _views(y, B, D, H, W, C)
    CP = (F // 2) * C
    # Bc pre-added here so the kernel's select covers routed vs non-routed
    # sites in one op (see _dy_kernel).
    ga = (g32 * A32 + B32).astype(y.dtype).reshape(B, D // 2, H // 2, PW, CP)
    params = jnp.concatenate(
        [
            _norm_params(mean, invstd, scale, bias, y.dtype, F),
            _tileF(B32.astype(y.dtype), F),
            _tileF(C32.astype(y.dtype), F),
        ],
        axis=0,
    )
    return dbeta, dgamma, ga, params, F, PW, y7


def _bwd(eps, block_d_pairs, interpret, residuals, cts):
    y, pooled, idx_f, scale, bias, mean, invstd = residuals
    B, D, H, W, C = y.shape
    bd = _block_d_pairs(D, block_d_pairs)
    interpret = _use_interpret(interpret)
    dbeta, dgamma, ga, params, F, PW, y7 = _bwd_pieces(
        y, pooled, scale, bias, mean, invstd, cts
    )
    idx7 = idx_f  # already in the folded pooled layout
    dy7 = _pallas_dy(y7, ga, idx7, params, B, D, H, PW, F * C, C, bd, interpret)
    dy = dy7.reshape(B, D, H, W, C)
    return dy, dgamma.astype(scale.dtype), dbeta.astype(bias.dtype)


fused_bn_relu_pool.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def hybrid_bn_relu_pool(y, scale, bias, eps=1e-5):
    """BN(train) → ReLU → MaxPool(2³) with a cheaper hand-derived backward.

    Pure XLA on both sides (no Pallas — every hand kernel tried here lost,
    PERF.md "Fused BN-ReLU-pool Pallas kernels"). The forward is identical
    to `reference_bn_relu_pool`, keeping XLA's conv-epilogue fusions. The
    backward replaces XLA's chain (select_and_scatter + full-resolution BN
    reductions + dx pass) with:

      * BN parameter grads at POOLED resolution via the argmax record: the
        routed gradient is nonzero only at each window's first max, where
        relu' = [m > 0] and ẑ = (m − β)/γ — both recoverable from the
        pooled output alone, eliminating two full-resolution reduction
        passes (~6 GB of HBM traffic at 64³×32),
      * routing via the VJP of reduce_window-max itself (one
        select_and_scatter, first-max semantics), and
      * dx = route(A·g·[m>0]) + B + C·ẑ as one fused elementwise pass.

    Measured at block-1 scale (128×64³×32 bf16): 31.5 vs 36.2 ms fwd+bwd.
    Same contract as fused_bn_relu_pool: returns (pooled, mean, var);
    gradients match the XLA composition (first-max routing, relu'(0)=0)
    to f32 rounding. Works on any backend — it is plain XLA.
    """
    out, _ = _hybrid_fwd(y, scale, bias, eps)
    return out


def _hybrid_fwd(y, scale, bias, eps):
    _check_shapes(y, scale, bias)
    mean, var, invstd = _stats(y, eps)
    mul, add = _muladd(mean, invstd, scale, bias, y.dtype)
    a = jnp.maximum(y * mul + add, 0.0)
    pooled = jax.lax.reduce_window(
        a, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID"
    )
    # `a` rides in the residuals — the bwd routes through it directly
    # instead of recomputing (see _masked_hybrid2_fwd).
    residuals = (y, a, pooled, scale, bias, mean, invstd)
    return ((pooled, mean, var), residuals)


def _hybrid_bwd(eps, residuals, cts):
    g_out, g_mean, g_var = cts
    y, a, pooled, scale, bias, mean, invstd = residuals
    B, D, H, W, C = y.shape
    n = float(B * D * H * W)

    # Pooled-resolution BN parameter grads (see _bwd_pieces for the γ == 0
    # guard rationale).
    live = (pooled > 0).astype(jnp.float32)
    g32 = g_out.astype(jnp.float32) * live
    scale32 = scale.astype(jnp.float32)
    safe = jnp.where(scale32 == 0.0, 1.0, scale32)
    zmax = (pooled.astype(jnp.float32) - bias.astype(jnp.float32)) / safe
    zmax = jnp.where(scale32 == 0.0, 0.0, zmax)
    dbeta = jnp.sum(g32, axis=(0, 1, 2, 3))
    dgamma = jnp.sum(g32 * zmax, axis=(0, 1, 2, 3))

    # dy = route(A·g·[m>0]) + B + C·ẑ; B/C fold the BN backward through the
    # batch statistics plus any mean/var cotangents (zero in training use).
    A32 = scale32 * invstd
    B32 = -A32 * dbeta / n + g_mean / n
    C32 = -A32 * dgamma / n + 2.0 * g_var / (n * invstd)

    # First-max routing through the pool on the forward's saved activation.
    routed = _route_pool_grad(a, pooled, (g32 * A32).astype(y.dtype))
    zhat = y.astype(jnp.float32) * invstd - mean * invstd
    dy = (routed.astype(jnp.float32) + B32 + C32 * zhat).astype(y.dtype)
    return dy, dgamma.astype(scale.dtype), dbeta.astype(bias.dtype)


hybrid_bn_relu_pool.defvjp(_hybrid_fwd, _hybrid_bwd)


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def masked_hybrid_bn_relu_pool(y, scale, bias, mask, eps=1e-5):
    """Masked (submanifold) BN → ReLU → zero-inactive → MaxPool(2³) with
    the hand-derived hybrid backward.

    Same contract and numerics as `masked_bn_relu_pool` (statistics over
    active sites only, inactive hard-zeroed) but the backward mirrors
    `hybrid_bn_relu_pool`: BN parameter grads reduce at POOLED resolution
    via the argmax record — when a pooled cell m > 0 its argmax site is
    active and positive, so relu'·mask = 1 there and ẑ = (m − β)/γ —
    killing the full-resolution masked reduction passes; routing is the
    VJP of reduce_window-max; dx is one fused elementwise pass times the
    mask. ``mask`` is treated as non-differentiable (zero cotangent) —
    it is input data / a pooled mask chain, never trained.

    Known deviation (shared with `hybrid_bn_relu_pool`): at γ == 0.0
    exactly, ẑ_argmax is unrecoverable from the pooled output and dγ is
    reported as 0 (the channel stays frozen under any multiplicative
    update). BN scales initialize at 1 and never hit exact 0.0 in
    training; use `masked_bn_relu_pool` (use_fused=false) if that case
    matters.
    """
    out, _ = _masked_hybrid_fwd(y, scale, bias, mask, eps)
    return out


# Gradient-routing backend for the hybrid backwards: "sas" = the VJP of
# reduce_window-max (XLA select_and_scatter); "compare" = an exact
# compare of the saved forward activation against its own pooled max,
# with the scan-order first-max tie-break built from 8 static window
# slices (identical semantics — ties resolve to the same site — but a
# different lowering; measured per-backend, see PERF.md). Module-level so
# the probe script can flip it before tracing.
ROUTING = "sas"


def _route_pool_grad(a, pooled, g):
    """Route pooled cotangent ``g`` to each 2³ window's first max of ``a``.

    Exact twin of the reduce_window-max VJP: ``pooled`` must be the
    window max of ``a`` (no arithmetic between them, so ``==`` is exact),
    and ties resolve to the first site in (d, h, w) scan order.
    """
    if ROUTING == "sas":
        _, route = jax.vjp(
            lambda t: jax.lax.reduce_window(
                t, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1),
                "VALID",
            ),
            a,
        )
        (routed,) = route(g)
        return routed
    B, D, H, W, C = a.shape
    a7 = a.reshape(B, D // 2, 2, H // 2, 2, W // 2, 2, C)
    taken = None
    pieces = []
    for dd in range(2):
        for hh in range(2):
            for ww in range(2):
                sl = a7[:, :, dd, :, hh, :, ww]
                hit = sl == pooled
                if taken is None:
                    taken = hit
                else:
                    hit = hit & ~taken
                    taken = taken | hit
                pieces.append(jnp.where(hit, g, 0).astype(a.dtype))
    routed = jnp.stack(pieces, axis=4)  # (B, D/2, H/2, W/2, 8, C)
    routed = routed.reshape(B, D // 2, H // 2, W // 2, 2, 2, 2, C)
    routed = routed.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return routed.reshape(B, D, H, W, C)


def _masked_stats(y, mask, eps):
    yf = y.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    count = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(yf * m, axis=(0, 1, 2, 3)) / count
    var = jnp.sum(jnp.square(yf) * m, axis=(0, 1, 2, 3)) / count - jnp.square(mean)
    var = jnp.maximum(var, 0.0)
    invstd = jax.lax.rsqrt(var + eps)
    return mean, var, invstd, count


def _masked_pool(a, mask):
    pooled = jax.lax.reduce_window(
        a, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID"
    )
    pooled_mask = jax.lax.reduce_window(
        mask, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID"
    )
    return pooled, pooled_mask


def _masked_hybrid_fwd(y, scale, bias, mask, eps):
    _check_shapes(y, scale, bias)
    mean, var, invstd, count = _masked_stats(y, mask, eps)
    mul, add = _muladd(mean, invstd, scale, bias, y.dtype)
    a = jnp.maximum(y * mul + add, 0.0) * mask.astype(y.dtype)
    pooled, pooled_mask = _masked_pool(a, mask)
    # `a` rides in the residuals — the bwd routes through it directly
    # instead of recomputing (see _masked_hybrid2_fwd).
    residuals = (y, a, pooled, mask, scale, bias, mean, invstd, count)
    return ((pooled, mean, var, pooled_mask), residuals)


def _masked_hybrid_bwd(eps, residuals, cts):
    g_out, g_mean, g_var, _g_pmask = cts  # pooled-mask cotangent: mask is data
    y, a, pooled, mask, scale, bias, mean, invstd, count = residuals

    # Pooled-resolution BN parameter grads: pooled m > 0 ⟹ the argmax site
    # is active (mask=1) and relu-live, where m = γ·ẑ + β.
    live = (pooled > 0).astype(jnp.float32)
    g32 = g_out.astype(jnp.float32) * live
    scale32 = scale.astype(jnp.float32)
    safe = jnp.where(scale32 == 0.0, 1.0, scale32)
    zmax = (pooled.astype(jnp.float32) - bias.astype(jnp.float32)) / safe
    zmax = jnp.where(scale32 == 0.0, 0.0, zmax)
    dbeta = jnp.sum(g32, axis=(0, 1, 2, 3))
    dgamma = jnp.sum(g32 * zmax, axis=(0, 1, 2, 3))

    # dy = route(A·g·[m>0]) + (B + C·ẑ)·mask, with the masked-count n.
    A32 = scale32 * invstd
    B32 = -A32 * dbeta / count + g_mean / count
    C32 = -A32 * dgamma / count + 2.0 * g_var / (count * invstd)

    routed = _route_pool_grad(a, pooled, (g32 * A32).astype(y.dtype))
    zhat = y.astype(jnp.float32) * invstd - mean * invstd
    dy = (
        (routed.astype(jnp.float32) + (B32 + C32 * zhat))
        * mask.astype(jnp.float32)
    ).astype(y.dtype)
    return dy, dgamma.astype(scale.dtype), dbeta.astype(bias.dtype), jnp.zeros_like(mask)


masked_hybrid_bn_relu_pool.defvjp(_masked_hybrid_fwd, _masked_hybrid_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def masked_hybrid_bn_relu_pool2(y, scale, bias, stats_mask, zero_mask, eps=1e-5):
    """Two-mask masked BN → ReLU → zero → MaxPool(2³), hybrid backward.

    The halo'd windowed voxel path (voxel_cnn._windowed_forward at halo 3)
    computes each tile's conv output over a region LARGER than the tile:
    the center 8³ plus a halo ring whose sites are other tiles' centers.
    Statistics must count every active site exactly once — reduce over
    ``stats_mask`` (center occupancy only) — while normalization/zeroing
    applies to the whole region via ``zero_mask`` (full occupancy, halo
    included), so the halo ring carries the same values the neighbor tile
    computes for its own center. Contract otherwise matches
    `masked_hybrid_bn_relu_pool`; returns (pooled, mean, var,
    pool(stats_mask)) — the pooled CENTER mask, which cropped by the next
    block's valid conv is exactly its (single) mask.

    Backward: identical pooled-argmax trick (a live pooled cell's argmax
    site is unmasked and relu-positive regardless of which mask zeroed the
    rest); only the mean/var chain term is restricted to ``stats_mask``
    sites with the stats count. Shares the γ == 0.0 dγ caveat.
    """
    out, _ = _masked_hybrid2_fwd(y, scale, bias, stats_mask, zero_mask, eps)
    return out


def _masked_hybrid2_fwd(y, scale, bias, stats_mask, zero_mask, eps):
    _check_shapes(y, scale, bias)
    mean, var, invstd, count = _masked_stats(y, stats_mask, eps)
    mul, add = _muladd(mean, invstd, scale, bias, y.dtype)
    a = jnp.maximum(y * mul + add, 0.0) * zero_mask.astype(y.dtype)
    pooled, pooled_mask = _masked_pool(a, stats_mask)
    # `a` rides in the residuals: the backward routes through it directly
    # instead of recomputing (saves one elementwise pass + a full read of
    # y in the bwd; fwd and bwd live in one jitted train program, so the
    # array is alive either way until XLA schedules the routing).
    residuals = (y, a, pooled, stats_mask, scale, bias, mean, invstd,
                 count)
    return ((pooled, mean, var, pooled_mask), residuals)


def _masked_hybrid2_bwd(eps, residuals, cts):
    g_out, g_mean, g_var, _g_pmask = cts
    (y, a, pooled, stats_mask, scale, bias, mean, invstd, count) = residuals

    live = (pooled > 0).astype(jnp.float32)
    g32 = g_out.astype(jnp.float32) * live
    scale32 = scale.astype(jnp.float32)
    safe = jnp.where(scale32 == 0.0, 1.0, scale32)
    zmax = (pooled.astype(jnp.float32) - bias.astype(jnp.float32)) / safe
    zmax = jnp.where(scale32 == 0.0, 0.0, zmax)
    dbeta = jnp.sum(g32, axis=(0, 1, 2, 3))
    dgamma = jnp.sum(g32 * zmax, axis=(0, 1, 2, 3))

    A32 = scale32 * invstd
    B32 = -A32 * dbeta / count + g_mean / count
    C32 = -A32 * dgamma / count + 2.0 * g_var / (count * invstd)

    routed = _route_pool_grad(a, pooled, (g32 * A32).astype(y.dtype))
    zhat = y.astype(jnp.float32) * invstd - mean * invstd
    # The mean/var chain reaches only statistics sites; the routed (direct)
    # term lands only on live argmax sites, which are zero_mask-live by
    # construction — no extra masking needed there.
    dy = (
        routed.astype(jnp.float32)
        + (B32 + C32 * zhat) * stats_mask.astype(jnp.float32)
    ).astype(y.dtype)
    # zero_mask shares stats_mask's (B, D, H, W, 1) shape/dtype.
    return (dy, dgamma.astype(scale.dtype), dbeta.astype(bias.dtype),
            jnp.zeros_like(stats_mask), jnp.zeros_like(stats_mask))


masked_hybrid_bn_relu_pool2.defvjp(_masked_hybrid2_fwd, _masked_hybrid2_bwd)


def masked_bn_relu_pool2(y, scale, bias, stats_mask, zero_mask, eps=1e-5):
    """Plain-XLA composed twin of `masked_hybrid_bn_relu_pool2` (the
    oracle for its hand-derived backward; autodiff-differentiable)."""
    mean, var, invstd, count = _masked_stats(y, stats_mask, eps)
    mul, add = _muladd(mean, invstd, scale, bias, y.dtype)
    a = jnp.maximum(y * mul + add, 0.0) * zero_mask.astype(y.dtype)
    pooled, pooled_mask = _masked_pool(a, stats_mask)
    return pooled, mean, var, pooled_mask


def masked_inference_bn_relu_pool2(y, scale, bias, mean, var, stats_mask,
                                   zero_mask, eps=1e-5):
    """Eval-mode two-mask path: running stats, relu, zero, pool."""
    invstd = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    mul, add = _muladd(mean.astype(jnp.float32), invstd, scale, bias, y.dtype)
    a = jnp.maximum(y * mul + add, 0.0) * zero_mask.astype(y.dtype)
    pooled, pooled_mask = _masked_pool(a, stats_mask)
    return pooled, pooled_mask


# ---------------------------------------------------------------------------
# 2-D stem variant: BN(train) → ReLU → overlapping MaxPool(3×3, stride 2,
# pad 1) — the torchvision ResNet stem (models/resnet.py, reference
# mv_cnn.py:44-58 via torchvision resnet). The pooled-resolution
# BN-parameter-grad trick survives OVERLAPPING windows because dγ/dβ sum
# per *window*, not per site: each window's routed gradient lands at its
# argmax, where relu' = [m > 0] and ẑ = (m − β)/γ are recoverable from the
# pooled output alone. Routing (a site argmax of several windows sums their
# cotangents) is the VJP of reduce_window-max itself.
# ---------------------------------------------------------------------------


def _stats2d(y, eps):
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(yf), axis=(0, 1, 2)) - jnp.square(mean)
    var = jnp.maximum(var, 0.0)
    invstd = jax.lax.rsqrt(var + eps)
    return mean, var, invstd


def _pool2d(a):
    return jax.lax.reduce_window(
        a,
        -jnp.inf,
        jax.lax.max,
        (1, 3, 3, 1),
        (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def hybrid_bn_relu_pool2d(y, scale, bias, eps=1e-5):
    """BN(train) → ReLU → MaxPool(3×3/2, pad 1) with the hybrid backward.

    The 2-D overlapping-window sibling of `hybrid_bn_relu_pool` for the
    ResNet stem. XLA both sides; BN parameter grads reduce at pooled (¼)
    resolution, killing the full-resolution BN-backward reduction passes
    over the (B·V, 64², 64) stem activation. Returns (pooled, mean, var);
    grads match the composed autodiff to f32 rounding (first-max routing,
    relu'(0)=0). γ == 0.0 exactly makes dγ for that channel zero (the
    ẑ-recovery divides by γ) — torch-init γ=1 and weight decay never
    produce an exact 0.0 in practice.
    """
    out, _ = _hybrid2d_fwd(y, scale, bias, eps)
    return out


def _hybrid2d_fwd(y, scale, bias, eps):
    if y.ndim != 4:
        raise ValueError(f"expected (N, H, W, C) activations, got {y.shape}")
    mean, var, invstd = _stats2d(y, eps)
    mul, add = _muladd(mean, invstd, scale, bias, y.dtype)
    pooled = _pool2d(jnp.maximum(y * mul + add, 0.0))
    residuals = (y, pooled, scale, bias, mean, invstd, mul, add)
    return ((pooled, mean, var), residuals)


def _hybrid2d_bwd(eps, residuals, cts):
    g_out, g_mean, g_var = cts
    y, pooled, scale, bias, mean, invstd, mul, add = residuals
    N, H, W, C = y.shape
    n = float(N * H * W)

    live = (pooled > 0).astype(jnp.float32)
    g32 = g_out.astype(jnp.float32) * live
    scale32 = scale.astype(jnp.float32)
    safe = jnp.where(scale32 == 0.0, 1.0, scale32)
    zmax = (pooled.astype(jnp.float32) - bias.astype(jnp.float32)) / safe
    zmax = jnp.where(scale32 == 0.0, 0.0, zmax)
    dbeta = jnp.sum(g32, axis=(0, 1, 2))
    dgamma = jnp.sum(g32 * zmax, axis=(0, 1, 2))

    A32 = scale32 * invstd
    B32 = -A32 * dbeta / n + g_mean / n
    C32 = -A32 * dgamma / n + 2.0 * g_var / (n * invstd)

    a = jnp.maximum(y * mul + add, 0)
    _, route = jax.vjp(_pool2d, a)
    (routed,) = route((g32 * A32).astype(y.dtype))
    zhat = y.astype(jnp.float32) * invstd - mean * invstd
    dy = (routed.astype(jnp.float32) + B32 + C32 * zhat).astype(y.dtype)
    return dy, dgamma.astype(scale.dtype), dbeta.astype(bias.dtype)


hybrid_bn_relu_pool2d.defvjp(_hybrid2d_fwd, _hybrid2d_bwd)


def reference_bn_relu_pool2d(y, scale, bias, eps=1e-5):
    """Plain-XLA composed twin (the autodiff oracle for the 2-D hybrid)."""
    mean, var, invstd = _stats2d(y, eps)
    mul, add = _muladd(mean, invstd, scale, bias, y.dtype)
    return _pool2d(jnp.maximum(y * mul + add, 0.0)), mean, var


def inference_bn_relu_pool2d(y, scale, bias, mean, var, eps=1e-5):
    """Eval-mode stem path: running statistics, relu, 3×3/2 pool."""
    invstd = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    mul, add = _muladd(mean.astype(jnp.float32), invstd, scale, bias, y.dtype)
    return _pool2d(jnp.maximum(y * mul + add, 0.0))


def masked_bn_relu_pool(y, scale, bias, mask, eps=1e-5):
    """Submanifold-faithful variant: statistics over *occupied* sites only.

    spconv's BatchNorm1d sees only active sites and inactive sites simply do
    not exist (reference sparse_cnn.py:11-40); the dense default instead
    normalizes over all sites — mostly empty zeros — which shifts every
    mean/var (documented divergence, models/voxel_cnn.py). This twin
    replicates the submanifold semantics on the dense grid:

      * mean/var over sites where ``mask`` is 1 (f32, masked reductions),
      * normalize + relu, then zero inactive sites (they "don't exist"),
      * maxpool; the pooled mask (window-any) propagates to the next block.

    mask: (B, D, H, W, 1) float 0/1. Returns (pooled, mean, var,
    pooled_mask). Plain XLA — this is the parity-experiment path
    (PARITY.md), not the perf path.
    """
    yf = y.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    count = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(yf * m, axis=(0, 1, 2, 3)) / count
    var = jnp.sum(jnp.square(yf) * m, axis=(0, 1, 2, 3)) / count - jnp.square(mean)
    var = jnp.maximum(var, 0.0)
    invstd = jax.lax.rsqrt(var + eps)
    mul, add = _muladd(mean, invstd, scale, bias, y.dtype)
    a = jnp.maximum(y * mul + add, 0.0) * mask.astype(y.dtype)
    pooled = jax.lax.reduce_window(
        a, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID"
    )
    pooled_mask = jax.lax.reduce_window(
        mask, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID"
    )
    return pooled, mean, var, pooled_mask


def masked_inference_bn_relu_pool(y, scale, bias, mean, var, mask, eps=1e-5):
    """Eval-mode masked path: running statistics, relu, zero inactive, pool."""
    invstd = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    mul, add = _muladd(mean.astype(jnp.float32), invstd, scale, bias, y.dtype)
    a = jnp.maximum(y * mul + add, 0.0) * mask.astype(y.dtype)
    pooled = jax.lax.reduce_window(
        a, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID"
    )
    pooled_mask = jax.lax.reduce_window(
        mask, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID"
    )
    return pooled, pooled_mask
