"""Probe: can a folded (w,c)-merged layout speed the windowed block-1
two-mask BN/ReLU/zero/pool chain?

Trace evidence (PERF.md round-3 trace profile): at (T≈3k, 12³, 32) bf16 the
elementwise normalize pass costs 2.2 ms and the routing backward 2.2 ms —
~2.5× their bandwidth floor — plausibly (8,128)-tiling pad waste on the
(12, 32) minor dims (16·128 / (12·32) = 5.3×). The folded view merges w
into lanes: (T,12,12,384) with 384 = 3·128 exact; pooling decomposes into
a w-pair group-max (free reshape (T,12,12,6,2,32) → max axis 4) and a
2-D reduce_window over (d,h).

Usage: python scripts/probe_bn2_layouts.py [--rows 3072] [--iters 30]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench_util import timeit  # noqa: E402


def folded_masked_bn_relu_pool2(y, scale, bias, stats_mask, zero_mask, eps=1e-5):
    """Same math as ops.fused_bn_pool.masked_bn_relu_pool2, folded layout."""
    from tricolo_tpu.ops.fused_bn_pool import _masked_stats, _muladd

    T, D, H, W, C = y.shape
    mean, var, invstd, count = _masked_stats(y, stats_mask, eps)
    mul, add = _muladd(mean, invstd, scale, bias, y.dtype)
    # Folded elementwise: (T, D, H, W·C); mask broadcasts (T,D,H,W,1)→(…,C)
    # then reshapes — XLA should fuse the broadcast into the multiply.
    yf = y.reshape(T, D, H, W * C)
    mulf = jnp.tile(mul, W)[None, None, None, :]
    addf = jnp.tile(add, W)[None, None, None, :]
    mzf = jnp.broadcast_to(zero_mask, (T, D, H, W, C)).reshape(T, D, H, W * C)
    a = jnp.maximum(yf * mulf + addf, 0.0) * mzf.astype(y.dtype)
    # w-pair group max: free minor-dim split, reduce over the pair axis.
    a = jnp.max(a.reshape(T, D, H, W // 2, 2, C), axis=4)  # (T,D,H,W/2,C)
    # (d,h) pool as a 2-D window over merged trailing dims.
    a = a.reshape(T, D, H, (W // 2) * C)
    pooled = jax.lax.reduce_window(
        a, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ).reshape(T, D // 2, H // 2, W // 2, C)
    pm = jax.lax.reduce_window(
        stats_mask, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID"
    )
    return pooled, mean, var, pm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=3072)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from tricolo_tpu.ops.fused_bn_pool import (
        masked_bn_relu_pool2,
        masked_hybrid_bn_relu_pool2,
    )

    T, s, C = args.rows, 12, 32
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((T, s, s, s, C)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    zero = jnp.asarray(
        (rng.random((T, s, s, s, 1)) < 0.5).astype(np.float32)
    ).astype(jnp.bfloat16)
    stats = jnp.asarray(
        np.pad(
            (rng.random((T, 8, 8, 8, 1)) < 0.6).astype(np.float32),
            ((0, 0), (2, 2), (2, 2), (2, 2), (0, 0)),
        )
    ).astype(jnp.bfloat16)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)

    # Correctness first.
    ref = masked_bn_relu_pool2(y, scale, bias, stats, zero)
    got = folded_masked_bn_relu_pool2(y, scale, bias, stats, zero)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-5
        )
    print("folded == composed: OK")

    variants = {
        "hybrid (current)": jax.jit(
            lambda *a: masked_hybrid_bn_relu_pool2(*a)[0]
        ),
        "composed 5-D": jax.jit(lambda *a: masked_bn_relu_pool2(*a)[0]),
        "folded (w,c)": jax.jit(
            lambda *a: folded_masked_bn_relu_pool2(*a)[0]
        ),
    }
    for name, fn in variants.items():
        ms = timeit(fn, (y, scale, bias, stats, zero), args.iters)
        print(f"fwd  {name:18s} {ms:7.2f} ms")

    def make_grad(op):
        def loss(y, s, b):
            pooled = op(y, s, b, stats, zero)[0]
            return jnp.sum(pooled.astype(jnp.float32))

        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    for name, op in (
        ("hybrid (current)", masked_hybrid_bn_relu_pool2),
        ("composed 5-D", masked_bn_relu_pool2),
        ("folded (w,c)", folded_masked_bn_relu_pool2),
    ):
        ms = timeit(make_grad(op), (y, scale, bias), args.iters)
        print(f"grad {name:18s} {ms:7.2f} ms")


if __name__ == "__main__":
    main()
