"""Per-block timing of the voxel encoder's conv/BN/relu/pool backward.

For each of the five ConvBlocks at flagship shapes (batch 128, 64^3 input),
times: conv forward, conv filter-grad, the BN→ReLU→MaxPool composite's
fwd and fwd+bwd (XLA composition vs fused Pallas op), and the whole block
fwd+bwd. Feeds the PERF.md component table and kernel decisions.

Usage: python scripts/profile_voxel_blocks.py [--iters 20]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


from bench_util import sync as _sync, timeit  # noqa: E402


BLOCKS = [  # (D, Cin, Cout) per ConvBlock at voxel_size=64, ef_dim=32
    (64, 3, 32),
    (32, 32, 64),
    (16, 64, 128),
    (8, 128, 256),
    (4, 256, 512),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    it = args.iters
    B = args.batch

    from tricolo_tpu.ops.fused_bn_pool import (
        fused_bn_relu_pool,
        hybrid_bn_relu_pool,
        reference_bn_relu_pool,
    )

    rng = np.random.default_rng(0)
    dimn = (
        lambda d, c: jnp.asarray(rng.standard_normal((B, d, d, d, c)), jnp.bfloat16)
    )

    print(f"{'block':<18} {'conv fwd':>9} {'conv dW':>9} {'bnrp fwd':>9} "
          f"{'bnrp f+b':>9} {'fused f+b':>10} {'hyb f+b':>9} {'block f+b':>10}")
    for D, Cin, Cout in BLOCKS:
        x = dimn(D, Cin)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, Cin, Cout)) * 0.05, jnp.bfloat16)
        scale = jnp.ones((Cout,), jnp.float32)
        bias = jnp.zeros((Cout,), jnp.float32)

        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))

        def conv(wt, xx):
            return jax.lax.conv_general_dilated(xx, wt, (1, 1, 1), "SAME", dimension_numbers=dn)

        conv_fwd = timeit(jax.jit(conv), (w, x), it)
        dW = jax.jit(jax.grad(lambda wt, xx: jnp.sum(conv(wt, xx) * jax.lax.stop_gradient(conv(wt, xx)))))
        # grad of sum(y*sg(y)) recomputes fwd; subtract conv_fwd to get dW alone
        conv_dw = timeit(dW, (w, x), it) - conv_fwd

        y = jax.jit(conv)(w, x)

        def bnrp_ref(yy, s, b):
            out, _, _ = reference_bn_relu_pool(yy, s, b)
            return jnp.sum(out.astype(jnp.float32) * jax.lax.stop_gradient(out.astype(jnp.float32)))

        def bnrp_fused(yy, s, b):
            out, _, _ = fused_bn_relu_pool(yy, s, b)
            return jnp.sum(out.astype(jnp.float32) * jax.lax.stop_gradient(out.astype(jnp.float32)))

        def bnrp_hyb(yy, s, b):
            out, _, _ = hybrid_bn_relu_pool(yy, s, b)
            return jnp.sum(out.astype(jnp.float32) * jax.lax.stop_gradient(out.astype(jnp.float32)))

        bnrp_fwd = timeit(jax.jit(lambda yy, s, b: reference_bn_relu_pool(yy, s, b)[0]), (y, scale, bias), it)
        bnrp_fb = timeit(jax.jit(jax.grad(bnrp_ref)), (y, scale, bias), it)
        fused_fb = timeit(jax.jit(jax.grad(bnrp_fused)), (y, scale, bias), it)
        hyb_fb = timeit(jax.jit(jax.grad(bnrp_hyb)), (y, scale, bias), it)

        def block(wt, s, b, xx):
            out, _, _ = reference_bn_relu_pool(conv(wt, xx), s, b)
            return jnp.sum(out.astype(jnp.float32) * jax.lax.stop_gradient(out.astype(jnp.float32)))

        block_fb = timeit(jax.jit(jax.grad(block, argnums=(0, 1, 2))), (w, scale, bias, x), it)

        print(f"{D}^3 {Cin:>3}->{Cout:<4}     {conv_fwd:>8.2f} {conv_dw:>8.2f} "
              f"{bnrp_fwd:>8.2f} {bnrp_fb:>8.2f} {fused_fb:>9.2f} {hyb_fb:>8.2f} {block_fb:>9.2f}")


if __name__ == "__main__":
    main()
