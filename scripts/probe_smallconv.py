"""Small-spatial convs: XLA conv vs explicit im2col matmul, on the chip.

The round-3 MVCNN decomposition (probe_mvcnn.py) shows ResNet18 stage 4
(768×4²×512) costs 9.3 ms fwd+bwd — ~6× its MXU speed-of-light. At 4²-8²
spatial the halo dominates XLA's conv tiling. im2col at these sizes is
cheap (9 shifted copies of a few-MB array) and turns the conv into one
large matmul. Measures 2-D (image stages 3/4) and 3-D (voxel tail
blocks) shapes, fwd+bwd wrt weights.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from scripts.bench_util import timeit

DTYPE = jnp.bfloat16


def xla_conv2d(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def im2col_conv2d(x, w):
    N, H, W, C = x.shape
    F = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [
            xp[:, i : i + H, j : j + W, :]
            for i in range(3)
            for j in range(3)
        ],
        axis=-1,
    )
    y = jax.lax.dot_general(
        cols.reshape(N * H * W, 9 * C),
        w.reshape(9 * C, F),
        (((1,), (0,)), ((), ())),
    )
    return y.reshape(N, H, W, F)


def xla_conv3d(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def im2col_conv3d(x, w):
    N, D, H, W, C = x.shape
    F = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [
            xp[:, k : k + D, i : i + H, j : j + W, :]
            for k in range(3)
            for i in range(3)
            for j in range(3)
        ],
        axis=-1,
    )
    y = jax.lax.dot_general(
        cols.reshape(N * D * H * W, 27 * C),
        w.reshape(27 * C, F),
        (((1,), (0,)), ((), ())),
    )
    return y.reshape(N, D, H, W, F)


def grad_time(f, x, w, iters):
    def loss(w):
        y = f(x, w)
        return jnp.sum(y.astype(jnp.float32) * jax.lax.stop_gradient(y.astype(jnp.float32)))

    g = jax.jit(jax.grad(loss))
    return timeit(g, (w,), iters)


def main():
    iters = 10
    rng = np.random.default_rng(0)

    for name, (N, H, C, F) in {
        "img stage4 (768,4²,512→512)": (768, 4, 512, 512),
        "img stage3 (768,8²,256→256)": (768, 8, 256, 256),
        "img stage2 (768,16²,128→128)": (768, 16, 128, 128),
    }.items():
        x = jnp.asarray(rng.standard_normal((N, H, H, C)).astype(np.float32), DTYPE)
        w = jnp.asarray(rng.standard_normal((3, 3, C, F)).astype(np.float32) * 0.05, DTYPE)
        w2 = w.reshape(9 * C, F).reshape(3, 3, C, F)  # same layout
        t_x = grad_time(xla_conv2d, x, w, iters)
        t_i = grad_time(im2col_conv2d, x, w2, iters)
        # numerics check at f32 tolerance
        ya = np.asarray(xla_conv2d(x, w), np.float32)
        yb = np.asarray(im2col_conv2d(x, w), np.float32)
        err = float(np.max(np.abs(ya - yb)))
        print(f"{name}: xla {t_x:.2f} ms | im2col {t_i:.2f} ms | max|Δ| {err:.2e}", flush=True)

    for name, (N, D, C, F) in {
        "vox block4 (128,8³,128→256)": (128, 8, 128, 256),
        "vox block5 (128,4³,256→512)": (128, 4, 256, 512),
    }.items():
        x = jnp.asarray(rng.standard_normal((N, D, D, D, C)).astype(np.float32), DTYPE)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, C, F)).astype(np.float32) * 0.05, DTYPE)
        t_x = grad_time(xla_conv3d, x, w, iters)
        t_i = grad_time(im2col_conv3d, x, w, iters)
        ya = np.asarray(xla_conv3d(x, w), np.float32)
        yb = np.asarray(im2col_conv3d(x, w), np.float32)
        err = float(np.max(np.abs(ya - yb)))
        print(f"{name}: xla {t_x:.2f} ms | im2col {t_i:.2f} ms | max|Δ| {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
