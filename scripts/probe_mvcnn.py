"""Decompose the MVCNN/ResNet18 fwd+bwd cost on the chip (flagship scale).

The round-3 profile puts MVCNN at 29.7 ms fwd+bwd (768×128², bf16) vs a
~7 ms MXU speed-of-light — on par with the whole windowed voxel stack.
Measures: per-stage truncated backbones (cost increments), the stem conv
at Cin=3 vs zero-padded Cin=4 (the trick that won 5 ms on the voxel
block-1 conv), and the overlapping 3×3/s2 stem maxpool's backward.

Usage: python scripts/probe_mvcnn.py [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from scripts.bench_util import timeit
from tricolo_tpu.models.resnet import ResNet
from tricolo_tpu.models.common import torch_conv_kernel_init

BV, H = 768, 128
DTYPE = jnp.bfloat16


def grad_time(module, x, iters, method=None):
    variables = module.init(jax.random.PRNGKey(0), x, train=True)

    def loss(params, stats, x):
        out, _ = module.apply(
            {"params": params, "batch_stats": stats} if stats is not None else {"params": params},
            x, train=True,
            mutable=["batch_stats"] if stats is not None else [],
        )
        out = out[0] if isinstance(out, tuple) else out
        return jnp.sum(out.astype(jnp.float32) * jax.lax.stop_gradient(out.astype(jnp.float32)))

    stats = variables.get("batch_stats")
    f = jax.jit(jax.grad(loss))
    return timeit(f, (variables["params"], stats, x), iters)


class TruncatedResNet(nn.Module):
    """ResNet18 prefix: stem + the first ``n_stages`` stages."""

    n_stages: int = 4
    stem_only: bool = False
    skip_pool: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        from tricolo_tpu.models.resnet import BasicBlock

        x = x.astype(DTYPE)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, kernel_init=torch_conv_kernel_init,
                    dtype=DTYPE, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=DTYPE, name="bn1")(x)
        x = nn.relu(x)
        if not self.skip_pool:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        if self.stem_only:
            return jnp.mean(x, axis=(1, 2))
        for stage in range(self.n_stages):
            for block in range(2):
                strides = 2 if stage > 0 and block == 0 else 1
                x = BasicBlock(64 * (2 ** stage), strides=strides, dtype=DTYPE,
                               name=f"layer{stage + 1}_{block}")(x, train=train)
        return jnp.mean(x, axis=(1, 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    iters = args.iters

    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.standard_normal((BV, H, H, 3)).astype(np.float32), DTYPE)
    x4 = jnp.pad(x3, ((0, 0), (0, 0), (0, 0), (0, 1)))

    full = ResNet(cnn_name="resnet18", dtype=DTYPE)
    t = grad_time(full, x3, iters)
    print(f"resnet18 full fwd+bwd:            {t:.2f} ms", flush=True)

    t_stem = grad_time(TruncatedResNet(stem_only=True), x3, iters)
    print(f"stem only (conv+bn+relu+pool):    {t_stem:.2f} ms", flush=True)
    t_stem_np = grad_time(TruncatedResNet(stem_only=True, skip_pool=True), x3, iters)
    print(f"stem without maxpool:             {t_stem_np:.2f} ms  (pool cost ≈ {t_stem - t_stem_np:.2f})", flush=True)
    t_stem4 = grad_time(TruncatedResNet(stem_only=True), x4, iters)
    print(f"stem Cin=4 (padded):              {t_stem4:.2f} ms", flush=True)

    prev = t_stem
    for n in (1, 2, 3, 4):
        t_n = grad_time(TruncatedResNet(n_stages=n), x3, iters)
        print(f"stem+stages1..{n}:                  {t_n:.2f} ms  (stage {n} ≈ {t_n - prev:.2f})", flush=True)
        prev = t_n


if __name__ == "__main__":
    main()
