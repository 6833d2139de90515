"""Optimizer with torch-Adam semantics + the reference LR schedule.

The reference trains with torch.optim.Adam(lr=3.5e-4, weight_decay=1e-6)
(config.yaml:50-53): *coupled* L2 weight decay — wd·param is added to the
gradient before the Adam moments (not AdamW's decoupled form) — and
eps=1e-8 added outside the sqrt. The optax chain below reproduces that
exactly; the learning rate is applied by the caller per step so the epoch
schedule needs no optimizer-state surgery.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class FlatTorchAdamState(NamedTuple):
    count: jax.Array  # int32 scalar step count
    mu: jax.Array  # (n_params,) first moment, flat
    nu: jax.Array  # (n_params,) second moment, flat


def flat_torch_adam(weight_decay: float = 0.0) -> optax.GradientTransformation:
    """torch-Adam over a single flattened parameter buffer.

    Numerically equivalent to the per-leaf optax chain (every op is
    elementwise, so flattening changes nothing but kernel granularity):
    the whole moment update + direction computation runs as a handful of
    fused kernels over one (n_params,) buffer instead of ~5 stages × ~100
    leaves. MEASURED NEGATIVE end-to-end on v5e (PERF.md round 3): the
    ravel/unravel copies cost more than the dispatch overhead they remove
    (86.9 vs 84.7 ms/step) and the concatenate-of-everything HLO blows
    compile time up 10× (688 s vs 69 s). Ships off by default
    (optimizer.flat_update) as a documented negative result.
    """
    from jax.flatten_util import ravel_pytree

    b1, b2, eps = 0.9, 0.999, 1e-8

    def init(params):
        flat, _ = ravel_pytree(params)
        return FlatTorchAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jnp.zeros_like(flat),
            nu=jnp.zeros_like(flat),
        )

    def update(grads, state, params=None):
        flat_g, unravel = ravel_pytree(grads)
        if weight_decay:
            if params is None:
                raise ValueError("flat_torch_adam with weight_decay needs params")
            flat_p, _ = ravel_pytree(params)
            flat_g = flat_g + weight_decay * flat_p
        count = state.count + 1
        mu = b1 * state.mu + (1.0 - b1) * flat_g
        nu = b2 * state.nu + (1.0 - b2) * (flat_g * flat_g)
        c = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1**c)
        nu_hat = nu / (1.0 - b2**c)
        direction = mu_hat / (jnp.sqrt(nu_hat) + eps)
        return unravel(direction), FlatTorchAdamState(count, mu, nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg) -> optax.GradientTransformation:
    """Direction-only transformation; caller applies params -= lr · update."""
    opt = cfg.optimizer
    if opt.name.lower() != "adam":
        raise ValueError(f"unsupported optimizer: {opt.name}")
    if opt.get("flat_update", False):
        return flat_torch_adam(opt.weight_decay or 0.0)
    transforms = []
    if opt.weight_decay:
        transforms.append(optax.add_decayed_weights(opt.weight_decay))
    transforms.append(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8, eps_root=0.0)
    )
    return optax.chain(*transforms)


def lr_for_epoch(cfg, epoch: int) -> float:
    """Learning rate used during 0-indexed ``epoch``.

    Replicates the reference LrDecayCallback's *end-of-epoch* update
    (lr_decay_callback.py:6-16): after epoch e completes and e ≥ start_epoch,
    lr is set to clip + ½(base−clip)(1+cos(π·(e−start)/(end−start))) — which
    takes effect from epoch e+1. So epoch E trains with the base lr for
    E ≤ start_epoch, and with the formula evaluated at e = E−1 afterwards.
    Inert at shipped defaults (start_epoch == max_epochs == 20, §2.1).
    """
    base = cfg.optimizer.lr
    start = cfg.lr_decay.start_epoch
    end = cfg.trainer.max_epochs
    if epoch <= start:
        return base
    clip = 1e-6
    progress = (epoch - 1 - start) / (end - start)
    return clip + 0.5 * (base - clip) * (1 + math.cos(math.pi * progress))
