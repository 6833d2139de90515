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

import optax


def make_optimizer(cfg) -> optax.GradientTransformation:
    """Direction-only transformation; caller applies params -= lr · update."""
    opt = cfg.optimizer
    if opt.name.lower() != "adam":
        raise ValueError(f"unsupported optimizer: {opt.name}")
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
