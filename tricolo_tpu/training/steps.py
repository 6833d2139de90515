"""Compiled train / eval steps.

One jitted function per phase. Inputs arrive batch-sharded over the mesh
(parallel.shard_batch); parameters are replicated. XLA therefore computes:

* encoder forward/backward data-parallel,
* BatchNorm statistics over the **global** batch (the tensors are logically
  global under pjit — matching the reference's single-device BN at global
  batch == reference batch),
* NT-Xent logits over the global batch (global negatives — the all-gather is
  inserted automatically by XLA; parallel.collectives holds the explicit
  shard_map twin, tested equivalent),
* gradient psum across chips.

The loss assembly matches reference tricolo_net.py:56-65 (sum of pairwise
contrastive losses over present modalities); the optimizer update applies
params ← params − lr·adam_direction with torch-Adam semantics (optim.py).
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..data.device_prep import prepare_device_batch
from ..losses import make_loss_fn, pairwise_losses


def _compute_dtype(cfg):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        cfg.precision.compute_dtype
    ]


def _wants_voxel_mask(cfg) -> bool:
    """Masked (submanifold-faithful) BN needs the alpha>0 occupancy channel
    carried through densification (device_prep bit-24 flag)."""
    return bool(cfg.model.modules.VoxelCNNEncoder.get("masked_bn", False))


def _compiler_options(cfg) -> dict | None:
    """TPU-only XLA overrides for the step programs.

    The scoped-VMEM budget is re-tuned per program generation (PERF.md):
    64 MiB won on the round-2/3 dense program (87.2 → 84.4 ms/step on
    v5e); 32 MiB wins on the round-4 per-sample windowed flagship
    (2508-2525 vs 2451-2476 pairs/s) and is the config default. TPU-only
    — the flag does not exist on the CPU backend the tests run on.
    """
    kib = cfg.precision.get("scoped_vmem_kib", 32768)
    if jax.default_backend() != "tpu":
        return None
    opts = {"xla_tpu_scoped_vmem_limit_kib": str(int(kib))} if kib else {}
    # Tuning surface for flag sweeps (scripts/sweep_step_flags.py): a JSON
    # object of extra XLA compiler options merged over the defaults. Env
    # rather than config so a sweep never mutates the shipped program
    # definition; production recipes promote winners into explicit
    # defaults here.
    extra = os.environ.get("TRICOLO_XLA_OPTS")
    if extra:
        opts.update({str(k): str(v) for k, v in json.loads(extra).items()})
    return opts or None


def make_train_step(model, tx, cfg, pair_loss: Callable | None = None):
    """Build the jitted train step: (state, batch, lr, rng) → (state, metrics).

    ``pair_loss`` overrides the configured loss (used to swap in the
    explicit-collective shard_map NT-Xent; default is the pjit-automatic
    global-batch loss).
    """
    voxel_size = cfg.data.voxel_size
    dtype = _compute_dtype(cfg)
    voxel_mask = _wants_voxel_mask(cfg)
    loss_pair = pair_loss or make_loss_fn(cfg)

    def loss_fn(params, batch_stats, batch, rng):
        device_batch = prepare_device_batch(batch, voxel_size, dtype, voxel_mask)
        variables = {"params": params, "batch_stats": batch_stats}
        output, mutated = model.apply(
            variables,
            device_batch,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        loss_dict = pairwise_losses(loss_pair, output, "train_loss")
        # Models without BatchNorm (CLIP-head variants) have no batch_stats
        # collection to mutate.
        new_stats = mutated.get("batch_stats", {})
        return loss_dict["train_loss/total_loss"], (loss_dict, new_stats)

    @partial(jax.jit, donate_argnums=(0,), compiler_options=_compiler_options(cfg))
    def train_step(state, batch, lr, rng):
        rng = jax.random.fold_in(rng, state.step)
        grads, (loss_dict, new_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(
            lambda p, u: (p - lr * u).astype(p.dtype), state.params, updates
        )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, loss_dict

    return train_step


def make_eval_step(model, cfg, with_loss: bool = True):
    """Build the jitted eval step: (state, batch) → (features, loss_dict).

    Runs the forward with running BN statistics and no dropout; returns the
    raw modality features (float32) for host-side embedding collection
    (reference validation_step/test_step, tricolo_net.py:73-110) and, when
    ``with_loss``, the val losses the reference logs per step.
    """
    voxel_size = cfg.data.voxel_size
    dtype = _compute_dtype(cfg)
    voxel_mask = _wants_voxel_mask(cfg)
    loss_pair = make_loss_fn(cfg)

    @partial(jax.jit, compiler_options=_compiler_options(cfg))
    def eval_step(state, batch):
        device_batch = prepare_device_batch(batch, voxel_size, dtype, voxel_mask)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        output = model.apply(variables, device_batch, train=False)
        output = {k: v.astype(jnp.float32) for k, v in output.items()}
        loss_dict = (
            pairwise_losses(loss_pair, output, "val_loss") if with_loss else {}
        )
        return output, loss_dict

    return eval_step


def shape_embedding_sum(output: dict) -> jax.Array:
    """Eval-time shape embedding = image + voxel features, unnormalized sum
    over whichever are present, zeros template from the text features
    (reference tricolo_net.py:135-139 — deliberate quirk, replicated)."""
    shape = jnp.zeros_like(output["text_features"])
    if "image_features" in output:
        shape = shape + output["image_features"]
    if "voxel_features" in output:
        shape = shape + output["voxel_features"]
    return shape
