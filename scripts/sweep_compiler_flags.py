"""Sweep XLA TPU compiler options on the full flagship train step.

The axon terminal forwards client-set proto-backed `xla_*` options to the
remote TPU compile, so `jax.jit(compiler_options=...)` is a live tuning
surface (this is how `precision.scoped_vmem_kib` was found: 16→64 MiB
scoped VMEM = 87.2→84.4 ms/step, PERF.md). Each option set is a fresh
compile (~3-10 min through the tunnel).

Usage:
    python scripts/sweep_compiler_flags.py                # baseline only
    python scripts/sweep_compiler_flags.py '{"xla_tpu_rwb_fusion":"false"}' ...
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def measure(extra_options: dict, iters: int = 30) -> float:
    """ms/step of the flagship train step under the given XLA options
    (always on top of the shipped scoped-VMEM default)."""
    import tricolo_tpu.training.steps as steps

    # Scope the override to exactly the step programs (patching jax.jit
    # process-wide would inject the options into every unrelated jit).
    orig_opts = steps._compiler_options
    steps._compiler_options = lambda cfg: {
        "xla_tpu_scoped_vmem_limit_kib": "65536",
        **extra_options,
    }
    try:
        from __graft_entry__ import _flagship_cfg, _host_batch
        from tricolo_tpu.data.device_prep import densify_on_host, prepare_device_batch
        from tricolo_tpu.models.tricolo_net import TriCoLoNet
        from tricolo_tpu.training import TrainState, make_optimizer

        cfg = _flagship_cfg()
        cfg.data.batch_size = 128
        model = TriCoLoNet.from_config(cfg)
        tx = make_optimizer(cfg)
        train_step = steps.make_train_step(model, tx, cfg)
        hosts = []
        for s in range(2):
            h = dict(_host_batch(cfg, n_points=8192, seed=s))
            h["voxel_grid"] = densify_on_host(
                h.pop("voxel_flat"), h.pop("voxel_rgb"), cfg.data.voxel_size
            )
            hosts.append({k: jnp.asarray(v) for k, v in h.items()})
        db = prepare_device_batch(hosts[0], cfg.data.voxel_size, jnp.bfloat16)
        variables = orig_jit(model.init)(jax.random.PRNGKey(0), db)
        state = TrainState.create(variables, tx)
        rng = jax.random.PRNGKey(0)
        lr = cfg.optimizer.lr
        for i in range(5):
            state, losses = train_step(state, hosts[i % 2], lr, rng)
        float(losses["train_loss/total_loss"])
        tic = time.perf_counter()
        for i in range(iters):
            state, losses = train_step(state, hosts[i % 2], lr, rng)
        float(losses["train_loss/total_loss"])
        return (time.perf_counter() - tic) / iters * 1000
    finally:
        steps._compiler_options = orig_opts


def main():
    option_sets = [json.loads(a) for a in sys.argv[1:]] or [{}]
    for extra in option_sets:
        ms = measure(extra)
        label = json.dumps(extra) if extra else "baseline (+vmem 64MiB)"
        print(f"{label}: {ms:.2f} ms/step -> {128 / ms * 1000:.0f} pairs/s", flush=True)


if __name__ == "__main__":
    main()
