"""Multi-process (multi-host) training smoke: 2 real processes, one global mesh.

The host-boundary contract (parallel/multiprocess.py; RUNBOOK
"Multi-process"): jax.distributed brings up a global mesh spanning both
processes (2 procs × 4 virtual CPU devices = 8 global), each process's
loader yields its stripe of the global batch
(BatchIterator process_index/process_count), shard_batch assembles global
arrays via make_array_from_process_local_data, and the train step's psum +
global-negative gathers ride the cross-process (Gloo on CPU) collectives.
Eval runs process-locally; process 0 owns checkpoints/logs.

The oracle is the SINGLE-process run: identical seeds + the striping
contract (union of process stripes == the single-process batch stream)
must reproduce the same losses and metrics to reduction-order tolerance.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(
    """
    import json, os, sys
    rank = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from tricolo_tpu.utils.compcache import compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", compilation_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from tricolo_tpu.config import load_config
    from tricolo_tpu.data import DataModule
    from tricolo_tpu.training.trainer import Trainer

    cfg = load_config([
        "data=synthetic",
        "model.voxel_encoder=VoxelCNNEncoder",
        "precision.compute_dtype=float32",
        "data.batch_size=8",
        "trainer.max_epochs=2",
        "trainer.check_val_every_n_epoch=2",
        "trainer.log_every_n_steps=1",
        "trainer.profiler=none",
        "logger.backend=jsonl",
        "checkpoint_monitor.save_top_k=1",
        "parallel.multiprocess=true",
        "parallel.coordinator_address=localhost:" + port,
        "experiment_name=mp_smoke",
        "project_root_path=" + outdir,
    ])
    # The coordinator triple must reach cfg.parallel before Trainer
    # initializes jax.distributed.
    cfg.parallel.num_processes = 2
    cfg.parallel.process_id = rank
    trainer = Trainer(cfg)
    assert jax.process_count() == 2 and len(jax.devices()) == 8
    dm = DataModule(cfg)
    state, manager = trainer.fit(dm)

    # Per-process record: the last train losses from this rank's metrics
    # stream are only on rank 0 (null logger elsewhere), so re-derive a
    # deterministic fingerprint both ranks can emit: a replicated scalar.
    fingerprint = float(
        sum(
            abs(jax.device_get(jax.tree.leaves(state.params)[i])).sum()
            for i in range(len(jax.tree.leaves(state.params)))
        )
    )
    with open(os.path.join(outdir, f"rank{{rank}}.json"), "w") as f:
        json.dump({{"rank": rank, "param_fp": fingerprint,
                    "step": int(jax.device_get(state.step))}}, f)
    print("WORKER_OK", rank, fingerprint, flush=True)
    """
)


@pytest.mark.slow
def test_two_process_fit_matches_single_process(tmp_path):
    """2-proc fit (striped loaders, cross-process collectives, process-local
    eval, proc-0 checkpointing) reproduces the single-process 8-device fit."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])

    outdir = str(tmp_path / "mp")
    os.makedirs(outdir)
    worker = _WORKER.format(repo=REPO)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker, str(rank), port, outdir],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=REPO,
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"

    results = {}
    for rank in range(2):
        with open(os.path.join(outdir, f"rank{rank}.json")) as f:
            results[rank] = json.load(f)
    # Both processes stepped the same replicated state.
    assert results[0]["step"] == results[1]["step"] > 0
    np.testing.assert_allclose(
        results[0]["param_fp"], results[1]["param_fp"], rtol=1e-6
    )

    # Process 0 owns the artifacts; process 1 must have written none.
    exp_dir = os.path.join(outdir, "output", "Synthetic", "mp_smoke", "training")
    metrics = os.path.join(exp_dir, "metrics.jsonl")
    assert os.path.isfile(metrics)
    ckpts = [f for f in os.listdir(exp_dir) if f.endswith(".ckpt")]
    assert ckpts, "process 0 must have checkpointed"

    # Single-process oracle: same config minus multiprocess on the
    # in-process 8-device mesh; identical seeds + striping contract =>
    # same parameter trajectory (f32, tolerance covers gloo-vs-local
    # reduction order).
    from tricolo_tpu.config import load_config
    from tricolo_tpu.data import DataModule
    from tricolo_tpu.training.trainer import Trainer

    cfg = load_config(
        [
            "data=synthetic",
            "model.voxel_encoder=VoxelCNNEncoder",
            "precision.compute_dtype=float32",
            "data.batch_size=8",
            "trainer.max_epochs=2",
            "trainer.check_val_every_n_epoch=2",
            "trainer.log_every_n_steps=1",
            "trainer.profiler=none",
            "logger.backend=jsonl",
            "checkpoint_monitor.save_top_k=0",
            "experiment_name=sp_oracle",
            f"project_root_path={tmp_path / 'sp'}",
        ]
    )
    trainer = Trainer(cfg)
    state, _ = trainer.fit(DataModule(cfg))
    import jax

    sp_fp = float(
        sum(abs(np.asarray(jax.device_get(p))).sum() for p in jax.tree.leaves(state.params))
    )
    np.testing.assert_allclose(results[0]["param_fp"], sp_fp, rtol=2e-5)
