"""Training entry point.

Invocation parity with the reference (README.md:98-107, train.py:10-49):

    python train.py data=text2shape_chair_table experiment_name=tri \\
        model.image_encoder=MVCNNEncoder model.voxel_encoder=SparseCNNEncoder

Any config key is overridable with ``a.b=v`` (``+a.b=v`` to add new keys).
Resume with ``ckpt_name=<file>`` (looked up under the experiment's training
dir). TPU-specific extras: ``+platform=cpu`` forces the CPU backend with a
virtual 8-device mesh (fast compiles; used by tests/smoke runs).
"""

from __future__ import annotations

import os
import sys


def _apply_platform_override(cfg):
    """Force a JAX platform before first backend use (sitecustomize already
    imported jax, so env-var-only switching is too late — see
    tests/conftest.py for the same dance)."""
    platform = cfg.get("platform", None)
    if platform:
        if platform == "cpu" and "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
            n = cfg.parallel.data_parallel
            count = n if isinstance(n, int) else 8
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={count}"
            ).strip()
        if platform == "cpu" and "xla_cpu_collective_call_terminate_timeout_seconds" not in os.environ.get("XLA_FLAGS", ""):
            # XLA:CPU collectives abort after a hard 40 s rendezvous
            # timeout; virtual devices serialize on few-core hosts and
            # legitimately skew past it (see tests/conftest.py).
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
                + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
            ).strip()
        import jax

        jax.config.update("jax_platforms", platform)
        if platform == "cpu":
            # Persist XLA:CPU compiles (namespaced by host CPU features —
            # utils/compcache.py) so repeated CPU smoke runs and the
            # full-chain CLI test's subprocesses skip the multi-minute
            # 3D-conv compiles. CPU-backend-only: a warm-cache rerun with
            # the cache configured hung the tunneled TPU runtime for 25
            # minutes (PERF.md round 3), so the default backend stays
            # uncached until that interaction is understood.
            from tricolo_tpu.utils.compcache import compilation_cache_dir

            jax.config.update("jax_compilation_cache_dir", compilation_cache_dir())
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def main(argv: list[str] | None = None):
    from tricolo_tpu.config import load_config

    cfg = load_config(argv if argv is not None else sys.argv[1:])
    _apply_platform_override(cfg)

    # Reference guard (train.py:21-23): CLIP image encoder needs 224² inputs.
    if cfg.model.image_encoder == "CLIPImageEncoder" and cfg.data.image_size != 224:
        print("Error: Please set data.image_size to 224 when using CLIPImageEncoder.")
        raise SystemExit(0)

    if cfg.experiment_name is None:
        cfg.experiment_name = "default"
        from tricolo_tpu.config import resolve_interpolations

        resolve_interpolations(cfg)

    os.makedirs(cfg.experiment_output_path, exist_ok=True)

    from tricolo_tpu.data import DataModule
    from tricolo_tpu.training import Trainer

    ckpt_path = None
    if cfg.ckpt_name is not None:
        ckpt_path = os.path.join(cfg.experiment_output_path, "training", cfg.ckpt_name)
        assert os.path.exists(ckpt_path), "Error: Checkpoint path does not exists."
    elif cfg.get("auto_resume", False):
        # Preemption recovery beyond the reference's manual ckpt_name: pick
        # the newest surviving checkpoint (or start fresh when none exist),
        # so re-running the identical command always makes progress.
        from tricolo_tpu.training.checkpoint import latest_checkpoint

        ckpt_path = latest_checkpoint(
            os.path.join(cfg.experiment_output_path, "training")
        )
        if ckpt_path:
            print(f"auto_resume: resuming from {ckpt_path}")

    trainer = Trainer(cfg)
    data_module = DataModule(cfg)
    trainer.fit(data_module, resume_ckpt=ckpt_path)


if __name__ == "__main__":
    main()
