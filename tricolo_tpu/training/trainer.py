"""Host-side training orchestration (the reference's Lightning-Trainer role).

fit(): epoch loop over the compiled train step, validation every
``check_val_every_n_epoch`` epochs with retrieval metrics, top-k
checkpointing by val RR@5, reference LR schedule, seeded determinism, and a
"simple"-profiler wall-clock summary (reference config.yaml:30-47,
train.py:10-49).

test(): checkpoint load with disabled-encoder pruning, full-split embedding
collection, metric printout, ``output.p`` pickle + ``nearest.jsonl``
artifacts (reference test.py:10-36, tricolo_net.py:99-122).
"""

from __future__ import annotations

import os
import pickle
import time
from collections import defaultdict

import jax
import numpy as np

from ..data.loader import DataModule
from ..models.tricolo_net import TriCoLoNet
from ..parallel import make_mesh, shard_batch
from ..evaluation import compute_metrics, compute_metrics_on_device, write_nearest_info
from .checkpoint import (
    AsyncCheckpointWriter,
    CheckpointManager,
    adapt_opt_state_format,
    load_checkpoint,
    migrate_legacy_voxel_kernel,
    prune_disabled_encoders,
)
from .logger import MetricsLogger
from .optim import lr_for_epoch, make_optimizer
from .state import TrainState
from .steps import make_eval_step, make_train_step, shape_embedding_sum


class _NullLogger:
    """Metrics sink for non-zero processes: same interface, no artifacts
    (a per-process scratch save_dir keeps incidental writes collision-free
    when processes share a filesystem)."""

    def __init__(self):
        import tempfile

        self.save_dir = tempfile.mkdtemp(prefix=f"tricolo_proc{jax.process_index()}_")

    def log(self, *args, **kwargs):
        pass

    def close(self):
        pass


class _NullManager:
    """Checkpoint sink for non-zero processes (process 0 owns the files)."""

    writer = None
    best = None

    def save(self, *args, **kwargs):
        pass

    def wait(self):
        pass


class Trainer:
    def __init__(self, cfg, use_explicit_collectives: bool | None = None):
        self.cfg = cfg
        # Multi-process (multi-host) runtime: bring up jax.distributed
        # BEFORE the mesh so jax.devices() spans every process
        # (parallel/multiprocess.py; RUNBOOK "Multi-process"). Training
        # then runs on the global mesh; eval and checkpointing stay
        # process-local (params replicated ⇒ every process holds them).
        from ..parallel import maybe_initialize

        maybe_initialize(cfg)
        if jax.process_count() > 1 and cfg.parallel.param_sharding != "replicated":
            raise ValueError(
                "parallel.multiprocess currently requires "
                "parallel.param_sharding=replicated (process-local eval and "
                "process-0 checkpointing read full replicas)"
            )
        self.mesh = make_mesh(cfg.parallel.data_parallel)
        self.model = TriCoLoNet.from_config(cfg)
        self.tx = make_optimizer(cfg)

        if use_explicit_collectives is None:
            use_explicit_collectives = cfg.parallel.get("explicit_collectives", False)
        pair_loss = None
        if cfg.loss.name == "NTXentLoss":
            params = cfg.loss.NTXentLoss
            if not cfg.parallel.get("global_negatives", True):
                from ..parallel.collectives import make_local_nt_xent

                pair_loss = make_local_nt_xent(
                    self.mesh, params.temperature, params.alpha_weight
                )
            elif use_explicit_collectives:
                from ..parallel.collectives import make_global_nt_xent

                pair_loss = make_global_nt_xent(
                    self.mesh, params.temperature, params.alpha_weight
                )
        self.train_step = make_train_step(self.model, self.tx, cfg, pair_loss)
        self.eval_step = make_eval_step(self.model, cfg)
        self.rng = jax.random.PRNGKey(cfg.train_seed)
        self._timers: dict[str, float] = defaultdict(float)

    # -- state ------------------------------------------------------------

    def init_state(self, sample_batch: dict) -> TrainState:
        """Initialize parameters from a sample batch's shapes.

        When ``model.modules.MVCNNEncoder.pretrained_path`` is set, the
        converted torchvision backbone weights (models/resnet.py
        save_pretrained format) are grafted over the random init —
        ImageNet pretraining matters for the reference's retrieval parity
        (reference mv_cnn.py:44-45 loads pretrained=True)."""
        from ..data.device_prep import prepare_device_batch

        from .steps import _wants_voxel_mask

        device_batch = prepare_device_batch(
            {k: v for k, v in sample_batch.items() if isinstance(v, np.ndarray)},
            self.cfg.data.voxel_size,
            voxel_mask=_wants_voxel_mask(self.cfg),
        )
        self._check_tile_budget(sample_batch)
        init_rng, self.rng = jax.random.split(self.rng)
        variables = jax.jit(self.model.init, static_argnames=("train",))(
            init_rng, device_batch, train=False
        )
        variables = self._graft_pretrained_backbone(variables)
        state = TrainState.create(variables, self.tx)
        return self._place_state(state)

    def _check_tile_budget(self, sample_batch: dict) -> None:
        """Warn when the tile-sparse budget looks too small for the data.

        The sparse path silently drops highest-index tiles past the static
        budget (ops/tile_sparse.py); one real batch's exact tile count is
        a cheap canary for a budget that will truncate."""
        voxel_cfg = self.cfg.model.modules.VoxelCNNEncoder
        # The budget truncates on every path that consumes it: the dense
        # tile_sparse plan AND the windowed transfers (whose encoder runs
        # tile-sparse regardless of the tile_sparse flag). windowed_compact
        # is handled in the loader — tile_budget=auto makes truncation
        # impossible and an explicit over-tight budget hard-fails per batch
        # (data.tile_overflow) — so the canary covers the remaining
        # device-side cases (its batches carry no voxel_rows key and fall
        # through the chain below).
        windowed = str(self.cfg.data.get("voxel_transfer", "packed")).startswith(
            "windowed"
        )
        if not voxel_cfg.get("masked_bn", False):
            return
        if not (voxel_cfg.get("tile_sparse", False) or windowed):
            return
        voxel_size = self.cfg.data.voxel_size
        tg3 = (voxel_size // 8) ** 3
        if "voxel_tile_occ" in sample_batch:
            need = int(np.asarray(sample_batch["voxel_tile_occ"]).sum())
            batch = sample_batch["voxel_tile_occ"].shape[0] // tg3
        elif "voxel_flat" in sample_batch:
            from ..ops.tile_sparse import host_tile_count

            batch = len(sample_batch["voxel_flat"])
            need = host_tile_count(sample_batch["voxel_flat"], voxel_size)
        elif "voxel_grid" in sample_batch:
            # dense transfer + tile_sparse: the device extracts active
            # tiles from the grid with the same nonzero rule.
            grid = np.asarray(sample_batch["voxel_grid"])
            batch = grid.shape[0]
            tg = voxel_size // 8
            tiled = grid.reshape(batch, tg, 8, tg, 8, tg, 8)
            need = int(np.any(tiled != 0, axis=(2, 4, 6)).sum())
        else:
            return
        from ..ops.tile_sparse import tile_budget

        frac = float(voxel_cfg.get("tile_budget_frac", 0.5))
        budget = tile_budget(frac, batch, tg3)
        if need > budget:
            import warnings

            warnings.warn(
                f"tile_sparse budget {budget} (tile_budget_frac={frac}) is "
                f"smaller than the {need} active tiles in the first batch — "
                "highest-index tiles will be dropped. Raise "
                "model.modules.VoxelCNNEncoder.tile_budget_frac.",
                stacklevel=2,
            )

    def _place_state(self, state):
        from ..parallel import shard_state

        return shard_state(
            state, self.mesh, self.cfg.parallel.get("param_sharding", "replicated")
        )

    def _graft_pretrained_backbone(self, variables: dict) -> dict:
        pretrained = self.cfg.model.modules.MVCNNEncoder.get("pretrained_path")
        if not pretrained or self.cfg.model.image_encoder != "MVCNNEncoder":
            return variables
        from flax.core import unfreeze

        from ..models.resnet import load_pretrained

        params, stats = load_pretrained(pretrained)
        variables = jax.tree_util.tree_map(lambda x: x, unfreeze(dict(variables)))
        target_params = variables["params"]["image_encoder"]["backbone"]
        target_stats = variables.get("batch_stats", {}).get("image_encoder", {}).get(
            "backbone", {}
        )

        def graft(dst: dict, src: dict, where: str):
            for key, value in src.items():
                if key not in dst:
                    raise KeyError(f"pretrained {where} key {key!r} not in model")
                if isinstance(value, dict):
                    graft(dst[key], value, f"{where}/{key}")
                else:
                    if dst[key].shape != value.shape:
                        raise ValueError(
                            f"pretrained {where}/{key} shape {value.shape} != "
                            f"model {dst[key].shape}"
                        )
                    dst[key] = value.astype(dst[key].dtype)

        graft(target_params, params, "params")
        graft(target_stats, stats, "batch_stats")
        return variables

    def load_state(self, ckpt_path: str, for_inference: bool = False):
        """Restore state (and epoch) from a checkpoint file."""
        raw = migrate_legacy_voxel_kernel(load_checkpoint(ckpt_path))
        params = raw["params"]
        if for_inference:
            params = prune_disabled_encoders(params, self.cfg)
        state = TrainState(
            step=np.asarray(raw["step"]),
            params=params,
            batch_stats=raw["batch_stats"],
            # Inference never touches the optimizer — skip allocating the
            # two f32 Adam moment trees (~2x parameter memory).
            opt_state={} if for_inference else None,
        )
        if not for_inference:
            # Restore optimizer moments with proper structure; checkpoints
            # written under the other optimizer.flat_update setting are
            # converted (same numbers, different pytree layout).
            template = self.tx.init(params)
            from flax import serialization

            raw_opt = adapt_opt_state_format(raw["opt_state"], params, template)
            opt_state = serialization.from_state_dict(template, raw_opt)
            state = state.replace(opt_state=opt_state)
        state = self._place_state(state)
        return state, int(raw["epoch"])

    # -- fit --------------------------------------------------------------

    def fit(self, data_module: DataModule, resume_ckpt: str | None = None):
        cfg = self.cfg
        np.random.seed(cfg.train_seed)
        tic = time.perf_counter()
        data_module.setup("fit")  # whole-split RAM load (reference parity)
        self._timers["data_load"] += time.perf_counter() - tic
        train_loader = data_module.train_loader()
        val_loader = data_module.val_loader()

        # Only process 0 owns on-disk artifacts (metrics JSONL, nearest
        # info, checkpoints); other processes run the identical loop with
        # null sinks so control flow and RNG streams stay in lockstep.
        is_main = jax.process_index() == 0
        logger = MetricsLogger(cfg) if is_main else _NullLogger()
        ckpt_dir = cfg.checkpoint_monitor.dirpath
        # async_save=true moves the device→host transfer + serialization +
        # file writes onto an ordered worker thread (AsyncCheckpointWriter):
        # the epoch loop only pays a device-side state copy (donation-safe)
        # and continues training while the ~8 s/save D2H (PERF.md
        # "Checkpoint D2H") drains in the background. fit() flushes the
        # writer before returning, so on-disk results are identical.
        writer = (
            AsyncCheckpointWriter()
            if bool(cfg.checkpoint_monitor.get("async_save", False)) and is_main
            else None
        )
        manager = (
            CheckpointManager(
                ckpt_dir,
                monitor=cfg.checkpoint_monitor.monitor,
                mode=cfg.checkpoint_monitor.mode,
                save_top_k=cfg.checkpoint_monitor.save_top_k,
                save_last=bool(cfg.checkpoint_monitor.get("save_last", False)),
                writer=writer,
            )
            if is_main
            else _NullManager()
        )

        if resume_ckpt is not None:
            state, last_epoch = self.load_state(resume_ckpt)
            start_epoch = last_epoch + 1
        else:
            state = self.init_state(train_loader.peek())
            start_epoch = 0

        dropout_rng, self.rng = jax.random.split(self.rng)
        log_every = cfg.trainer.log_every_n_steps
        val_every = cfg.trainer.check_val_every_n_epoch
        global_step = int(np.asarray(state.step))

        from ..utils import profile_trace

        with profile_trace(
            cfg.trainer.profiler == "xplane",
            os.path.join(logger.save_dir, "xplane"),
        ):
            state = self._fit_epochs(
                state, cfg, train_loader, val_loader, logger, manager,
                start_epoch, dropout_rng, log_every, val_every, global_step,
            )

        tic = time.perf_counter()
        manager.wait()  # flush async checkpoint writes before handing off
        if writer is not None:
            writer.close()
            manager.writer = None  # later caller-side saves run synchronously
        self._timers["checkpoint"] += time.perf_counter() - tic

        if cfg.trainer.profiler == "simple":
            total = sum(self._timers.values()) or 1.0
            print("\nProfiler (simple) — wall clock by phase:")
            for phase, seconds in sorted(self._timers.items(), key=lambda kv: -kv[1]):
                print(f"  {phase:<12} {seconds:8.2f}s  {100 * seconds / total:5.1f}%")
        logger.close()
        return state, manager

    def _fit_epochs(
        self, state, cfg, train_loader, val_loader, logger, manager,
        start_epoch, dropout_rng, log_every, val_every, global_step,
    ):
        for epoch in range(start_epoch, cfg.trainer.max_epochs):
            lr = lr_for_epoch(cfg, epoch)
            train_loader.set_epoch(epoch)
            tic = time.perf_counter()
            for batch in train_loader:
                device_batch = shard_batch(batch, self.mesh)
                state, loss_dict = self.train_step(state, device_batch, lr, dropout_rng)
                global_step += 1
                if global_step % log_every == 0:
                    logger.log(
                        {**{k: float(v) for k, v in loss_dict.items()}, "lr": lr},
                        global_step,
                        epoch,
                    )
            self._timers["train"] += time.perf_counter() - tic

            if (epoch + 1) % val_every == 0 or epoch == cfg.trainer.max_epochs - 1:
                tic = time.perf_counter()
                embeddings_dict, val_losses = self.collect_embeddings(
                    state, val_loader, with_loss=True
                )
                metrics = self._run_retrieval_eval(
                    embeddings_dict,
                    nearest_path=os.path.join(logger.save_dir, "nearest.jsonl"),
                )
                summary = metrics.summary("val_eval/")
                logger.log({**summary, **val_losses}, global_step, epoch)
                if jax.process_index() == 0:
                    print(
                        f"epoch {epoch}: "
                        + " ".join(
                            f"{k.split('/')[-1]}={v:.2f}" for k, v in summary.items()
                        )
                    )
                self._timers["validate"] += time.perf_counter() - tic

                # Checkpoint cadence is its own knob (reference
                # config.yaml:44 every_n_epochs). Like Lightning's
                # ModelCheckpoint-on-validation-end, saving is gated on the
                # monitored metric being fresh, so a cadence more frequent
                # than check_val_every_n_epoch degenerates to the val
                # cadence; a sparser one skips fresh-val epochs. 0/null
                # falls back to the val cadence rather than crashing.
                ckpt_every = (
                    self.cfg.checkpoint_monitor.get("every_n_epochs", None)
                    or val_every
                )
                if (epoch + 1) % ckpt_every == 0 or epoch == cfg.trainer.max_epochs - 1:
                    tic = time.perf_counter()
                    manager.save(state, epoch, {**summary, **val_losses})
                    self._timers["checkpoint"] += time.perf_counter() - tic

        return state

    # -- evaluation -------------------------------------------------------

    def collect_embeddings(self, state, loader, with_loss: bool = False):
        """Run the eval step over a loader; build the caption-tuple dict
        (reference validation/test steps + _collate_output,
        tricolo_net.py:73-158). Padded tail rows are dropped via num_valid.

        Val losses average over *full* batches only: a padded tail batch's
        duplicated rows would act as maximal false negatives in the
        contrastive loss and bias the logged value (the reference feeds the
        ragged tail instead — documented divergence; retrieval metrics are
        unaffected since padded rows never enter the embedding set)."""
        tuples = []
        loss_totals: dict[str, float] = defaultdict(float)
        n_loss_batches = 0
        batch_size = loader.batch_size
        mesh = self.mesh
        if any(d.process_index != jax.process_index() for d in mesh.devices.flat):
            # Multi-process fit: eval runs PROCESS-LOCALLY — every host
            # holds the full val split (whole-split RAM load) and params
            # are replicated, so each process evaluates the whole split on
            # its own devices with no cross-host traffic; process 0 logs.
            # Re-place the (fully-replicated ⇒ host-readable) state onto a
            # local-device mesh so the eval jit sees one device set.
            from jax.sharding import Mesh

            from ..parallel import replicated_sharding

            mesh = Mesh(
                np.asarray(jax.local_devices()), self.mesh.axis_names
            )
            state = jax.device_put(
                jax.tree.map(lambda x: np.asarray(x), state),
                replicated_sharding(mesh),
            )
        for batch in loader:
            device_batch = shard_batch(batch, mesh)
            output, loss_dict = self.eval_step(state, device_batch)
            n_valid = batch["num_valid"]
            text = np.asarray(output["text_features"])[:n_valid]
            shape = np.asarray(shape_embedding_sum(output))[:n_valid]
            for i in range(n_valid):
                tuples.append(
                    (None, batch["category"][i], batch["model_id"][i], text[i], shape[i])
                )
            if with_loss and n_valid == batch_size:
                n_loss_batches += 1
                for key, value in loss_dict.items():
                    loss_totals[key] += float(value)
        losses = {k: v / max(n_loss_batches, 1) for k, v in loss_totals.items()}
        return {"caption_embedding_tuples": tuples}, losses

    def _run_retrieval_eval(
        self, embeddings_dict, nearest_path: str | None, print_results: bool = False
    ):
        """Dispatch to the NumPy oracle pipeline or the jit device twin."""
        if not self.cfg.inference.get("device_eval", False):
            return compute_metrics(
                embeddings_dict, nearest_path=nearest_path, print_results=print_results
            )
        metrics, top_k, top_sims, label_to_model_id = compute_metrics_on_device(
            embeddings_dict
        )
        if nearest_path:
            write_nearest_info(
                embeddings_dict["caption_embedding_tuples"],
                top_k,
                top_sims,
                label_to_model_id,
                path=nearest_path,
            )
        if print_results:
            metrics.print_results()
        return metrics

    def test(self, data_module: DataModule, ckpt_path: str):
        """Reference test path: load → embed split → metrics → artifacts."""
        cfg = self.cfg
        np.random.seed(cfg.test_seed)
        data_module.setup("test")
        loader = data_module.test_loader()
        state, _ = self.load_state(ckpt_path, for_inference=True)

        embeddings_dict, _ = self.collect_embeddings(state, loader)
        metrics = None
        if cfg.inference.evaluate:
            # nearest.jsonl lands in CWD exactly as upstream does
            # (eval_retrieval.py:292).
            metrics = self._run_retrieval_eval(
                embeddings_dict, nearest_path="nearest.jsonl", print_results=True
            )
        if cfg.inference.save_predictions:
            os.makedirs(cfg.inference.output_dir, exist_ok=True)
            out_path = os.path.join(cfg.inference.output_dir, "output.p")
            with open(out_path, "wb") as f:
                pickle.dump(embeddings_dict, f)
            print(f"\nPredictions saved at {out_path}")
        return metrics
