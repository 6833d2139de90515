"""Training-layer tests: optimizer parity, LR schedule, steps, checkpoints."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tricolo_tpu.config import load_config
from tricolo_tpu.training import (
    CheckpointManager,
    TrainState,
    load_checkpoint,
    lr_for_epoch,
    make_eval_step,
    make_optimizer,
    make_train_step,
    save_checkpoint,
)
from tricolo_tpu.training.checkpoint import prune_disabled_encoders


def bi_v_cfg(extra=()):
    cfg = load_config(["data=synthetic", *extra])
    cfg.model.voxel_encoder = "VoxelCNNEncoder"
    cfg.precision.compute_dtype = "float32"
    return cfg


class TestAdamParity:
    def test_matches_torch_adam_with_weight_decay(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        w0 = rng.standard_normal((4, 3)).astype(np.float32)
        lr, wd = 3.5e-4, 1e-2  # large wd to make coupling visible

        t_param = torch.nn.Parameter(torch.tensor(w0.copy()))
        opt = torch.optim.Adam([t_param], lr=lr, weight_decay=wd)

        cfg = load_config(["optimizer.weight_decay=0.01"])
        tx = make_optimizer(cfg)
        params = {"w": jnp.asarray(w0)}
        opt_state = tx.init(params)

        for step in range(5):
            g = rng.standard_normal((4, 3)).astype(np.float32)
            opt.zero_grad()
            t_param.grad = torch.tensor(g.copy())
            opt.step()

            updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
            params = jax.tree.map(lambda p, u: p - lr * u, params, updates)

            np.testing.assert_allclose(
                np.asarray(params["w"]), t_param.detach().numpy(), rtol=1e-5, atol=1e-7
            )


class TestFlatAdam:
    def _tree(self, rng):
        return {
            "a": {"w": rng.standard_normal((8, 4)).astype(np.float32)},
            "b": rng.standard_normal((16,)).astype(np.float32),
            "c": {"k": rng.standard_normal((2, 3, 5)).astype(np.float32)},
        }

    def test_flat_matches_per_leaf_chain(self):
        """optimizer.flat_update=true must produce identical updates and
        moments to the per-leaf optax chain — same math, fewer kernels."""
        rng = np.random.default_rng(1)
        params = jax.tree.map(jnp.asarray, self._tree(rng))
        cfg_flat = load_config(
            ["optimizer.weight_decay=0.01", "optimizer.flat_update=true"]
        )
        cfg_leaf = load_config(
            ["optimizer.weight_decay=0.01", "optimizer.flat_update=false"]
        )
        tx_f, tx_l = make_optimizer(cfg_flat), make_optimizer(cfg_leaf)
        s_f, s_l = tx_f.init(params), tx_l.init(params)
        for _ in range(4):
            grads = jax.tree.map(jnp.asarray, self._tree(rng))
            u_f, s_f = tx_f.update(grads, s_f, params)
            u_l, s_l = tx_l.update(grads, s_l, params)
            for a, b in zip(jax.tree.leaves(u_f), jax.tree.leaves(u_l)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
                )
            params = jax.tree.map(lambda p, u: p - 3e-4 * u, params, u_f)

    def test_opt_state_format_migration_roundtrip(self):
        """A checkpointed per-leaf opt state restores under a flat
        optimizer and vice versa (optimizer.flat_update flips)."""
        from flax import serialization
        from jax.flatten_util import ravel_pytree

        from tricolo_tpu.training.checkpoint import adapt_opt_state_format

        rng = np.random.default_rng(2)
        params = jax.tree.map(jnp.asarray, self._tree(rng))
        tx_f = make_optimizer(load_config(["optimizer.flat_update=true"]))
        tx_l = make_optimizer(load_config(["optimizer.flat_update=false"]))
        s_f, s_l = tx_f.init(params), tx_l.init(params)
        grads = jax.tree.map(jnp.asarray, self._tree(rng))
        _, s_f = tx_f.update(grads, s_f, params)
        _, s_l = tx_l.update(grads, s_l, params)

        # per-leaf checkpoint → flat optimizer
        raw = serialization.to_state_dict(s_l)
        adapted = adapt_opt_state_format(raw, params, tx_f.init(params))
        restored = serialization.from_state_dict(tx_f.init(params), adapted)
        np.testing.assert_allclose(
            np.asarray(restored.mu), np.asarray(s_f.mu), rtol=1e-6, atol=0
        )
        np.testing.assert_allclose(
            np.asarray(restored.nu), np.asarray(s_f.nu), rtol=1e-6, atol=0
        )
        assert int(restored.count) == 1

        # flat checkpoint → per-leaf optimizer
        raw_f = serialization.to_state_dict(s_f)
        adapted_l = adapt_opt_state_format(raw_f, params, tx_l.init(params))
        restored_l = serialization.from_state_dict(tx_l.init(params), adapted_l)
        flat_mu, _ = ravel_pytree(restored_l[-1].mu)
        np.testing.assert_allclose(
            np.asarray(flat_mu), np.asarray(s_f.mu), rtol=1e-6, atol=0
        )

        # same-layout state dicts pass through untouched
        assert adapt_opt_state_format(raw_f, params, tx_f.init(params)) is raw_f


class TestLrSchedule:
    def test_inert_at_defaults(self):
        cfg = load_config([])
        for epoch in range(cfg.trainer.max_epochs):
            assert lr_for_epoch(cfg, epoch) == cfg.optimizer.lr

    def test_cosine_decay_when_enabled(self):
        import math

        cfg = load_config(["lr_decay.start_epoch=10", "trainer.max_epochs=20"])
        base = cfg.optimizer.lr
        # Epochs 0..10 run at base (callback fires at END of epoch 10 first).
        for epoch in range(11):
            assert lr_for_epoch(cfg, epoch) == base
        # Epoch 11 uses the end-of-epoch-10 value: progress 0 → still base.
        assert lr_for_epoch(cfg, 11) == pytest.approx(1e-6 + 0.5 * (base - 1e-6) * 2)
        # Monotone decreasing afterwards, approaching the clip.
        lrs = [lr_for_epoch(cfg, e) for e in range(11, 21)]
        assert all(a >= b for a, b in zip(lrs, lrs[1:]))
        expect_last = 1e-6 + 0.5 * (base - 1e-6) * (1 + math.cos(math.pi * 9 / 10))
        assert lrs[-1] == pytest.approx(expect_last)


@pytest.fixture(scope="module")
def tiny_setup():
    from tricolo_tpu.data import DataModule
    from tricolo_tpu.parallel import make_mesh, replicated_sharding, shard_batch
    from tricolo_tpu.models.tricolo_net import TriCoLoNet
    from tricolo_tpu.data.device_prep import prepare_device_batch

    cfg = bi_v_cfg()
    dm = DataModule(cfg)
    dm.setup("fit")
    loader = dm.train_loader()
    batch = next(iter(loader))
    # Single-device mesh: the tests on this fixture assert step/checkpoint
    # semantics, not sharding (test_parallel owns that). The 8-virtual-
    # device XLA:CPU mesh costs ~2-4x wall clock per step on small hosts
    # (collective rendezvous across device threads).
    mesh = make_mesh(1)
    model = TriCoLoNet.from_config(cfg)
    tx = make_optimizer(cfg)
    dev_batch = prepare_device_batch(
        {k: jnp.asarray(v) for k, v in batch.items() if isinstance(v, np.ndarray)},
        cfg.data.voxel_size,
    )
    variables = model.init(jax.random.key(0), dev_batch)
    state = jax.device_put(
        TrainState.create(variables, tx), replicated_sharding(mesh)
    )
    return cfg, model, tx, mesh, state, batch


class TestTrainStep:
    def test_loss_decreases(self, tiny_setup):
        from tricolo_tpu.parallel import shard_batch

        cfg, model, tx, mesh, state, batch = tiny_setup
        step = make_train_step(model, tx, cfg)
        sharded = shard_batch(batch, mesh)
        rng = jax.random.PRNGKey(0)
        # The step donates its input state; work on a copy so the
        # module-scoped fixture state survives for later tests.
        state = jax.tree.map(jnp.copy, state)
        first = None
        # 6 repeated steps on one batch are plenty to drive the NT-Xent
        # loss down (12 steps cost ~8 min of XLA:CPU execution per cold
        # run for the same assertion).
        for _ in range(6):
            state, losses = step(state, sharded, 3e-3, rng)
            if first is None:
                first = float(losses["train_loss/total_loss"])
        last = float(losses["train_loss/total_loss"])
        assert last < first

    def test_eval_step_outputs(self, tiny_setup):
        from tricolo_tpu.parallel import shard_batch

        cfg, model, tx, mesh, state, batch = tiny_setup
        estep = make_eval_step(model, cfg)
        output, losses = estep(state, shard_batch(batch, mesh))
        assert set(output) == {"text_features", "voxel_features"}
        assert "val_loss/total_loss" in losses
        norms = np.linalg.norm(np.asarray(output["text_features"]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


class TestCheckpoint:
    def test_roundtrip(self, tiny_setup, tmp_path):
        cfg, model, tx, mesh, state, batch = tiny_setup
        path = str(tmp_path / "ck.ckpt")
        save_checkpoint(path, state, epoch=3, extra={"metrics": {"x": 1.0}})
        raw = load_checkpoint(path)
        assert int(raw["epoch"]) == 3
        leaves_a = jax.tree.leaves(state.params)
        leaves_b = jax.tree.leaves(raw["params"])
        assert len(leaves_a) == len(leaves_b)
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_top_k_retention(self, tiny_setup, tmp_path):
        cfg, model, tx, mesh, state, batch = tiny_setup
        mgr = CheckpointManager(str(tmp_path), monitor="m", save_top_k=2)
        scores = [(0, 1.0), (1, 3.0), (2, 2.0), (3, 0.5), (4, 5.0)]
        for epoch, score in scores:
            mgr.save(state, epoch, {"m": score})
        kept = sorted(f for f in os.listdir(tmp_path) if f.endswith(".ckpt"))
        assert kept == ["epoch=1.ckpt", "epoch=4.ckpt"]
        assert mgr.best_path.endswith("epoch=4.ckpt")

    def test_save_last(self, tiny_setup, tmp_path):
        """save_last=True maintains last.ckpt outside the top-k set
        (Lightning ModelCheckpoint save_last, reference config.yaml:42)."""
        cfg, model, tx, mesh, state, batch = tiny_setup
        mgr = CheckpointManager(
            str(tmp_path), monitor="m", save_top_k=1, save_last=True
        )
        mgr.save(state, 0, {"m": 5.0})
        # Worse score: rejected from top-k but last.ckpt still refreshed.
        mgr.save(state, 1, {"m": 1.0})
        kept = sorted(f for f in os.listdir(tmp_path) if f.endswith(".ckpt"))
        assert kept == ["epoch=0.ckpt", "last.ckpt"]
        raw = load_checkpoint(str(tmp_path / "last.ckpt"))
        assert int(raw["epoch"]) == 1
        # save_top_k=0 disables top-k saving but not last.
        mgr0 = CheckpointManager(
            str(tmp_path / "only_last"), monitor="m", save_top_k=0, save_last=True
        )
        assert mgr0.save(state, 2, {"m": 9.0}) is None
        assert os.listdir(tmp_path / "only_last") == ["last.ckpt"]

    def test_migrate_legacy_voxel_kernel(self):
        """A legacy (3,3,3,3,C) block-0 voxel kernel (pre Cin-pad) is
        zero-padded to (3,3,3,4,C) in params and optimizer moments."""
        from tricolo_tpu.training.checkpoint import migrate_legacy_voxel_kernel

        kernel = np.random.default_rng(0).normal(size=(3, 3, 3, 3, 8)).astype(
            np.float32
        )
        raw = {
            "params": {
                "voxel_encoder": {"ConvBlock_0": {"Conv_0": {"kernel": kernel.copy()}}}
            },
            "opt_state": {
                "0": {
                    "mu": {
                        "voxel_encoder": {
                            "ConvBlock_0": {"Conv_0": {"kernel": kernel.copy()}}
                        }
                    }
                }
            },
        }
        out = migrate_legacy_voxel_kernel(raw)
        new = out["params"]["voxel_encoder"]["ConvBlock_0"]["Conv_0"]["kernel"]
        assert new.shape == (3, 3, 3, 4, 8)
        np.testing.assert_array_equal(new[..., :3, :], kernel)
        np.testing.assert_array_equal(new[..., 3, :], 0.0)
        mu = out["opt_state"]["0"]["mu"]["voxel_encoder"]["ConvBlock_0"]["Conv_0"][
            "kernel"
        ]
        assert mu.shape == (3, 3, 3, 4, 8)
        # Already-padded checkpoints pass through untouched.
        again = migrate_legacy_voxel_kernel(out)
        assert (
            again["params"]["voxel_encoder"]["ConvBlock_0"]["Conv_0"]["kernel"].shape
            == (3, 3, 3, 4, 8)
        )

    def test_prune_disabled_encoders(self, tiny_setup):
        cfg, model, tx, mesh, state, batch = tiny_setup
        params = {"text_encoder": {}, "voxel_encoder": {}, "image_encoder": {}}
        cfg2 = load_config(["data=synthetic"])  # no image/voxel encoders
        pruned = prune_disabled_encoders(params, cfg2)
        assert set(pruned) == {"text_encoder"}
        cfg3 = bi_v_cfg()
        pruned3 = prune_disabled_encoders(params, cfg3)
        assert set(pruned3) == {"text_encoder", "voxel_encoder"}


class TestTrainerEndToEnd:
    """Full fit/test cycles on tiny synthetic configs (CPU mesh)."""

    def _fit_cfg(self, tmp_path, extra=()):
        cfg = load_config(
            [
                "data=synthetic",
                "trainer.max_epochs=2",
                "trainer.check_val_every_n_epoch=1",
                "trainer.log_every_n_steps=1",
                "trainer.profiler=none",
                f"project_root_path={tmp_path}",
                "experiment_name=t",
                *extra,
            ]
        )
        return cfg

    def test_clip_variant_fit_resume_and_test(self, tmp_path):
        """CLIP-head model (cheap MLPs): fit → resume → test artifacts.

        Covers dropout rngs, models without batch_stats, checkpoint resume
        (reference ckpt_name path, train.py:40-45) and the test pipeline."""
        from tricolo_tpu.data import DataModule
        from tricolo_tpu.training.trainer import Trainer

        cfg = self._fit_cfg(
            tmp_path,
            (
                "model.text_encoder=CLIPTextEncoder",
                "model.image_encoder=CLIPImageEncoder",
                # Async writer under a real fit: epoch-0's save drains in the
                # background while epoch-1's donating train steps run — the
                # device-side snapshot must keep the write donation-safe.
                "checkpoint_monitor.async_save=true",
            ),
        )
        trainer = Trainer(cfg)
        state, manager = trainer.fit(DataModule(cfg))
        assert manager.best_path and os.path.exists(manager.best_path)
        metrics_file = os.path.join(cfg.logger.save_dir, "metrics.jsonl")
        assert os.path.getsize(metrics_file) > 0

        # Resume for one more epoch from the last checkpoint.
        cfg2 = self._fit_cfg(
            tmp_path,
            (
                "model.text_encoder=CLIPTextEncoder",
                "model.image_encoder=CLIPImageEncoder",
                "trainer.max_epochs=3",
            ),
        )
        trainer2 = Trainer(cfg2)
        state2, manager2 = trainer2.fit(DataModule(cfg2), resume_ckpt=manager.best_path)
        assert int(np.asarray(state2.step)) > int(np.asarray(state.step))

        # Test path: prints metrics, saves output.p.
        import json as _json

        dm = DataModule(cfg2)
        result = trainer2.test(dm, manager2.best_path or manager.best_path)
        assert result is not None
        out_p = os.path.join(cfg2.inference.output_dir, "output.p")
        assert os.path.exists(out_p)

    def test_device_eval_flag_matches_numpy(self, tmp_path):
        from tricolo_tpu.data import DataModule
        from tricolo_tpu.training.trainer import Trainer

        cfg = self._fit_cfg(
            tmp_path,
            ("model.text_encoder=CLIPTextEncoder", "model.image_encoder=CLIPImageEncoder"),
        )
        trainer = Trainer(cfg)
        dm = DataModule(cfg)
        dm.setup("fit")
        state = trainer.init_state(next(iter(dm.train_loader())))
        emb, _ = trainer.collect_embeddings(state, dm.val_loader())
        numpy_metrics = trainer._run_retrieval_eval(emb, nearest_path=None)
        cfg.inference.device_eval = True
        device_metrics = trainer._run_retrieval_eval(emb, nearest_path=None)
        assert device_metrics.mrr == pytest.approx(numpy_metrics.mrr, rel=1e-5)
        np.testing.assert_allclose(
            device_metrics.recall_rate, numpy_metrics.recall_rate, rtol=1e-6
        )


class TestPretrainedGraft:
    def test_backbone_weights_grafted_into_state(self, tmp_path):
        """Converted torchvision weights must land in the init state
        (reference pretrained=True path, mv_cnn.py:44-45)."""
        torch = pytest.importorskip("torch")
        from tricolo_tpu.data import DataModule
        from tricolo_tpu.models.resnet import (
            ResNet,
            convert_torchvision_state_dict,
            save_pretrained,
        )
        from tricolo_tpu.training.trainer import Trainer

        # Build a random torch-layout state_dict via our flax ResNet shapes:
        # simplest is to init the flax model, convert a synthetic torch
        # state_dict, and check the values arrive bit-exact.
        rng = np.random.default_rng(0)
        sd = {}
        def conv_entry(name, shape_oihw):
            sd[f"{name}.weight"] = rng.standard_normal(shape_oihw).astype(np.float32)
        def bn_entry(name, c):
            sd[f"{name}.weight"] = rng.standard_normal(c).astype(np.float32)
            sd[f"{name}.bias"] = rng.standard_normal(c).astype(np.float32)
            sd[f"{name}.running_mean"] = rng.standard_normal(c).astype(np.float32)
            sd[f"{name}.running_var"] = rng.random(c).astype(np.float32) + 0.5
        conv_entry("conv1", (64, 3, 7, 7)); bn_entry("bn1", 64)
        sizes = [(64, 2), (128, 2), (256, 2), (512, 2)]
        in_c = 64
        for stage, (c, blocks) in enumerate(sizes):
            for blk in range(blocks):
                pre = f"layer{stage+1}.{blk}"
                first_in = in_c if blk == 0 else c
                conv_entry(f"{pre}.conv1.weight"[:-7], (c, first_in, 3, 3))
                bn_entry(f"{pre}.bn1", c)
                conv_entry(f"{pre}.conv2.weight"[:-7], (c, c, 3, 3))
                bn_entry(f"{pre}.bn2", c)
                if blk == 0 and stage > 0:
                    conv_entry(f"{pre}.downsample.0.weight"[:-7], (c, in_c, 1, 1))
                    bn_entry(f"{pre}.downsample.1", c)
            in_c = c
        params, stats = convert_torchvision_state_dict(sd, "resnet18")
        path = str(tmp_path / "rn18.npz")
        save_pretrained(path, params, stats)

        cfg = load_config(
            [
                "data=synthetic",
                "model.image_encoder=MVCNNEncoder",
                f"model.modules.MVCNNEncoder.pretrained_path={path}",
                f"project_root_path={tmp_path}",
                "experiment_name=t",
            ]
        )
        trainer = Trainer(cfg)
        dm = DataModule(cfg)
        dm.setup("fit")
        state = trainer.init_state(next(iter(dm.train_loader())))
        got = np.asarray(
            state.params["image_encoder"]["backbone"]["conv1"]["kernel"]
        )
        expect = sd["conv1.weight"].transpose(2, 3, 1, 0)
        np.testing.assert_allclose(got, expect, rtol=1e-6)
        got_stat = np.asarray(
            state.batch_stats["image_encoder"]["backbone"]["bn1"]["mean"]
        )
        np.testing.assert_allclose(got_stat, sd["bn1.running_mean"], rtol=1e-6)


class TestResumeFidelity:
    def test_interrupted_plus_resume_equals_straight_run(self, tmp_path):
        """Checkpoint/resume must be lossless: train 2 epochs straight vs
        1 epoch + resume for 1 more — final params, opt state, BN stats
        and step counter must match exactly (f32, no dropout — the only
        intentionally unresumed state is the dropout stream).

        Pins the full checkpoint payload (params/opt_state/batch_stats/
        step/epoch), the seeded per-epoch shuffle, and the lr schedule
        under resume — the machinery auto_resume relies on. (The 2-vs-1+1
        schedule exercises the same machinery as the original 4-vs-2+2 at
        half the ~17 min cold XLA:CPU cost.)"""
        from tricolo_tpu.data import DataModule
        from tricolo_tpu.training.trainer import Trainer

        def cfg_for(name, epochs):
            return load_config(
                [
                    "data=synthetic",
                    "model.voxel_encoder=VoxelCNNEncoder",
                    "precision.compute_dtype=float32",
                    f"trainer.max_epochs={epochs}",
                    "trainer.check_val_every_n_epoch=2",
                    "trainer.log_every_n_steps=1",
                    "trainer.profiler=none",
                    "checkpoint_monitor.save_top_k=-1",
                    "checkpoint_monitor.every_n_epochs=1",
                    # Resume losslessness is mesh-independent (test_parallel
                    # owns sharding); the 1-device mesh halves-or-better the
                    # XLA:CPU wall clock of these three full fits.
                    "parallel.data_parallel=1",
                    f"project_root_path={tmp_path}",
                    f"experiment_name={name}",
                ]
            )

        cfg_a = cfg_for("straight", 2)
        state_a, _ = Trainer(cfg_a).fit(DataModule(cfg_a))

        cfg_b1 = cfg_for("resumed", 1)
        Trainer(cfg_b1).fit(DataModule(cfg_b1))
        ckpt = os.path.join(
            cfg_b1.experiment_output_path, "training", "epoch=0.ckpt"
        )
        assert os.path.exists(ckpt)
        cfg_b2 = cfg_for("resumed", 2)
        state_b, _ = Trainer(cfg_b2).fit(DataModule(cfg_b2), resume_ckpt=ckpt)

        assert int(np.asarray(state_a.step)) == int(np.asarray(state_b.step))
        for tree_a, tree_b, name in (
            (state_a.params, state_b.params, "params"),
            (state_a.batch_stats, state_b.batch_stats, "batch_stats"),
            (state_a.opt_state, state_b.opt_state, "opt_state"),
        ):
            leaves_a = jax.tree.leaves(tree_a)
            leaves_b = jax.tree.leaves(tree_b)
            assert len(leaves_a) == len(leaves_b)
            for la, lb in zip(leaves_a, leaves_b):
                np.testing.assert_array_equal(
                    np.asarray(la), np.asarray(lb), err_msg=name
                )


class TestCheckpointEdgeCases:
    def test_save_top_k_zero_disables(self, tiny_setup, tmp_path):
        cfg, model, tx, mesh, state, batch = tiny_setup
        mgr = CheckpointManager(str(tmp_path), monitor="m", save_top_k=0)
        assert mgr.save(state, 0, {"m": 1.0}) is None
        assert not [f for f in os.listdir(tmp_path) if f.endswith(".ckpt")]

    def test_save_top_k_minus_one_keeps_all_and_best(self, tiny_setup, tmp_path):
        cfg, model, tx, mesh, state, batch = tiny_setup
        mgr = CheckpointManager(str(tmp_path), monitor="m", save_top_k=-1)
        for epoch, score in ((0, 1.0), (1, 5.0), (2, 3.0)):
            mgr.save(state, epoch, {"m": score})
        kept = sorted(f for f in os.listdir(tmp_path) if f.endswith(".ckpt"))
        assert kept == ["epoch=0.ckpt", "epoch=1.ckpt", "epoch=2.ckpt"]
        assert mgr.best_path.endswith("epoch=1.ckpt")

    def test_latest_checkpoint_picks_newest_epoch(self, tiny_setup, tmp_path):
        from tricolo_tpu.training.checkpoint import latest_checkpoint

        assert latest_checkpoint(str(tmp_path)) is None
        assert latest_checkpoint(str(tmp_path / "missing")) is None
        cfg, model, tx, mesh, state, batch = tiny_setup
        mgr = CheckpointManager(str(tmp_path), monitor="m", save_top_k=-1)
        for epoch, score in ((0, 1.0), (2, 5.0), (10, 3.0)):
            mgr.save(state, epoch, {"m": score})
        (tmp_path / "epoch=bogus.ckpt").write_text("x")  # ignored
        assert latest_checkpoint(str(tmp_path)).endswith("epoch=10.ckpt")


class TestCheckpointCadence:
    def test_every_n_epochs_decoupled_from_val_cadence(self, tmp_path):
        """checkpoint_monitor.every_n_epochs must gate saving independently
        of check_val_every_n_epoch (reference config.yaml:44 — Lightning
        saves when (epoch+1) % N == 0 and the monitored metric is fresh)."""
        import glob

        from tricolo_tpu.config import load_config
        from tricolo_tpu.data import DataModule
        from tricolo_tpu.training.trainer import Trainer

        cfg = load_config(
            [
                "data=synthetic",
                "model.text_encoder=CLIPTextEncoder",
                "model.image_encoder=CLIPImageEncoder",
                "trainer.max_epochs=4",
                "trainer.check_val_every_n_epoch=1",
                "trainer.log_every_n_steps=1",
                "trainer.profiler=none",
                "checkpoint_monitor.every_n_epochs=4",
                f"project_root_path={tmp_path}",
                "experiment_name=cadence",
            ]
        )
        trainer = Trainer(cfg)
        _, manager = trainer.fit(DataModule(cfg))
        saved = sorted(
            os.path.basename(p)
            for p in glob.glob(os.path.join(cfg.checkpoint_monitor.dirpath, "*.ckpt"))
        )
        # Validation ran at epochs 0-3, but only epoch 3 satisfies
        # (epoch+1) % 4 == 0 (the final-epoch fallback coincides with it).
        assert saved == ["epoch=3.ckpt"], saved
