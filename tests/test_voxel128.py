"""128³ voxel configuration (BASELINE.json C13/128³) + remat memory plan.

The reference packs voxel128 npz members (preprocess_all_data.py:94-101)
and GeneralDataset selects `voxel{size}` (general_dataset.py:44), but its
hard-coded Linear(4096) breaks at 128³ (sparse_cnn.py:41). Our derived MLP
width fixes that; these tests prove the configuration actually runs:
shapes, derived widths, and the rematerialized-backward equivalence that
makes the 16 GB-chip memory plan (batch 32 + precision.remat_voxel) exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tricolo_tpu.config import load_config
from tricolo_tpu.models.tricolo_net import TriCoLoNet


class TestRematEquivalence:
    def test_remat_voxel_grads_match(self):
        """precision.remat_voxel recomputes the voxel stack in backward;
        values and gradients must match the plain path exactly (same
        variable tree, so checkpoints interchange)."""
        cfg = load_config(["data=synthetic", "model.voxel_encoder=VoxelCNNEncoder"])
        cfg.precision.compute_dtype = "float32"
        plain = TriCoLoNet.from_config(cfg)
        cfg.precision.remat_voxel = True
        remat = TriCoLoNet.from_config(cfg)

        rng = np.random.default_rng(0)
        batch = {
            "tokens": jnp.asarray(rng.integers(1, 100, (2, 16)).astype(np.int32)),
            "voxels": jnp.asarray(rng.random((2, 32, 32, 32, 3)).astype(np.float32)),
        }
        va = plain.init(jax.random.PRNGKey(0), batch)
        vb = remat.init(jax.random.PRNGKey(0), batch)
        for a, b in zip(jax.tree.leaves(va), jax.tree.leaves(vb)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        def loss(variables, model):
            out, _ = model.apply(
                variables, batch, train=True, mutable=["batch_stats"]
            )
            return jnp.sum(out["voxel_features"] ** 2)

        ga = jax.grad(lambda v: loss(v, plain))(va)
        gb = jax.grad(lambda v: loss(v, remat))(vb)
        for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
            )


class TestVoxel128:
    def test_forward_and_derived_mlp_width(self):
        """Tri-modal forward at voxel_size=128 (batch 1, CPU): the MLP
        width derives to (128/32)³·512 = 32768 — the fix for the
        reference's 64³-only Linear (sparse_cnn.py:41)."""
        cfg = load_config(
            [
                "data=synthetic",
                "data.voxel_size=128",
                "model.voxel_encoder=VoxelCNNEncoder",
                "precision.remat_voxel=true",
            ]
        )
        cfg.precision.compute_dtype = "float32"
        model = TriCoLoNet.from_config(cfg)
        rng = np.random.default_rng(0)
        batch = {
            "tokens": jnp.asarray(rng.integers(1, 100, (1, 16)).astype(np.int32)),
            "voxels": jnp.zeros((1, 128, 128, 128, 3), jnp.float32),
        }
        variables = model.init(jax.random.PRNGKey(0), batch)
        kernel = variables["params"]["voxel_encoder"]["MLPHead_0"]["TorchLinear_0"][
            "Dense_0"
        ]["kernel"]
        assert kernel.shape[0] == (128 // 32) ** 3 * 512
        out = model.apply(variables, batch)
        assert out["voxel_features"].shape == (1, 512)
        norms = np.linalg.norm(np.asarray(out["voxel_features"]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)

    def test_dataset_voxel128_plumbing(self):
        """The synthetic pipeline carries 128³ packed voxels end to end
        (coords pack x|y|z into u32 bytes — 128 < 256 fits)."""
        from tricolo_tpu.data import collate
        from tricolo_tpu.data.datasets import build_dataset
        from tricolo_tpu.data.device_prep import prepare_device_batch

        cfg = load_config(
            ["data=synthetic", "data.voxel_size=128", "data.batch_size=2"]
        )
        ds = build_dataset(cfg, "train")
        items = [ds[0], ds[1]]
        batch = collate(items, ds.max_voxel_points, "packed", 128)
        dev = prepare_device_batch(
            {
                "tokens": jnp.asarray(batch["tokens"]),
                "voxel_flat": jnp.asarray(batch["voxel_flat"]),
                "voxel_rgb": jnp.asarray(batch["voxel_rgb"]),
            },
            128,
        )
        assert dev["voxels"].shape == (2, 128, 128, 128, 3)
        # occupied-site count survives the densify
        n_occ = int((np.asarray(dev["voxels"]).sum(axis=-1) > 0).sum())
        expect = sum(len(i["voxel_flat"]) for i in items)
        assert n_occ == expect


class TestVoxel128Mesh:
    """128³ mesh validation (round-4 verdict item 5): the second shipped
    recipe (C13/128³: windowed_compact + remat_voxel, batch 32 on a 16 GB
    chip) gets the same multi-chip correctness evidence as the 64³
    flagship — windowed on the 8-device mesh == the identical program on a
    1-device mesh (sharding semantics) == packed dense-masked (tile-sparse
    exactness), through loss + Adam update, in f32 at tiny batch."""

    def _cfg(self, transfer):
        # Bi(V) at tiny text/image shapes: the 128³ question is the VOXEL
        # path's mesh semantics; the image encoder and remat are validated
        # elsewhere (TestWindowedCompactMesh at 64³-class shapes,
        # TestRematEquivalence) and at 128³ each would multiply this
        # test's single-core CPU cost several-fold.
        return load_config(
            [
                "data=synthetic",
                "model.image_encoder=null",
                "model.voxel_encoder=VoxelCNNEncoder",
                "data.voxel_size=128",
                "data.batch_size=8",
                "data.num_models=8",
                f"data.voxel_transfer={transfer}",
                "precision.compute_dtype=float32",
            ]
        )

    def _batch(self, cfg):
        from tricolo_tpu.data import DataModule

        dm = DataModule(cfg)
        dm.setup("fit")
        return next(iter(dm.train_loader()))

    def _run_step(self, cfg, model, tx, batch, run_mesh, variables):
        from tricolo_tpu.parallel import replicated_sharding, shard_batch
        from tricolo_tpu.training import TrainState, make_train_step

        fresh = jax.tree.map(jnp.copy, variables)
        state = jax.device_put(
            TrainState.create(fresh, tx), replicated_sharding(run_mesh)
        )
        step = make_train_step(model, tx, cfg)
        state, losses = step(
            state, shard_batch(batch, run_mesh), 3.5e-4, jax.random.PRNGKey(0)
        )
        leaves = jax.tree.leaves(state.params)
        return float(losses["train_loss/total_loss"]), np.asarray(
            jax.device_get(leaves[0])
        )

    def test_windowed_128_matches_packed_and_one_device(self):
        from tricolo_tpu.data.device_prep import prepare_device_batch
        from tricolo_tpu.models.tricolo_net import TriCoLoNet
        from tricolo_tpu.parallel import make_mesh
        from tricolo_tpu.training import make_optimizer
        from tricolo_tpu.training.steps import _wants_voxel_mask

        cfg = self._cfg("windowed_compact")
        wc_batch = self._batch(cfg)
        packed_batch = self._batch(self._cfg("packed"))
        assert "voxel_rows" in wc_batch and wc_batch["voxel_rows"].shape[2] == 14**3
        model = TriCoLoNet.from_config(cfg)
        tx = make_optimizer(cfg)

        dev = prepare_device_batch(
            {
                k: jnp.asarray(v)
                for k, v in wc_batch.items()
                if isinstance(v, np.ndarray)
            },
            cfg.data.voxel_size,
            voxel_mask=_wants_voxel_mask(cfg),
        )
        variables = model.init(jax.random.key(0), dev)

        mesh = make_mesh(8)
        loss_mesh, p_mesh = self._run_step(cfg, model, tx, wc_batch, mesh, variables)
        loss_1dev, p_1dev = self._run_step(
            cfg, model, tx, wc_batch, make_mesh(1), variables
        )
        loss_packed, p_packed = self._run_step(
            cfg, model, tx, packed_batch, mesh, variables
        )
        assert loss_mesh == pytest.approx(loss_1dev, rel=1e-5)
        np.testing.assert_allclose(p_mesh, p_1dev, rtol=1e-4, atol=1e-6)
        assert loss_mesh == pytest.approx(loss_packed, rel=1e-4)
        np.testing.assert_allclose(p_mesh, p_packed, rtol=1e-3, atol=1e-5)
