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
