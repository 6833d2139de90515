"""TriCoLoNet composition semantics: modality sets, loss assembly, eval rule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tricolo_tpu.config import load_config
from tricolo_tpu.losses import make_loss_fn, pairwise_losses
from tricolo_tpu.models.tricolo_net import TriCoLoNet
from tricolo_tpu.training.steps import shape_embedding_sum


def forward(cfg, batch_shapes):
    model = TriCoLoNet.from_config(cfg)
    rng = np.random.default_rng(0)
    batch = {}
    for key, shape in batch_shapes.items():
        if key == "tokens":
            batch[key] = jnp.asarray(rng.integers(1, 50, shape).astype(np.int32))
        else:
            batch[key] = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), batch)
    return model.apply(variables, batch)


class TestModalityComposition:
    def test_trimodal_pairwise_losses(self):
        cfg = load_config(["data=synthetic"])
        cfg.precision.compute_dtype = "float32"
        output = {
            "text_features": jnp.asarray(np.random.default_rng(0).standard_normal((4, 8), np.float32)),
            "image_features": jnp.asarray(np.random.default_rng(1).standard_normal((4, 8), np.float32)),
            "voxel_features": jnp.asarray(np.random.default_rng(2).standard_normal((4, 8), np.float32)),
        }
        loss_dict = pairwise_losses(make_loss_fn(cfg), output, "train_loss")
        # Three pairs in insertion order + total (reference tricolo_net.py:56-65).
        assert set(loss_dict) == {
            "train_loss/text_image_loss",
            "train_loss/text_voxel_loss",
            "train_loss/image_voxel_loss",
            "train_loss/total_loss",
        }
        total = sum(v for k, v in loss_dict.items() if k != "train_loss/total_loss")
        assert float(loss_dict["train_loss/total_loss"]) == pytest.approx(float(total))

    def test_bimodal_single_pair(self):
        cfg = load_config(["data=synthetic"])
        output = {
            "text_features": jnp.ones((4, 8)),
            "voxel_features": jnp.ones((4, 8)),
        }
        loss_dict = pairwise_losses(make_loss_fn(cfg), output, "val_loss")
        assert set(loss_dict) == {"val_loss/text_voxel_loss", "val_loss/total_loss"}

    def test_unknown_encoder_raises(self):
        cfg = load_config(["data=synthetic", "model.image_encoder=Bogus"])
        cfg.precision.compute_dtype = "float32"
        with pytest.raises(ValueError, match="unknown image encoder"):
            forward(
                cfg,
                {"tokens": (2, 16), "images": (2, 2, 32, 32, 3)},
            )

    def test_sparse_cnn_alias(self):
        cfg = load_config(["data=synthetic", "model.voxel_encoder=SparseCNNEncoder"])
        cfg.precision.compute_dtype = "float32"
        out = forward(cfg, {"tokens": (2, 16), "voxels": (2, 32, 32, 32, 3)})
        assert "voxel_features" in out


class TestShapeEmbeddingSum:
    """Eval shape embedding = unnormalized image+voxel sum, zeros template
    from text (reference tricolo_net.py:135-139 quirk)."""

    def test_sum_both_modalities(self):
        rng = np.random.default_rng(0)
        out = {
            "text_features": jnp.asarray(rng.standard_normal((3, 8), np.float32)),
            "image_features": jnp.asarray(rng.standard_normal((3, 8), np.float32)),
            "voxel_features": jnp.asarray(rng.standard_normal((3, 8), np.float32)),
        }
        got = np.asarray(shape_embedding_sum(out))
        expect = np.asarray(out["image_features"]) + np.asarray(out["voxel_features"])
        np.testing.assert_allclose(got, expect, rtol=1e-6)
        # Deliberately NOT normalized.
        assert not np.allclose(np.linalg.norm(got, axis=1), 1.0)

    def test_text_only_gives_zeros(self):
        out = {"text_features": jnp.ones((2, 4))}
        np.testing.assert_array_equal(np.asarray(shape_embedding_sum(out)), 0.0)
