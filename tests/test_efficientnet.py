"""EfficientNet backbone tests: scaling math, shapes, MVCNN integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tricolo_tpu.models.efficientnet import (
    EfficientNet,
    _round_filters,
    _round_repeats,
    efficientnet_feature_dim,
)
from tricolo_tpu.models.mvcnn import MVCNNEncoder


class TestScalingMath:
    def test_b0_filters_identity(self):
        for c in (32, 16, 24, 40, 80, 112, 192, 320, 1280):
            assert _round_filters(c, 1.0) == c

    def test_b3_reference_dims(self):
        # Known efficientnet-b3 channel plan (width 1.2).
        assert _round_filters(32, 1.2) == 40
        assert _round_filters(16, 1.2) == 24
        assert _round_filters(24, 1.2) == 32
        assert _round_filters(40, 1.2) == 48
        assert _round_filters(80, 1.2) == 96
        assert _round_filters(112, 1.2) == 136
        assert _round_filters(192, 1.2) == 232
        assert _round_filters(320, 1.2) == 384
        assert efficientnet_feature_dim("efficientnet_b3") == 1536
        assert efficientnet_feature_dim("efficientnet_b0") == 1280

    def test_b3_repeats(self):
        # depth 1.4: [1,2,2,3,3,4,1] -> [2,3,3,5,5,6,2]
        assert [_round_repeats(r, 1.4) for r in (1, 2, 2, 3, 3, 4, 1)] == [
            2, 3, 3, 5, 5, 6, 2,
        ]


class TestBackbone:
    @pytest.mark.parametrize("name,dim", [("efficientnet_b0", 1280)])
    def test_forward_shapes(self, name, dim):
        model = EfficientNet(cnn_name=name)
        x = jnp.ones((2, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (2, dim)
        assert np.isfinite(np.asarray(out)).all()

    def test_train_mode_stochastic_depth(self):
        model = EfficientNet(cnn_name="efficientnet_b0", drop_connect_rate=0.5)
        x = jnp.ones((4, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        out1, _ = model.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        out2, _ = model.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        # Different dropout keys → different residual draws.
        assert not np.allclose(np.asarray(out1), np.asarray(out2))


class TestMVCNNIntegration:
    def test_efficientnet_backbone_dispatch(self):
        enc = MVCNNEncoder(num_views=2, z_dim=512, out_dim=512, cnn_name="efficientnet_b0")
        x = jnp.ones((2, 2, 32, 32, 3))
        variables = enc.init(jax.random.PRNGKey(0), x)
        out = enc.apply(variables, x)
        assert out.shape == (2, 512)
        norms = np.linalg.norm(np.asarray(out), axis=-1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
        # The z-projection consumes the 1280-d pooled features.
        assert variables["params"]["fc"]["Dense_0"]["kernel"].shape == (1280, 512)

    def test_train_step_with_efficientnet(self):
        from tricolo_tpu.config import load_config
        from tricolo_tpu.data import DataModule
        from tricolo_tpu.data.device_prep import prepare_device_batch
        from tricolo_tpu.models.tricolo_net import TriCoLoNet
        from tricolo_tpu.parallel import make_mesh, replicated_sharding, shard_batch
        from tricolo_tpu.training import TrainState, make_optimizer, make_train_step

        cfg = load_config(
            [
                "data=synthetic",
                "model.image_encoder=MVCNNEncoder",
                "model.modules.MVCNNEncoder.cnn_name=efficientnet_b0",
            ]
        )
        cfg.precision.compute_dtype = "float32"
        dm = DataModule(cfg)
        dm.setup("fit")
        batch = next(iter(dm.train_loader()))
        mesh = make_mesh()
        model = TriCoLoNet.from_config(cfg)
        tx = make_optimizer(cfg)
        dev = prepare_device_batch(
            {k: jnp.asarray(v) for k, v in batch.items() if isinstance(v, np.ndarray)},
            cfg.data.voxel_size,
        )
        variables = model.init(jax.random.PRNGKey(0), dev)
        state = jax.device_put(TrainState.create(variables, tx), replicated_sharding(mesh))
        step = make_train_step(model, tx, cfg)
        state, losses = step(state, shard_batch(batch, mesh), 3.5e-4, jax.random.PRNGKey(0))
        assert np.isfinite(float(losses["train_loss/total_loss"]))
