"""Encoder contract tests: output shapes, normalization, pooling semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tricolo_tpu.models import (
    CLIPImageEncoder,
    CLIPTextEncoder,
    MVCNNEncoder,
    TriCoLoNet,
    VoxelCNNEncoder,
)


def test_voxel_encoder_shapes_and_norm():
    enc = VoxelCNNEncoder(voxel_size=32, out_dim=512)
    vox = jnp.asarray(np.random.default_rng(0).normal(size=(3, 32, 32, 32, 3)), jnp.float32)
    variables = enc.init(jax.random.key(0), vox)
    out = enc.apply(variables, vox)
    assert out.shape == (3, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-5)
    # Derived flatten width: (32/32)^3 * 512 = 512 (the reference hard-codes
    # 4096 and only supports 64^3, sparse_cnn.py:41 — we derive it).
    mlp_kernel = variables["params"]["MLPHead_0"]["TorchLinear_0"]["Dense_0"]["kernel"]
    assert mlp_kernel.shape[0] == 512


def test_voxel_encoder_64_matches_reference_flatten():
    enc = VoxelCNNEncoder(voxel_size=64, out_dim=512)
    vox = jnp.zeros((1, 64, 64, 64, 3), jnp.float32)
    variables = enc.init(jax.random.key(0), vox)
    mlp_kernel = variables["params"]["MLPHead_0"]["TorchLinear_0"]["Dense_0"]["kernel"]
    assert mlp_kernel.shape[0] == 4096  # 512 * 2^3 (sparse_cnn.py:41)


def test_mvcnn_view_max_pooling_is_permutation_invariant():
    enc = MVCNNEncoder(num_views=4, z_dim=64, out_dim=32, cnn_name="resnet18")
    rng = np.random.default_rng(1)
    imgs = rng.normal(size=(2, 4, 32, 32, 3)).astype(np.float32)
    variables = enc.init(jax.random.key(0), jnp.asarray(imgs))
    out1 = enc.apply(variables, jnp.asarray(imgs))
    out2 = enc.apply(variables, jnp.asarray(imgs[:, ::-1]))  # permute views
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out1), axis=1), 1.0, atol=1e-5)


def test_clip_heads_no_normalization():
    """CLIP heads return raw MLP output (clip_text.py:22, clip_img.py:25)."""
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(4, 768)).astype(np.float32))
    for cls in (CLIPTextEncoder, CLIPImageEncoder):
        enc = cls(out_dim=512)
        variables = enc.init(jax.random.key(0), feats)
        out = np.asarray(enc.apply(variables, feats))
        assert out.shape == (4, 512)
        norms = np.linalg.norm(out, axis=1)
        assert not np.allclose(norms, 1.0, atol=1e-3)


def test_clip_head_dropout_active_in_train():
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(4, 768)).astype(np.float32))
    enc = CLIPTextEncoder(out_dim=64, dropout=0.5)
    variables = enc.init(jax.random.key(0), feats)
    out_a = enc.apply(variables, feats, deterministic=False, rngs={"dropout": jax.random.key(1)})
    out_b = enc.apply(variables, feats, deterministic=False, rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))
    out_c = enc.apply(variables, feats, deterministic=True)
    out_d = enc.apply(variables, feats, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_d))


def test_tricolo_net_feature_keys_follow_config():
    from tricolo_tpu.config import load_config

    cfg = load_config(["data=synthetic", "model.voxel_encoder=SparseCNNEncoder"])
    net = TriCoLoNet.from_config(cfg)
    D = cfg.data.voxel_size
    batch = {
        "tokens": jnp.ones((2, 8), jnp.int32),
        "voxels": jnp.zeros((2, D, D, D, 3), jnp.float32),
    }
    variables = net.init(jax.random.key(0), batch)
    out = net.apply(variables, batch)
    assert list(out.keys()) == ["text_features", "voxel_features"]


def test_voxel_encoder_batchnorm_stats_update():
    enc = VoxelCNNEncoder(voxel_size=32, out_dim=32)
    vox = jnp.asarray(np.random.default_rng(4).normal(size=(2, 32, 32, 32, 3)), jnp.float32)
    variables = enc.init(jax.random.key(0), vox)
    _, mutated = enc.apply(variables, vox, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))
