"""Loss numerics against oracles lifted from the reference's formulas.

NT-Xent oracle: torch implementation of nt_xent.py:15-74 (log_softmax soft
cross-entropy with identity targets, α-weighted bidirectional sum).
Triplet oracle: literal O(B²) double loop of triplet.py:103-125.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tricolo_tpu.losses import nt_xent_loss, pairwise_losses, triplet_loss
from tricolo_tpu.losses.triplet import pairwise_distances


def _numpy_nt_xent(zis, zjs, temperature, alpha):
    def normalize(x):
        return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)

    def soft_xent(target, logits):
        logits = logits - logits.max(axis=1, keepdims=True)
        logprobs = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
        return -(target * logprobs).sum() / logits.shape[0]

    zis, zjs = normalize(zis), normalize(zjs)
    labels = np.eye(zis.shape[0])
    loss_a = soft_xent(labels, zis @ zjs.T / temperature)
    loss_b = soft_xent(labels, zjs @ zis.T / temperature)
    return alpha * loss_a + (1 - alpha) * loss_b


@pytest.mark.parametrize("temperature,alpha", [(0.1, 0.25), (0.5, 0.5)])
def test_nt_xent_matches_oracle(temperature, alpha):
    rng = np.random.default_rng(0)
    zis = rng.normal(size=(16, 32)).astype(np.float32)
    zjs = rng.normal(size=(16, 32)).astype(np.float32)
    expected = _numpy_nt_xent(zis, zjs, temperature, alpha)
    actual = float(nt_xent_loss(jnp.asarray(zis), jnp.asarray(zjs), temperature, alpha))
    assert actual == pytest.approx(expected, rel=1e-5)


def test_nt_xent_matches_torch_reference_formula():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    zis = rng.normal(size=(8, 16)).astype(np.float32)
    zjs = rng.normal(size=(8, 16)).astype(np.float32)
    temperature, alpha = 0.1, 0.25

    tis = F.normalize(torch.from_numpy(zis), p=2, dim=1)
    tjs = F.normalize(torch.from_numpy(zjs), p=2, dim=1)
    labels = torch.eye(8)

    def soft_xent(target, logits):
        return -(target * F.log_softmax(logits, dim=1)).sum() / logits.shape[0]

    logits_ab = tis @ tjs.T / temperature
    logits_ba = tjs @ tis.T / temperature
    expected = alpha * soft_xent(labels, logits_ab) + (1 - alpha) * soft_xent(labels, logits_ba)

    actual = float(nt_xent_loss(jnp.asarray(zis), jnp.asarray(zjs), temperature, alpha))
    assert actual == pytest.approx(float(expected), rel=1e-5)


def test_nt_xent_perfect_alignment_low_loss():
    rng = np.random.default_rng(1)
    z = rng.normal(size=(32, 64)).astype(np.float32)
    aligned = float(nt_xent_loss(jnp.asarray(z), jnp.asarray(z)))
    shuffled = float(nt_xent_loss(jnp.asarray(z), jnp.asarray(np.roll(z, 5, axis=0))))
    assert aligned < shuffled


def _loop_triplet(zis, zls, margin):
    """Literal reference double loop (triplet.py:103-125)."""
    dot = zls @ zis.T
    a_sq = np.sum(zls * zls, axis=1)
    b_sq = np.sum(zis * zis, axis=1)
    d = a_sq[None, :] - 2 * dot + b_sq[:, None]
    d = np.maximum(d, 0)
    mask = (d == 0).astype(np.float64)
    d = (1 - mask) * np.sqrt(d + mask * 1e-16)

    batch = d.shape[0]
    losses = []
    for i in range(batch):
        for j in range(batch):
            if i == j:
                continue
            if d[i][i] < d[i][j] < d[i][i] + margin:
                losses.append(d[i][i] - d[i][j] + margin)
    if not losses:
        for i in range(batch):
            for j in range(batch):
                if i != j and d[i][j] < d[i][i]:
                    losses.append(d[i][i] - d[i][j] + margin)
    return sum(losses) / len(losses) if losses else 0.0


@pytest.mark.parametrize("margin", [0.025, 0.5])
def test_triplet_matches_loop_oracle(margin):
    rng = np.random.default_rng(2)
    zis = rng.normal(size=(10, 8)).astype(np.float32)
    zls = rng.normal(size=(10, 8)).astype(np.float32)
    zis /= np.linalg.norm(zis, axis=1, keepdims=True)
    zls /= np.linalg.norm(zls, axis=1, keepdims=True)
    expected = _loop_triplet(zis, zls, margin)
    actual = float(triplet_loss(jnp.asarray(zis), jnp.asarray(zls), margin))
    assert actual == pytest.approx(expected, rel=1e-5, abs=1e-7)


def test_triplet_jits():
    rng = np.random.default_rng(4)
    z = rng.normal(size=(6, 4)).astype(np.float32)
    fn = jax.jit(triplet_loss)
    assert np.isfinite(float(fn(jnp.asarray(z), jnp.asarray(np.roll(z, 1, 0)))))


def test_pairwise_losses_combination_rule():
    """Sum over all modality pairs in insertion order (tricolo_net.py:56-65)."""
    rng = np.random.default_rng(5)
    feats = {
        key: jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
        for key in ("text_features", "image_features", "voxel_features")
    }
    loss_dict = pairwise_losses(lambda a, b: nt_xent_loss(a, b), feats, "train_loss")
    assert set(loss_dict) == {
        "train_loss/text_image_loss",
        "train_loss/text_voxel_loss",
        "train_loss/image_voxel_loss",
        "train_loss/total_loss",
    }
    total = (
        loss_dict["train_loss/text_image_loss"]
        + loss_dict["train_loss/text_voxel_loss"]
        + loss_dict["train_loss/image_voxel_loss"]
    )
    assert float(loss_dict["train_loss/total_loss"]) == pytest.approx(float(total), rel=1e-6)


def test_pairwise_losses_bimodal():
    rng = np.random.default_rng(6)
    feats = {
        key: jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
        for key in ("text_features", "voxel_features")
    }
    loss_dict = pairwise_losses(lambda a, b: nt_xent_loss(a, b), feats, "val_loss")
    assert set(loss_dict) == {"val_loss/text_voxel_loss", "val_loss/total_loss"}
