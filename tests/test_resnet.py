"""ResNet backbone parity against a torch oracle via the weight converter.

torchvision is not installed in this environment, so the oracle is a minimal
torch ResNet-18 whose state_dict keys follow torchvision's exact naming
(conv1.weight, bn1.*, layerN.M.convK.weight, layerN.M.downsample.{0,1}.*) —
which is all `convert_torchvision_state_dict` depends on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

from tricolo_tpu.models import ResNet
from tricolo_tpu.models.resnet import (
    convert_torchvision_state_dict,
    load_pretrained,
    save_pretrained,
)


class TorchBasicBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(out_ch)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out_ch)
        self.downsample = None
        if stride != 1 or in_ch != out_ch:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_ch, out_ch, 1, stride, bias=False), tnn.BatchNorm2d(out_ch)
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + identity)


class TorchResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cfg = [(64, 1), (128, 2), (256, 2), (512, 2)]
        in_ch = 64
        for idx, (ch, stride) in enumerate(cfg, start=1):
            blocks = tnn.Sequential(
                TorchBasicBlock(in_ch, ch, stride), TorchBasicBlock(ch, ch, 1)
            )
            setattr(self, f"layer{idx}", blocks)
            in_ch = ch

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        for idx in range(1, 5):
            x = getattr(self, f"layer{idx}")(x)
        return x.mean(dim=(2, 3))


def test_resnet18_matches_torch_oracle(tmp_path):
    torch.manual_seed(0)
    tm = TorchResNet18().eval()
    # Perturb BN running stats so the converter's stats mapping is exercised.
    with torch.no_grad():
        tm(torch.randn(4, 3, 64, 64))
        tm.eval()

    params, stats = convert_torchvision_state_dict(tm.state_dict(), "resnet18")

    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        expected = tm(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()

    model = ResNet(cnn_name="resnet18")
    actual = np.asarray(
        model.apply({"params": params, "batch_stats": stats}, jnp.asarray(img))
    )
    np.testing.assert_allclose(actual, expected, atol=5e-4, rtol=1e-4)

    # Round-trip through the offline .npz format.
    path = str(tmp_path / "weights.npz")
    save_pretrained(path, params, stats)
    params2, stats2 = load_pretrained(path)
    actual2 = np.asarray(
        model.apply({"params": params2, "batch_stats": stats2}, jnp.asarray(img))
    )
    np.testing.assert_allclose(actual2, actual, atol=1e-6)


@pytest.mark.slow  # opt-in feature (default stem stays composed); ~18 s
# cold compile of two full ResNet18 grad programs
def test_hybrid_stem_matches_composed():
    """hybrid_stem=True (StemBNReLUPool) must equal the composed flax
    bn1→relu→maxpool chain: identical variable tree, stem output equal to
    flax rounding (~5e-7 — the mul/add fold reorders the normalize), and
    full-net train-mode outputs/grads equal up to the downstream
    amplification 8 BatchNorm layers apply to that stem rounding."""
    from tricolo_tpu.models.resnet import StemBNReLUPool
    from flax import linen as nn

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    hybrid = ResNet(cnn_name="resnet18", hybrid_stem=True)
    composed = ResNet(cnn_name="resnet18", hybrid_stem=False)
    variables = composed.init(jax.random.key(0), img, train=True)
    vh = hybrid.init(jax.random.key(0), img, train=True)
    assert jax.tree.structure(variables) == jax.tree.structure(vh)

    # Stem-level: the hybrid module vs the composed flax chain, same
    # scale/bias — tight tolerance (pure rounding, no amplification).
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 64)).astype(np.float32))
    stem = StemBNReLUPool()
    vs = stem.init(jax.random.key(1), x, train=True)

    class _Composed(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.BatchNorm(
                use_running_average=False, momentum=0.9, epsilon=1e-5, name="bn"
            )(x)
            return nn.max_pool(
                nn.relu(y), (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
            )

    comp = _Composed()
    vc = {
        "params": {"bn": vs["params"]},
        "batch_stats": {"bn": dict(vs["batch_stats"])},
    }
    out_s, mut_s = stem.apply(vs, x, train=True, mutable=["batch_stats"])
    out_cs, mut_cs = comp.apply(vc, x, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_cs), atol=5e-6, rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(mut_s["batch_stats"]),
        jax.tree.leaves(mut_cs["batch_stats"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    # Full-net sanity: the ~5e-7 stem rounding amplifies through the
    # downstream BatchNorms (their batch statistics shift globally), so
    # the comparison is necessarily loose.
    def run(model):
        out, mut = model.apply(variables, img, train=True, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    out_c, stats_c = run(composed)
    out_h, stats_h = run(hybrid)
    # Elementwise comparison is ill-conditioned here (relu/max boundary
    # flips on a random-init net move individual features arbitrarily),
    # so assert the bulk agreement instead.
    a, b = np.asarray(out_h), np.asarray(out_c)
    close = np.abs(a - b) <= 5e-3 + 5e-2 * np.abs(b)
    assert close.mean() > 0.98, f"only {close.mean():.1%} of features agree"

    def loss(v, model):
        out, _ = model.apply(v, img, train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    lc = float(loss(variables, composed))
    lh = float(loss(variables, hybrid))
    assert abs(lc - lh) < 1e-3 * max(1.0, abs(lc))


def test_resnet_init_structure_matches_converted():
    """Random init must produce the same pytree structure as conversion."""
    torch.manual_seed(1)
    tm = TorchResNet18()
    params, stats = convert_torchvision_state_dict(tm.state_dict(), "resnet18")
    model = ResNet(cnn_name="resnet18")
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    expected_struct = jax.tree.structure(variables["params"])
    actual_struct = jax.tree.structure(params)
    assert expected_struct == actual_struct
    assert jax.tree.structure(variables["batch_stats"]) == jax.tree.structure(stats)


def test_s2d_stem_matches_plain_conv():
    """S2DStemConv (4×4/1 conv over 2×2 space-to-depth input) must equal the
    plain 7×7/2/p3 stem conv: identical parameter tree, identical outputs
    (up to f32 conv summation-order rounding), identical kernel gradients."""
    from flax import linen as nn
    from tricolo_tpu.models.resnet import S2DStemConv

    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.normal(size=(3, 32, 32, 3)).astype(np.float32))
    s2d = S2DStemConv(features=64)
    vs = s2d.init(jax.random.key(3), img)
    plain = nn.Conv(
        64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False
    )
    assert jax.tree.structure(vs) == jax.tree.structure(
        plain.init(jax.random.key(3), img)
    )
    assert vs["params"]["kernel"].shape == (7, 7, 3, 64)

    out_s = np.asarray(s2d.apply(vs, img))
    out_p = np.asarray(plain.apply(vs, img))
    assert out_s.shape == out_p.shape == (3, 16, 16, 64)
    np.testing.assert_allclose(out_s, out_p, atol=1e-5, rtol=1e-5)

    # Kernel gradients through the pad/space-to-depth rearrangement.
    def loss(v, mod):
        return jnp.sum(jnp.sin(mod.apply(v, img)))

    gs = jax.grad(loss)(vs, s2d)["params"]["kernel"]
    gp = jax.grad(loss)(vs, plain)["params"]["kernel"]
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gp), atol=2e-5, rtol=1e-4)

    # Odd spatial dims fall back to the plain 7×7/s2/p3 conv over the
    # same kernel (the (4,2) pad rule assumes even H/W).
    img_odd = jnp.asarray(rng.normal(size=(1, 31, 31, 3)).astype(np.float32))
    out_odd = np.asarray(s2d.apply(vs, img_odd))
    ref_odd = np.asarray(plain.apply(vs, img_odd))
    assert out_odd.shape == ref_odd.shape == (1, 16, 16, 64)
    np.testing.assert_array_equal(out_odd, ref_odd)


def test_s2d_stem_full_resnet_equivalence():
    """ResNet(s2d_stem=True) shares the variable tree with the plain model
    and produces the same features on the same parameters."""
    rng = np.random.default_rng(12)
    img = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    plain = ResNet(cnn_name="resnet18", s2d_stem=False)
    s2d = ResNet(cnn_name="resnet18", s2d_stem=True)
    variables = plain.init(jax.random.key(0), img, train=False)
    assert jax.tree.structure(
        s2d.init(jax.random.key(0), img, train=False)
    ) == jax.tree.structure(variables)
    out_p = np.asarray(plain.apply(variables, img, train=False))
    out_s = np.asarray(s2d.apply(variables, img, train=False))
    np.testing.assert_allclose(out_s, out_p, atol=5e-4, rtol=1e-3)
