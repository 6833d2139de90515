"""Fused BN→ReLU→MaxPool(2³) op: value/grad equivalence with the XLA twin.

The fused op (ops/fused_bn_pool.py) replaces the voxel ConvBlock's
BatchNorm/relu/max_pool composition (reference sparse_cnn.py:11-44 dense
redesign) on TPU. These tests run it in interpret mode on the CPU mesh and
pin: forward values + batch statistics, full VJP (dy, dγ, dβ) against
jax.grad of the composition, exact first-max tie routing (XLA
select_and_scatter semantics), and the flax-module integration (variable
tree unchanged, fused/plain toggle produces the same training step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tricolo_tpu.ops.fused_bn_pool import (
    fused_bn_relu_pool,
    inference_bn_relu_pool,
    reference_bn_relu_pool,
)


def _rand(rng, shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


@pytest.fixture(scope="module", autouse=True)
def _isolate_interpret_mode_state():
    """See tests/test_ops.py: interpret-mode pallas_call state can abort
    later shard_map programs in-process; clear jax caches on module exit."""
    yield
    import jax

    jax.clear_caches()


class TestFusedOp:
    def test_forward_matches_reference(self):
        rng = np.random.default_rng(0)
        y = _rand(rng, (2, 8, 8, 8, 16))
        scale = _rand(rng, (16,)) * 0.2 + 1.0
        bias = _rand(rng, (16,)) * 0.2
        pf, mf, vf = fused_bn_relu_pool(y, scale, bias)
        pr, mr, vr = reference_bn_relu_pool(y, scale, bias)
        assert pf.shape == (2, 4, 4, 4, 16)
        np.testing.assert_allclose(pf, pr, atol=1e-6)
        np.testing.assert_array_equal(mf, mr)
        np.testing.assert_array_equal(vf, vr)

    def test_grads_match_reference(self):
        rng = np.random.default_rng(1)
        y = _rand(rng, (2, 8, 8, 8, 16))
        scale = _rand(rng, (16,)) * 0.2 + 1.0
        bias = _rand(rng, (16,)) * 0.2
        ct = _rand(rng, (2, 4, 4, 4, 16))

        gf = jax.grad(
            lambda *a: jnp.sum(fused_bn_relu_pool(*a)[0] * ct), argnums=(0, 1, 2)
        )(y, scale, bias)
        gr = jax.grad(
            lambda *a: jnp.sum(reference_bn_relu_pool(*a)[0] * ct), argnums=(0, 1, 2)
        )(y, scale, bias)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(a, b, atol=2e-5)

    def test_tie_routing_matches_select_and_scatter(self):
        # Integer-valued inputs produce exact ties (whole constant windows,
        # like empty voxel space); the first max in (d, h, w) scan order must
        # receive the gradient, matching XLA/torch.
        rng = np.random.default_rng(2)
        y = jnp.asarray(rng.integers(-2, 3, size=(2, 4, 4, 8, 8)).astype(np.float32))
        scale, bias = jnp.ones(8), jnp.zeros(8)
        ct = _rand(rng, (2, 2, 2, 4, 8))
        gf = jax.grad(lambda y: jnp.sum(fused_bn_relu_pool(y, scale, bias)[0] * ct))(y)
        gr = jax.grad(
            lambda y: jnp.sum(reference_bn_relu_pool(y, scale, bias)[0] * ct)
        )(y)
        np.testing.assert_allclose(gf, gr, atol=1e-6)

    def test_bf16_forward_matches(self):
        rng = np.random.default_rng(3)
        y = _rand(rng, (2, 8, 8, 8, 16)).astype(jnp.bfloat16)
        scale = _rand(rng, (16,)) * 0.2 + 1.0
        bias = _rand(rng, (16,)) * 0.2
        pf, _, _ = fused_bn_relu_pool(y, scale, bias)
        pr, _, _ = reference_bn_relu_pool(y, scale, bias)
        assert pf.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(pf, np.float32), np.asarray(pr, np.float32)
        )

    def test_mean_var_cotangents_are_exact(self):
        # The op returns (pooled, mean, var); grads flowing through the
        # statistics outputs must match the composition too.
        rng = np.random.default_rng(4)
        y = _rand(rng, (2, 4, 4, 4, 8))
        scale = _rand(rng, (8,)) * 0.2 + 1.0
        bias = _rand(rng, (8,)) * 0.2

        def lf(y):
            p, m, v = fused_bn_relu_pool(y, scale, bias)
            return jnp.sum(p) + jnp.sum(m * 0.7) + jnp.sum(v * 1.3)

        def lr(y):
            p, m, v = reference_bn_relu_pool(y, scale, bias)
            return jnp.sum(p) + jnp.sum(m * 0.7) + jnp.sum(v * 1.3)

        np.testing.assert_allclose(jax.grad(lf)(y), jax.grad(lr)(y), atol=2e-5)

    def test_odd_spatial_raises(self):
        y = jnp.zeros((1, 3, 4, 4, 8))
        with pytest.raises(ValueError, match="even"):
            fused_bn_relu_pool(y, jnp.ones(8), jnp.zeros(8))

    def test_inference_path(self):
        rng = np.random.default_rng(5)
        y = _rand(rng, (2, 4, 4, 4, 8))
        scale = _rand(rng, (8,)) * 0.2 + 1.0
        bias = _rand(rng, (8,)) * 0.2
        mean = _rand(rng, (8,)) * 0.1
        var = jnp.abs(_rand(rng, (8,))) + 0.5
        out = inference_bn_relu_pool(y, scale, bias, mean, var)
        inv = 1.0 / np.sqrt(np.asarray(var) + 1e-5)
        a = np.maximum(
            (np.asarray(y) - np.asarray(mean)) * inv * np.asarray(scale)
            + np.asarray(bias),
            0.0,
        )
        expect = a.reshape(2, 2, 2, 2, 2, 2, 2, 8).max(axis=(2, 4, 6))
        np.testing.assert_allclose(out, expect, atol=1e-5)


class TestModuleIntegration:
    def _encoder(self, fused):
        from tricolo_tpu.models.voxel_cnn import VoxelCNNEncoder

        return VoxelCNNEncoder(voxel_size=32, ef_dim=4, z_dim=16, out_dim=16,
                               fused_bn_pool=fused)

    def test_variable_tree_keeps_batchnorm_layout(self):
        enc = self._encoder(fused=False)
        x = jnp.zeros((2, 32, 32, 32, 3))
        variables = enc.init(jax.random.PRNGKey(0), x)
        block0 = variables["params"]["ConvBlock_0"]
        assert set(block0["BatchNorm_0"].keys()) == {"scale", "bias"}
        stats0 = variables["batch_stats"]["ConvBlock_0"]["BatchNorm_0"]
        assert set(stats0.keys()) == {"mean", "var"}

    def test_fused_and_plain_paths_agree(self):
        rng = np.random.default_rng(6)
        x = _rand(rng, (2, 32, 32, 32, 3))
        enc_p = self._encoder(fused=False)
        enc_f = self._encoder(fused=True)
        variables = enc_p.init(jax.random.PRNGKey(0), x)

        def step(enc, variables):
            def loss(params):
                out, updates = enc.apply(
                    {**variables, "params": params},
                    x,
                    train=True,
                    mutable=["batch_stats"],
                )
                return jnp.sum(out * out), updates

            (value, updates), grads = jax.value_and_grad(loss, has_aux=True)(
                variables["params"]
            )
            return value, updates, grads

        vp, up, gp = step(enc_p, variables)
        vf, uf, gf = step(enc_f, variables)
        np.testing.assert_allclose(vp, vf, rtol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=3e-5), up, uf
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=3e-5), gp, gf
        )


class TestMaskedBN:
    """Submanifold-faithful masked-BN variant (spconv semantics twin)."""

    def test_all_ones_mask_matches_plain(self):
        rng = np.random.default_rng(7)
        y = _rand(rng, (2, 4, 4, 4, 8))
        scale = _rand(rng, (8,)) * 0.2 + 1.0
        bias = _rand(rng, (8,)) * 0.2
        from tricolo_tpu.ops.fused_bn_pool import masked_bn_relu_pool

        mask = jnp.ones((2, 4, 4, 4, 1))
        pm, mm, vm, _ = masked_bn_relu_pool(y, scale, bias, mask)
        pr, mr, vr = reference_bn_relu_pool(y, scale, bias)
        np.testing.assert_allclose(mm, mr, atol=1e-6)
        np.testing.assert_allclose(vm, vr, atol=1e-6)
        np.testing.assert_allclose(pm, pr, atol=1e-6)

    def test_stats_over_active_sites_and_zeroed_inactive(self):
        rng = np.random.default_rng(8)
        y = _rand(rng, (1, 2, 2, 2, 4))
        mask_np = np.zeros((1, 2, 2, 2, 1), np.float32)
        mask_np[0, 0, 0, 0, 0] = 1.0
        mask_np[0, 1, 1, 1, 0] = 1.0
        mask = jnp.asarray(mask_np)
        scale, bias = jnp.ones(4), jnp.full((4,), 10.0)  # big bias: inactive
        # sites would dominate the pool if not zeroed.
        from tricolo_tpu.ops.fused_bn_pool import masked_bn_relu_pool

        pooled, mean, var, pmask = masked_bn_relu_pool(y, scale, bias, mask)
        active = np.asarray(y)[mask_np[..., 0] > 0]  # (2, 4)
        np.testing.assert_allclose(mean, active.mean(axis=0), atol=1e-6)
        np.testing.assert_allclose(var, active.var(axis=0), atol=1e-5)
        # One 2^3 window with 2 active sites -> pooled = max over the two
        # normalized actives; inactive contribute exactly nothing.
        inv = 1.0 / np.sqrt(np.asarray(var) + 1e-5)
        a = np.maximum((active - np.asarray(mean)) * inv + 10.0, 0.0)
        np.testing.assert_allclose(np.asarray(pooled)[0, 0, 0, 0], a.max(axis=0), atol=1e-5)
        assert float(pmask[0, 0, 0, 0, 0]) == 1.0

    def test_encoder_masked_bn_flag(self):
        from tricolo_tpu.models.voxel_cnn import VoxelCNNEncoder

        rng = np.random.default_rng(9)
        vox = np.zeros((2, 32, 32, 32, 3), np.float32)
        occ = rng.random((2, 32, 32, 32)) < 0.05
        vox[occ] = rng.random((occ.sum(), 3)).astype(np.float32)
        x = jnp.asarray(vox)
        enc = VoxelCNNEncoder(voxel_size=32, ef_dim=4, z_dim=16, out_dim=16,
                              masked_bn=True, fused_bn_pool=False)
        variables = enc.init(jax.random.PRNGKey(0), x)
        out, updates = enc.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        assert out.shape == (2, 16)
        assert np.isfinite(np.asarray(out)).all()
        # Masked statistics differ from the dense-BN ones (zeros dominate
        # the dense mean) — the flag must actually change the computation.
        enc_d = VoxelCNNEncoder(voxel_size=32, ef_dim=4, z_dim=16, out_dim=16,
                                masked_bn=False, fused_bn_pool=False)
        _, updates_d = enc_d.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        m = updates["batch_stats"]["ConvBlock_0"]["BatchNorm_0"]["mean"]
        md = updates_d["batch_stats"]["ConvBlock_0"]["BatchNorm_0"]["mean"]
        assert not np.allclose(np.asarray(m), np.asarray(md), atol=1e-4)


class TestMaskedHybrid:
    """masked_hybrid_bn_relu_pool must match the plain masked composition
    in values AND gradients (y, scale, bias), including ties/dead cells."""

    def _data(self, seed=0, B=2, D=8, C=6):
        rng = np.random.default_rng(seed)
        y = jnp.asarray(rng.standard_normal((B, D, D, D, C)).astype(np.float32))
        mask = jnp.asarray(
            (rng.random((B, D, D, D, 1)) < 0.3).astype(np.float32)
        )
        scale = jnp.asarray(rng.standard_normal(C).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
        return y, scale, bias, mask

    def test_forward_matches(self):
        from tricolo_tpu.ops.fused_bn_pool import (
            masked_bn_relu_pool,
            masked_hybrid_bn_relu_pool,
        )

        y, scale, bias, mask = self._data()
        ref = masked_bn_relu_pool(y, scale, bias, mask)
        got = masked_hybrid_bn_relu_pool(y, scale, bias, mask)
        for a, b in zip(got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_grads_match(self):
        from tricolo_tpu.ops.fused_bn_pool import (
            masked_bn_relu_pool,
            masked_hybrid_bn_relu_pool,
        )

        y, scale, bias, mask = self._data(seed=1)

        def loss(op, y, s, b):
            pooled, mean, var, pm = op(y, s, b, mask)
            # weight every output so all cotangent paths are exercised
            w = jnp.arange(pooled.size, dtype=jnp.float32).reshape(pooled.shape)
            return (
                jnp.sum(pooled * w)
                + jnp.sum(mean * 0.7)
                + jnp.sum(var * 1.3)
            )

        ref = jax.grad(
            lambda *a: loss(masked_bn_relu_pool, *a), argnums=(0, 1, 2)
        )(y, scale, bias)
        got = jax.grad(
            lambda *a: loss(masked_hybrid_bn_relu_pool, *a), argnums=(0, 1, 2)
        )(y, scale, bias)
        for a, b in zip(got, ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )

    def test_grads_match_with_ties_and_zero_scale(self):
        """Ties route identically; the γ==0 channel follows the documented
        hybrid deviation (dγ reported 0, dy/dβ still exact since A=0)."""
        from tricolo_tpu.ops.fused_bn_pool import (
            masked_bn_relu_pool,
            masked_hybrid_bn_relu_pool,
        )

        y, scale, bias, mask = self._data(seed=2)
        y = jnp.round(y * 2) / 2  # force ties inside pool windows
        scale = scale.at[0].set(0.0)

        def loss(op, y, s, b):
            pooled, *_ = op(y, s, b, mask)
            return jnp.sum(pooled**2)

        ref = jax.grad(
            lambda *a: loss(masked_bn_relu_pool, *a), argnums=(0, 1, 2)
        )(y, scale, bias)
        got = jax.grad(
            lambda *a: loss(masked_hybrid_bn_relu_pool, *a), argnums=(0, 1, 2)
        )(y, scale, bias)
        dy_ref, dscale_ref, dbias_ref = ref
        dy_got, dscale_got, dbias_got = got
        np.testing.assert_allclose(
            np.asarray(dy_got), np.asarray(dy_ref), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(dbias_got), np.asarray(dbias_ref), rtol=1e-4, atol=1e-5
        )
        # nonzero-γ channels exact; γ==0 channel reported frozen
        np.testing.assert_allclose(
            np.asarray(dscale_got)[1:], np.asarray(dscale_ref)[1:],
            rtol=1e-4, atol=1e-5,
        )
        assert float(dscale_got[0]) == 0.0


class TestRoutingModes:
    """ROUTING='compare' (8-slice first-max compare against the saved
    pooled max) must reproduce ROUTING='sas' (select_and_scatter) exactly,
    including bf16 ties resolving to the same scan-order-first site."""

    def _grads(self, mode, y, scale, bias, mask):
        import tricolo_tpu.ops.fused_bn_pool as fbp

        old = fbp.ROUTING
        fbp.ROUTING = mode
        try:
            def loss(y, s, b):
                pooled, mean, var, _ = fbp.masked_hybrid_bn_relu_pool(
                    y, s, b, mask
                )
                w = jnp.arange(pooled.size, dtype=jnp.float32).reshape(pooled.shape)
                return jnp.sum(pooled.astype(jnp.float32) * w)

            # fresh trace per mode (the global is read at trace time)
            return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(y, scale, bias)
        finally:
            fbp.ROUTING = old

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_compare_matches_sas(self, dtype):
        rng = np.random.default_rng(5)
        B, D, C = 2, 8, 6
        y = jnp.asarray(rng.standard_normal((B, D, D, D, C)).astype(np.float32))
        # quantized values force exact ties inside pooling windows at bf16
        y = y.astype(dtype)
        mask = jnp.asarray(
            (rng.random((B, D, D, D, 1)) < 0.6).astype(np.float32)
        ).astype(dtype)
        scale = jnp.asarray(rng.standard_normal(C).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
        ref = self._grads("sas", y, scale, bias, mask)
        got = self._grads("compare", y, scale, bias, mask)
        for a, b in zip(got, ref):
            # ulp-level fusion-order noise only: a tie mis-route would show
            # full-cotangent-magnitude diffs (~40), caught by this bound.
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-5, atol=1e-5,
            )


class TestHybridStem2D:
    """2-D overlapping-window hybrid (ResNet stem): hand-derived backward
    must match autodiff of the composed BN→relu→maxpool(3×3/2, pad 1)."""

    def _data(self, seed=0, N=3, H=10, W=10, C=6):
        rng = np.random.default_rng(seed)
        y = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
        scale = jnp.asarray(rng.standard_normal(C).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
        return y, scale, bias

    def test_forward_matches_composed(self):
        from tricolo_tpu.ops.fused_bn_pool import (
            hybrid_bn_relu_pool2d,
            reference_bn_relu_pool2d,
        )

        y, scale, bias = self._data()
        ref = reference_bn_relu_pool2d(y, scale, bias)
        got = hybrid_bn_relu_pool2d(y, scale, bias)
        assert got[0].shape == (3, 5, 5, 6)
        for a, b in zip(got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_grads_match_composed(self):
        from tricolo_tpu.ops.fused_bn_pool import (
            hybrid_bn_relu_pool2d,
            reference_bn_relu_pool2d,
        )

        y, scale, bias = self._data(seed=1)

        def loss(op, y, s, b):
            pooled, mean, var = op(y, s, b)
            w = jnp.arange(pooled.size, dtype=jnp.float32).reshape(pooled.shape)
            return jnp.sum(pooled * w) + jnp.sum(mean * 0.7) + jnp.sum(var * 1.3)

        ref = jax.grad(
            lambda *a: loss(reference_bn_relu_pool2d, *a), argnums=(0, 1, 2)
        )(y, scale, bias)
        got = jax.grad(
            lambda *a: loss(hybrid_bn_relu_pool2d, *a), argnums=(0, 1, 2)
        )(y, scale, bias)
        for a, b in zip(got, ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
            )

    def test_grads_match_composed_bf16(self):
        """bf16: the hybrid recovers ẑ(argmax) from the bf16-rounded
        pooled output ((m−β)/γ), so its dγ and the B/C chain constants
        carry ~0.4% bf16 quantization relative to the composed chain's
        site-computed ẑ — the comparison tolerances are bf16-scale, not
        f32-scale (measured worst: dγ 0.43% rel, dy abs 2 on ~300-magnitude
        index-weighted cotangents; fixed seed keeps tie routing stable)."""
        from tricolo_tpu.ops.fused_bn_pool import (
            hybrid_bn_relu_pool2d,
            reference_bn_relu_pool2d,
        )

        y, scale, bias = self._data(seed=2, N=2, H=8, W=8, C=4)
        y = y.astype(jnp.bfloat16)

        def loss(op, y, s, b):
            pooled, _, _ = op(y, s, b)
            w = jnp.arange(pooled.size, dtype=jnp.float32).reshape(pooled.shape)
            return jnp.sum(pooled.astype(jnp.float32) * w)

        ref = jax.grad(
            lambda *a: loss(reference_bn_relu_pool2d, *a), argnums=(0, 1, 2)
        )(y, scale, bias)
        got = jax.grad(
            lambda *a: loss(hybrid_bn_relu_pool2d, *a), argnums=(0, 1, 2)
        )(y, scale, bias)
        np.testing.assert_allclose(
            np.asarray(got[0], np.float32), np.asarray(ref[0], np.float32),
            rtol=3e-2, atol=3.0,
        )
        for a, b in zip(got[1:], ref[1:]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-2, atol=1.0
            )

    def test_inference_matches_composed(self):
        from tricolo_tpu.ops.fused_bn_pool import inference_bn_relu_pool2d

        y, scale, bias = self._data(seed=3)
        mean = jnp.asarray(np.random.default_rng(4).standard_normal(6), jnp.float32)
        var = jnp.abs(jnp.asarray(np.random.default_rng(5).standard_normal(6))) + 0.5
        got = inference_bn_relu_pool2d(y, scale, bias, mean, var)
        inv = np.asarray(jax.lax.rsqrt(var + 1e-5))
        a = np.maximum(
            (np.asarray(y) - np.asarray(mean)) * inv * np.asarray(scale)
            + np.asarray(bias),
            0.0,
        )
        ref = np.asarray(
            jax.lax.reduce_window(
                jnp.asarray(a), -jnp.inf, jax.lax.max,
                (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
            )
        )
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)


class TestMaskedHybrid2:
    """Two-mask variant (windowed halo-3 block 1): statistics over
    ``stats_mask``, zeroing over ``zero_mask`` ⊇ stats_mask. The hybrid
    backward must match autodiff of the plain composition."""

    def _data(self, seed=0, B=2, D=8, C=6):
        rng = np.random.default_rng(seed)
        y = jnp.asarray(rng.standard_normal((B, D, D, D, C)).astype(np.float32))
        zero = (rng.random((B, D, D, D, 1)) < 0.4).astype(np.float32)
        stats = zero * (rng.random((B, D, D, D, 1)) < 0.6)
        scale = jnp.asarray(rng.standard_normal(C).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
        return y, scale, bias, jnp.asarray(stats), jnp.asarray(zero)

    def test_forward_matches_composed(self):
        from tricolo_tpu.ops.fused_bn_pool import (
            masked_bn_relu_pool2,
            masked_hybrid_bn_relu_pool2,
        )

        y, scale, bias, ms, mz = self._data()
        ref = masked_bn_relu_pool2(y, scale, bias, ms, mz)
        got = masked_hybrid_bn_relu_pool2(y, scale, bias, ms, mz)
        for a, b in zip(got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_equal_masks_match_single_mask_op(self):
        from tricolo_tpu.ops.fused_bn_pool import (
            masked_hybrid_bn_relu_pool,
            masked_hybrid_bn_relu_pool2,
        )

        y, scale, bias, ms, _ = self._data(seed=3)
        ref = masked_hybrid_bn_relu_pool(y, scale, bias, ms)
        got = masked_hybrid_bn_relu_pool2(y, scale, bias, ms, ms)
        for a, b in zip(got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_grads_match_composed(self):
        from tricolo_tpu.ops.fused_bn_pool import (
            masked_bn_relu_pool2,
            masked_hybrid_bn_relu_pool2,
        )

        y, scale, bias, ms, mz = self._data(seed=1)

        def loss(op, y, s, b):
            pooled, mean, var, pm = op(y, s, b, ms, mz)
            w = jnp.arange(pooled.size, dtype=jnp.float32).reshape(pooled.shape)
            return jnp.sum(pooled * w) + jnp.sum(mean * 0.7) + jnp.sum(var * 1.3)

        ref = jax.grad(
            lambda *a: loss(masked_bn_relu_pool2, *a), argnums=(0, 1, 2)
        )(y, scale, bias)
        got = jax.grad(
            lambda *a: loss(masked_hybrid_bn_relu_pool2, *a), argnums=(0, 1, 2)
        )(y, scale, bias)
        for a, b in zip(got, ref):
            # pooled- vs full-resolution dγ/dβ reductions accumulate in a
            # different order; the index-weighted loss amplifies the f32
            # rounding (worst observed: 3e-5 abs on values ~80)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
            )
