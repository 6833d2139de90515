"""Explicit-dgrad VALID conv (ops/conv3d.py): same forward bytes as the
nn.Conv lowering, gradients equal to XLA's auto-transpose to reduction
order, and the variable tree interchanges with the nn.Conv path."""

import jax
import jax.numpy as jnp
import numpy as np

from tricolo_tpu.models.voxel_cnn import ConvBlock
from tricolo_tpu.ops.conv3d import DIMNUMS, conv3d_valid_explicit_dgrad


def _auto_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID", dimension_numbers=DIMNUMS
    )


class TestOpLevel:
    def _data(self, dtype):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((4, 6, 6, 6, 8)), dtype)
        w = jnp.asarray(0.2 * rng.standard_normal((3, 3, 3, 8, 16)), dtype)
        ct = jnp.asarray(rng.standard_normal((4, 4, 4, 4, 16)), dtype)
        return x, w, ct

    def test_forward_bitwise_f32(self):
        x, w, _ = self._data(jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(conv3d_valid_explicit_dgrad(x, w)),
            np.asarray(_auto_conv(x, w)),
        )

    def test_grads_match_auto_f32(self):
        x, w, ct = self._data(jnp.float32)

        def loss(fn, x, w):
            return jnp.vdot(fn(x, w), ct)

        gx_e, gw_e = jax.grad(loss, argnums=(1, 2))(
            conv3d_valid_explicit_dgrad, x, w
        )
        gx_a, gw_a = jax.grad(loss, argnums=(1, 2))(_auto_conv, x, w)
        # dW is literally the same program; dX differs only in reduction
        # order (explicit full conv vs transposed op).
        np.testing.assert_allclose(gw_e, gw_a, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(gx_e, gx_a, rtol=1e-5, atol=1e-5)

    def test_grads_match_auto_bf16(self):
        x, w, ct = self._data(jnp.bfloat16)

        def loss(fn, x, w):
            return jnp.vdot(
                fn(x, w).astype(jnp.float32), ct.astype(jnp.float32)
            )

        gx_e, gw_e = jax.grad(loss, argnums=(1, 2))(
            conv3d_valid_explicit_dgrad, x, w
        )
        gx_a, gw_a = jax.grad(loss, argnums=(1, 2))(_auto_conv, x, w)
        np.testing.assert_allclose(
            np.asarray(gw_e, np.float32), np.asarray(gw_a, np.float32),
            rtol=2e-2, atol=2e-2,
        )
        np.testing.assert_allclose(
            np.asarray(gx_e, np.float32), np.asarray(gx_a, np.float32),
            rtol=2e-2, atol=2e-2,
        )


class TestConvBlockKnob:
    """explicit_dgrad=True must interchange with the nn.Conv path: same
    variable tree, same forward, matching masked-BN train-step grads."""

    def _block(self, explicit):
        return ConvBlock(
            16,
            dtype=jnp.float32,
            valid_padding=True,
            explicit_dgrad=explicit,
        )

    def test_variables_and_forward_interchange(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((3, 6, 6, 6, 8)), jnp.float32)
        mask = jnp.asarray(
            (rng.random((3, 4, 4, 4, 1)) > 0.4).astype(np.float32)
        )
        ref = self._block(False)
        variables = ref.init(jax.random.PRNGKey(0), x, mask=mask, train=True)
        exp = self._block(True)
        v2 = exp.init(jax.random.PRNGKey(0), x, mask=mask, train=True)
        assert jax.tree_util.tree_structure(
            variables
        ) == jax.tree_util.tree_structure(v2)

        def fwd(block, variables):
            (y, m), _ = block.apply(
                variables, x, mask=mask, train=True, mutable=["batch_stats"]
            )
            return y, m

        y_ref, m_ref = fwd(ref, variables)
        y_exp, m_exp = fwd(exp, variables)  # the SAME params apply cleanly
        np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_exp))
        np.testing.assert_array_equal(np.asarray(m_ref), np.asarray(m_exp))

    def test_train_grads_match(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((3, 6, 6, 6, 8)), jnp.float32)
        mask = jnp.asarray(
            (rng.random((3, 4, 4, 4, 1)) > 0.4).astype(np.float32)
        )
        ref = self._block(False)
        variables = ref.init(jax.random.PRNGKey(0), x, mask=mask, train=True)
        params = variables["params"]
        stats = variables["batch_stats"]

        def loss(block, params, x):
            (y, _), _ = block.apply(
                {"params": params, "batch_stats": stats},
                x,
                mask=mask,
                train=True,
                mutable=["batch_stats"],
            )
            return jnp.sum(y * y)

        g_ref = jax.grad(loss, argnums=(1, 2))(ref, params, x)
        g_exp = jax.grad(loss, argnums=(1, 2))(self._block(True), params, x)
        for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_exp)):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
