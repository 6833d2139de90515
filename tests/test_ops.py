"""Pallas NT-Xent kernel: value + gradient parity with the reference loss.

Interpret mode on the CPU mesh gives exact kernel semantics; the real-TPU
compile path is exercised separately (PERF.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tricolo_tpu.losses import nt_xent_loss
from tricolo_tpu.ops import pallas_nt_xent_loss


def random_pair(seed, batch=32, dim=16):
    rng = np.random.default_rng(seed)
    zis = rng.standard_normal((batch, dim)).astype(np.float32)
    zjs = rng.standard_normal((batch, dim)).astype(np.float32)
    return jnp.asarray(zis), jnp.asarray(zjs)


@pytest.fixture(scope="module", autouse=True)
def _isolate_interpret_mode_state():
    """Interpret-mode pallas_call leaves runtime state that intermittently
    aborts later shard_map programs in the same process (reproduced:
    test_ops + test_parallel's fsdp step -> 'Fatal Python error: Aborted'
    inside XLA:CPU; jax 0.9.0). Clearing jax's caches after this module
    drops the poisoned executables/callbacks."""
    yield
    import jax

    jax.clear_caches()


class TestPallasNTXent:
    @pytest.mark.parametrize("alpha", [0.25, 0.5])
    @pytest.mark.parametrize("batch", [16, 32, 64])
    def test_value_matches_reference(self, alpha, batch):
        zis, zjs = random_pair(batch, batch=batch)
        expect = float(nt_xent_loss(zis, zjs, 0.1, alpha))
        got = float(pallas_nt_xent_loss(zis, zjs, 0.1, alpha, interpret=True))
        assert got == pytest.approx(expect, rel=1e-5)

    def test_gradients_match_reference(self):
        zis, zjs = random_pair(0, batch=32, dim=16)
        ref = jax.grad(lambda a, b: nt_xent_loss(a, b, 0.1, 0.25), argnums=(0, 1))(
            zis, zjs
        )
        got = jax.grad(
            lambda a, b: pallas_nt_xent_loss(a, b, 0.1, 0.25, interpret=True),
            argnums=(0, 1),
        )(zis, zjs)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-6)

    def test_block_smaller_than_batch(self):
        # batch 48 → block 16: multiple tiles per direction, diagonal spans
        # tile boundaries.
        zis, zjs = random_pair(1, batch=48, dim=16)
        expect = float(nt_xent_loss(zis, zjs, 0.1, 0.25))
        got = float(pallas_nt_xent_loss(zis, zjs, 0.1, 0.25, interpret=True))
        assert got == pytest.approx(expect, rel=1e-5)

    def test_upstream_gradient_scaling(self):
        # custom VJP must respect a non-unit cotangent.
        zis, zjs = random_pair(2, batch=16, dim=8)
        ref = jax.grad(lambda a: 3.0 * nt_xent_loss(a, zjs, 0.1, 0.25))(zis)
        got = jax.grad(
            lambda a: 3.0 * pallas_nt_xent_loss(a, zjs, 0.1, 0.25, interpret=True)
        )(zis)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-6)
