"""Bidirectional GRU text encoder (TPU-native `lax.scan` recurrence).

Capability parity with the reference BiGRU encoder
(tricolo/model/module/text_encoder/bigru.py:7-18): Embedding(vocab, 256,
padding_idx=0) → 1-layer bidirectional GRU(256→128) from zero initial state →
concat(final forward hidden, final backward hidden) → Linear(256→out_dim) →
tanh → L2 normalize.

TPU design notes
----------------
* The input projections for all timesteps and all three gates are hoisted out
  of the recurrence into one large (B·T, E) @ (E, 3H) matmul that runs on the
  MXU; the `lax.scan` body only carries the (B, H) @ (H, 3H) recurrent matmul
  — the minimum serial work a GRU admits.
* Gate math follows the cuDNN/torch convention (gate order r, z, n; the
  candidate uses r ⊙ (h·W_hn + b_hn)), so converted torch weights reproduce
  reference numerics bit-for-bit up to accumulation order.
* padding_idx=0 semantics (embedding row 0 pinned to zero, no gradient) are
  realized by masking the embedding lookup with (tokens != 0); like the
  reference, pad steps still advance the recurrence on zero inputs.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import TorchLinear, l2_normalize, uniform_init


class GRULayer(nn.Module):
    """One direction of a GRU over a (B, T, E) sequence; returns final (B, H)."""

    hidden_dim: int
    reverse: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        batch, _, embed_dim = x.shape
        hidden = self.hidden_dim
        bound = 1.0 / math.sqrt(hidden)
        init = uniform_init(bound)
        # Stored pre-transposed relative to torch ((in, 3H) not (3H, in)) so
        # the matmuls below need no transposes at trace time.
        w_ih = self.param("w_ih", init, (embed_dim, 3 * hidden), self.param_dtype)
        w_hh = self.param("w_hh", init, (hidden, 3 * hidden), self.param_dtype)
        b_ih = self.param("b_ih", init, (3 * hidden,), self.param_dtype)
        b_hh = self.param("b_hh", init, (3 * hidden,), self.param_dtype)

        dtype = self.dtype or self.param_dtype
        x = x.astype(dtype)

        if self.reverse:
            x = jnp.flip(x, axis=1)

        # Hoisted input projection: one big MXU matmul for every timestep.
        x_proj = (
            x.reshape(-1, embed_dim) @ w_ih.astype(dtype) + b_ih.astype(dtype)
        ).reshape(batch, -1, 3 * hidden)
        x_proj = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 3H) — scan over time

        w_hh_c = w_hh.astype(dtype)
        b_hh_c = b_hh.astype(dtype)

        def step(h, xp_t):
            h_proj = h @ w_hh_c + b_hh_c
            xr, xz, xn = jnp.split(xp_t, 3, axis=-1)
            hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h
            return h_new, None

        h0 = jnp.zeros((batch, hidden), dtype)
        h_final, _ = jax.lax.scan(step, h0, x_proj)
        return h_final


class BiGRUEncoder(nn.Module):
    """Text encoder: tokens (B, T) int32 → L2-normalized (B, out_dim)."""

    vocab_size: int
    out_dim: int = 512
    embed_dim: int = 256
    hidden_dim: int = 128
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, *, deterministic: bool = True) -> jax.Array:
        embedding = nn.Embed(
            self.vocab_size,
            self.embed_dim,
            embedding_init=nn.initializers.normal(stddev=1.0),
            param_dtype=self.param_dtype,
        )
        x = embedding(tokens)
        # padding_idx=0: row 0 contributes zeros and receives no gradient.
        x = x * (tokens != 0)[..., None].astype(x.dtype)

        h_fwd = GRULayer(
            self.hidden_dim, reverse=False, dtype=self.dtype, param_dtype=self.param_dtype, name="gru_fwd"
        )(x)
        h_bwd = GRULayer(
            self.hidden_dim, reverse=True, dtype=self.dtype, param_dtype=self.param_dtype, name="gru_bwd"
        )(x)
        # torch hidden[-2] (forward final) then hidden[-1] (backward final).
        h = jnp.concatenate([h_fwd, h_bwd], axis=-1)
        out = TorchLinear(self.out_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc")(h)
        return l2_normalize(jnp.tanh(out.astype(jnp.float32)))
