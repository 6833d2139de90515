"""BiGRU parity against a torch oracle (SURVEY.md hard part iii).

Builds the reference text encoder (Embedding(padding_idx=0) → bidirectional
GRU → fc → tanh → normalize, bigru.py:7-18) in CPU torch, copies its weights
into the JAX module, and requires near-bit-exact agreement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tricolo_tpu.models import BiGRUEncoder


class TorchBiGRU(torch.nn.Module):
    def __init__(self, vocab, out_dim):
        super().__init__()
        self.embedding_layer = torch.nn.Embedding(vocab, 256, padding_idx=0)
        self.gru = torch.nn.GRU(input_size=256, hidden_size=128, num_layers=1, bidirectional=True)
        self.fc = torch.nn.Linear(256, out_dim)

    def forward(self, x):
        emb = torch.transpose(self.embedding_layer(x), 0, 1)
        h0 = torch.zeros(size=(2, emb.shape[1], 128), dtype=torch.float32)
        _, hidden = self.gru(emb, h0)
        out = torch.tanh(self.fc(torch.cat((hidden[-2], hidden[-1]), dim=1)))
        return torch.nn.functional.normalize(out, dim=1)


def _port_weights(params, tm):
    params = jax.tree.map(np.asarray, params)
    params["Embed_0"]["embedding"] = tm.embedding_layer.weight.detach().numpy()
    for direction, suffix in (("gru_fwd", ""), ("gru_bwd", "_reverse")):
        params[direction]["w_ih"] = getattr(tm.gru, f"weight_ih_l0{suffix}").detach().numpy().T
        params[direction]["w_hh"] = getattr(tm.gru, f"weight_hh_l0{suffix}").detach().numpy().T
        params[direction]["b_ih"] = getattr(tm.gru, f"bias_ih_l0{suffix}").detach().numpy()
        params[direction]["b_hh"] = getattr(tm.gru, f"bias_hh_l0{suffix}").detach().numpy()
    params["fc"]["Dense_0"]["kernel"] = tm.fc.weight.detach().numpy().T
    params["fc"]["Dense_0"]["bias"] = tm.fc.bias.detach().numpy()
    return params


def test_bigru_matches_torch():
    vocab, out_dim, batch, seq = 50, 64, 5, 12
    torch.manual_seed(0)
    tm = TorchBiGRU(vocab, out_dim).eval()

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, vocab, (batch, seq))
    tokens[0, 6:] = 0  # trailing padding
    tokens[1, :] = 0  # fully padded row

    with torch.no_grad():
        expected = tm(torch.from_numpy(tokens).long()).numpy()

    enc = BiGRUEncoder(vocab_size=vocab, out_dim=out_dim)
    variables = enc.init(jax.random.key(0), jnp.asarray(tokens, jnp.int32))
    params = _port_weights(variables["params"], tm)
    actual = np.asarray(enc.apply({"params": params}, jnp.asarray(tokens, jnp.int32)))

    np.testing.assert_allclose(actual, expected, atol=2e-6, rtol=1e-5)


def test_padding_row_zero_embedding():
    """padding_idx=0 rows contribute zero embeddings (torch Embedding semantics)."""
    enc = BiGRUEncoder(vocab_size=10, out_dim=8)
    tokens = jnp.zeros((2, 4), jnp.int32)
    variables = enc.init(jax.random.key(0), tokens)
    out = enc.apply(variables, tokens)
    # All-pad rows still produce a valid normalized embedding (GRU runs on
    # zero inputs, matching the reference which does not mask).
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-5)
