"""On-device retrieval evaluation (similarity + ranking + metrics in XLA).

The TPU-native upgrade over the reference's NumPy eval loop
(eval_retrieval.py:68-207): the (Q, M) similarity matrix is one MXU matmul,
the ranking one argsort, and every metric a masked reduction — all under
jit, so large eval splits never round-trip rankings through the host. The
NumPy pipeline (retrieval.py) remains the oracle; equality is tested on the
virtual CPU mesh.

Scope: the text→shape retrieval path (fit = deduplicated shape matrix, so
fit labels are unique and each query has exactly one relevant item). The
reference's fit==query self-removal branch only arises for shape↔shape
evals, which stay on the NumPy path.

Tie-breaking matches the reference exactly: ascending stable argsort,
reversed — so among equal similarities the higher fit index ranks first
(eval_retrieval.py:75-82 semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .retrieval import N_NEIGHBORS, RetrievalMetrics, construct_embeddings_matrix


@functools.partial(jax.jit, static_argnames=("n_neighbors",))
def _device_metrics(text_matrix, shape_matrix, labels, n_neighbors: int = N_NEIGHBORS):
    """Core jitted computation → dict of small metric arrays."""
    sims = text_matrix @ shape_matrix.T  # (Q, M) — MXU
    # Reference tie order: ascending stable argsort, then flip.
    order = jnp.flip(jnp.argsort(sims, axis=1, stable=True), axis=1)
    top_k = order[:, :n_neighbors]

    # Fit labels are the identity after dedup (one row per model), so the
    # retrieved items' labels are their indices.
    rel = (top_k == labels[:, None]).astype(jnp.float32)  # (Q, k)
    num_correct = jnp.cumsum(rel, axis=1)

    # Each query has exactly one relevant fit item (dedup) → the ideal
    # relevance prefix is [1, 0, 0, ...].
    discounts = jnp.log2(jnp.arange(1, n_neighbors + 1, dtype=jnp.float32) + 1)
    ideal = jnp.zeros((n_neighbors,), jnp.float32).at[0].set(1.0)
    dcg = jnp.cumsum((jnp.exp2(rel) - 1) / discounts, axis=1)
    idcg = jnp.cumsum((jnp.exp2(ideal) - 1) / discounts)
    ndcg = dcg / idcg

    first_hit = jnp.argmax(order == labels[:, None], axis=1)
    mrr = jnp.mean(1.0 / (first_hit + 1).astype(jnp.float32))

    q = text_matrix.shape[0]
    ks = jnp.arange(1, n_neighbors + 1, dtype=jnp.float32)
    return {
        "precision": jnp.sum(num_correct / ks, axis=0) / q,
        "recall": jnp.sum(num_correct, axis=0) / q,  # num_relevant == 1
        "recall_rate": jnp.sum(num_correct > 0, axis=0) / q,
        "ndcg": jnp.sum(ndcg, axis=0) / q,
        "mrr": mrr,
        "top_k": top_k,
        "top_k_sims": jnp.take_along_axis(sims, top_k, axis=1),
    }


def compute_metrics_on_device(
    embeddings_dict, n_neighbors: int = N_NEIGHBORS
) -> tuple[RetrievalMetrics, np.ndarray, np.ndarray, dict]:
    """Device twin of retrieval.compute_metrics (no artifact writing).

    Returns (metrics, top_k indices, top_k similarities, label→model_id);
    the caller can feed the latter three to write_nearest_info without
    rebuilding the embedding matrices.
    """
    text_matrix, shape_matrix, labels, _, label_to_model_id = (
        construct_embeddings_matrix(embeddings_dict)
    )
    out = _device_metrics(
        jnp.asarray(text_matrix, jnp.float32),
        jnp.asarray(shape_matrix, jnp.float32),
        jnp.asarray(labels),
        n_neighbors=min(n_neighbors, shape_matrix.shape[0]),
    )
    metrics = RetrievalMetrics(
        precision=np.asarray(out["precision"], np.float64),
        recall=np.asarray(out["recall"], np.float64),
        recall_rate=np.asarray(out["recall_rate"], np.float64),
        ndcg=np.asarray(out["ndcg"], np.float64),
        mrr=float(out["mrr"]),
    )
    return (
        metrics,
        np.asarray(out["top_k"]),
        np.asarray(out["top_k_sims"]),
        label_to_model_id,
    )
