"""Retrieval evaluation: embedding matrices, nearest neighbors, RR/NDCG/MRR.

Re-exports the full public surface (the reference's ``tricolo.evaluation`` is
a namespace package with no re-exports, which is why its ``eval.py`` is broken
— reference eval.py:2 / README.md:118; fixed here).
"""

from .retrieval import (
    RetrievalMetrics,
    compute_metrics,
    compute_nearest_neighbors,
    compute_pr_at_k,
    construct_embeddings_matrix,
    write_nearest_info,
)
from .device import compute_metrics_on_device

__all__ = [
    "RetrievalMetrics",
    "compute_metrics",
    "compute_metrics_on_device",
    "compute_nearest_neighbors",
    "compute_pr_at_k",
    "construct_embeddings_matrix",
    "write_nearest_info",
]
