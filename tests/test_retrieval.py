"""Retrieval-metric parity tests against a literal per-query oracle.

The oracle below re-states the reference's metric definitions
(tricolo/evaluation/eval_retrieval.py:149-207) as straight-line per-query
Python, hand-derived from observed behavior; the production code is the
vectorized version. SURVEY.md §4 calls for exactly this pairing.
"""

import json

import numpy as np
import pytest

from tricolo_tpu.evaluation import (
    compute_metrics,
    compute_nearest_neighbors,
    compute_pr_at_k,
    construct_embeddings_matrix,
)


def oracle_metrics(indices, sort_indices, labels, fit_labels, k):
    """Literal per-query restatement of the reference metric loop."""
    q = len(labels)
    label_counter = np.bincount(fit_labels)
    precision = np.zeros(k)
    recall = np.zeros(k)
    recall_rate = np.zeros(k)
    ndcg = np.zeros(k)
    mrr = 0.0
    for i in range(q):
        label = labels[i]
        near = [fit_labels[x] for x in indices[i]]
        n_rel = label_counter[label]
        rel = np.array([c == label for c in near], dtype=float)
        ideal = np.zeros(k)
        ideal[: min(n_rel, k)] = 1.0
        disc = np.log2(np.arange(1, k + 1) + 1)
        dcg = np.cumsum((np.exp2(rel) - 1) / disc)
        idcg = np.cumsum((np.exp2(ideal) - 1) / disc)
        ndcg += dcg / idcg
        for kk in range(k):
            hits = sum(1 for c in near[: kk + 1] if c == label)
            precision[kk] += hits / (kk + 1)
            recall[kk] += hits / n_rel
            recall_rate[kk] += 1.0 if hits > 0 else 0.0
        all_classes = [fit_labels[x] for x in sort_indices[i]]
        mrr += 1.0 / (all_classes.index(label) + 1)
    return precision / q, recall / q, recall_rate / q, ndcg / q, mrr / q


def make_embeddings_dict(rng, n_models=7, captions_per_model=3, dim=16):
    tuples = []
    for m in range(n_models):
        shape_emb = rng.standard_normal(dim)
        shape_emb /= np.linalg.norm(shape_emb)
        for c in range(captions_per_model):
            text_emb = shape_emb + 0.5 * rng.standard_normal(dim)
            text_emb /= np.linalg.norm(text_emb)
            tuples.append((f"caption {m} {c}", "cat", f"model{m}", text_emb, shape_emb))
    rng.shuffle(tuples)
    return {"caption_embedding_tuples": tuples, "dataset_size": len(tuples)}


class TestConstructMatrix:
    def test_dedup_first_occurrence(self):
        rng = np.random.default_rng(0)
        d = make_embeddings_dict(rng, n_models=5)
        text, shape, labels, fit_labels, l2m = construct_embeddings_matrix(d)
        assert text.shape[0] == len(d["caption_embedding_tuples"])
        assert shape.shape[0] == 5
        # First caption of each model supplies its shape row & label id.
        seen = {}
        for idx, t in enumerate(d["caption_embedding_tuples"]):
            if t[2] not in seen:
                seen[t[2]] = len(seen)
                np.testing.assert_allclose(shape[seen[t[2]]], t[4])
            assert labels[idx] == seen[t[2]]
        assert list(fit_labels) == list(range(5))
        assert all(l2m[seen[m]] == m for m in seen)


class TestNearestNeighbors:
    def test_ranking_is_descending_similarity(self):
        rng = np.random.default_rng(1)
        fit = rng.standard_normal((9, 8))
        query = rng.standard_normal((4, 8))
        dist, idx, sort_idx = compute_nearest_neighbors(fit, query, 5)
        sims = query @ fit.T
        for i in range(4):
            expect = np.argsort(-sims[i], kind="stable")
            np.testing.assert_array_equal(sort_idx[i], expect)
            np.testing.assert_array_equal(idx[i], expect[:5])
            np.testing.assert_allclose(dist[i], np.sort(sims[i])[::-1][:5])

    def test_self_removal_when_fit_eq_query(self):
        rng = np.random.default_rng(2)
        m = rng.standard_normal((8, 6))
        _, idx, _ = compute_nearest_neighbors(m, m.copy(), 5)
        for i in range(8):
            assert i not in idx[i]
        assert idx.shape == (8, 5)

    def test_blocked_path_matches_unblocked(self, monkeypatch):
        import tricolo_tpu.evaluation.retrieval as R

        rng = np.random.default_rng(3)
        fit = rng.standard_normal((20, 4))
        query = rng.standard_normal((50, 4))
        expected = compute_nearest_neighbors(fit, query, 5)
        monkeypatch.setattr(R, "_BLOCK_QUERY_THRESHOLD", 10)
        monkeypatch.setattr(R, "_BLOCK_SIZE", 7)
        blocked = compute_nearest_neighbors(fit, query, 5)
        # Distances may differ by 1 ULP (BLAS GEMM tiling varies with the
        # block shape); rankings must be identical.
        np.testing.assert_allclose(expected[0], blocked[0], rtol=1e-12)
        np.testing.assert_array_equal(expected[1], blocked[1])
        np.testing.assert_array_equal(expected[2], blocked[2])


class TestMetricsOracle:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_vectorized_matches_oracle(self, seed):
        rng = np.random.default_rng(seed)
        d = make_embeddings_dict(rng, n_models=11, captions_per_model=4, dim=12)
        text, shape, labels, fit_labels, _ = construct_embeddings_matrix(d)
        _, idx, sort_idx = compute_nearest_neighbors(shape, text, 5)
        metrics = compute_pr_at_k(idx, sort_idx, labels, 5, fit_labels)
        p, r, rr, ndcg, mrr = oracle_metrics(idx, sort_idx, labels, fit_labels, 5)
        np.testing.assert_allclose(metrics.precision, p, rtol=1e-12)
        np.testing.assert_allclose(metrics.recall, r, rtol=1e-12)
        np.testing.assert_allclose(metrics.recall_rate, rr, rtol=1e-12)
        np.testing.assert_allclose(metrics.ndcg, ndcg, rtol=1e-12)
        assert metrics.mrr == pytest.approx(mrr, rel=1e-12)

    def test_truncated_n_neighbors(self):
        """n_neighbors smaller than the retrieved width must truncate the
        indices (regression: (Q,5) relevance broadcast against (3,) crashed)
        and agree with the oracle at the smaller k."""
        rng = np.random.default_rng(3)
        d = make_embeddings_dict(rng, n_models=9, captions_per_model=3, dim=8)
        text, shape, labels, fit_labels, _ = construct_embeddings_matrix(d)
        _, idx, sort_idx = compute_nearest_neighbors(shape, text, 5)
        metrics = compute_pr_at_k(idx, sort_idx, labels, 3, fit_labels)
        p, r, rr, ndcg, mrr = oracle_metrics(
            idx[:, :3], sort_idx, labels, fit_labels, 3
        )
        np.testing.assert_allclose(metrics.precision, p, rtol=1e-12)
        np.testing.assert_allclose(metrics.recall_rate, rr, rtol=1e-12)
        np.testing.assert_allclose(metrics.ndcg, ndcg, rtol=1e-12)

    def test_perfect_retrieval_self_removed(self):
        # One caption per model, text == shape embedding → fit equals query,
        # so each query's self-match is removed from top-k; with unique
        # labels every remaining neighbor is wrong → RR@k = 0. The full
        # ranking (sort_indices) keeps self at rank 1 → MRR = 1.
        dim = 8
        embs = np.eye(dim)
        tuples = [(f"c{i}", "cat", f"m{i}", embs[i], embs[i]) for i in range(8)]
        m = compute_metrics({"caption_embedding_tuples": tuples}, nearest_path=None)
        assert m.recall_rate[0] == 0.0
        assert m.mrr == 1.0

    def test_near_perfect_retrieval(self):
        dim = 8
        embs = np.eye(dim)
        tuples = [
            (f"c{i}", "cat", f"m{i}", embs[i] + 0.01 * np.roll(embs[i], 1), embs[i])
            for i in range(8)
        ]
        m = compute_metrics({"caption_embedding_tuples": tuples}, nearest_path=None)
        assert m.recall_rate[0] == 1.0
        assert m.ndcg[4] == 1.0
        assert m.mrr == 1.0


class TestArtifacts:
    def test_nearest_jsonl_rows(self, tmp_path):
        rng = np.random.default_rng(5)
        d = make_embeddings_dict(rng, n_models=6, captions_per_model=2)
        path = tmp_path / "nearest.jsonl"
        compute_metrics(d, nearest_path=str(path), rng=np.random.default_rng(0))
        rows = [json.loads(line) for line in path.read_text().splitlines()]
        assert len(rows) == 12
        suffixes = sorted(int(r["groundtruth"].rsplit("-", 1)[1]) for r in rows)
        assert suffixes == list(range(12))
        for row in rows:
            assert len(row["retrieved_models"]) == 5
            assert len(row["distance"]) == 5
            assert row["cat_id"] == "cat"


class TestDeviceEval:
    """On-device eval must match the NumPy oracle pipeline exactly."""

    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_numpy_pipeline(self, seed):
        from tricolo_tpu.evaluation.device import compute_metrics_on_device

        rng = np.random.default_rng(seed)
        d = make_embeddings_dict(rng, n_models=13, captions_per_model=3, dim=24)
        expect = compute_metrics(d, nearest_path=None)
        got, top_k, top_sims, _ = compute_metrics_on_device(d)
        np.testing.assert_allclose(got.precision, expect.precision, rtol=1e-5)
        np.testing.assert_allclose(got.recall, expect.recall, rtol=1e-5)
        np.testing.assert_allclose(got.recall_rate, expect.recall_rate, rtol=1e-5)
        np.testing.assert_allclose(got.ndcg, expect.ndcg, rtol=1e-5)
        assert got.mrr == pytest.approx(expect.mrr, rel=1e-5)

        # Rankings identical too (same tie-break semantics).
        text, shape, labels, fit_labels, _ = construct_embeddings_matrix(d)
        _, idx, _ = compute_nearest_neighbors(shape, text, 5)
        np.testing.assert_array_equal(top_k, idx)

    def test_tie_breaking_matches(self):
        from tricolo_tpu.evaluation.device import compute_metrics_on_device

        # Duplicate shape embeddings force similarity ties; tie order must
        # match the reference (higher fit index first).
        dim = 8
        base = np.eye(dim)[0]
        tuples = [
            (f"c{i}", "cat", f"m{i}", base + 1e-3 * np.eye(dim)[i], base.copy())
            for i in range(6)
        ]
        expect = compute_metrics({"caption_embedding_tuples": tuples}, nearest_path=None)
        got, top_k, _, _ = compute_metrics_on_device({"caption_embedding_tuples": tuples})
        text, shape, labels, fit_labels, _ = construct_embeddings_matrix(
            {"caption_embedding_tuples": tuples}
        )
        _, idx, _ = compute_nearest_neighbors(shape, text, 5)
        np.testing.assert_array_equal(top_k, idx)
        assert got.mrr == pytest.approx(expect.mrr, rel=1e-6)
