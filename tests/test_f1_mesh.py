"""Mesh-F1 tests: sampling, scaling, KNN distances, end-to-end driver."""

import json
import os

import numpy as np
import pytest

from tricolo_tpu.evaluation.f1_mesh import (
    PointCache,
    f1_between_point_sets,
    gt_scale_factor,
    run_f1_over_nearest,
    sample_points_on_mesh,
)

UNIT_QUAD = (
    np.array([[0.0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]]),
    np.array([[0, 1, 2], [0, 2, 3]]),
)


class TestSampling:
    def test_points_lie_on_surface(self):
        v, f = UNIT_QUAD
        pts = sample_points_on_mesh(v, f, 500)
        assert pts.shape == (500, 3)
        assert np.allclose(pts[:, 2], 0)  # planar quad
        assert (pts[:, :2] >= 0).all() and (pts[:, :2] <= 1).all()

    def test_area_weighting(self):
        # Two triangles: one tiny, one 100× larger; samples concentrate on
        # the large one.
        v = np.array(
            [[0.0, 0, 0], [1, 0, 0], [0, 1, 0],
             [0.0, 0, 5], [0.01, 0, 5], [0, 0.01, 5]]
        )
        f = np.array([[0, 1, 2], [3, 4, 5]])
        pts = sample_points_on_mesh(v, f, 1000, rng=np.random.default_rng(0))
        frac_large = (pts[:, 2] < 2.5).mean()
        assert frac_large > 0.95

    def test_gt_scale_factor(self):
        v = np.array([[0.0, 0, 0], [2.5, 1, 0.5]])
        assert gt_scale_factor(v) == pytest.approx(10.0 / 2.5)


class TestF1:
    def test_identical_point_sets_give_100(self):
        rng = np.random.default_rng(0)
        pts = rng.standard_normal((256, 3)).astype(np.float32)
        f1 = f1_between_point_sets(pts, pts.copy())[0.1]
        assert f1 == pytest.approx(100.0, abs=0.01)

    def test_disjoint_point_sets_give_0(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((128, 3)).astype(np.float32)
        b = a + 100.0
        assert f1_between_point_sets(a, b)[0.1] == pytest.approx(0.0, abs=1e-6)

    def test_partial_overlap_matches_numpy_oracle(self):
        rng = np.random.default_rng(1)
        a = rng.random((200, 3)).astype(np.float32)
        b = rng.random((150, 3)).astype(np.float32)
        got = f1_between_point_sets(a, b, (0.1,))[0.1]
        d_ab = np.sqrt(((a[:, None] - b[None]) ** 2).sum(-1)).min(1)
        d_ba = np.sqrt(((b[:, None] - a[None]) ** 2).sum(-1)).min(1)
        p = 100 * (d_ab < 0.1).mean()
        r = 100 * (d_ba < 0.1).mean()
        expect = 2 * p * r / (p + r + 1e-8)
        assert got == pytest.approx(expect, rel=1e-4)


def write_shapenet_obj(root, category, model_id, scale=1.0, offset=0.0):
    d = os.path.join(root, category, model_id, "models")
    os.makedirs(d, exist_ok=True)
    v = (np.array([[0.0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]]) * scale) + offset
    with open(os.path.join(d, "model_normalized.obj"), "w") as f:
        for x, y, z in v:
            f.write(f"v {x} {y} {z}\n")
        f.write("f 1 2 3\nf 1 3 4\n")


class TestDriver:
    def test_run_over_nearest(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        shapenet = str(tmp_path / "ShapeNetCore.v2")
        write_shapenet_obj(shapenet, "cat", "good")     # same quad as GT
        write_shapenet_obj(shapenet, "cat", "gtmodel")
        write_shapenet_obj(shapenet, "cat", "bad", offset=50.0)

        val_map = tmp_path / "val_map.json"
        val_map.write_text(json.dumps(
            [{"model_id": m, "category": "cat"} for m in ("good", "gtmodel", "bad")]
        ))
        nearest = tmp_path / "nearest.jsonl"
        rows = [
            {"groundtruth": "gtmodel-0000", "retrieved_models": ["good"]},
            {"groundtruth": "gtmodel-0001", "retrieved_models": ["bad"]},
            {"groundtruth": "missing-0002", "retrieved_models": ["good"]},  # skipped
        ]
        nearest.write_text("\n".join(json.dumps(r) for r in rows))

        mean_f1 = run_f1_over_nearest(
            str(nearest), str(val_map), shapenet, cache_dir=str(tmp_path / "pc")
        )
        # Query 1: identical geometry → ~100; query 2: disjoint → ~0.
        assert mean_f1 == pytest.approx(50.0, abs=1.0)
        # Point cache was populated per model.
        assert sorted(os.listdir(tmp_path / "pc")) == ["bad.npy", "good.npy", "gtmodel.npy"]
