"""Mesh-retrieval F1: surface sampling + bidirectional KNN (JAX).

Capability parity with the reference's post-hoc calculate_f1.py (pytorch3d
CUDA KNN + mesh sampling): for each nearest.jsonl row, load the ground-truth
and top-1 retrieved ShapeNet OBJs, scale both by the factor that makes the
GT's longest bounding-box edge 10 ("gt-10", calculate_f1.py:83-99,129),
sample 10k points uniformly (area-weighted) from each surface with an
on-disk per-model point cache, and compute F1@0.1 = 2PR/(P+R+eps) where
P/R are the percentages of pred→gt / gt→pred nearest-neighbor distances
under the threshold (calculate_f1.py:21-78). The script prints the mean F1
over queries.

TPU-native replacements: KNN is a brute-force pairwise-distance min via one
(S,3)@(3,S) matmul on device (10k points → a 100M-entry f32 matrix, chunked
to bound memory); surface sampling is vectorized numpy on host.

Replicated quirk: the point cache is keyed by model id only, so a model's
cached points keep whichever scale they were first written with
(calculate_f1.py:173-205 has the same behavior).
"""

from __future__ import annotations

import json
import os

import numpy as np

THRESHOLDS = (0.1,)
NUM_SAMPLES = 10000
SCALE_TARGET = 10.0
EPS = 1e-8


def sample_points_on_mesh(
    vertices: np.ndarray, faces: np.ndarray, num_samples: int, rng=None
) -> np.ndarray:
    """Uniform surface sampling: area-weighted triangles + barycentric."""
    rng = rng or np.random.default_rng(0)
    tri = vertices[faces]  # (F, 3, 3)
    cross = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    areas = 0.5 * np.linalg.norm(cross, axis=1)
    total = areas.sum()
    if total <= 0:
        raise ValueError("degenerate mesh: zero surface area")
    choice = rng.choice(len(faces), size=num_samples, p=areas / total)
    # Uniform barycentric via the sqrt trick.
    r1 = np.sqrt(rng.random(num_samples))
    r2 = rng.random(num_samples)
    a, b, c = tri[choice, 0], tri[choice, 1], tri[choice, 2]
    pts = (1 - r1)[:, None] * a + (r1 * (1 - r2))[:, None] * b + (r1 * r2)[:, None] * c
    return pts.astype(np.float32)


def gt_scale_factor(gt_vertices: np.ndarray, target: float = SCALE_TARGET) -> float:
    """gt-<target> rule: longest GT bbox edge → target length."""
    extent = gt_vertices.max(axis=0) - gt_vertices.min(axis=0)
    return float(target / extent.max())


_block_min = None


def _get_block_min():
    """Module-level jitted kernel: defining it per call would defeat jit's
    cache (fresh function object ⇒ retrace) and recompile the 2048×N
    distance program for every query of an F1 sweep."""
    global _block_min
    if _block_min is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def block_min(a_block, b, b_sq):
            a_sq = jnp.sum(a_block * a_block, axis=1)
            d2 = a_sq[:, None] - 2.0 * (a_block @ b.T) + b_sq[None, :]
            return jnp.sqrt(jnp.maximum(jnp.min(d2, axis=1), 0.0))

        _block_min = block_min
    return _block_min


def _min_dists_chunked(a: np.ndarray, b: np.ndarray, chunk: int = 2048) -> np.ndarray:
    """For each row of ``a``: distance to its nearest neighbor in ``b``."""
    import jax.numpy as jnp

    block_min = _get_block_min()
    b = jnp.asarray(b)
    b_sq = jnp.sum(b * b, axis=1)

    out = []
    for start in range(0, a.shape[0], chunk):
        block = a[start : start + chunk]
        pad = chunk - block.shape[0]
        if pad:  # static shape per chunk → one compile
            block = np.pad(block, ((0, pad), (0, 0)))
        out.append(
            np.asarray(block_min(jnp.asarray(block), b, b_sq))[: chunk - pad or None]
        )
    return np.concatenate(out)[: a.shape[0]]


def f1_between_point_sets(
    pred_points: np.ndarray,
    gt_points: np.ndarray,
    thresholds=THRESHOLDS,
    eps: float = EPS,
) -> dict[float, float]:
    """F1@t between two sampled point sets (percent-scaled P/R)."""
    pred_to_gt = _min_dists_chunked(pred_points, gt_points)
    gt_to_pred = _min_dists_chunked(gt_points, pred_points)
    result = {}
    for t in thresholds:
        precision = 100.0 * float((pred_to_gt < t).mean())
        recall = 100.0 * float((gt_to_pred < t).mean())
        result[t] = (2.0 * precision * recall) / (precision + recall + eps)
    return result


class PointCache:
    """Per-model sampled-point cache (``point_cache/{model_id}.npy``)."""

    def __init__(self, cache_dir: str = "point_cache"):
        self.cache_dir = cache_dir

    def path(self, model_id: str) -> str:
        return os.path.join(self.cache_dir, f"{model_id}.npy")

    def has(self, model_id: str) -> bool:
        return os.path.exists(self.path(model_id))

    def get_or_sample(
        self,
        model_id: str,
        obj_path: str,
        scale: float,
        num_samples: int = NUM_SAMPLES,
        mesh: tuple | None = None,
    ) -> np.ndarray:
        """``mesh`` = already-parsed (vertices, faces), avoiding a second
        OBJ parse when the caller loaded the file for the scale factor."""
        if self.has(model_id):
            return np.load(self.path(model_id))
        if mesh is None:
            from ..data.render import load_obj

            mesh = load_obj(obj_path)
        vertices, faces = mesh
        points = sample_points_on_mesh(vertices * scale, faces, num_samples)
        os.makedirs(self.cache_dir, exist_ok=True)
        np.save(self.path(model_id), points)
        return points


def mesh_f1_for_query(
    gt_id: str,
    pred_id: str,
    model_to_category: dict[str, str],
    shapenet_root: str,
    cache: PointCache,
    threshold: float = 0.1,
) -> float:
    """F1@threshold between the GT mesh and the top-1 retrieved mesh."""
    from ..data.render import load_obj

    def obj_path(model_id):
        return os.path.join(
            shapenet_root, model_to_category[model_id], model_id,
            "models", "model_normalized.obj",
        )

    gt_mesh = None
    if cache.has(gt_id) and cache.has(pred_id):
        scale = 1.0  # cached points already carry their scale (quirk noted above)
    else:
        gt_mesh = load_obj(obj_path(gt_id))
        scale = gt_scale_factor(gt_mesh[0])
    gt_points = cache.get_or_sample(gt_id, obj_path(gt_id), scale, mesh=gt_mesh)
    pred_points = cache.get_or_sample(pred_id, obj_path(pred_id), scale)
    return f1_between_point_sets(pred_points, gt_points, (threshold,))[threshold]


def run_f1_over_nearest(
    nearest_path: str,
    val_map_path: str,
    shapenet_root: str,
    cache_dir: str = "point_cache",
    threshold: float = 0.1,
) -> float:
    """Mean top-1 mesh F1 over all evaluable nearest.jsonl rows."""
    with open(val_map_path) as f:
        model_to_category = {r["model_id"]: r["category"] for r in json.load(f)}

    with open(nearest_path) as f:
        rows = [json.loads(line) for line in f if line.strip()]

    cache = PointCache(cache_dir)
    scores = []
    for row in rows:
        gt_id = row["groundtruth"].rsplit("-", 1)[0]
        pred_id = row["retrieved_models"][0]
        if gt_id not in model_to_category or pred_id not in model_to_category:
            continue

        def obj_exists(model_id):
            return os.path.exists(
                os.path.join(
                    shapenet_root, model_to_category[model_id], model_id,
                    "models", "model_normalized.obj",
                )
            )

        # Skip rows whose GT *or* retrieved mesh is unavailable — one
        # missing OBJ must not abort a long evaluation sweep. When either
        # mesh still needs sampling, the GT OBJ is also required for the
        # gt-10 scale factor.
        gt_ok = cache.has(gt_id) or obj_exists(gt_id)
        pred_ok = cache.has(pred_id) or obj_exists(pred_id)
        needs_sampling = not (cache.has(gt_id) and cache.has(pred_id))
        if not (gt_ok and pred_ok) or (needs_sampling and not obj_exists(gt_id)):
            continue
        scores.append(
            mesh_f1_for_query(gt_id, pred_id, model_to_category, shapenet_root, cache, threshold)
        )
    if not scores:
        raise ValueError("no evaluable queries found in nearest.jsonl")
    return float(np.mean(scores))
