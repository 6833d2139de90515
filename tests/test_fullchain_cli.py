"""Full-chain CLI test on raw Text2Shape-FORMAT fixtures.

The reference README's workflow (README.md:40-115) is a chain of CLI
invocations over the raw data release: preprocess → train → test → eval →
calculate_f1. Every piece is unit-tested elsewhere; this module tests the
SPLICE POINTS by fabricating a 4-model miniature Text2Shape in the raw
formats the release actually uses —

* ``processed_captions_{split}.p`` caption pickles ({"caption_tuples":
  [(token_ids, category, nrrd_name), ...]}) + ``shapenet.json`` vocab
  (reference preprocess_all_data.py:16-41),
* gzip NRRD solid-voxel archives ``nrrd_256_filter_div_{D}_solid``,
* ShapeNetCore.v2 OBJ meshes —

and driving the real CLIs through subprocess, asserting each artifact:
``{split}_map.json``, the npz schema, a checkpoint, the
"RR@1 RR@5 NDCG@5 MRR" line, ``output.p``, ``nearest.jsonl`` and the
mean-F1 line.
"""

import json
import os
import pickle
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODELS = [
    ("03001627", "chairA"),
    ("03001627", "chairB"),
    ("04379243", "tableA"),
    ("04379243", "tableB"),
]
VOCAB = {"1": "a", "2": "red", "3": "blue", "4": "chair", "5": "table", "6": "round"}

CUBE_OBJ = """v -0.3 -0.3 -0.3
v 0.3 -0.3 -0.3
v 0.3 0.3 -0.3
v -0.3 0.3 -0.3
v -0.3 -0.3 0.3
v 0.3 -0.3 0.3
v 0.3 0.3 0.3
v -0.3 0.3 0.3
f 1 2 3 4
f 5 6 7 8
f 1 2 6 5
f 2 3 7 6
f 3 4 8 7
f 4 1 5 8
"""


def _solid_rgba(rng, d):
    """A solid-ellipsoid (4, d, d, d) uint8 RGBA grid (alpha>0 = occupied)."""
    z, y, x = np.ogrid[0:d, 0:d, 0:d]
    c = rng.uniform(0.4 * d, 0.6 * d, 3)
    r = rng.uniform(0.18 * d, 0.28 * d)
    m = ((z - c[0]) ** 2 + (y - c[1]) ** 2 + (x - c[2]) ** 2) <= r * r
    grid = np.zeros((4, d, d, d), np.uint8)
    for ch in range(3):
        grid[ch][m] = rng.integers(1, 256)
    grid[3][m] = 255
    return grid


def _build_raw_dataset(root):
    """Fabricate the raw Text2Shape release layout under ``root``."""
    from tricolo_tpu.data import nrrd

    ds = os.path.join(root, "text2shape-data", "chair_table")
    os.makedirs(ds, exist_ok=True)
    # Vocab json (reference format: {"idx_to_word": {...}}).
    with open(os.path.join(ds, "shapenet.json"), "w") as f:
        json.dump({"idx_to_word": VOCAB}, f)
    # Caption pickles: 2 captions per model, shared across splits (a real
    # release has disjoint splits; the CHAIN under test is format-driven).
    rng = np.random.default_rng(0)
    tuples = []
    for cat, mid in MODELS:
        noun = "4" if cat == "03001627" else "5"
        for adj in ("2", "3"):
            ids = [int(adj), int(noun), 0, 0, 0, 0]
            tuples.append((np.asarray(ids, np.int64), cat, f"{mid}.nrrd"))
    for split in ("train", "val", "test"):
        with open(os.path.join(ds, f"processed_captions_{split}.p"), "wb") as f:
            pickle.dump({"caption_tuples": tuples}, f)
    # Gzip NRRD solid-voxel archives at all three release resolutions.
    for _, mid in MODELS:
        g32 = None
        for d in (32, 64, 128):
            vdir = os.path.join(ds, f"nrrd_256_filter_div_{d}_solid", mid)
            os.makedirs(vdir, exist_ok=True)
            grid = _solid_rgba(rng, d)
            if d == 32:
                g32 = grid
            nrrd.write(os.path.join(vdir, f"{mid}.nrrd"), grid, encoding="gzip")
        assert g32 is not None and (g32[3] > 0).any()
    # ShapeNetCore.v2 OBJ meshes (preprocess renders them; calculate_f1
    # samples them).
    for cat, mid in MODELS:
        mdir = os.path.join(root, "text2shape-data", "ShapeNetCore.v2", cat, mid, "models")
        os.makedirs(mdir, exist_ok=True)
        with open(os.path.join(mdir, "model_normalized.obj"), "w") as f:
            f.write(CUBE_OBJ)
    return ds


def _run_cli(script, args, cwd):
    """Run a repo CLI in a subprocess from ``cwd``; returns stdout."""
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        cwd=cwd,
        capture_output=True,
        text=True,
        timeout=1800,
        env={**os.environ, "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")},
    )
    assert result.returncode == 0, (
        f"{script} {' '.join(args)} failed:\n"
        + result.stdout[-3000:]
        + result.stderr[-2000:]
    )
    return result.stdout


@pytest.mark.slow
def test_fullchain_raw_to_f1(tmp_path):
    root = str(tmp_path)
    _build_raw_dataset(root)

    common = [
        "data=text2shape_chair_table",
        f"data.dataset_root_path={root}",
        "data.batch_size=4",
        "data.voxel_size=32",
        "data.num_views=2",
        "data.image_size=32",
        "model.voxel_encoder=VoxelCNNEncoder",
        "experiment_name=fullchain",
        "+platform=cpu",
        "parallel.data_parallel=1",
    ]

    # 1. preprocess: caption pickles + NRRD + OBJ → map.json + npz
    out = _run_cli(
        "preprocess.py",
        ["data=text2shape_chair_table", f"data.dataset_root_path={root}",
         "data.num_views=2", "+cpu_workers=1"],
        cwd=root,
    )
    exp_data = os.path.join(root, "text2shape-data", "chair_table", "preprocessed", "exp_data")
    for split in ("train", "val", "test"):
        map_path = os.path.join(exp_data, f"{split}_map.json")
        assert os.path.exists(map_path), out
        rows = json.load(open(map_path))
        assert len(rows) == 8  # 4 models × 2 captions
        assert rows[0]["caption"] in ("red chair", "blue chair", "red table", "blue table")
        assert isinstance(rows[0]["tokens"], list)
    for cat, mid in MODELS:
        npz = np.load(os.path.join(exp_data, cat, f"{mid}.npz"))
        assert set(npz.files) == {"voxel32", "voxel64", "voxel128", "images"}
        assert npz["voxel32"].shape == (4, 32, 32, 32)
        assert npz["images"].shape == (2, 3, 224, 224)

    # 2. train 2 epochs (the DEFAULT windowed_compact flagship transfer)
    out = _run_cli(
        "train.py", common + ["trainer.max_epochs=2"], cwd=root
    )
    assert re.search(r"epoch 1: RR@1=", out), out
    ckpt = os.path.join(
        root, "output", "Text2ShapeChairTable", "fullchain", "training", "epoch=1.ckpt"
    )
    assert os.path.exists(ckpt), out

    # 3. test: metric line + output.p + nearest.jsonl
    out = _run_cli("test.py", common + [f"+ckpt_path={ckpt}"], cwd=root)
    assert "RR@1 RR@5 NDCG@5 MRR" in out, out
    pred = os.path.join(
        root, "output", "Text2ShapeChairTable", "fullchain",
        "inference", "val", "predictions", "output.p",
    )
    assert os.path.exists(pred), out
    nearest = os.path.join(root, "nearest.jsonl")  # CWD, as upstream
    assert os.path.exists(nearest), out
    rows = [json.loads(line) for line in open(nearest) if line.strip()]
    assert rows and "retrieved_models" in rows[0] and "groundtruth" in rows[0]

    # 4. offline eval over the saved predictions (the entry the reference
    # ships broken, reference eval.py:2-11)
    out = _run_cli("eval.py", [f"+prediction_file_path={pred}"], cwd=root)
    assert "RR@1 RR@5 NDCG@5 MRR" in out, out

    # 5. mesh F1 over nearest.jsonl + the OBJ meshes
    out = _run_cli(
        "calculate_f1.py",
        [
            f"+nearest_path={nearest}",
            f"+val_map_path={os.path.join(exp_data, 'val_map.json')}",
            f"+shapenet_root={os.path.join(root, 'text2shape-data', 'ShapeNetCore.v2')}",
            f"+point_cache_dir={os.path.join(root, 'point_cache')}",
        ],
        cwd=root,
    )
    f1 = float(out.strip().splitlines()[-1])
    # Mean F1@0.1 on the reference's percent scale; all four fixture
    # meshes are the same cube, so any retrieval scores well above zero
    # (sampling noise keeps it below a perfect 100).
    assert 0.0 < f1 <= 100.0
