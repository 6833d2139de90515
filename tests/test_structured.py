"""Structured synthetic dataset: attribute-grounded captions and shapes."""

import numpy as np
import pytest

from tricolo_tpu.config import load_config
from tricolo_tpu.data.datasets import build_dataset
from tricolo_tpu.data.structured import (
    COLORS,
    VOCAB,
    WORD_TO_ID,
    caption_words,
    project_views,
    voxelize_primitive,
)


@pytest.fixture(scope="module")
def cfg():
    return load_config(
        [
            "data=structured",
            "data.num_models=20",
            "data.voxel_size=32",
            "data.image_size=32",
        ]
    )


class TestStructuredDataset:
    def test_deterministic(self, cfg):
        a = build_dataset(cfg, "val")
        b = build_dataset(cfg, "val")
        np.testing.assert_array_equal(a[3]["tokens"], b[3]["tokens"])
        np.testing.assert_array_equal(a[3]["voxel_flat"], b[3]["voxel_flat"])

    def test_item_contract(self, cfg):
        ds = build_dataset(cfg, "train")
        assert len(ds) == 20 * cfg.data.captions_per_model
        item = ds[0]
        assert item["tokens"].dtype == np.int32
        assert item["images"].shape == (3, 32, 32, 3)
        assert item["voxel_flat"].dtype == np.uint32
        # occupancy bit set on every site (alpha>0 by construction)
        assert ((item["voxel_rgb"] >> 24) & 1).all()

    def test_captions_identify_attributes(self, cfg):
        """Every caption mentions all five attribute words of its model,
        and captions of the same model share them."""
        ds = build_dataset(cfg, "val")
        per_model = {}
        attr_words = set(VOCAB[: len(VOCAB) - 14])  # attribute vocabulary
        for row in ds.language_data:
            words = set(row["text"].split()) & attr_words
            assert len(words) == 5, row["text"]
            per_model.setdefault(row["model_id"], []).append(words)
        for caps in per_model.values():
            assert all(c == caps[0] for c in caps)

    def test_tokens_roundtrip_words(self, cfg):
        ds = build_dataset(cfg, "val")
        row = ds.language_data[0]
        ids = [WORD_TO_ID[w] for w in row["text"].split()]
        np.testing.assert_array_equal(row["tokens"][: len(ids)], ids)
        assert (row["tokens"][len(ids) :] == 0).all()

    def test_voxelized_color_matches_attribute(self):
        rng = np.random.default_rng(0)
        attrs = {
            "shape": "box",
            "size": "large",
            "color": "red",
            "aspect": "even",
            "vpos": "middle",
        }
        grid = voxelize_primitive(attrs, 32, rng)
        occ = grid[3] > 0
        assert occ.sum() > 500
        base = np.asarray(COLORS["red"], np.float64)
        mean_rgb = np.stack([grid[c][occ].mean() for c in range(3)])
        assert np.abs(mean_rgb - base).max() < 12  # jitter is ±25, zero-mean

    def test_vpos_moves_centroid(self):
        rng = np.random.default_rng(0)
        common = {"shape": "sphere", "size": "small", "color": "blue", "aspect": "even"}
        zs = {}
        for vpos in ("bottom", "top"):
            grid = voxelize_primitive({**common, "vpos": vpos}, 32, rng)
            zcoords = np.nonzero(grid[3] > 0)[2]
            zs[vpos] = zcoords.mean()
        assert zs["top"] - zs["bottom"] > 5

    def test_projection_views(self):
        rng = np.random.default_rng(0)
        attrs = {
            "shape": "sphere",
            "size": "medium",
            "color": "green",
            "aspect": "even",
            "vpos": "middle",
        }
        grid = voxelize_primitive(attrs, 32, rng)
        views = project_views(grid, 64, 4)
        assert views.shape == (4, 64, 64, 3)
        # Background is white, object pixels are green-dominant.
        center = views[0, 32, 32]
        assert center[1] > center[0] and center[1] > center[2]
        assert (views[0, 0, 0] == 255).all()

    def test_caption_templates_vary(self):
        attrs = {
            "shape": "torus",
            "size": "small",
            "color": "cyan",
            "aspect": "tall",
            "vpos": "top",
        }
        c0 = caption_words(attrs, 0)
        c1 = caption_words(attrs, 1)
        assert c0 != c1
