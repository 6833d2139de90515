"""Data pipeline tests: datasets, collation, iteration, device prep."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from tricolo_tpu.config import load_config
from tricolo_tpu.data import (
    BatchIterator,
    DataModule,
    build_dataset,
    collate,
    densify_voxels,
    normalize_images,
)
from tricolo_tpu.data.datasets import (
    CLIP_IMAGE_MEAN,
    CLIP_IMAGE_STD,
    GeneralDataset,
    dense_rgba_to_sparse,
)


@pytest.fixture(scope="module")
def synth_cfg():
    return load_config(["data=synthetic"])


@pytest.fixture(scope="module")
def synth_train(synth_cfg):
    return build_dataset(synth_cfg, "train")


class TestSyntheticDataset:
    def test_item_contract(self, synth_cfg, synth_train):
        item = synth_train[0]
        d = synth_cfg.data
        assert item["tokens"].shape == (d.max_tokens,)
        assert item["tokens"].dtype == np.int32
        assert item["images"].shape == (d.num_views, d.image_size, d.image_size, 3)
        assert item["images"].dtype == np.uint8
        assert item["voxel_flat"].dtype == np.uint32
        assert item["voxel_rgb"].dtype == np.uint32
        assert item["voxel_flat"].shape == item["voxel_rgb"].shape
        # Decoded coordinates stay inside the grid.
        x = item["voxel_flat"] >> 16
        z = item["voxel_flat"] & 0xFF
        assert (x < d.voxel_size).all() and (z < d.voxel_size).all()

    def test_deterministic_and_split_distinct(self, synth_cfg):
        a = build_dataset(synth_cfg, "train")
        b = build_dataset(synth_cfg, "train")
        np.testing.assert_array_equal(a[0]["tokens"], b[0]["tokens"])
        v = build_dataset(synth_cfg, "val")
        assert v[0]["model_id"] != a[0]["model_id"]

    def test_counts(self, synth_cfg, synth_train):
        d = synth_cfg.data
        assert len(synth_train) == d.num_models * d.captions_per_model


class TestCollate:
    def test_static_shapes_and_packing(self, synth_train):
        from tricolo_tpu.data.device_prep import VOXEL_PAD_SENTINEL

        items = [synth_train[i] for i in range(4)]
        n_pad = synth_train.max_voxel_points
        batch = collate(items, n_pad)
        assert batch["voxel_flat"].shape == (4, n_pad)
        assert batch["voxel_flat"].dtype == np.uint32
        assert batch["voxel_rgb"].shape == (4, n_pad)
        for i, item in enumerate(items):
            n = item["voxel_flat"].shape[0]
            np.testing.assert_array_equal(batch["voxel_flat"][i, :n], item["voxel_flat"])
            np.testing.assert_array_equal(batch["voxel_rgb"][i, :n], item["voxel_rgb"])
            # Real entries strictly increasing, padding = sentinel.
            assert (np.diff(batch["voxel_flat"][i, :n].astype(np.int64)) > 0).all()
            assert (batch["voxel_flat"][i, n:] == VOXEL_PAD_SENTINEL).all()
            assert (batch["voxel_rgb"][i, n:] == 0).all()

    def test_disabled_modalities_not_collated(self, synth_train):
        """with_voxels=False must skip all voxel host work (and never index
        item['voxel_flat']); with_images=False skips the image stack."""
        items = [
            {k: v for k, v in synth_train[i].items() if not k.startswith("voxel")}
            for i in range(3)
        ]
        batch = collate(
            items, synth_train.max_voxel_points, with_images=True, with_voxels=False
        )
        assert "voxel_flat" not in batch and "voxel_rgb" not in batch
        assert "voxel_grid" not in batch
        assert "images" in batch
        batch2 = collate(
            [synth_train[i] for i in range(3)],
            synth_train.max_voxel_points,
            with_images=False,
            with_voxels=True,
        )
        assert "images" not in batch2 and "voxel_flat" in batch2

    def test_dense_transfer_equivalence(self, synth_train, synth_cfg):
        """data.voxel_transfer=dense ships the host-densified grid; the
        device must see the exact same voxels either way."""
        import jax.numpy as jnp

        from tricolo_tpu.data.device_prep import prepare_device_batch

        items = [synth_train[i] for i in range(4)]
        n_pad = synth_train.max_voxel_points
        D = synth_cfg.data.voxel_size
        packed = collate(items, n_pad, "packed", D)
        dense = collate(items, n_pad, "dense", D)
        assert "voxel_flat" not in dense
        assert dense["voxel_grid"].shape == (4, D, D, D)
        assert dense["voxel_grid"].dtype == np.uint32
        va = prepare_device_batch(
            {k: jnp.asarray(v) for k, v in packed.items() if k not in ("model_id", "category")}, D
        )["voxels"]
        vb = prepare_device_batch(
            {k: jnp.asarray(v) for k, v in dense.items() if k not in ("model_id", "category")}, D
        )["voxels"]
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


class TestBatchIterator:
    def test_train_drop_last_and_shuffle(self, synth_train):
        it = BatchIterator(synth_train, batch_size=10, shuffle=True, drop_last=True, seed=7, prefetch=False)
        batches = list(it)
        assert len(batches) == len(synth_train) // 10 == len(it)
        it.set_epoch(1)
        batches2 = list(it)
        assert any(
            b1["model_id"] != b2["model_id"] for b1, b2 in zip(batches, batches2)
        )
        # Same epoch → same order (seeded).
        it.set_epoch(1)
        batches3 = list(it)
        assert all(b2["model_id"] == b3["model_id"] for b2, b3 in zip(batches2, batches3))

    def test_eval_tail_padding(self, synth_train):
        bs = 25
        it = BatchIterator(synth_train, batch_size=bs, prefetch=False)
        batches = list(it)
        n = len(synth_train)
        assert len(batches) == (n + bs - 1) // bs
        tail = batches[-1]
        assert tail["tokens"].shape[0] == bs  # static shape
        assert tail["num_valid"] == n - (len(batches) - 1) * bs

    def test_prefetch_equals_sync(self, synth_train):
        a = list(BatchIterator(synth_train, batch_size=8, prefetch=False))
        b = list(BatchIterator(synth_train, batch_size=8, prefetch=True))
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x["tokens"], y["tokens"])


class TestDevicePrep:
    def test_densify_matches_numpy(self, synth_train):
        items = [synth_train[i] for i in range(3)]
        batch = collate(items, synth_train.max_voxel_points)
        D = synth_train.voxel_size
        dense = np.asarray(
            densify_voxels(jnp.asarray(batch["voxel_flat"]), jnp.asarray(batch["voxel_rgb"]), D)
        )
        expect = np.zeros((3, D, D, D, 3), np.float32)
        for i, item in enumerate(items):
            for word, rgb in zip(item["voxel_flat"], item["voxel_rgb"]):
                x, y, z = word >> 16, (word >> 8) & 0xFF, word & 0xFF
                expect[i, x, y, z] = [rgb & 0xFF, (rgb >> 8) & 0xFF, (rgb >> 16) & 0xFF]
        expect /= 255.0
        np.testing.assert_allclose(dense, expect, atol=1e-6)

    def test_padding_preserves_origin_site(self):
        # A real point at (0,0,0) must survive padding entries; padded slots
        # land in the per-sample trash region, never the real grid.
        from tricolo_tpu.data.device_prep import pack_sparse_voxels

        coords = np.zeros((1, 3), np.uint8)
        feats = np.full((1, 3), 255, np.uint8)
        flat, rgb = pack_sparse_voxels(coords, feats, 4)
        dense = np.asarray(densify_voxels(jnp.asarray(flat[None]), jnp.asarray(rgb[None]), 4))
        np.testing.assert_allclose(dense[0, 0, 0, 0], [1.0, 1.0, 1.0])
        assert dense.sum() == pytest.approx(3.0)

    def test_densify_two_samples_differ(self):
        # Same local site in different samples must not collide.
        from tricolo_tpu.data.device_prep import pack_sparse_voxels

        c = np.array([[1, 2, 3]], np.uint8)
        f0 = pack_sparse_voxels(c, np.array([[255, 0, 0]], np.uint8), 2)
        f1 = pack_sparse_voxels(c, np.array([[0, 255, 0]], np.uint8), 2)
        flat = np.stack([f0[0], f1[0]])
        rgb = np.stack([f0[1], f1[1]])
        dense = np.asarray(densify_voxels(jnp.asarray(flat), jnp.asarray(rgb), 4))
        np.testing.assert_allclose(dense[0, 1, 2, 3], [1.0, 0.0, 0.0])
        np.testing.assert_allclose(dense[1, 1, 2, 3], [0.0, 1.0, 0.0])

    def test_densify_on_host_skips_out_of_range(self):
        """Non-sentinel out-of-range coordinates are silently skipped by
        both the numpy fallback and the C++ sweep — identical behavior
        whether or not the native lib built."""
        from tricolo_tpu import native
        from tricolo_tpu.data.device_prep import VOXEL_PAD_SENTINEL, densify_on_host

        D = 4
        flat = np.full((1, 4), VOXEL_PAD_SENTINEL, np.uint32)
        rgb = np.zeros((1, 4), np.uint32)
        flat[0, 0] = (1 << 16) | (2 << 8) | 3  # in range
        rgb[0, 0] = 0x010203
        flat[0, 1] = (200 << 16) | (2 << 8) | 3  # x=200 >= D: malformed
        rgb[0, 1] = 0xFFFFFF

        def numpy_path():
            return densify_on_host(flat, rgb, D)

        grid = numpy_path()
        assert grid[0, 1, 2, 3] == 0x010203
        assert grid.sum() == 0x010203  # the malformed site wrote nowhere
        if native.available():
            # Force the numpy fallback and compare against the C++ result.
            import unittest.mock as mock

            with mock.patch.object(native, "available", lambda: False):
                np.testing.assert_array_equal(numpy_path(), grid)

    def test_voxel_mask_channel_alpha_rule(self):
        # Occupied pure-black voxels must appear in the occupancy channel
        # (the reference active-site rule is alpha>0, not rgb!=0).
        from tricolo_tpu.data.device_prep import (
            densify_on_host,
            pack_sparse_voxels,
            prepare_device_batch,
            unpack_dense_voxels,
        )

        coords = np.array([[0, 0, 0], [1, 1, 1]], np.uint8)
        feats = np.array([[0, 0, 0], [255, 0, 0]], np.uint8)  # black + red
        flat, rgb = pack_sparse_voxels(coords, feats, 4)
        batch = {
            "tokens": jnp.zeros((1, 4), jnp.int32),
            "voxel_flat": jnp.asarray(flat[None]),
            "voxel_rgb": jnp.asarray(rgb[None]),
        }
        out = prepare_device_batch(batch, 4, voxel_mask=True)["voxels"]
        assert out.shape == (1, 4, 4, 4, 4)
        v = np.asarray(out)
        assert v[0, 0, 0, 0, 3] == 1.0  # black voxel occupied
        assert v[0, 1, 1, 1, 3] == 1.0
        assert v[..., 3].sum() == 2.0
        np.testing.assert_allclose(v[0, 0, 0, 0, :3], 0.0)
        np.testing.assert_allclose(v[0, 1, 1, 1, :3], [1.0, 0.0, 0.0])
        # Dense-transfer path agrees.
        grid = densify_on_host(flat[None], rgb[None], 4)
        v2 = np.asarray(unpack_dense_voxels(jnp.asarray(grid), with_mask=True))
        np.testing.assert_array_equal(v, v2)

    def test_normalize_images(self):
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 256, (2, 4, 4, 3), dtype=np.uint8)
        out = np.asarray(normalize_images(jnp.asarray(imgs)))
        expect = (imgs / 255.0 - np.array(CLIP_IMAGE_MEAN)) / np.array(CLIP_IMAGE_STD)
        np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def make_disk_dataset(root, n_models=3, captions_per_model=2, voxel=32, views=4):
    """Write a reference-format exp_data tree: map.json + per-model npz."""
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "cat0"), exist_ok=True)
    rows = []
    for m in range(n_models):
        model_id = f"m{m:02d}"
        grid = np.zeros((4, voxel, voxel, voxel), np.uint8)
        n_occ = int(rng.integers(5, 20))
        xs, ys, zs = (rng.integers(0, voxel, n_occ) for _ in range(3))
        grid[3, xs, ys, zs] = 255
        grid[:3, xs, ys, zs] = rng.integers(1, 256, (3, n_occ))
        images = rng.integers(0, 256, (views * 2, 3, 24, 24), dtype=np.uint8)
        np.savez(
            os.path.join(root, "cat0", f"{model_id}.npz"),
            **{f"voxel{voxel}": grid, "images": images},
        )
        for c in range(captions_per_model):
            rows.append(
                {
                    "model_id": model_id,
                    "category": "cat0",
                    "caption": f"caption {m} {c}",
                    "tokens": rng.integers(1, 50, int(rng.integers(3, 10))).tolist(),
                }
            )
    with open(os.path.join(root, "train_map.json"), "w") as f:
        json.dump(rows, f)
    return rows


class TestGeneralDataset:
    def test_load_from_disk(self, tmp_path):
        root = str(tmp_path)
        rows = make_disk_dataset(root)
        cfg = load_config(["data=synthetic"])
        cfg.data.exp_data_root_path = root
        cfg.data.train_lang_data_path = os.path.join(root, "train_map.json")
        cfg.data.voxel_size = 32
        cfg.data.image_size = 16
        cfg.data.num_views = 4
        cfg.data.max_tokens = 12
        ds = GeneralDataset(cfg, "train")
        assert len(ds) == len(rows)
        item = ds[0]
        assert item["images"].shape == (4, 16, 16, 3)
        assert item["tokens"].shape == (12,)
        # Sparse conversion round-trips the occupied sites.
        npz = np.load(os.path.join(root, "cat0", f"{rows[0]['model_id']}.npz"))
        coords, feats = dense_rgba_to_sparse(npz["voxel32"])
        c = coords.astype(np.uint32)
        f = feats.astype(np.uint32)
        np.testing.assert_array_equal(
            item["voxel_flat"], (c[:, 0] * 256 + c[:, 1]) * 256 + c[:, 2]
        )
        np.testing.assert_array_equal(
            item["voxel_rgb"],
            f[:, 0] | (f[:, 1] << 8) | (f[:, 2] << 16) | np.uint32(1 << 24),
        )

    def test_view_subsample_even(self, tmp_path):
        root = str(tmp_path)
        make_disk_dataset(root, views=3)  # stores 6 views, subsample to 3
        cfg = load_config(["data=synthetic"])
        cfg.data.exp_data_root_path = root
        cfg.data.train_lang_data_path = os.path.join(root, "train_map.json")
        cfg.data.voxel_size = 32
        cfg.data.image_size = 24  # no resize → raw pixels comparable
        cfg.data.num_views = 3
        ds = GeneralDataset(cfg, "train")
        item = ds[0]
        npz = np.load(os.path.join(root, "cat0", "m00.npz"))
        sub = np.round(np.linspace(0, 5, 3)).astype(int)
        expect = npz["images"][sub].transpose(0, 2, 3, 1)
        np.testing.assert_array_equal(item["images"], expect)


class TestDataModule:
    def test_setup_and_loaders(self, synth_cfg):
        dm = DataModule(synth_cfg)
        dm.setup("fit")
        train = dm.train_loader()
        val = dm.val_loader()
        assert train.shuffle and train.drop_last
        assert not val.shuffle and not val.drop_last
        batch = next(iter(train))
        assert batch["tokens"].shape[0] == synth_cfg.data.batch_size


class TestVoxelBudget:
    def test_cap_never_exceeds_data_max(self):
        cfg = load_config(["data=synthetic", "data.voxel_max_points=999999"])
        capped = build_dataset(cfg, "train")
        auto = build_dataset(load_config(["data=synthetic"]), "train")
        assert capped.max_voxel_points == auto.max_voxel_points

    def test_truncating_cap_warns(self):
        import warnings

        from tricolo_tpu.data.datasets import GeneralDataset, _resolve_voxel_budget

        cfg = load_config(["data=synthetic", "data.voxel_max_points=600"])
        vision = {
            ("c", "big"): {"flat": np.zeros(2000, np.uint32)},
            ("c", "small"): {"flat": np.zeros(100, np.uint32)},
        }
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            budget = _resolve_voxel_budget(
                cfg, vision, "train", GeneralDataset._pad_target
            )
        assert budget == 1024  # cap rounded up to the pad multiple
        msgs = [str(w.message) for w in caught]
        assert any("truncates 1/2" in m and "voxel_max_points" in m for m in msgs), msgs

    def test_non_truncating_cap_silent(self):
        import warnings

        from tricolo_tpu.data.datasets import GeneralDataset, _resolve_voxel_budget

        # A cap that rounds up past the data max truncates nothing → silent.
        cfg = load_config(["data=synthetic", "data.voxel_max_points=100"])
        vision = {("c", "m"): {"flat": np.zeros(300, np.uint32)}}
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            budget = _resolve_voxel_budget(
                cfg, vision, "train", GeneralDataset._pad_target
            )
        assert budget == 512
        assert not [w for w in caught if "truncates" in str(w.message)]


class TestParallelLoad:
    def test_threaded_load_matches_serial(self, tmp_path):
        rows = make_disk_dataset(str(tmp_path), n_models=6)
        base = [
            "data=synthetic",
            f"data.exp_data_root_path={tmp_path}",
            f"data.train_lang_data_path={os.path.join(tmp_path, 'train_map.json')}",
            "data.voxel_size=32",
            "data.image_size=16",
            "data.num_views=4",
        ]
        serial = GeneralDataset(load_config([*base, "data.num_workers=0"]), "train")
        threaded = GeneralDataset(load_config([*base, "data.num_workers=4"]), "train")
        assert serial.vision_data.keys() == threaded.vision_data.keys()
        for key in serial.vision_data:
            np.testing.assert_array_equal(
                serial.vision_data[key]["flat"], threaded.vision_data[key]["flat"]
            )
            np.testing.assert_array_equal(
                serial.vision_data[key]["images"], threaded.vision_data[key]["images"]
            )
        assert serial.max_voxel_points == threaded.max_voxel_points
