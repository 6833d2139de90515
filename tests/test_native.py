"""Native C++ loader tests: build, parity with numpy path, error handling."""

import numpy as np
import pytest

from tricolo_tpu import native
from tricolo_tpu.data.datasets import dense_rgba_to_packed


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.ensure_built():
        pytest.skip("native toolchain unavailable")


def random_grid(rng, d=32, occupancy=0.1):
    grid = np.zeros((4, d, d, d), np.uint8)
    mask = rng.random((d, d, d)) < occupancy
    grid[3][mask] = rng.integers(1, 256, mask.sum())
    for c in range(3):
        grid[c][mask] = rng.integers(0, 256, mask.sum())
    return grid


class TestDenseToPacked:
    @pytest.mark.parametrize("d", [16, 32, 64])
    def test_matches_numpy(self, d):
        rng = np.random.default_rng(d)
        grid = random_grid(rng, d)
        nf, nr = native.dense_rgba_to_packed(grid)
        pf, pr = dense_rgba_to_packed(grid)
        np.testing.assert_array_equal(nf, pf)
        np.testing.assert_array_equal(nr, pr)
        # Sorted + unique by construction.
        assert (np.diff(nf.astype(np.int64)) > 0).all()

    def test_empty_grid(self):
        grid = np.zeros((4, 8, 8, 8), np.uint8)
        flat, rgb = native.dense_rgba_to_packed(grid)
        assert flat.size == 0 and rgb.size == 0

    def test_full_grid(self):
        grid = np.full((4, 8, 8, 8), 200, np.uint8)
        flat, rgb = native.dense_rgba_to_packed(grid)
        assert flat.size == 512
        assert (rgb == (200 | (200 << 8) | (200 << 16) | (1 << 24))).all()


class TestNpzPath:
    def test_fused_loader_matches_numpy(self, tmp_path):
        rng = np.random.default_rng(0)
        grid = random_grid(rng, 32)
        images = rng.integers(0, 256, (4, 3, 8, 8), np.uint8)
        path = str(tmp_path / "model.npz")
        np.savez_compressed(path, voxel32=grid, images=images)

        nf, nr = native.load_npz_voxels_packed(path, "voxel32")
        pf, pr = dense_rgba_to_packed(grid)
        np.testing.assert_array_equal(nf, pf)
        np.testing.assert_array_equal(nr, pr)

    def test_uncompressed_npz(self, tmp_path):
        rng = np.random.default_rng(1)
        grid = random_grid(rng, 16)
        path = str(tmp_path / "model.npz")
        np.savez(path, voxel16=grid)  # stored, not deflated
        nf, nr = native.load_npz_voxels_packed(path, "voxel16")
        pf, pr = dense_rgba_to_packed(grid)
        np.testing.assert_array_equal(nf, pf)
        np.testing.assert_array_equal(nr, pr)

    def test_npz_read_raw_member(self, tmp_path):
        arr = np.arange(100, dtype=np.uint8)
        path = str(tmp_path / "x.npz")
        np.savez_compressed(path, stuff=arr)
        payload = native.npz_read(path, "stuff")
        # payload is the raw .npy stream; numpy must parse it back.
        import io

        back = np.load(io.BytesIO(payload))
        np.testing.assert_array_equal(back, arr)

    def test_missing_member_error(self, tmp_path):
        path = str(tmp_path / "x.npz")
        np.savez(path, a=np.zeros(3, np.uint8))
        with pytest.raises(ValueError, match="member not found"):
            native.load_npz_voxels_packed(path, "voxel64")

    def test_wrong_shape_error(self, tmp_path):
        path = str(tmp_path / "x.npz")
        np.savez(path, voxel8=np.zeros((3, 8, 8, 8), np.uint8))
        with pytest.raises(ValueError, match="RGBA"):
            native.load_npz_voxels_packed(path, "voxel8")


class TestGzip:
    def test_roundtrip(self):
        import gzip as pygzip

        rng = np.random.default_rng(0)
        raw = rng.integers(0, 256, 10000, np.uint8).tobytes()
        compressed = pygzip.compress(raw)
        assert native.gzip_decode(compressed, len(raw)) == raw


class TestDatasetIntegration:
    def test_general_dataset_uses_native(self, tmp_path):
        """End-to-end: GeneralDataset over an npz tree must produce identical
        packed voxels whether or not the native loader is active."""
        from tests.test_data import make_disk_dataset
        from tricolo_tpu.config import load_config
        from tricolo_tpu.data.datasets import GeneralDataset

        make_disk_dataset(str(tmp_path))
        cfg = load_config(["data=synthetic"])
        cfg.data.exp_data_root_path = str(tmp_path)
        cfg.data.train_lang_data_path = str(tmp_path / "train_map.json")
        cfg.data.voxel_size = 32
        cfg.data.image_size = 16
        cfg.data.num_views = 4
        ds_native = GeneralDataset(cfg, "train")

        import tricolo_tpu.native as nat

        orig = nat.available
        try:
            nat.available = lambda: False
            ds_numpy = GeneralDataset(cfg, "train")
        finally:
            nat.available = orig

        for key in ds_native.vision_data:
            np.testing.assert_array_equal(
                ds_native.vision_data[key]["flat"], ds_numpy.vision_data[key]["flat"]
            )
            np.testing.assert_array_equal(
                ds_native.vision_data[key]["rgb"], ds_numpy.vision_data[key]["rgb"]
            )


class TestPackedToDense:
    def test_matches_numpy_fallback(self):
        pytest.importorskip("numpy")
        if not native.available():
            pytest.skip("native lib unavailable")
        from tricolo_tpu.data.device_prep import (
            VOXEL_PAD_SENTINEL,
            pack_sparse_voxels,
        )

        rng = np.random.default_rng(3)
        B, D, n = 4, 16, 64
        flat = np.full((B, n), VOXEL_PAD_SENTINEL, np.uint32)
        rgb = np.zeros((B, n), np.uint32)
        for i in range(B):
            k = int(rng.integers(1, n))
            sites = np.sort(rng.choice(D**3, size=k, replace=False))
            c = np.stack([sites // (D * D), (sites // D) % D, sites % D], 1).astype(np.uint8)
            f = rng.integers(0, 256, (k, 3), dtype=np.uint8)
            flat[i], rgb[i] = pack_sparse_voxels(c, f, n)
        got = native.packed_to_dense(flat, rgb, D)
        # numpy twin (the densify_on_host fallback path)
        expect = np.zeros((B, D**3 + 1), np.uint32)
        x = (flat >> 16) & 0xFF; y = (flat >> 8) & 0xFF; z = flat & 0xFF
        local = (x.astype(np.int64) * D + y) * D + z
        local = np.where(flat == VOXEL_PAD_SENTINEL, D**3, local)
        np.put_along_axis(expect, local, rgb, axis=1)
        np.testing.assert_array_equal(got, expect[:, :D**3].reshape(B, D, D, D))
