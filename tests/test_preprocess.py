"""Preprocessing tests: NRRD codec, renderer, caption maps, npz packing."""

import json
import os
import pickle

import numpy as np
import pytest

from tricolo_tpu.data import nrrd
from tricolo_tpu.data.preprocess import (
    create_model_id_caption_mapping,
    pack_npz,
    read_solid_voxels,
)
from tricolo_tpu.data.render import (
    camera_pose,
    load_obj,
    render_mesh,
    render_views,
)


class TestNrrd:
    @pytest.mark.parametrize("encoding", ["raw", "gzip"])
    @pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32])
    def test_roundtrip(self, tmp_path, encoding, dtype):
        rng = np.random.default_rng(0)
        arr = (rng.random((4, 5, 6, 7)) * 100).astype(dtype)
        path = str(tmp_path / "x.nrrd")
        nrrd.write(path, arr, encoding=encoding)
        back, header = nrrd.read(path)
        np.testing.assert_array_equal(back, arr)
        assert header["encoding"] == encoding
        assert header["sizes"] == "4 5 6 7"

    def test_fortran_order_semantics(self, tmp_path):
        # NRRD sizes list the fastest axis first; a known byte pattern must
        # land at the right indices.
        arr = np.arange(24, dtype=np.uint8).reshape(2, 3, 4)
        path = str(tmp_path / "f.nrrd")
        nrrd.write(path, arr, encoding="raw")
        back, _ = nrrd.read(path)
        np.testing.assert_array_equal(back, arr)

    def test_rejects_non_nrrd(self, tmp_path):
        path = tmp_path / "bad.nrrd"
        path.write_bytes(b"PNG\n\n")
        with pytest.raises(ValueError, match="not an NRRD"):
            nrrd.read(str(path))


CUBE_OBJ = """
v -0.5 -0.5 -0.5
v  0.5 -0.5 -0.5
v  0.5  0.5 -0.5
v -0.5  0.5 -0.5
v -0.5 -0.5  0.5
v  0.5 -0.5  0.5
v  0.5  0.5  0.5
v -0.5  0.5  0.5
f 1 2 3 4
f 5 8 7 6
f 1 5 6 2
f 2 6 7 3
f 3 7 8 4
f 5 1 4 8
"""


class TestRenderer:
    def test_load_obj_triangulates_quads(self, tmp_path):
        path = tmp_path / "cube.obj"
        path.write_text(CUBE_OBJ)
        vertices, faces = load_obj(str(path))
        assert vertices.shape == (8, 3)
        assert faces.shape == (12, 3)  # 6 quads → 12 triangles

    def test_camera_ring_geometry(self):
        centroid = np.array([0.1, 0.2, 0.3])
        for yaw in (0.0, np.pi / 2, np.pi):
            pose = camera_pose(centroid, yaw)
            # Camera is at the configured distance from the centroid…
            assert np.linalg.norm(pose[:3, 3] - centroid) == pytest.approx(0.85)
            # …and its −z axis looks at the centroid.
            view_dir = -pose[:3, 2]
            to_centroid = centroid - pose[:3, 3]
            to_centroid /= np.linalg.norm(to_centroid)
            np.testing.assert_allclose(view_dir, to_centroid, atol=1e-12)

    def test_render_cube_views(self, tmp_path):
        # Shrink the cube: ShapeNet meshes are unit-normalized and the
        # reference's 0.85 camera distance frames them large; a half-size
        # cube would fill the frame entirely. Also deform one corner —
        # a perfect cube under the top-down light is yaw-invariant, so
        # views would be legitimately identical.
        small = CUBE_OBJ.replace("0.5", "0.15").replace(
            "v  0.15  0.15  0.15", "v  0.3  0.3  0.15"
        )
        path = tmp_path / "cube.obj"
        path.write_text(small)
        views = render_views(str(path), num_views=4, image_size=64)
        assert views.shape == (4, 64, 64, 3)
        for view in views:
            # The cube covers part of the frame but not everything.
            foreground = (view != 255).any(axis=-1).mean()
            assert 0.05 < foreground < 0.95
        # Different yaw angles → different images.
        assert not np.array_equal(views[0], views[1])

    def test_zbuffer_occlusion(self):
        # Two parallel quads; the nearer one must win the overlap.
        vertices = np.array(
            [
                [-0.4, -0.4, 0.0], [0.4, -0.4, 0.0], [0.4, 0.4, 0.0], [-0.4, 0.4, 0.0],  # far
                [-0.2, -0.2, 0.3], [0.2, -0.2, 0.3], [0.2, 0.2, 0.3], [-0.2, 0.2, 0.3],  # near
            ]
        )
        faces = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]])
        # Camera straight down +z looking at origin.
        pose = np.eye(4)
        pose[:3, 3] = [0, 0, 1.0]
        img = render_mesh(vertices, faces, pose, image_size=64)
        assert img.shape == (64, 64, 3)
        # Something rendered at the center (covered by both quads; z-buffer
        # must pick the nearer without corruption)…
        assert (img[32, 32] != 255).any()
        # …and the far quad is visible outside the near quad's footprint
        # (col 12 ≈ x=-0.38: inside far quad, outside near quad).
        assert (img[32, 12] != 255).any()
        # Corner pixels show background.
        assert (img[0, 0] == 255).all()


class TestCaptionMapping:
    def test_create_mapping(self, tmp_path):
        vocab = {"idx_to_word": {"1": "a", "2": "red", "3": "chair"}}
        (tmp_path / "shapenet.json").write_text(json.dumps(vocab))
        tuples = [
            (np.array([2, 3, 0, 0]), "03001627", "modelA.nrrd"),
            (np.array([1, 2, 3, 0]), "03001627", "modelA.nrrd"),
            (np.array([3, 0, 0, 0]), "04379243", "modelB.nrrd"),
            (np.array([1, 0, 0, 0]), "03001627", "ignored.nrrd"),
        ]
        with open(tmp_path / "caps.p", "wb") as f:
            pickle.dump({"caption_tuples": tuples}, f)
        out = tmp_path / "train_map.json"
        models = create_model_id_caption_mapping(
            str(tmp_path / "caps.p"),
            str(tmp_path / "shapenet.json"),
            str(out),
            ignored_models=["03001627/ignored"],
        )
        rows = json.loads(out.read_text())
        assert len(rows) == 3  # ignored model dropped
        assert rows[0]["caption"] == "red chair"
        assert rows[0]["tokens"] == [2, 3, 0, 0]
        assert rows[1]["caption"] == "a red chair"
        assert set(models) == {("03001627", "modelA"), ("04379243", "modelB")}


class TestPackNpz:
    def test_pack_and_dataset_compat(self, tmp_path):
        from PIL import Image

        rng = np.random.default_rng(0)
        model_id, category = "m0", "cat"
        # NRRD voxel archives for all three sizes.
        for size in (32, 64, 128):
            d = tmp_path / f"nrrd_256_filter_div_{size}_solid" / model_id
            d.mkdir(parents=True)
            grid = rng.integers(0, 256, (4, size, size, size), dtype=np.uint8)
            nrrd.write(str(d / f"{model_id}.nrrd"), grid)
        # Rendered view jpgs.
        img_root = tmp_path / "imgs"
        vdir = img_root / category / model_id
        vdir.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(
                rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
            ).save(vdir / f"{i}.jpg")

        out_root = tmp_path / "exp_data"
        pack_npz(
            (category, model_id),
            data_root_path=str(tmp_path),
            img_root_path=str(img_root),
            output_root_path=str(out_root),
            num_views=3,
        )
        npz = np.load(out_root / category / f"{model_id}.npz")
        assert set(npz.files) == {"voxel32", "voxel64", "voxel128", "images"}
        assert npz["voxel64"].shape == (4, 64, 64, 64)
        assert npz["images"].shape == (3, 3, 224, 224)
        # Round-trips the NRRD content exactly.
        expect = read_solid_voxels(str(tmp_path), model_id, 32)
        np.testing.assert_array_equal(npz["voxel32"], expect)
