"""Split datasets: caption maps + per-model vision data, loaded into RAM.

Behavioral parity with the reference GeneralDataset (tricolo/data/dataset/
general_dataset.py:11-98): a `{split}_map.json` of per-caption rows
{model_id, category, caption, tokens} drives the split; per unique
(category, model_id) the matching `exp_data/{category}/{model_id}.npz` is
read once, its dense `voxel{D}` RGBA grid converted to sparse
(coords where alpha>0, feats=RGB), `num_views` views subsampled evenly from
the stored renders and bicubic-antialias-resized to `image_size` at load
time, and optional precached CLIP embeddings attached.

TPU-first divergences (documented):

* items stay **uint8/sparse on the host** — images (V, H, W, 3) uint8 NHWC,
  voxels (coords uint8 (N,3), feats uint8 (N,3)). The float conversion,
  CLIP-stat normalization (general_dataset.py:87-93) and dense-grid
  scatter all run on device inside the jitted step (device_prep.py), which
  cuts H2D traffic ~10× vs shipping normalized float batches.
* the per-split max occupied-voxel count is computed at load time and
  rounded up to a multiple of 512 → one static sparse-batch shape per
  split, so the train step compiles exactly once.
* CLIP caches are `.npz` files written by our extract tool; the reference's
  torch `.pth` files are also accepted when torch is importable.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

# CLIP normalization stats (reference general_dataset.py:87-89).
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)

_VOXEL_PAD_MULTIPLE = 512


def _resize_views_bicubic(views_chw: np.ndarray, size: int) -> np.ndarray:
    """(V, 3, H, W) uint8 → (V, size, size, 3) uint8, bicubic + antialias.

    Matches torchvision Resize(size, BICUBIC, antialias=True) as used at
    dataset load (general_dataset.py:63-65). torch is CPU-only here and this
    is a host-side, load-time step — the TPU never sees it.
    """
    if views_chw.shape[-1] == size and views_chw.shape[-2] == size:
        return np.ascontiguousarray(views_chw.transpose(0, 2, 3, 1))
    try:
        import torch
        import torch.nn.functional as F

        t = torch.from_numpy(np.ascontiguousarray(views_chw)).to(torch.float32)
        out = F.interpolate(t, size=(size, size), mode="bicubic", antialias=True)
        out = out.round().clamp(0, 255).to(torch.uint8).numpy()
        return np.ascontiguousarray(out.transpose(0, 2, 3, 1))
    except ImportError:  # pragma: no cover - torch is present in CI
        from PIL import Image

        frames = []
        for view in views_chw:
            img = Image.fromarray(view.transpose(1, 2, 0))
            frames.append(np.asarray(img.resize((size, size), Image.BICUBIC)))
        return np.stack(frames)


def dense_rgba_to_sparse(dense_voxel: np.ndarray):
    """Reference dense→sparse rule (general_dataset.py:46-51).

    ``dense_voxel`` is the npz's (4, D, D, D) RGBA grid; occupied sites are
    alpha>0; coords are (N, 3) uint8 grid indices, feats (N, 3) uint8 RGB.
    Sites come out sorted (flat-index order) and unique — the contract the
    packed device scatter relies on.
    """
    grid = np.transpose(dense_voxel, (1, 2, 3, 0))
    flat = grid.reshape(-1, grid.shape[3])
    mask = flat[:, -1].nonzero()[0]
    coords = np.indices(grid.shape[:3], dtype=np.uint8).reshape(3, -1).T[mask]
    feats = flat[mask, :3]
    return coords.astype(np.uint8), feats.astype(np.uint8)


def dense_rgba_to_packed(dense_voxel: np.ndarray):
    """Dense RGBA grid → packed (flat u32 sorted site words, rgb u32 words).

    The packed form collate pads into device batches (device_prep). The
    numpy path here is the fallback; the C++ loader (tricolo_tpu.native)
    produces identical output ~10× faster for the load-time sweep.
    """
    alpha = dense_voxel[3]
    sites = np.nonzero(alpha.reshape(-1))[0].astype(np.uint32)
    d = dense_voxel.shape[1]
    x = (sites // (d * d)).astype(np.uint32)
    rem = sites % (d * d)
    y = (rem // d).astype(np.uint32)
    z = (rem % d).astype(np.uint32)
    flat = (x * 256 + y) * 256 + z
    rgb_channels = dense_voxel[:3].reshape(3, -1)[:, sites].astype(np.uint32)
    # Bit 24 = occupancy (alpha>0 rule); see device_prep.VOXEL_OCCUPIED_BIT.
    rgb = (
        rgb_channels[0]
        | (rgb_channels[1] << 8)
        | (rgb_channels[2] << 16)
        | np.uint32(1 << 24)
    )
    return flat, rgb


def _load_clip_cache(path_base: str) -> dict | None:
    """Load `clip_embeddings_{split}` as .npz (ours) or .pth (reference)."""
    npz_path = path_base + ".npz"
    if os.path.exists(npz_path):
        data = np.load(npz_path)
        cache: dict[str, dict[str, np.ndarray]] = {}
        for key in data.files:
            model_id, kind = key.rsplit("/", 1)
            cache.setdefault(model_id, {})[kind] = data[key].astype(np.float32)
        return cache
    pth_path = path_base + ".pth"
    if os.path.exists(pth_path):
        import torch

        raw = torch.load(pth_path, map_location="cpu")
        return {
            mid: {k: np.asarray(v, dtype=np.float32) for k, v in entry.items()}
            for mid, entry in raw.items()
        }
    return None



def _resolve_voxel_budget(cfg, vision_data, split, pad_target) -> int:
    """Per-sample padded voxel budget: data max, optionally capped by
    ``data.voxel_max_points`` — warning when the cap actually truncates
    (truncation keeps the first sites in flat-grid order, i.e. drops the
    top of the grid)."""
    data_max = max((v["flat"].shape[0] for v in vision_data.values()), default=1)
    cap = cfg.data.get("voxel_max_points")
    budget = pad_target(min(cap, data_max) if cap else data_max)
    if cap and cap < data_max:
        clipped = sum(
            1 for v in vision_data.values() if v["flat"].shape[0] > budget
        )
        if clipped:
            import warnings

            warnings.warn(
                f"voxel_max_points={cap} truncates {clipped}/"
                f"{len(vision_data)} models in split '{split}' "
                f"(split max {data_max} occupied sites); truncation keeps "
                "the first sites in flat-grid order, dropping the top of "
                "the grid. Set data.voxel_max_points=null for exact batches.",
                stacklevel=3,
            )
    return budget


class GeneralDataset:
    """One split in RAM; indexable by caption."""

    def __init__(self, cfg, split: str):
        self.cfg = cfg
        self.split = split
        self.voxel_size = cfg.data.voxel_size
        self.image_size = cfg.data.image_size
        self.num_views = cfg.data.num_views
        self.max_tokens = cfg.data.get("max_tokens", 96)
        self.use_clip_text = cfg.model.text_encoder == "CLIPTextEncoder"
        self.use_clip_image = cfg.model.image_encoder == "CLIPImageEncoder"
        # CLIP-tokenize captions on the fly when the CLIP text encoder is
        # configured (general_dataset.py:76-79).
        self.tokenize_with_clip = self.use_clip_text

        map_path = cfg.data.get(f"{split}_lang_data_path")
        with open(map_path) as f:
            raw_rows = json.load(f)

        clip_cache = None
        if self.use_clip_text or self.use_clip_image:
            clip_cache = _load_clip_cache(
                os.path.join(cfg.data.exp_data_root_path, f"clip_embeddings_{split}")
            )

        self.language_data: list[dict] = []
        unique_keys: list[tuple] = []
        seen: set[tuple] = set()
        for row in raw_rows:
            key = (row["category"], row["model_id"])
            self.language_data.append(
                {
                    "model_id": row["model_id"],
                    "category": row["category"],
                    "tokens": self._fix_tokens(row["tokens"]),
                    "text": row["caption"].strip(),
                }
            )
            if key not in seen:
                seen.add(key)
                unique_keys.append(key)

        # Parallel split load over cfg.data.num_workers threads (the
        # reference's num_workers feeds torch DataLoader processes,
        # data_module.py:24; here the per-epoch path is cheap and the
        # one-time npz decode sweep is the parallel win — the C++ loader
        # releases the GIL, so threads scale).
        workers = int(cfg.data.get("num_workers", 0) or 0)
        if workers > 1 and len(unique_keys) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=workers) as pool:
                entries = list(
                    pool.map(lambda k: self._load_model(k, clip_cache), unique_keys)
                )
        else:
            entries = [self._load_model(k, clip_cache) for k in unique_keys]
        self.vision_data = dict(zip(unique_keys, entries))

        self.max_voxel_points = _resolve_voxel_budget(
            cfg, self.vision_data, split, self._pad_target
        )

    def _fix_tokens(self, tokens) -> np.ndarray:
        out = np.zeros(self.max_tokens, dtype=np.int32)
        arr = np.asarray(tokens, dtype=np.int32)[: self.max_tokens]
        out[: arr.shape[0]] = arr
        return out

    @property
    def max_voxel_tiles(self) -> int:
        """Split max per-sample active 8³-tile count — the fitted
        windowed_compact row budget (tile_budget="auto"): every sample of
        the split fits in this many rows by construction, so host-side
        tile truncation is impossible. Computed once, cached."""
        cached = getattr(self, "_max_voxel_tiles", None)
        if cached is None:
            tile = 8
            tg = self.voxel_size // tile
            worst = 1
            for v in self.vision_data.values():
                flat = v["flat"]
                if flat.shape[0] == 0:
                    continue
                x = (flat >> np.uint32(16)) & np.uint32(0xFF)
                y = (flat >> np.uint32(8)) & np.uint32(0xFF)
                z = flat & np.uint32(0xFF)
                tid = (
                    (x // tile).astype(np.int64) * tg + y // tile
                ) * tg + z // tile
                worst = max(worst, len(np.unique(tid)))
            cached = self._max_voxel_tiles = worst
        return cached

    @staticmethod
    def _pad_target(n: int) -> int:
        return max(_VOXEL_PAD_MULTIPLE, ((n + _VOXEL_PAD_MULTIPLE - 1) // _VOXEL_PAD_MULTIPLE) * _VOXEL_PAD_MULTIPLE)

    def _load_model(self, key: tuple, clip_cache: dict | None) -> dict:
        category, model_id = key
        npz_path = os.path.join(
            self.cfg.data.exp_data_root_path, category, f"{model_id}.npz"
        )
        flat = rgb = None
        try:  # C++ fast path: fused npz-member inflate + dense→packed sweep
            from tricolo_tpu import native

            if native.available():
                flat, rgb = native.load_npz_voxels_packed(
                    npz_path, f"voxel{self.voxel_size}"
                )
        except ImportError:
            pass
        npz = np.load(npz_path)
        if flat is None:
            flat, rgb = dense_rgba_to_packed(npz[f"voxel{self.voxel_size}"])

        stored_views = npz["images"]  # (V_stored, 3, H, W) uint8
        sub = np.round(
            np.linspace(0, len(stored_views) - 1, self.num_views)
        ).astype(int)
        images = _resize_views_bicubic(stored_views[sub], self.image_size)

        entry = {"flat": flat, "rgb": rgb, "images": images}
        if clip_cache is not None and model_id in clip_cache:
            entry["clip_embeddings_img"] = clip_cache[model_id]["img"]
            entry["clip_embeddings_text"] = clip_cache[model_id]["text"]
        return entry

    def __len__(self) -> int:
        return len(self.language_data)

    def __getitem__(self, idx: int) -> dict[str, Any]:
        lang = self.language_data[idx]
        vision = self.vision_data[(lang["category"], lang["model_id"])]
        item = {
            "model_id": lang["model_id"],
            "category": lang["category"],
            "tokens": self._clip_tokenize(lang["text"])
            if self.tokenize_with_clip
            else lang["tokens"],
            "images": vision["images"],
            "voxel_flat": vision["flat"],
            "voxel_rgb": vision["rgb"],
        }
        for key in ("clip_embeddings_img", "clip_embeddings_text"):
            if key in vision:
                item[key] = vision[key]
        return item

    @staticmethod
    def _clip_tokenize(text: str) -> np.ndarray:
        """CLIP BPE tokenization (general_dataset.py:76-77), host-side."""
        from tricolo_tpu.clip.tokenizer import tokenize

        return tokenize(text, context_length=77, truncate=True)


class SyntheticDataset:
    """Deterministic random data in the GeneralDataset item contract.

    CPU-runnable fixture for tests/smoke/bench (SURVEY.md §4); captions are
    token sequences drawn per (model, caption) pair, shapes get a random
    sparse voxel cloud and random views, so the whole pipeline — including
    retrieval eval with multiple captions per model — exercises end to end.
    """

    def __init__(self, cfg, split: str):
        data = cfg.data
        self.voxel_size = data.voxel_size
        self.image_size = data.image_size
        self.num_views = data.num_views
        self.max_tokens = data.get("max_tokens", 16)
        num_models = data.get("num_models", 12)
        captions_per_model = data.get("captions_per_model", 3)
        vocab = data.vocab_size
        seed = {"train": 0, "val": 1, "test": 2}.get(split, 3)
        rng = np.random.default_rng(seed)

        self.use_clip_text = cfg.model.text_encoder == "CLIPTextEncoder"
        self.use_clip_image = cfg.model.image_encoder == "CLIPImageEncoder"
        # Synthetic captions carry plain int tokens; no BPE file needed (the
        # CLIP heads consume precached embeddings, never the tokens).
        self.tokenize_with_clip = False

        self.language_data = []
        self.vision_data = {}
        for m in range(num_models):
            model_id = f"{split}_model_{m:04d}"
            key = ("synthetic", model_id)
            n_points = int(rng.integers(32, 256))
            # Sorted-unique sites, like `nonzero` on a dense grid yields —
            # the contract the packed device scatter relies on.
            d3 = self.voxel_size**3
            sites = np.sort(rng.choice(d3, size=n_points, replace=False)).astype(np.uint32)
            d = np.uint32(self.voxel_size)
            x, y, z = sites // (d * d), (sites // d) % d, sites % d
            flat = (x * 256 + y) * 256 + z
            feats = rng.integers(0, 256, (n_points, 3), dtype=np.uint32)
            rgb = (
                feats[:, 0]
                | (feats[:, 1] << 8)
                | (feats[:, 2] << 16)
                | np.uint32(1 << 24)  # occupancy bit, see device_prep
            )
            images = rng.integers(
                0, 256, (self.num_views, self.image_size, self.image_size, 3), dtype=np.uint8
            )
            entry = {"flat": flat.astype(np.uint32), "rgb": rgb.astype(np.uint32), "images": images}
            if self.use_clip_text or self.use_clip_image:
                entry["clip_embeddings_img"] = rng.standard_normal(768).astype(np.float32)
                entry["clip_embeddings_text"] = rng.standard_normal(768).astype(np.float32)
            self.vision_data[key] = entry
            for c in range(captions_per_model):
                length = int(rng.integers(4, self.max_tokens))
                tokens = np.zeros(self.max_tokens, dtype=np.int32)
                tokens[:length] = rng.integers(1, vocab, length)
                self.language_data.append(
                    {
                        "model_id": model_id,
                        "category": "synthetic",
                        "tokens": tokens,
                        "text": f"synthetic caption {m}-{c}",
                    }
                )
        self.max_voxel_points = _resolve_voxel_budget(
            cfg, self.vision_data, split, GeneralDataset._pad_target
        )

    def __len__(self):
        return len(self.language_data)

    __getitem__ = GeneralDataset.__getitem__
    max_voxel_tiles = GeneralDataset.max_voxel_tiles


def _structured(cfg, split):
    from .structured import StructuredSyntheticDataset

    return StructuredSyntheticDataset(cfg, split)


_DATASETS = {
    # Reference dataset names are trivial subclasses of GeneralDataset used
    # only for Hydra dispatch (dataset/text2shape_chair_table.py:4-6).
    "Text2ShapeChairTable": GeneralDataset,
    "Text2ShapeC13": GeneralDataset,
    "GeneralDataset": GeneralDataset,
    "Synthetic": SyntheticDataset,
    "StructuredSynthetic": _structured,
}


def build_dataset(cfg, split: str):
    """Resolve `cfg.data.dataset` by name (reference data_module.py:12)."""
    name = cfg.data.dataset
    if name not in _DATASETS:
        raise KeyError(f"unknown dataset {name!r}; known: {sorted(_DATASETS)}")
    return _DATASETS[name](cfg, split)
