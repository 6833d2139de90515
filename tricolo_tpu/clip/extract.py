"""Offline CLIP feature-cache extraction (reference extract_clip_feats.py).

For each split: run the frozen CLIP encoders over every caption/model, cache

* ``img``  — L2-normalized mean over ``num_views`` of per-view image
  embeddings (extract_clip_feats.py:24-28,36),
* ``text`` — L2-normalized caption embedding (extract_clip_feats.py:29-31),

keyed by model_id into ``clip_embeddings_{split}.npz`` (keys
``{model_id}/img`` / ``{model_id}/text``, the format datasets.py loads).
Because the dict is keyed by model_id while iteration is per caption, every
shape ends up with the embedding of its *last* caption — the reference's
documented quirk (SURVEY.md §2.1), replicated deliberately.

Extraction fidelity: the reference encodes the *dataset pipeline's* tensors
(extract_clip_feats.py:17-31) — 224² views already normalized with the CLIP
mean/std by the dataset transform (general_dataset.py:87-89), and
`clip.tokenize` token ids. This extractor therefore normalizes the stored
views with the same constants the training pipeline uses
(data/device_prep.py CLIP_IMAGE_MEAN/STD) and tokenizes captions with the
in-repo BPE twin (clip/tokenizer.py); backends receive those tensors
verbatim, never raw strings or raw uint8 pixels, so a cache produced here
matches one produced by the reference given the same weights.

The encoder backend is injectable so the pipeline is testable without CLIP
weights; `TransformersClipBackend` wires a local HuggingFace CLIP checkpoint
(host CPU torch) when one is available on disk.
"""

from __future__ import annotations

import os
from typing import Callable, Protocol

import numpy as np

# Same constants the on-device training transform uses (device_prep.py),
# which in turn mirror the reference's torchvision Normalize
# (general_dataset.py:87-89).
from ..data.datasets import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD  # noqa: E402


def clip_normalize_images(images_u8: np.ndarray) -> np.ndarray:
    """(..., H, W, 3) uint8 → CLIP-normalized float32 (host numpy twin of
    data.device_prep.normalize_images)."""
    x = images_u8.astype(np.float32) / 255.0
    mean = np.asarray(CLIP_IMAGE_MEAN, np.float32)
    std = np.asarray(CLIP_IMAGE_STD, np.float32)
    return (x - mean) / std


class ClipBackend(Protocol):
    """Minimal frozen-CLIP surface the extractor needs.

    Backends consume the dataset pipeline's tensors (see module docstring):
    """

    def encode_image(self, pixels: np.ndarray) -> np.ndarray:
        """(N, H, W, 3) float32 CLIP-normalized → (N, D) float32."""
        ...

    def encode_text(self, tokens: np.ndarray) -> np.ndarray:
        """(N, 77) int32 clip.tokenize-format ids → (N, D) float32."""
        ...


class TransformersClipBackend:
    """HF CLIP checkpoint from a *local directory* (no network egress).

    Runs on host CPU torch — extraction is offline, the TPU never sees CLIP.
    The HF processor is bypassed entirely: pixel_values/input_ids are fed
    straight to the model so the extractor's dataset-pipeline tensors are
    what gets encoded. No attention mask is passed — OpenAI CLIP's text
    transformer is causally masked and pools at the EOT position
    (= argmax token id, identical in HF), so trailing zero-padding cannot
    influence the feature, exactly as in `clip.tokenize`-based encoding.
    """

    def __init__(self, model_path: str):
        if not os.path.isdir(model_path):
            raise FileNotFoundError(
                f"local CLIP checkpoint directory not found: {model_path!r}; "
                "download openai/clip-vit-large-patch14 on a connected host "
                "and point model.modules.clip_model at the directory."
            )
        from transformers import CLIPModel

        self.model = CLIPModel.from_pretrained(model_path)
        self.model.eval()

    def encode_image(self, pixels: np.ndarray) -> np.ndarray:
        import torch

        pixel_values = torch.from_numpy(
            np.ascontiguousarray(pixels.transpose(0, 3, 1, 2))
        )
        with torch.no_grad():
            feats = self.model.get_image_features(pixel_values=pixel_values)
        return feats.numpy().astype(np.float32)

    def encode_text(self, tokens: np.ndarray) -> np.ndarray:
        import torch

        input_ids = torch.from_numpy(tokens.astype(np.int64))
        with torch.no_grad():
            feats = self.model.get_text_features(input_ids=input_ids)
        return feats.numpy().astype(np.float32)


def _l2(x: np.ndarray, axis: int = -1) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def extract_clip_features(
    dataset,
    backend: ClipBackend,
    output_path: str,
    batch_captions: int = 64,
    tokenizer: Callable[[str], np.ndarray] | None = None,
):
    """Build one split's cache from a GeneralDataset-contract dataset.

    ``tokenizer`` maps a caption string to (77,) int32 ids; defaults to the
    in-repo CLIP BPE (clip.tokenizer.tokenize, needs TRICOLO_CLIP_BPE).
    """
    if tokenizer is None:
        from .tokenizer import tokenize as tokenizer

    cache: dict[str, dict[str, np.ndarray]] = {}

    # Image embeddings: once per unique model (mean over views), over the
    # dataset-transform pixels.
    for (category, model_id), vision in dataset.vision_data.items():
        pixels = clip_normalize_images(vision["images"])  # (V, H, W, 3)
        per_view = backend.encode_image(pixels)
        cache[model_id] = {"img": _l2(per_view.mean(axis=0))}

    # Text embeddings: per caption, keyed by model_id — last caption wins
    # (reference quirk, see module docstring).
    rows = dataset.language_data
    for start in range(0, len(rows), batch_captions):
        chunk = rows[start : start + batch_captions]
        tokens = np.stack([tokenizer(r["text"]) for r in chunk])
        embs = _l2(backend.encode_text(tokens), axis=-1)
        for row, emb in zip(chunk, embs):
            cache[row["model_id"]]["text"] = emb

    flat = {}
    for model_id, entry in cache.items():
        for kind, value in entry.items():
            flat[f"{model_id}/{kind}"] = value.astype(np.float32)
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    np.savez(output_path, **flat)
    return cache
