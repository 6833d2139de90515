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

The encoder backend is injectable so the pipeline is testable without CLIP
weights; `TransformersClipBackend` wires a local HuggingFace CLIP checkpoint
(host CPU torch) when one is available on disk.
"""

from __future__ import annotations

import os
from typing import Protocol, Sequence

import numpy as np


class ClipBackend(Protocol):
    """Minimal frozen-CLIP surface the extractor needs."""

    def encode_image(self, images: np.ndarray) -> np.ndarray:
        """(N, H, W, 3) uint8 → (N, D) float32 (unnormalized)."""
        ...

    def encode_text(self, texts: Sequence[str]) -> np.ndarray:
        """list of N strings → (N, D) float32 (unnormalized)."""
        ...


class TransformersClipBackend:
    """HF CLIP checkpoint from a *local directory* (no network egress).

    Runs on host CPU torch — extraction is offline, the TPU never sees CLIP.
    """

    def __init__(self, model_path: str):
        if not os.path.isdir(model_path):
            raise FileNotFoundError(
                f"local CLIP checkpoint directory not found: {model_path!r}; "
                "download openai/clip-vit-large-patch14 on a connected host "
                "and point model.modules.clip_model at the directory."
            )
        from transformers import CLIPModel, CLIPProcessor

        self.model = CLIPModel.from_pretrained(model_path)
        self.model.eval()
        self.processor = CLIPProcessor.from_pretrained(model_path)

    def encode_image(self, images: np.ndarray) -> np.ndarray:
        import torch

        inputs = self.processor(images=list(images), return_tensors="pt")
        with torch.no_grad():
            feats = self.model.get_image_features(**inputs)
        return feats.numpy().astype(np.float32)

    def encode_text(self, texts: Sequence[str]) -> np.ndarray:
        import torch

        inputs = self.processor(
            text=list(texts), return_tensors="pt", padding=True, truncation=True
        )
        with torch.no_grad():
            feats = self.model.get_text_features(**inputs)
        return feats.numpy().astype(np.float32)


def _l2(x: np.ndarray, axis: int = -1) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def extract_clip_features(
    dataset,
    backend: ClipBackend,
    output_path: str,
    batch_captions: int = 64,
):
    """Build one split's cache from a GeneralDataset-contract dataset."""
    cache: dict[str, dict[str, np.ndarray]] = {}

    # Image embeddings: once per unique model (mean over views).
    for (category, model_id), vision in dataset.vision_data.items():
        views = vision["images"]  # (V, H, W, 3) uint8
        per_view = backend.encode_image(views)
        cache[model_id] = {"img": _l2(per_view.mean(axis=0))}

    # Text embeddings: per caption, keyed by model_id — last caption wins
    # (reference quirk, see module docstring).
    rows = dataset.language_data
    for start in range(0, len(rows), batch_captions):
        chunk = rows[start : start + batch_captions]
        embs = _l2(backend.encode_text([r["text"] for r in chunk]), axis=-1)
        for row, emb in zip(chunk, embs):
            cache[row["model_id"]]["text"] = emb

    flat = {}
    for model_id, entry in cache.items():
        for kind, value in entry.items():
            flat[f"{model_id}/{kind}"] = value.astype(np.float32)
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    np.savez(output_path, **flat)
    return cache
