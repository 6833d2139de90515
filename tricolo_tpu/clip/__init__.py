"""Frozen-CLIP support: BPE tokenizer + offline feature extraction.

The reference freezes CLIP ViT-L/14 and only ever consumes *precached*
features (extract_clip_feats.py; the live encode paths in its encoders are
commented out — SURVEY.md §2.1). This package reproduces that workflow:

* `tokenizer` — CLIP's byte-level BPE (loads the standard
  ``bpe_simple_vocab_16e6.txt.gz`` merges file from a configurable path);
* `extract` — the cache builder: per split, image embedding = L2-normalized
  mean over views of the per-view image embeddings, text embedding =
  L2-normalized caption embedding keyed by model_id (so the *last* caption
  seen wins — the reference's quirk, extract_clip_feats.py:39-40),
  saved as ``clip_embeddings_{split}.npz``.

The encoder backend is pluggable (`ClipBackend`): a torch/transformers
implementation is provided for hosts with local CLIP weights, and tests
inject a deterministic fake. No network access is ever required at train
time — extraction is a one-time host-side step.
"""

from .extract import ClipBackend, TransformersClipBackend, extract_clip_features
from .tokenizer import ClipTokenizer, tokenize

__all__ = [
    "ClipTokenizer",
    "tokenize",
    "ClipBackend",
    "TransformersClipBackend",
    "extract_clip_features",
]
