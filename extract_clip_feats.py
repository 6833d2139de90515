"""CLIP feature-cache CLI.

Invocation parity with the reference (README.md:84-86):

    python extract_clip_feats.py data=text2shape_chair_table data.image_size=224

Forces the CLIP text encoder for tokenization parity (reference
extract_clip_feats.py:51), loads a *local* HF CLIP checkpoint directory from
``model.modules.clip_model`` (no network egress), and writes
``clip_embeddings_{split}.npz`` per split under exp_data.
"""

from __future__ import annotations

import os
import sys


def main(argv: list[str] | None = None):
    from tricolo_tpu.config import load_config
    from tricolo_tpu.clip.extract import TransformersClipBackend, extract_clip_features
    from tricolo_tpu.data import build_dataset

    cfg = load_config(argv if argv is not None else sys.argv[1:])
    if cfg.data.image_size != 224:
        print("Error: Please set data.image_size to 224 for CLIP extraction.")
        raise SystemExit(0)

    backend = TransformersClipBackend(cfg.model.modules.clip_model)
    for split in ("train", "val", "test"):
        dataset = build_dataset(cfg, split)
        out = os.path.join(
            cfg.data.exp_data_root_path, f"clip_embeddings_{split}.npz"
        )
        extract_clip_features(dataset, backend, out)
        print(f"saved {out}")


if __name__ == "__main__":
    main()
