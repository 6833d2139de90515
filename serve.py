"""Retrieval serving entry point (beyond the reference, which has none).

Build the shape index from a checkpoint + split, then answer text queries —
one-shot, or as an HTTP endpoint:

    # one-shot query
    python serve.py data=text2shape_chair_table experiment_name=tri \\
        model.voxel_encoder=SparseCNNEncoder +ckpt_path=output/.../epoch=19.ckpt \\
        +query="a red leather office chair"

    # HTTP endpoint (POST /retrieve {"query": ..., "k": 5})
    python serve.py ... +ckpt_path=... +port=8080

Optional: `+index_path=index.npz` caches the built index (loaded when the
file exists, saved after building otherwise); `+vocab_path=...` points at
the Text2Shape `shapenet.json` (defaults to `{data.dataset_path}/
shapenet.json`) for raw-text tokenization; `+query_tokens="12,5,99"`
queries with pre-tokenized ids (no vocabulary needed).
"""

from __future__ import annotations

import os
import sys


def main(argv: list[str] | None = None):
    from tricolo_tpu.config import load_config

    cfg = load_config(argv if argv is not None else sys.argv[1:])
    from train import _apply_platform_override

    _apply_platform_override(cfg)

    if cfg.experiment_name is None:
        cfg.experiment_name = "default"
        from tricolo_tpu.config import resolve_interpolations

        resolve_interpolations(cfg)

    ckpt_path = cfg.get("ckpt_path", None)
    assert ckpt_path and os.path.exists(ckpt_path), (
        "Error: Checkpoint path does not exists."
    )

    from tricolo_tpu.data import DataModule
    from tricolo_tpu.serving import RetrievalIndex, RetrievalServer, TextTokenizer

    tokenizer = None
    vocab_path = cfg.get("vocab_path", None) or os.path.join(
        cfg.data.get("dataset_path") or "", "shapenet.json"
    )
    if os.path.exists(vocab_path):
        tokenizer = TextTokenizer.from_file(vocab_path)

    server = RetrievalServer.from_checkpoint(cfg, ckpt_path, tokenizer=tokenizer)

    index_path = cfg.get("index_path", None)
    if index_path:
        index_path = RetrievalIndex._norm_path(index_path)
    if index_path and os.path.exists(index_path):
        # Provenance: refuse an index built from a different checkpoint.
        server.index = RetrievalIndex.load(index_path, expect_provenance=ckpt_path)
        print(f"index loaded from {index_path} ({len(server.index.model_ids)} models)")
    else:
        server.build_index(DataModule(cfg))
        print(f"index built: {len(server.index.model_ids)} models")
        if index_path:
            saved = server.index.save(index_path, provenance=ckpt_path)
            print(f"index saved to {saved}")

    query_tokens = cfg.get("query_tokens", None)
    query = cfg.get("query", None)
    if query_tokens is not None:
        tokens = [int(t) for t in str(query_tokens).split(",")]
        for model_id, sim in server.query(tokens=tokens):
            print(f"{model_id}\t{sim:.4f}")
    elif query is not None:
        for model_id, sim in server.query(text=str(query)):
            print(f"{model_id}\t{sim:.4f}")

    port = cfg.get("port", None)
    if port is not None:
        print(f"serving on :{port} — POST /retrieve, GET /healthz")
        server.serve_http(int(port))


if __name__ == "__main__":
    main()
