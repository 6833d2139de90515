"""Text-to-shape retrieval serving: index building + query answering.

The reference repo stops at offline evaluation (test.py writes metrics and
an embeddings pickle); it has no way to answer a *new* text query. This
module adds the production path the framework is meant to serve:

* `RetrievalIndex` — the deduplicated shape-embedding matrix (one row per
  model, first occurrence wins — the same rule the evaluator uses,
  reference eval_retrieval.py:49-56) with save/load to `.npz`.
* `TextTokenizer` — raw text → the Text2Shape integer token ids the BiGRU
  was trained on, via the inverted `shapenet.json` idx_to_word vocabulary
  (the reference ships only pre-tokenized captions; this is the inverse
  mapping, whitespace/punctuation-split lowercase words, OOV dropped).
* `RetrievalServer` — loads a checkpoint (pruned like test.py), embeds a
  query with a jitted text encoder, and returns the top-k model ids by
  the evaluator's similarity (raw dot product over L2-normalized text
  embeddings against the unnormalized image+voxel sum — the reference's
  deliberate quirk, tricolo_net.py:135-139, replicated for consistency
  with the reported metrics). `serve_http` exposes it over a stdlib HTTP
  endpoint (POST /retrieve {"query"|"tokens", "k"}).

Query-time batch is 1; the encoder jit warms once per (padded) length
bucket. BiGRU queries run fully on device; the CLIPTextEncoder variant
encodes queries through the frozen CLIP backend on host (the same local
HF checkpoint extraction uses) before the trained MLP head — raw text
additionally needs the BPE merges file (TRICOLO_CLIP_BPE).
"""

from __future__ import annotations

import json
import re
from typing import Any, Sequence

import numpy as np


class TextTokenizer:
    """Raw text → Text2Shape token ids (best-effort inverse vocabulary).

    ``vocab`` is the `shapenet.json` dict holding ``idx_to_word`` (the file
    preprocessing reads, preprocess.py:46-48); words are lowercased and
    split on non-alphanumerics (keeping word-internal apostrophes), unknown
    words are dropped.
    """

    def __init__(self, vocab: dict):
        idx_to_word = vocab["idx_to_word"]
        self.word_to_idx = {w: int(i) for i, w in idx_to_word.items()}

    @classmethod
    def from_file(cls, path: str) -> "TextTokenizer":
        with open(path) as f:
            return cls(json.load(f))

    def __call__(self, text: str, max_tokens: int) -> np.ndarray:
        words = re.findall(r"[a-z0-9]+(?:'[a-z]+)?", text.lower())
        ids = [self.word_to_idx[w] for w in words if w in self.word_to_idx]
        if words and not ids:
            # An all-padding query would still produce a fixed embedding and
            # a confident-looking ranking — fail loudly instead.
            raise ValueError(
                f"no word of {text!r} is in the vocabulary; the query would "
                "be empty"
            )
        out = np.zeros(max_tokens, dtype=np.int32)
        ids = ids[:max_tokens]
        out[: len(ids)] = ids
        return out


class RetrievalIndex:
    """Deduplicated shape-embedding matrix keyed by model_id."""

    def __init__(self, model_ids: Sequence[str], matrix: np.ndarray):
        if len(model_ids) != matrix.shape[0]:
            raise ValueError(
                f"{len(model_ids)} ids vs matrix {matrix.shape}"
            )
        self.model_ids = list(model_ids)
        self.matrix = np.asarray(matrix, np.float32)

    @classmethod
    def from_embeddings_dict(cls, embeddings_dict: dict) -> "RetrievalIndex":
        """Build from the evaluator's caption-tuple dict — one row per
        unique model, first occurrence wins (eval_retrieval.py:49-56)."""
        ids: list[str] = []
        rows: list[np.ndarray] = []
        seen: set[str] = set()
        for (_, _, model_id, _, shape) in embeddings_dict["caption_embedding_tuples"]:
            if model_id in seen:
                continue
            seen.add(model_id)
            ids.append(model_id)
            rows.append(np.asarray(shape, np.float32))
        return cls(ids, np.stack(rows))

    @staticmethod
    def _norm_path(path: str) -> str:
        # np.savez always appends ".npz"; normalize so save/exists/load agree.
        return path if path.endswith(".npz") else path + ".npz"

    def save(self, path: str, provenance: str = "") -> str:
        path = self._norm_path(path)
        np.savez(
            path,
            model_ids=np.asarray(self.model_ids),
            matrix=self.matrix,
            provenance=np.asarray(provenance),
        )
        return path

    @classmethod
    def load(cls, path: str, expect_provenance: str | None = None) -> "RetrievalIndex":
        data = np.load(cls._norm_path(path), allow_pickle=False)
        if expect_provenance is not None and "provenance" in data:
            found = str(data["provenance"])
            if found and found != expect_provenance:
                raise ValueError(
                    f"index was built from {found!r} but the server loaded "
                    f"{expect_provenance!r} — rebuild the index or drop "
                    "+index_path"
                )
        return cls([str(m) for m in data["model_ids"]], data["matrix"])

    def topk(self, query_embedding: np.ndarray, k: int = 5):
        """Top-k (model_id, similarity) by the evaluator's raw dot product."""
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        sims = self.matrix @ np.asarray(query_embedding, np.float32)
        k = min(k, len(self.model_ids))
        order = np.argsort(-sims)[:k]
        return [(self.model_ids[i], float(sims[i])) for i in order]


def _text_encoder_apply(cfg, clip_backend=None):
    """(apply_fn, max_tokens): standalone text-query encoder sharing the
    TriCoLoNet text_encoder param subtree (encoders are self-contained
    submodules, so the subtree is a complete parameter set).

    BiGRU: jitted embed→GRU→fc on device. CLIPTextEncoder: frozen CLIP
    `encode_text` on host (the local HF checkpoint extraction uses,
    `model.modules.clip_model`) → L2-normalize → the trained MLP head —
    the same pipeline that produced the cached training features
    (clip/extract.py), applied to a live query.
    """
    import jax
    import jax.numpy as jnp

    modules = cfg.model.modules
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        cfg.precision.compute_dtype
    ]
    name = cfg.model.text_encoder or "BiGRUEncoder"

    if name == "BiGRUEncoder":
        from .models.bigru import BiGRUEncoder

        encoder = BiGRUEncoder(
            vocab_size=modules.BiGRUEncoder.vocab_size,
            out_dim=cfg.model.out_dim,
            embed_dim=modules.BiGRUEncoder.embed_dim,
            hidden_dim=modules.BiGRUEncoder.hidden_dim,
            dtype=dtype,
        )

        @jax.jit
        def apply(text_params, tokens):
            return encoder.apply({"params": text_params}, tokens)

        return apply, cfg.data.get("max_tokens", 96)

    if name == "CLIPTextEncoder":
        from .clip.extract import TransformersClipBackend, _l2
        from .models.clip_heads import CLIPTextEncoder

        backend = clip_backend or TransformersClipBackend(modules.clip_model)
        head = CLIPTextEncoder(
            out_dim=cfg.model.out_dim,
            feature_dim=modules.clip_feature_dim,
            dropout=modules.CLIPTextEncoder.dropout,
            dtype=dtype,
        )

        def apply(text_params, tokens):
            feats = _l2(backend.encode_text(np.asarray(tokens)))
            return head.apply(
                {"params": text_params}, jnp.asarray(feats), deterministic=True
            )

        from .clip.tokenizer import CONTEXT_LENGTH

        return apply, CONTEXT_LENGTH

    raise NotImplementedError(f"no serving path for text encoder {name!r}")


def _image_encoder_apply(cfg):
    """Jitted standalone MVCNN for query-by-example images, sharing the
    TriCoLoNet image_encoder param subtree. None when the config has no
    trainable image encoder (CLIPImageEncoder consumes precached features)."""
    if cfg.model.image_encoder != "MVCNNEncoder":
        return None
    import jax
    import jax.numpy as jnp

    from .data.device_prep import normalize_images
    from .models.mvcnn import MVCNNEncoder

    modules = cfg.model.modules
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        cfg.precision.compute_dtype
    ]
    encoder = MVCNNEncoder(
        num_views=modules.MVCNNEncoder.num_views,
        z_dim=modules.MVCNNEncoder.z_dim,
        out_dim=cfg.model.out_dim,
        cnn_name=modules.MVCNNEncoder.cnn_name,
        dtype=dtype,
    )

    @jax.jit
    def apply(image_params, views_u8):
        views = normalize_images(views_u8, dtype)
        return encoder.apply(
            {
                "params": image_params["params"],
                "batch_stats": image_params["batch_stats"],
            },
            views,
        )

    return apply


class RetrievalServer:
    """Answer text queries against a built shape index."""

    def __init__(self, cfg, state, index: RetrievalIndex | None = None,
                 tokenizer: TextTokenizer | None = None, clip_backend=None):
        self.cfg = cfg
        self.state = state
        self.index = index
        self.tokenizer = tokenizer
        self._clip_text = (cfg.model.text_encoder or "BiGRUEncoder") == "CLIPTextEncoder"
        self._apply, self.max_tokens = _text_encoder_apply(cfg, clip_backend)
        self._image_apply = _image_encoder_apply(cfg)

    # -- construction -----------------------------------------------------

    @classmethod
    def from_checkpoint(cls, cfg, ckpt_path: str, **kw) -> "RetrievalServer":
        from .training import Trainer

        trainer = Trainer(cfg)
        state, _ = trainer.load_state(ckpt_path, for_inference=True)
        server = cls(cfg, state, **kw)
        server._trainer = trainer
        return server

    def build_index(self, data_module) -> RetrievalIndex:
        """Embed the ``inference.split`` split and build the index."""
        from .training import Trainer

        trainer = getattr(self, "_trainer", None) or Trainer(self.cfg)
        data_module.setup("test")
        embeddings_dict, _ = trainer.collect_embeddings(
            self.state, data_module.test_loader()
        )
        self.index = RetrievalIndex.from_embeddings_dict(embeddings_dict)
        return self.index

    # -- queries ----------------------------------------------------------

    def embed_text(self, tokens: np.ndarray) -> np.ndarray:
        tokens = np.asarray(tokens, np.int32)
        if tokens.ndim == 1:
            tokens = tokens[None]
        padded = np.zeros((tokens.shape[0], self.max_tokens), np.int32)
        n = min(tokens.shape[1], self.max_tokens)
        padded[:, :n] = tokens[:, :n]
        out = self._apply(self.state.params["text_encoder"], padded)
        return np.asarray(out, np.float32)

    def query(self, text: str | None = None, tokens=None, k: int = 5):
        """Top-k (model_id, similarity) for a raw-text or token-id query."""
        if self.index is None:
            raise RuntimeError("no index built — call build_index() first")
        if tokens is None:
            if text is None:
                raise ValueError("provide text or tokens")
            if self._clip_text:
                # CLIP mode tokenizes with the in-repo BPE (the ids the
                # frozen backend expects) — no external vocabulary needed.
                from .clip.tokenizer import tokenize as clip_tokenize

                tokens = np.asarray(clip_tokenize(text), np.int32)
            elif self.tokenizer is None:
                raise RuntimeError(
                    "raw-text queries need a vocabulary — pass +vocab_path "
                    "(shapenet.json with idx_to_word) or query with tokens"
                )
            else:
                tokens = self.tokenizer(text, self.max_tokens)
        emb = self.embed_text(np.asarray(tokens))[0]
        return self.index.topk(emb, k)

    def query_image(self, views_u8: np.ndarray, k: int = 5):
        """Top-k shapes for a query-by-example: ``views_u8`` is one sample's
        (num_views, H, W, 3) uint8 multi-view renders, embedded through the
        trained MVCNN (image features share the contrastive space with the
        indexed shape embeddings via the image-voxel/image-text pair losses,
        reference tricolo_net.py:56-65)."""
        if self.index is None:
            raise RuntimeError("no index built — call build_index() first")
        if self._image_apply is None:
            raise NotImplementedError(
                "query_image needs a trained MVCNN image encoder "
                "(model.image_encoder=MVCNNEncoder)"
            )
        views = np.asarray(views_u8, np.uint8)
        if views.ndim == 4:
            views = views[None]
        emb = np.asarray(
            self._image_apply(
                {
                    "params": self.state.params["image_encoder"],
                    "batch_stats": self.state.batch_stats.get("image_encoder", {}),
                },
                views,
            ),
            np.float32,
        )[0]
        return self.index.topk(emb, k)

    # -- HTTP -------------------------------------------------------------

    def serve_http(
        self, port: int, host: str = "127.0.0.1", max_requests: int | None = None
    ) -> None:
        """Blocking stdlib HTTP endpoint.

        POST /retrieve {"query": str | "tokens": [int], "k": int} →
        {"results": [{"model_id": ..., "similarity": ...}]};
        GET /healthz → {"status": "ok", "index_size": N}.
        ``max_requests`` bounds the loop (used by tests). Binds localhost by
        default — the endpoint is unauthenticated and single-threaded; put a
        real proxy in front before exposing it (`host="0.0.0.0"`).
        """
        import http.server

        server_ref = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def _reply(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802 (stdlib API)
                if self.path == "/healthz":
                    self._reply(
                        200,
                        {"status": "ok", "index_size": len(server_ref.index.model_ids)
                         if server_ref.index else 0},
                    )
                else:
                    self._reply(404, {"error": "unknown path"})

            def do_POST(self):  # noqa: N802
                if self.path != "/retrieve":
                    self._reply(404, {"error": "unknown path"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(length) or b"{}")
                    results = server_ref.query(
                        text=req.get("query"),
                        tokens=req.get("tokens"),
                        k=int(req.get("k", 5)),
                    )
                    self._reply(
                        200,
                        {"results": [
                            {"model_id": m, "similarity": s} for m, s in results
                        ]},
                    )
                except (ValueError, KeyError, TypeError, json.JSONDecodeError) as exc:
                    # Malformed request → client error, detail surfaced.
                    self._reply(400, {"error": str(exc)})
                except Exception:
                    # Genuine server-side fault: 500, generic message (no
                    # internal detail leaked to the client).
                    import traceback

                    traceback.print_exc()
                    self._reply(500, {"error": "internal server error"})

            def log_message(self, *args: Any) -> None:
                pass  # quiet; the CLI prints the serving banner

        httpd = http.server.HTTPServer((host, port), Handler)
        if max_requests is None:
            httpd.serve_forever()
        else:
            for _ in range(max_requests):
                httpd.handle_request()
        httpd.server_close()
