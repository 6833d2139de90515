"""Serving layer: tokenizer, index semantics, query path, HTTP endpoint."""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from tricolo_tpu.config import load_config
from tricolo_tpu.serving import RetrievalIndex, RetrievalServer, TextTokenizer


class TestTextTokenizer:
    VOCAB = {"idx_to_word": {"1": "red", "2": "chair", "3": "leather", "4": "it's"}}

    def test_basic_oov_and_truncation(self):
        tok = TextTokenizer(self.VOCAB)
        out = tok("A RED, leather spaceship chair!", max_tokens=8)
        np.testing.assert_array_equal(out, [1, 3, 2, 0, 0, 0, 0, 0])
        out = tok("red chair red chair", max_tokens=3)
        np.testing.assert_array_equal(out, [1, 2, 1])
        assert out.dtype == np.int32

    def test_apostrophe_word(self):
        tok = TextTokenizer(self.VOCAB)
        np.testing.assert_array_equal(tok("it's red", 4), [4, 1, 0, 0])


class TestRetrievalIndex:
    def _dict(self):
        mk = lambda v: np.asarray(v, np.float32)
        return {
            "caption_embedding_tuples": [
                (None, "c", "m1", mk([1, 0]), mk([1.0, 0.0])),
                (None, "c", "m2", mk([0, 1]), mk([0.0, 2.0])),
                (None, "c", "m1", mk([1, 1]), mk([9.0, 9.0])),  # dup: ignored
                (None, "c", "m3", mk([1, 1]), mk([0.5, 0.5])),
            ]
        }

    def test_dedup_first_occurrence_and_topk(self):
        index = RetrievalIndex.from_embeddings_dict(self._dict())
        assert index.model_ids == ["m1", "m2", "m3"]
        np.testing.assert_array_equal(index.matrix[0], [1.0, 0.0])  # not [9,9]
        top = index.topk(np.asarray([0.0, 1.0], np.float32), k=2)
        assert top[0] == ("m2", 2.0)
        assert top[1][0] == "m3"
        # k beyond the index size clamps
        assert len(index.topk(np.asarray([1.0, 0.0], np.float32), k=99)) == 3

    def test_save_load_roundtrip(self, tmp_path):
        index = RetrievalIndex.from_embeddings_dict(self._dict())
        path = str(tmp_path / "index.npz")
        index.save(path)
        loaded = RetrievalIndex.load(path)
        assert loaded.model_ids == index.model_ids
        np.testing.assert_array_equal(loaded.matrix, index.matrix)


@pytest.fixture(scope="module")
def tiny_server():
    from tricolo_tpu.data import DataModule
    from tricolo_tpu.data.device_prep import prepare_device_batch
    from tricolo_tpu.models.tricolo_net import TriCoLoNet
    from tricolo_tpu.training import TrainState, make_optimizer

    cfg = load_config(
        [
            "data=synthetic",
            "model.voxel_encoder=VoxelCNNEncoder",
            "data.voxel_size=32",
            "data.batch_size=8",
            # f32 so the standalone query encoder matches the full-model
            # program bit-for-bit (bf16 differs by fusion-order rounding).
            "precision.compute_dtype=float32",
        ]
    )
    dm = DataModule(cfg)
    dm.setup("test")
    model = TriCoLoNet.from_config(cfg)
    batch = dm.test_loader().peek()
    import jax.numpy as jnp

    device_batch = prepare_device_batch(
        {k: jnp.asarray(v) for k, v in batch.items() if isinstance(v, np.ndarray)},
        cfg.data.voxel_size,
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), device_batch)
    state = TrainState.create(variables, make_optimizer(cfg))
    server = RetrievalServer(cfg, state)
    server.build_index(dm)
    return cfg, dm, model, variables, batch, server


class TestRetrievalServer:
    def test_index_covers_split(self, tiny_server):
        cfg, dm, model, variables, batch, server = tiny_server
        assert len(server.index.model_ids) == cfg.data.num_models
        assert len(set(server.index.model_ids)) == len(server.index.model_ids)

    def test_embed_text_matches_model(self, tiny_server):
        cfg, dm, model, variables, batch, server = tiny_server
        from tricolo_tpu.data.device_prep import prepare_device_batch
        import jax.numpy as jnp

        device_batch = prepare_device_batch(
            {k: jnp.asarray(v) for k, v in batch.items() if isinstance(v, np.ndarray)},
            cfg.data.voxel_size,
        )
        expected = np.asarray(
            model.apply(variables, device_batch)["text_features"], np.float32
        )
        got = server.embed_text(batch["tokens"])
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_query_with_tokens(self, tiny_server):
        cfg, dm, model, variables, batch, server = tiny_server
        results = server.query(tokens=batch["tokens"][0], k=3)
        assert len(results) == 3
        assert all(m in server.index.model_ids for m, _ in results)
        sims = [s for _, s in results]
        assert sims == sorted(sims, reverse=True)

    def test_raw_text_needs_tokenizer(self, tiny_server):
        cfg, dm, model, variables, batch, server = tiny_server
        with pytest.raises(RuntimeError, match="vocab"):
            server.query(text="a red chair")
        server.tokenizer = TextTokenizer(
            {"idx_to_word": {"1": "red", "2": "chair"}}
        )
        assert len(server.query(text="red chair", k=2)) == 2

    def test_http_endpoint(self, tiny_server):
        import socket

        cfg, dm, model, variables, batch, server = tiny_server
        with socket.socket() as s:  # grab a free port
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        thread = threading.Thread(
            target=server.serve_http, args=(port,), kwargs={"max_requests": 3},
            daemon=True,
        )
        thread.start()
        # Poll until the server socket is actually listening (bind happens
        # inside the thread — connecting immediately would race it).
        import time

        health = None
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                health = json.loads(
                    urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz", timeout=30
                    ).read()
                )
                break
            except (ConnectionError, urllib.error.URLError):
                time.sleep(0.1)
        assert health is not None, "server never came up"
        assert health["status"] == "ok"
        assert health["index_size"] == len(server.index.model_ids)

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/retrieve",
            data=json.dumps({"tokens": batch["tokens"][0].tolist(), "k": 2}).encode(),
            headers={"Content-Type": "application/json"},
        )
        body = json.loads(urllib.request.urlopen(req, timeout=30).read())
        assert len(body["results"]) == 2
        assert {"model_id", "similarity"} <= set(body["results"][0])

        # malformed request → 400 with an error payload
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/retrieve", data=b'{"k": 1}',
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as err:
            assert err.code == 400
            assert "error" in json.loads(err.read())
        thread.join(timeout=10)
        assert not thread.is_alive()


class TestClipTextServing:
    def test_query_through_stub_backend(self):
        """CLIP-text mode: BPE-tokenize the query, encode through the frozen
        backend, L2-normalize, apply the trained MLP head."""
        from tricolo_tpu.data.device_prep import prepare_device_batch
        from tricolo_tpu.models.tricolo_net import TriCoLoNet
        from tricolo_tpu.training import TrainState, make_optimizer
        import jax.numpy as jnp

        class StubBackend:
            def encode_text(self, tokens):
                tokens = np.asarray(tokens, np.float32)
                out = np.zeros((tokens.shape[0], 768), np.float32)
                out[:, : tokens.shape[1]] = tokens / 1000.0
                return out

        cfg = load_config(
            [
                "data=synthetic",
                "model.text_encoder=CLIPTextEncoder",
                "model.voxel_encoder=VoxelCNNEncoder",
                "data.voxel_size=32",
                "data.batch_size=8",
                "precision.compute_dtype=float32",
            ]
        )
        from tricolo_tpu.data import DataModule

        dm = DataModule(cfg)
        dm.setup("test")
        model = TriCoLoNet.from_config(cfg)
        batch = dm.test_loader().peek()
        device_batch = prepare_device_batch(
            {k: jnp.asarray(v) for k, v in batch.items() if isinstance(v, np.ndarray)},
            cfg.data.voxel_size,
        )
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), device_batch)
        state = TrainState.create(variables, make_optimizer(cfg))
        server = RetrievalServer(cfg, state, clip_backend=StubBackend())
        server.build_index(dm)
        assert server.max_tokens == 77
        tokens = np.zeros(77, np.int32)
        tokens[:5] = [49406, 320, 1901, 4159, 49407]  # BPE ids for a short query
        results = server.query(tokens=tokens, k=3)
        assert len(results) == 3
        # determinism: same tokens → same ranking
        assert server.query(tokens=tokens, k=3) == results
        # raw text needs the BPE merges file (absent in this environment) —
        # must fail with the tokenizer's descriptive error, not something cryptic
        import os
        if not os.environ.get("TRICOLO_CLIP_BPE"):
            with pytest.raises(FileNotFoundError, match="BPE"):
                server.query(text="a gray swivel chair")


class TestImageQuery:
    def test_query_image_matches_model_features(self):
        import jax.numpy as jnp

        from tricolo_tpu.data import DataModule
        from tricolo_tpu.data.device_prep import prepare_device_batch
        from tricolo_tpu.models.tricolo_net import TriCoLoNet
        from tricolo_tpu.training import TrainState, make_optimizer

        cfg = load_config(
            [
                "data=synthetic",
                "model.voxel_encoder=VoxelCNNEncoder",
                "model.image_encoder=MVCNNEncoder",
                "data.voxel_size=32",
                "data.image_size=32",
                "data.num_views=2",
                "data.batch_size=8",
                "precision.compute_dtype=float32",
            ]
        )
        dm = DataModule(cfg)
        dm.setup("test")
        model = TriCoLoNet.from_config(cfg)
        batch = dm.test_loader().peek()
        device_batch = prepare_device_batch(
            {k: jnp.asarray(v) for k, v in batch.items() if isinstance(v, np.ndarray)},
            cfg.data.voxel_size,
        )
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), device_batch)
        state = TrainState.create(variables, make_optimizer(cfg))
        server = RetrievalServer(cfg, state)
        server.build_index(dm)

        # Standalone image-query embedding must equal the full model's
        # image_features for the same views (f32, eval mode).
        expected = np.asarray(
            model.apply(variables, device_batch)["image_features"], np.float32
        )
        results = server.query_image(batch["images"][0], k=3)
        assert len(results) == 3
        sims_direct = server.index.topk(expected[0], k=3)
        assert [m for m, _ in results] == [m for m, _ in sims_direct]

    def test_query_image_without_image_encoder_raises(self, tiny_server):
        cfg, dm, model, variables, batch, server = tiny_server
        with pytest.raises(NotImplementedError, match="MVCNN"):
            server.query_image(np.zeros((2, 32, 32, 3), np.uint8))
