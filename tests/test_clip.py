"""CLIP subpackage tests: BPE tokenizer mechanics + extraction pipeline."""

import gzip

import numpy as np
import pytest

from tricolo_tpu.clip.extract import extract_clip_features
from tricolo_tpu.clip.tokenizer import ClipTokenizer
from tricolo_tpu.config import load_config
from tricolo_tpu.data import build_dataset


def write_tiny_bpe(path):
    """A miniature merges file in the OpenAI format (version header first)."""
    merges = [
        ("h", "e"),          # he
        ("l", "l"),          # ll
        ("he", "ll"),        # hell
        ("o", "</w>"),       # o</w>
        ("hell", "o</w>"),   # hello</w>
        ("w", "o"),          # wo
        ("r", "l"),          # rl
        ("rl", "d</w>"),     # rld</w>
        ("wo", "rld</w>"),   # world</w>
    ]
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("#version: tiny\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return merges


class TestTokenizer:
    def test_merges_and_framing(self, tmp_path):
        bpe = str(tmp_path / "bpe.txt.gz")
        write_tiny_bpe(bpe)
        tok = ClipTokenizer(bpe)
        ids = tok("hello world", context_length=8)
        assert ids.dtype == np.int32
        assert ids.shape == (8,)
        assert ids[0] == tok.sot
        # "hello" and "world" each merge to a single token.
        assert ids[1] == tok.encoder["hello</w>"]
        assert ids[2] == tok.encoder["world</w>"]
        assert ids[3] == tok.eot
        assert (ids[4:] == 0).all()

    def test_unmerged_falls_back_to_bytes(self, tmp_path):
        bpe = str(tmp_path / "bpe.txt.gz")
        write_tiny_bpe(bpe)
        tok = ClipTokenizer(bpe)
        ids = tok("hex", context_length=16)
        # 'he' merges; 'x</w>' stays a byte token.
        assert ids[1] == tok.encoder["he"]
        assert ids[2] == tok.encoder["x</w>"]

    def test_truncation_keeps_eot(self, tmp_path):
        bpe = str(tmp_path / "bpe.txt.gz")
        write_tiny_bpe(bpe)
        tok = ClipTokenizer(bpe)
        ids = tok("hello " * 50, context_length=10, truncate=True)
        assert ids.shape == (10,)
        assert ids[-1] == tok.eot
        with pytest.raises(ValueError):
            tok("hello " * 50, context_length=10, truncate=False)

    def test_cleaning_lowercases_and_collapses_whitespace(self, tmp_path):
        bpe = str(tmp_path / "bpe.txt.gz")
        write_tiny_bpe(bpe)
        tok = ClipTokenizer(bpe)
        np.testing.assert_array_equal(
            tok("HELLO   world"), tok("hello world")
        )

    def test_missing_bpe_file_message(self):
        with pytest.raises(FileNotFoundError, match="TRICOLO_CLIP_BPE"):
            ClipTokenizer("/nonexistent/bpe.gz")


class FakeBackend:
    """Deterministic stand-in: embeddings are hashes of the input bytes.

    Also asserts the extractor's feed contract (reference
    extract_clip_feats.py:17-31): images arrive as CLIP-normalized float32
    pixels from the dataset transform, texts as (77,) int32 BPE token rows —
    never raw uint8 or raw strings.
    """

    dim = 16

    def _embed(self, key: bytes) -> np.ndarray:
        seed = np.frombuffer(key[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
        return np.random.default_rng(int(seed) % (2**31)).standard_normal(self.dim)

    def encode_image(self, pixels):
        assert pixels.dtype == np.float32 and pixels.ndim == 4
        # CLIP normalization maps [0, 255] uint8 well outside [0, 1].
        assert pixels.min() < -0.5 and pixels.max() < 4.0
        return np.stack([self._embed(p.tobytes()[:64]) for p in pixels]).astype(
            np.float32
        )

    def encode_text(self, tokens):
        assert tokens.dtype == np.int32 and tokens.ndim == 2
        assert tokens.shape[1] == 77
        return np.stack([self._embed(t.tobytes()) for t in tokens]).astype(np.float32)


class TestExtraction:
    @staticmethod
    def _tokenizer(tmp_path):
        bpe = tmp_path / "bpe.txt.gz"
        write_tiny_bpe(str(bpe))
        return ClipTokenizer(str(bpe))

    def test_cache_format_and_quirks(self, tmp_path):
        cfg = load_config(["data=synthetic"])
        dataset = build_dataset(cfg, "val")
        backend = FakeBackend()
        tokenizer = self._tokenizer(tmp_path)
        out = str(tmp_path / "clip_embeddings_val.npz")
        cache = extract_clip_features(dataset, backend, out, tokenizer=tokenizer)

        # Every model has normalized img + text entries.
        for model_id, entry in cache.items():
            assert set(entry) == {"img", "text"}
            assert np.linalg.norm(entry["img"]) == pytest.approx(1.0, rel=1e-5)
            assert np.linalg.norm(entry["text"]) == pytest.approx(1.0, rel=1e-5)

        # img = normalized mean of per-view embeddings over the
        # dataset-transform (CLIP-normalized) pixels.
        from tricolo_tpu.clip.extract import clip_normalize_images

        (cat, mid), vision = next(iter(dataset.vision_data.items()))
        per_view = backend.encode_image(clip_normalize_images(vision["images"]))
        expect = per_view.mean(axis=0)
        expect /= np.linalg.norm(expect)
        np.testing.assert_allclose(cache[mid]["img"], expect, rtol=1e-5)

        # text = LAST caption's embedding for each model (reference quirk),
        # encoded from the in-repo BPE tokens.
        last_caption = {}
        for row in dataset.language_data:
            last_caption[row["model_id"]] = row["text"]
        for mid2, text in last_caption.items():
            expect_t = backend.encode_text(tokenizer(text)[None, :])[0]
            expect_t /= np.linalg.norm(expect_t)
            np.testing.assert_allclose(cache[mid2]["text"], expect_t, rtol=1e-5)

        # The npz round-trips through the dataset loader's cache reader.
        from tricolo_tpu.data.datasets import _load_clip_cache

        loaded = _load_clip_cache(out[: -len(".npz")])
        assert set(loaded) == set(cache)
        np.testing.assert_allclose(loaded[mid]["img"], cache[mid]["img"], rtol=1e-6)

    def test_dataset_attaches_cache(self, tmp_path, monkeypatch):
        # With the cache present and a CLIP encoder configured, items carry
        # clip_embeddings_* (general_dataset.py:56-61 behavior).
        cfg = load_config(["data=synthetic", "model.image_encoder=CLIPImageEncoder"])
        dataset = build_dataset(cfg, "val")
        item = dataset[0]
        assert "clip_embeddings_img" in item
        assert item["clip_embeddings_img"].shape == (768,)


class TestUnicodeTokenization:
    def test_non_ascii_letters_group_as_words(self, tmp_path):
        bpe = str(tmp_path / "bpe.txt.gz")
        write_tiny_bpe(bpe)
        tok = ClipTokenizer(bpe)
        # 'café' must tokenize as one letter-word (byte-level pieces of the
        # whole word), not split é into the punctuation bucket.
        words = [m for m in __import__("tricolo_tpu.clip.tokenizer", fromlist=["_WORD_RE"])._WORD_RE.findall("a café-style chair")]
        assert "café" in words
        assert "-" in words
