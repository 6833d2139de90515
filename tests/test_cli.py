"""Entry-point guard behaviors (fast paths only — no training)."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_entry(script, args, cwd=None):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        capture_output=True, text=True, timeout=300, cwd=cwd or REPO, env=env,
    )


class TestTrainGuards:
    def test_clip_image_encoder_requires_224(self):
        """Reference guard (train.py:21-23): exits with the message."""
        result = run_entry(
            "train.py",
            [
                "data=synthetic",
                "model.image_encoder=CLIPImageEncoder",
                "experiment_name=x",
            ],
        )
        assert "set data.image_size to 224" in result.stdout
        assert result.returncode == 0  # reference exits 0

    def test_missing_resume_ckpt_asserts(self, tmp_path):
        result = run_entry(
            "train.py",
            [
                "data=synthetic",
                "experiment_name=x",
                "ckpt_name=missing.ckpt",
                f"project_root_path={tmp_path}",
            ],
        )
        assert result.returncode != 0
        assert "Checkpoint path does not exists" in result.stderr


class TestTestGuards:
    def test_missing_ckpt_path_asserts(self):
        result = run_entry(
            "test.py", ["data=synthetic", "experiment_name=x", "+ckpt_path=/nope"]
        )
        assert result.returncode != 0
        assert "Checkpoint path does not exists" in result.stderr


class TestEvalCli:
    def test_eval_over_pickle(self, tmp_path):
        rng = np.random.default_rng(0)
        tuples = []
        for m in range(6):
            emb = rng.standard_normal(8).astype(np.float32)
            tuples.append((None, "cat", f"m{m}", emb, emb))
        path = tmp_path / "output.p"
        with open(path, "wb") as f:
            pickle.dump({"caption_embedding_tuples": tuples}, f)
        result = run_entry("eval.py", [f"+prediction_file_path={path}"])
        assert result.returncode == 0
        assert "RR@1 RR@5 NDCG@5 MRR" in result.stdout
