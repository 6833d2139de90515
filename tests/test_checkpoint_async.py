"""Async checkpointing: ordered background writes, donation safety, parity.

The reference saves synchronously through Lightning's ModelCheckpoint; this
framework adds an opt-in background writer (checkpoint_monitor.async_save)
because the device→host transfer dominates save time on remote-attached
TPU runtimes (PERF.md "Checkpoint D2H over the tunnel", ~8 s/save). The
contract under test: identical on-disk results to the synchronous path,
safety against the train step's buffer donation, strict submission-order
execution, and error propagation instead of silent checkpoint loss.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tricolo_tpu.training import TrainState
from tricolo_tpu.training.checkpoint import (
    AsyncCheckpointWriter,
    CheckpointManager,
    load_checkpoint,
    snapshot_state,
)


def _state(seed: int) -> TrainState:
    rng = np.random.RandomState(seed)
    return TrainState(
        step=jnp.asarray(seed, jnp.int32),
        params={"dense": {"kernel": jnp.asarray(rng.randn(4, 3), jnp.float32)}},
        batch_stats={"bn": {"mean": jnp.asarray(rng.randn(3), jnp.float32)}},
        opt_state={"mu": {"dense": {"kernel": jnp.zeros((4, 3), jnp.float32)}}},
    )


# Save sequence exercising top-k admission, rejection, and eviction.
_SCORES = [("a", 10.0), ("b", 30.0), ("c", 5.0), ("d", 20.0), ("e", 25.0)]


def _run_saves(dirpath: str, writer: AsyncCheckpointWriter | None):
    manager = CheckpointManager(
        dirpath, save_top_k=2, save_last=True, writer=writer
    )
    for epoch, (_, score) in enumerate(_SCORES):
        manager.save(_state(epoch), epoch, {"val_eval/RR@5": score})
    manager.wait()
    return manager


class TestAsyncMatchesSync:
    def test_identical_directory_and_contents(self, tmp_path):
        sync_dir, async_dir = str(tmp_path / "sync"), str(tmp_path / "async")
        writer = AsyncCheckpointWriter()
        m_sync = _run_saves(sync_dir, None)
        m_async = _run_saves(async_dir, writer)
        writer.close()

        assert sorted(os.listdir(sync_dir)) == sorted(os.listdir(async_dir))
        # Retention kept epochs 1 (30.0) and 4 (25.0) plus last.ckpt.
        assert sorted(os.listdir(sync_dir)) == [
            "checkpoints.json",
            "epoch=1.ckpt",
            "epoch=4.ckpt",
            "last.ckpt",
        ]
        for name in os.listdir(sync_dir):
            if not name.endswith(".ckpt"):
                continue
            a = load_checkpoint(os.path.join(sync_dir, name))
            b = load_checkpoint(os.path.join(async_dir, name))
            assert int(a["epoch"]) == int(b["epoch"])
            jax.tree.map(
                np.testing.assert_array_equal, a["params"], b["params"]
            )
        with open(os.path.join(sync_dir, "checkpoints.json")) as f:
            idx_sync = json.load(f)
        with open(os.path.join(async_dir, "checkpoints.json")) as f:
            idx_async = json.load(f)
        fix = lambda idx: [
            {**e, "path": os.path.basename(e["path"])} for e in idx["entries"]
        ]
        assert fix(idx_sync) == fix(idx_async)
        assert os.path.basename(m_sync.best_path) == os.path.basename(
            m_async.best_path
        )


class TestDonationSafety:
    def test_snapshot_survives_source_deletion(self, tmp_path):
        """The epoch loop donates state buffers to the next train step right
        after save() returns; the background write must read the device-side
        snapshot, never the (now deleted) original."""
        writer = AsyncCheckpointWriter()
        manager = CheckpointManager(
            str(tmp_path), save_top_k=1, writer=writer
        )
        state = _state(7)
        expected = np.asarray(state.params["dense"]["kernel"])
        manager.save(state, 0, {"val_eval/RR@5": 1.0})
        # Simulate donation: delete every original device buffer.
        jax.tree.map(lambda x: x.delete(), state)
        manager.wait()
        writer.close()
        raw = load_checkpoint(str(tmp_path / "epoch=0.ckpt"))
        np.testing.assert_array_equal(
            raw["params"]["dense"]["kernel"], expected
        )

    def test_snapshot_state_copies_every_leaf(self):
        state = _state(3)
        snap = snapshot_state(state)
        jax.tree.map(lambda x: x.delete(), state)
        assert int(snap.step) == 3
        assert np.isfinite(np.asarray(snap.params["dense"]["kernel"])).all()


class TestWriterSemantics:
    def test_submission_order(self):
        writer = AsyncCheckpointWriter()
        seen = []
        for i in range(50):
            writer.submit(lambda i=i: seen.append(i))
        writer.wait()
        writer.close()
        assert seen == list(range(50))

    def test_error_propagates_on_wait(self):
        writer = AsyncCheckpointWriter()
        writer.submit(lambda: (_ for _ in ()).throw(OSError("disk full")))
        with pytest.raises(RuntimeError, match="async checkpoint write"):
            writer.wait()
        writer.close()

    def test_error_propagates_on_next_submit(self):
        writer = AsyncCheckpointWriter()
        writer.submit(lambda: (_ for _ in ()).throw(OSError("disk full")))
        writer._queue.join()  # let the failure land deterministically
        with pytest.raises(RuntimeError, match="async checkpoint write"):
            writer.submit(lambda: None)
        writer.close()

    def test_manager_save_raises_after_failed_write(self, tmp_path):
        writer = AsyncCheckpointWriter()
        manager = CheckpointManager(
            str(tmp_path / "missing" / "nested"), save_top_k=1, writer=writer
        )
        # save_checkpoint creates dirs, so break it differently: a file
        # standing where the directory must go.
        blocker = tmp_path / "missing"
        blocker.write_text("not a directory")
        manager.save(_state(0), 0, {"val_eval/RR@5": 1.0})
        with pytest.raises(RuntimeError, match="async checkpoint write"):
            manager.wait()
        writer.close()
