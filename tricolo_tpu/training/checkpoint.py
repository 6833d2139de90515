"""Checkpointing: msgpack serialization + top-k-by-metric retention.

Role parity with Lightning's ModelCheckpoint as configured by the reference
(config.yaml:39-47: monitor val_eval/RR@5, mode max, save_top_k 3, every 2
epochs, filename "{epoch}", dirpath <experiment>/training) plus the resume
path (train.py:40-45) and the key-pruned test-time load (test.py:20-28:
state_dict keys of disabled encoders are deleted before loading).

Format: a single msgpack file holding params / batch_stats / opt_state
pytrees and step/epoch counters — flax.serialization, no orbax daemon, no
directory layout to corrupt. A sidecar ``checkpoints.json`` tracks the
retained top-k and their monitored scores.
"""

from __future__ import annotations

import json
import os
import queue
import threading


import jax
import numpy as np
from flax import serialization


def snapshot_state(state):
    """Device-side copy of a train state for async saving.

    Train steps DONATE their input state buffers, so a background thread
    must never read the live state: the next step would delete those
    buffers mid-transfer. An on-device ``jnp.copy`` of every leaf is a
    cheap HBM→HBM pass (~180 MB for the flagship params+moments) after
    which the original can be donated freely; the worker thread fetches
    the copy at its leisure.
    """
    import jax.numpy as jnp

    return jax.tree.map(jnp.copy, state)


class AsyncCheckpointWriter:
    """Single ordered worker thread for checkpoint filesystem effects.

    Role parity with orbax's AsyncCheckpointer, without the daemon: the
    training loop enqueues closures (serialize+write, stale-file removal,
    index update) and continues immediately; the worker executes them in
    submission order, so top-k retention semantics are identical to the
    synchronous path. The device→host transfer — ~8 s/save over the
    tunneled runtime (PERF.md "Checkpoint D2H") — happens on the worker.

    Exceptions are captured and re-raised on the *next* submit() or
    wait(), so a full disk or unwritable dir fails the run rather than
    silently dropping checkpoints.
    """

    def __init__(self):
        self._queue: queue.Queue = queue.Queue()
        self._error: BaseException | None = None
        self._thread = threading.Thread(
            target=self._run, name="ckpt-writer", daemon=True
        )
        self._thread.start()

    def _run(self):
        while True:
            fn = self._queue.get()
            if fn is None:
                self._queue.task_done()
                return
            try:
                if self._error is None:
                    fn()
            except BaseException as e:  # noqa: BLE001 — re-raised on submit/wait
                self._error = e
            finally:
                self._queue.task_done()

    def _check(self):
        if self._error is not None:
            error, self._error = self._error, None
            raise RuntimeError("async checkpoint write failed") from error

    def submit(self, fn):
        self._check()
        self._queue.put(fn)

    def wait(self):
        """Block until every submitted write has completed; re-raise errors."""
        self._queue.join()
        self._check()

    def close(self):
        self.wait()
        self._queue.put(None)
        self._thread.join()


def save_checkpoint(path: str, state, epoch: int, extra: dict | None = None):
    """Serialize train state (+ counters) to ``path`` atomically.

    Write-to-temp + os.replace so a preemption mid-save never leaves a
    truncated file at the final path — auto_resume picks the newest
    ``epoch=N.ckpt`` and must be able to trust it (latest_checkpoint).
    """
    payload = {
        "step": np.asarray(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "epoch": np.asarray(epoch),
        "extra": extra or {},
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(payload))
    os.replace(tmp, path)


def load_checkpoint(path: str, template: dict | None = None) -> dict:
    """Restore a checkpoint dict.

    With ``template`` (same structure as the saved payload) the arrays come
    back with the template's exact pytree types; without it, raw nested
    dicts of numpy arrays are returned (sufficient for param loading).
    """
    with open(path, "rb") as f:
        data = f.read()
    if template is not None:
        return serialization.from_bytes(template, data)
    return serialization.msgpack_restore(data)


def migrate_legacy_voxel_kernel(raw: dict) -> dict:
    """Zero-pad a legacy (3,3,3,3,C) block-0 voxel conv kernel to the
    current Cin-padded (3,3,3,4,C) layout, in place.

    Checkpoints saved before the RGB 3→4 zero-pad (voxel_cnn.py
    padded_rgb_conv_kernel_init) carry the 3-channel kernel; the pad
    channel's input is always zero, so appending zero weights (and zero
    optimizer moments — walked in opt_state too, where the Adam moment
    trees mirror the param tree) is numerically exact. Without this, old
    checkpoints fail to restore with a shape mismatch.
    """

    def _walk(node):
        if not isinstance(node, dict):
            return
        voxel = node.get("voxel_encoder")
        if isinstance(voxel, dict):
            conv = voxel.get("ConvBlock_0", {}).get("Conv_0", {})
            kernel = conv.get("kernel")
            if (
                kernel is not None
                and getattr(kernel, "ndim", 0) == 5
                and kernel.shape[-2] == 3
            ):
                conv["kernel"] = np.concatenate(
                    [kernel, np.zeros_like(kernel[..., :1, :])], axis=-2
                )
        for value in node.values():
            if isinstance(value, dict):
                _walk(value)

    _walk(raw.get("params", {}))
    _walk(raw.get("opt_state", {}))
    return raw


def _find_adam_moments(node):
    """Locate the {count, mu, nu} dict inside a raw opt-state state-dict."""
    if isinstance(node, dict):
        if {"count", "mu", "nu"} <= set(node):
            return node
        for value in node.values():
            found = _find_adam_moments(value)
            if found is not None:
                return found
    return None


def adapt_opt_state_format(raw_opt: dict, params, template) -> dict:
    """Convert a checkpointed opt-state state-dict between the per-leaf
    optax-chain layout and the flat_torch_adam layout, whichever the
    current optimizer (``template``) expects.

    Both layouts hold the same numbers — torch-Adam count/mu/nu — so the
    conversion is a ravel (or unravel) of the moment trees in the params
    pytree order. Lets checkpoints survive flips of
    ``optimizer.flat_update`` in either direction.
    """
    from flax import serialization
    from jax.flatten_util import ravel_pytree

    src = _find_adam_moments(raw_opt)
    if src is None:
        return raw_opt  # unknown layout — let from_state_dict report it
    src_is_flat = getattr(src["mu"], "ndim", None) == 1 and not isinstance(
        src["mu"], dict
    )
    template_sd = serialization.to_state_dict(template)
    dst = _find_adam_moments(template_sd)
    if dst is None:
        return raw_opt
    dst_is_flat = getattr(dst["mu"], "ndim", None) == 1 and not isinstance(
        dst["mu"], dict
    )
    if src_is_flat == dst_is_flat:
        return raw_opt

    flat_p, unravel = ravel_pytree(params)
    params_sd = serialization.to_state_dict(params)
    for key in ("mu", "nu"):
        if dst_is_flat:
            # per-leaf tree → flat buffer, in params ravel order
            tree = serialization.from_state_dict(params, src[key])
            dst[key], _ = ravel_pytree(tree)
        else:
            moment = np.asarray(src[key])
            if moment.shape != flat_p.shape:
                raise ValueError(
                    f"flat opt-state moment {key} has {moment.shape}, "
                    f"model expects {flat_p.shape} — params changed?"
                )
            dst[key] = serialization.to_state_dict(unravel(moment))
    dst["count"] = src["count"]
    return template_sd


def prune_disabled_encoders(params: dict, cfg) -> dict:
    """Drop disabled-encoder params before a partial load (test.py:20-28).

    The reference deletes image_/voxel_encoder state-dict keys when those
    encoders are configured off; flax params nest by module name, so the
    top-level subtree is dropped.
    """
    pruned = dict(params)
    if cfg.model.image_encoder is None:
        pruned.pop("image_encoder", None)
    if cfg.model.voxel_encoder is None:
        pruned.pop("voxel_encoder", None)
    return pruned


def latest_checkpoint(dirpath: str) -> str | None:
    """Newest surviving ``epoch=N.ckpt`` in a training dir, or None.

    Powers ``+auto_resume=true``: after a preemption, re-running the same
    train command resumes from here without naming a file. Note top-k
    retention may have deleted the chronologically newest save — resuming
    from the newest *surviving* checkpoint just retrains the few epochs
    since, which is always correct.
    """
    if not os.path.isdir(dirpath):
        return None
    best: tuple[int, str] | None = None
    for name in os.listdir(dirpath):
        if name.startswith("epoch=") and name.endswith(".ckpt"):
            try:
                epoch = int(name[len("epoch=") : -len(".ckpt")])
            except ValueError:
                continue
            if best is None or epoch > best[0]:
                best = (epoch, name)
    return os.path.join(dirpath, best[1]) if best else None


class CheckpointManager:
    """Top-k retention by a monitored metric (mode max or min)."""

    def __init__(
        self,
        dirpath: str,
        monitor: str = "val_eval/RR@5",
        mode: str = "max",
        save_top_k: int = 3,
        save_last: bool = False,
        writer: AsyncCheckpointWriter | None = None,
    ):
        self.dirpath = dirpath
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        self.save_last = save_last
        self.writer = writer
        self._index_path = os.path.join(dirpath, "checkpoints.json")
        self._entries: list[dict] = []
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                self._entries = json.load(f)["entries"]

    def _better(self, a: float, b: float) -> bool:
        return a > b if self.mode == "max" else a < b

    def _effect(self, fn):
        """Run a filesystem effect inline, or enqueue it on the writer.

        Retention *decisions* are always made synchronously from host-side
        scores; only the effects (serialize+write, delete, index write) are
        deferred, in submission order, so async and sync runs produce an
        identical checkpoint directory."""
        if self.writer is None:
            fn()
        else:
            self.writer.submit(fn)

    def wait(self):
        """Flush pending async writes (no-op for the synchronous manager)."""
        if self.writer is not None:
            self.writer.wait()

    def save(self, state, epoch: int, metrics: dict[str, float]) -> str | None:
        """Save if the monitored score makes the top-k; returns path or None.

        Lightning semantics: save_top_k=0 disables top-k saving, -1 keeps
        all; save_last=True additionally maintains a ``last.ckpt`` outside
        the top-k set, overwritten at every save opportunity (ModelCheckpoint
        save_last, reference config.yaml:42)."""
        # Snapshot lazily: when every write is skipped (save_last off and
        # the score misses the top-k) the device-side copy of the full
        # state (params + optimizer moments) would be pure waste. The
        # snapshot still happens synchronously, before save() returns, so
        # later donation/mutation of ``state`` cannot race the writer.
        _snapshot = [state if self.writer is None else None]

        def snap():
            if _snapshot[0] is None:
                _snapshot[0] = snapshot_state(state)
            return _snapshot[0]

        if self.save_last:
            last_path = os.path.join(self.dirpath, "last.ckpt")
            self._effect(
                lambda s=snap(): save_checkpoint(
                    last_path, s, epoch, extra={"metrics": metrics}
                )
            )
        if self.save_top_k == 0:
            return None
        if self.monitor not in metrics:
            raise KeyError(
                f"checkpoint monitor {self.monitor!r} not among logged "
                f"metrics {sorted(metrics)} — set checkpoint_monitor.monitor "
                "to one of these"
            )
        score = float(metrics[self.monitor])
        if 0 < self.save_top_k <= len(self._entries):
            worst = min if self.mode == "max" else max
            worst_entry = worst(self._entries, key=lambda e: e["score"])
            if not self._better(score, worst_entry["score"]):
                return None

        path = os.path.join(self.dirpath, f"epoch={epoch}.ckpt")
        self._effect(
            lambda s=snap(): save_checkpoint(
                path, s, epoch, extra={"metrics": metrics}
            )
        )
        self._entries = [e for e in self._entries if e["path"] != path]
        self._entries.append({"path": path, "score": score, "epoch": epoch})

        # Keep entries sorted best-first so best_path is right in every mode.
        self._entries.sort(key=lambda e: e["score"], reverse=self.mode == "max")
        if self.save_top_k > 0:
            stale_paths = [e["path"] for e in self._entries[self.save_top_k :]]

            def _prune(paths=stale_paths):
                for stale in paths:
                    if os.path.exists(stale):
                        os.remove(stale)

            self._effect(_prune)
            self._entries = self._entries[: self.save_top_k]

        index_payload = {"monitor": self.monitor, "entries": list(self._entries)}

        def _write_index(payload=index_payload):
            with open(self._index_path, "w") as f:
                json.dump(payload, f, indent=2)

        self._effect(_write_index)
        return path

    @property
    def best_path(self) -> str | None:
        return self._entries[0]["path"] if self._entries else None
