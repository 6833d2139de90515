"""Batching: seeded shuffles, fixed-shape collation, background prefetch.

Replaces the reference's torch DataLoader stack (data_module.py:21-37) with a
host iterator designed for XLA: every batch of a split has the **same static
shapes** (tokens (B,T), images (B,V,H,W,3) uint8, padded sparse voxels), so a
jitted train step compiles once. Train batches shuffle each epoch from a
seeded generator and drop the last partial batch (DataLoader(shuffle=True,
drop_last=True)); eval batches keep order and pad the final short batch with
repeats plus a validity mask (the reference instead emits a ragged last
batch — impossible under jit without a recompile; padded rows are masked out
of eval collection).

A one-deep background prefetch thread overlaps host collation with device
compute — the reference gets the same overlap from worker processes + pinned
memory (data_module.py:23).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator

import numpy as np

from .datasets import build_dataset

# Once-per-process guard for the windowed_compact over-budget warning
# (collate runs in the prefetch thread; a too-small budget truncates on
# every batch and per-batch warnings would flood the log).
_WARNED_OVER_BUDGET = False


def collate(
    items: list[dict],
    max_voxel_points: int,
    voxel_transfer: str = "packed",
    voxel_size: int = 64,
    with_images: bool = True,
    with_voxels: bool = True,
    tile_budget_frac: float = 0.5,
    windowed_halo: int = 1,
) -> dict[str, Any]:
    """Stack items into one fixed-shape numpy batch.

    The sparse-voxel convention diverges from the reference's ragged
    (ΣN, 4) concatenation (data_module.py:52-64): each sample's points pack
    into two fixed-width uint32 words — a flattened sorted site index (max-
    uint sentinel for padding) and r|g<<8|b<<16 — giving a static (B, N)
    shape that feeds the TPU-tuned sorted-unique set-scatter
    (device_prep.densify_voxels).

    ``voxel_transfer="dense"`` instead ships the already-densified uint32
    grid (built here, in the prefetch thread): ~16× more H2D bytes at 64³,
    but the per-step device scatter (~6.6 ms on v5e) disappears and the
    transfer overlaps with compute. Pick "packed" when host→device
    bandwidth is the constraint, "dense" when device step time is.
    "windowed"/"windowed_compact" feed the tile-sparse masked voxel
    encoder with host-materialized halo'd 10³ windows; the compact variant
    ships only the active ~10-25% of rows (budget =
    tile_budget_frac·B·(D/8)³ rows, /256, matching the encoder's
    tile_budget_frac — keep the two configs equal).
    """
    from .device_prep import (
        VOXEL_PAD_SENTINEL,
        densify_on_host,
        windowed_compact_on_host,
        windowed_on_host,
    )

    batch: dict[str, Any] = {
        "model_id": [item["model_id"] for item in items],
        "category": [item["category"] for item in items],
        "tokens": np.stack([item["tokens"] for item in items]).astype(np.int32),
    }
    # Disabled modalities are not collated or shipped: a voxel-only run
    # saves ~38 MB/batch of image H2D, an image-only run the voxel words
    # (or the 134 MB/batch dense grid) — XLA would DCE the compute anyway,
    # but the host collation and transfer are pure waste.
    if with_images:
        batch["images"] = np.stack([item["images"] for item in items])
    if with_voxels:
        batch_size = len(items)
        n_pad = max_voxel_points
        flat = np.full((batch_size, n_pad), VOXEL_PAD_SENTINEL, dtype=np.uint32)
        rgb = np.zeros((batch_size, n_pad), dtype=np.uint32)
        for i, item in enumerate(items):
            n = min(item["voxel_flat"].shape[0], n_pad)
            flat[i, :n] = item["voxel_flat"][:n]
            rgb[i, :n] = item["voxel_rgb"][:n]
        if voxel_transfer == "dense":
            batch["voxel_grid"] = densify_on_host(flat, rgb, voxel_size)
        elif voxel_transfer == "windowed":
            # Host materializes each 8³ tile's halo'd window (the
            # device-side halo gather has no fast formulation — PERF.md
            # round 3) + the per-tile occupancy map. Feeds the tile-sparse
            # masked voxel encoder. halo 1 (10³ rows) runs block 1
            # tile-sparse; halo 3 (14³ rows) ships each tile's full
            # block-2 support so blocks 1-2 run tile-sparse with no
            # inter-block gather.
            windows, occ = windowed_on_host(
                flat, rgb, voxel_size, halo=windowed_halo
            )
            batch["voxel_windows"] = windows
            batch["voxel_tile_occ"] = occ
        elif voxel_transfer == "windowed_compact":
            from ..ops.tile_sparse import tile_budget

            tg3 = (voxel_size // 8) ** 3
            budget = tile_budget(tile_budget_frac, batch_size, tg3)
            rows, row_ids, total = windowed_compact_on_host(
                flat, rgb, voxel_size, budget, halo=windowed_halo
            )
            if total > budget:
                # Once per process (truncation recurs every batch once the
                # budget is too small — per-batch repeats would bury the log
                # from the prefetch thread).
                global _WARNED_OVER_BUDGET
                if not _WARNED_OVER_BUDGET:
                    _WARNED_OVER_BUDGET = True
                    import logging

                    logging.getLogger(__name__).warning(
                        "windowed_compact: %d active tiles exceed the budget "
                        "%d (tile_budget_frac=%.3g) — highest-index tiles "
                        "dropped; raise model.modules.VoxelCNNEncoder."
                        "tile_budget_frac (warning once; later batches may "
                        "truncate too)",
                        total, budget, tile_budget_frac,
                    )
            batch["voxel_rows"] = rows
            batch["voxel_row_ids"] = row_ids
        else:
            batch["voxel_flat"] = flat
            batch["voxel_rgb"] = rgb
    for key in ("clip_embeddings_img", "clip_embeddings_text"):
        if key in items[0]:
            batch[key] = np.stack([item[key] for item in items]).astype(np.float32)
    return batch


class BatchIterator:
    """Iterate a dataset in fixed-shape batches with optional prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        prefetch: bool = True,
        voxel_transfer: str = "packed",
        voxel_size: int = 64,
        with_images: bool = True,
        with_voxels: bool = True,
        tile_budget_frac: float = 0.5,
        windowed_halo: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.voxel_transfer = voxel_transfer
        self.voxel_size = voxel_size
        self.with_images = with_images
        self.with_voxels = with_voxels
        self.tile_budget_frac = tile_budget_frac
        self.windowed_halo = windowed_halo
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        """Advance the shuffle stream (new permutation each epoch, seeded)."""
        self.epoch = epoch

    def _batches(self) -> Iterator[dict]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            order = rng.permutation(n)
        n_pad = self.dataset.max_voxel_points
        for start in range(0, n, self.batch_size):
            chunk = order[start : start + self.batch_size]
            if len(chunk) < self.batch_size:
                if self.drop_last:
                    return
                # Pad eval tail batches to the static shape; mask marks reals.
                valid = len(chunk)
                chunk = np.concatenate(
                    [chunk, np.full(self.batch_size - valid, chunk[-1])]
                )
            else:
                valid = self.batch_size
            batch = collate(
                [self.dataset[int(i)] for i in chunk],
                n_pad,
                self.voxel_transfer,
                self.voxel_size,
                self.with_images,
                self.with_voxels,
                self.tile_budget_frac,
                self.windowed_halo,
            )
            batch["num_valid"] = valid
            yield batch

    def peek(self) -> dict:
        """One batch without spinning up the prefetch thread (used for
        shape-driven initialization; see Trainer.init_state)."""
        return next(iter(self._batches()))

    def __iter__(self) -> Iterator[dict]:
        if not self.prefetch:
            yield from self._batches()
            return
        q: queue.Queue = queue.Queue(maxsize=2)
        sentinel = object()
        stop = threading.Event()
        error: list[BaseException] = []

        def producer():
            try:
                for batch in self._batches():
                    # Bounded put that notices consumer abandonment, so a
                    # dropped generator never leaks a blocked thread.
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as exc:  # surface worker errors to consumer
                error.append(exc)
            finally:
                q.put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is sentinel:
                    break
                yield batch
        finally:
            stop.set()
            while True:  # drain so the producer's final put never blocks
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            thread.join(timeout=5)
        if error:
            raise error[0]


class DataModule:
    """Split construction + loader config (reference data_module.py:8-37)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.train_set = None
        self.val_set = None

    def setup(self, stage: str | None = None):
        if stage in ("fit", None):
            self.train_set = build_dataset(self.cfg, "train")
            self.val_set = build_dataset(self.cfg, self.cfg.inference.split)
        else:
            self.val_set = build_dataset(self.cfg, self.cfg.inference.split)

    def _loader_kwargs(self) -> dict:
        from ..ops.tile_sparse import windowed_halo

        model = self.cfg.model
        blocks = int(model.modules.VoxelCNNEncoder.get("tile_sparse_blocks", 2))
        if blocks > 2 and str(
            self.cfg.data.get("voxel_transfer", "packed")
        ).startswith("windowed"):
            import warnings

            warnings.warn(
                f"tile_sparse_blocks={blocks} with a windowed voxel transfer: "
                "the windowed encoder derives its sparse depth from the row "
                "halo and supports at most 2 sparse blocks — running 2. Use "
                "voxel_transfer=dense with tile_sparse=true for deeper "
                "sparse stacks.",
                stacklevel=2,
            )
        return dict(
            batch_size=self.cfg.data.batch_size,
            voxel_transfer=self.cfg.data.get("voxel_transfer", "packed"),
            voxel_size=self.cfg.data.voxel_size,
            # Raw images feed only the trainable MVCNN (the CLIP image head
            # consumes precached embeddings); voxels only their encoder.
            with_images=model.image_encoder == "MVCNNEncoder",
            with_voxels=model.voxel_encoder is not None,
            # windowed_compact sizes its row budget with the SAME formula
            # as the encoder — keep the two in lockstep via the config key.
            tile_budget_frac=float(
                model.modules.VoxelCNNEncoder.get("tile_budget_frac", 0.5)
            ),
            # windowed halo follows the encoder's sparse depth (single
            # definition in ops/tile_sparse.py): ≥2 blocks need each
            # tile's full block-2 support (14³ rows, halo 3).
            windowed_halo=windowed_halo(blocks),
        )

    def train_loader(self) -> BatchIterator:
        return BatchIterator(
            self.train_set,
            shuffle=True,
            drop_last=True,
            seed=self.cfg.train_seed,
            **self._loader_kwargs(),
        )

    def val_loader(self) -> BatchIterator:
        return BatchIterator(self.val_set, **self._loader_kwargs())

    test_loader = val_loader
