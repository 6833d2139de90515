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


def collate(
    items: list[dict],
    max_voxel_points: int,
    voxel_transfer: str = "packed",
    voxel_size: int = 64,
    with_images: bool = True,
    with_voxels: bool = True,
    tile_budget_rows: int = 0,
    windowed_halo: int = 1,
    tile_overflow: str = "error",
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
    encoder with host-materialized halo'd windows; the compact variant is
    PER-SAMPLE — (B, k, s³) rows for each sample's first k active tiles,
    k = ``tile_budget_rows`` (the caller fits it to the split's measured
    max so truncation is impossible; an explicit smaller budget that would
    truncate is ``tile_overflow``: "error" → raise, "truncate" → warn per
    occurrence and drop each sample's highest tiles).
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
            if tile_budget_rows <= 0:
                raise ValueError(
                    "windowed_compact collate needs tile_budget_rows > 0 "
                    "(BatchIterator resolves it from the config/dataset)"
                )
            rows, local_ids, counts = windowed_compact_on_host(
                flat, rgb, voxel_size, tile_budget_rows, halo=windowed_halo
            )
            if (counts > tile_budget_rows).any():
                over = counts.max()
                msg = (
                    f"windowed_compact: a sample has {int(over)} active "
                    f"tiles > tile_budget={tile_budget_rows} — set model."
                    "modules.VoxelCNNEncoder.tile_budget=auto (fits the "
                    "split) or raise the explicit budget"
                )
                if tile_overflow != "truncate":
                    # Hard default: truncation silently changes the
                    # numerics the tile-sparse exactness chain guarantees.
                    raise ValueError(msg)
                import logging

                # Per occurrence, not per process: a later denser batch
                # must be as loud as the first one.
                logging.getLogger(__name__).warning(
                    "%s (data.tile_overflow=truncate: highest tiles dropped)",
                    msg,
                )
            batch["voxel_rows"] = rows
            batch["voxel_row_ids"] = local_ids
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
        tile_budget: "int | str" = "auto",
        windowed_halo: int = 1,
        tile_overflow: str = "error",
        process_index: int = 0,
        process_count: int = 1,
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
        self.tile_budget = tile_budget
        self.windowed_halo = windowed_halo
        self.tile_overflow = tile_overflow
        # Multi-process striping (parallel/multiprocess.py): every process
        # runs the identical seeded permutation over the identical dataset
        # and takes its slice of each GLOBAL batch, so union-over-processes
        # reproduces exactly the single-process batch stream. batch_size
        # here stays the GLOBAL batch; yielded batches carry
        # batch_size/process_count samples.
        if process_count > 1:
            if batch_size % process_count != 0:
                raise ValueError(
                    f"global batch {batch_size} not divisible by "
                    f"process count {process_count}"
                )
            if not drop_last:
                raise ValueError(
                    "multi-process striping requires drop_last=True (tail "
                    "padding is a per-process eval concern; run eval "
                    "process-locally instead)"
                )
        self.process_index = process_index
        self.process_count = process_count
        self._tile_budget_rows: int | None = None
        self.epoch = 0

    @property
    def tile_budget_rows(self) -> int:
        """The resolved per-sample windowed_compact row count k.

        "auto" fits the split's measured max per-sample active-tile count
        (dataset.max_voxel_tiles) — truncation is then impossible by
        construction; an int is taken as-is. Single definition in
        ops/tile_sparse.sample_tile_budget (bench.py and the dryrun derive
        k the same way so host row shapes always match the encoder)."""
        if self._tile_budget_rows is None:
            from ..ops.tile_sparse import sample_tile_budget

            tg3 = (self.voxel_size // 8) ** 3
            explicit = isinstance(
                self.tile_budget, (int, float)
            ) and not isinstance(self.tile_budget, bool)
            self._tile_budget_rows = sample_tile_budget(
                self.tile_budget,
                tg3,
                None if explicit else self.dataset.max_voxel_tiles,
            )
        return self._tile_budget_rows

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
            if self.process_count > 1:
                local = self.batch_size // self.process_count
                chunk = chunk[
                    self.process_index * local : (self.process_index + 1) * local
                ]
                valid = local
            batch = collate(
                [self.dataset[int(i)] for i in chunk],
                n_pad,
                self.voxel_transfer,
                self.voxel_size,
                self.with_images,
                self.with_voxels,
                self.tile_budget_rows
                if self.voxel_transfer == "windowed_compact" and self.with_voxels
                else 0,
                self.windowed_halo,
                self.tile_overflow,
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
        voxel_cfg = model.modules.VoxelCNNEncoder
        blocks = int(voxel_cfg.get("tile_sparse_blocks", 2))
        transfer = str(self.cfg.data.get("voxel_transfer", "packed"))
        if transfer.startswith("windowed") and model.voxel_encoder is not None:
            if blocks > 2:
                import warnings

                warnings.warn(
                    f"tile_sparse_blocks={blocks} with a windowed voxel "
                    "transfer: the windowed encoder derives its sparse depth "
                    "from the row halo and supports at most 2 sparse blocks "
                    "— running 2. Use voxel_transfer=dense with "
                    "tile_sparse=true for deeper sparse stacks.",
                    stacklevel=2,
                )
            if not voxel_cfg.get("masked_bn", False):
                # Windowed rows are only exact under submanifold (masked)
                # semantics; with masked_bn=false (the torch-oracle parity
                # path) fall back to the truncation-free packed transfer so
                # reference-style CLI invocations keep working under the
                # windowed_compact default.
                import warnings

                warnings.warn(
                    f"voxel_transfer={transfer} requires masked_bn=true; "
                    "masked_bn=false — falling back to "
                    "data.voxel_transfer=packed (dense all-site BN path).",
                    stacklevel=2,
                )
                transfer = "packed"
        return dict(
            batch_size=self.cfg.data.batch_size,
            voxel_transfer=transfer,
            voxel_size=self.cfg.data.voxel_size,
            # Raw images feed only the trainable MVCNN (the CLIP image head
            # consumes precached embeddings); voxels only their encoder.
            with_images=model.image_encoder == "MVCNNEncoder",
            with_voxels=model.voxel_encoder is not None,
            # Per-sample windowed_compact row budget: "auto" (default) fits
            # the split's measured max per-sample tile count so truncation
            # is impossible; an int pins k (overflow then follows
            # data.tile_overflow: error | truncate).
            tile_budget=voxel_cfg.get("tile_budget", "auto"),
            tile_overflow=str(self.cfg.data.get("tile_overflow", "error")),
            # windowed halo follows the encoder's sparse depth (single
            # definition in ops/tile_sparse.py): ≥2 blocks need each
            # tile's full block-2 support (14³ rows, halo 3).
            windowed_halo=windowed_halo(blocks),
        )

    def train_loader(self) -> BatchIterator:
        # Under parallel.multiprocess each process yields its stripe of the
        # global batch (identical seeded permutation everywhere); eval
        # loaders stay process-local — every host holds the full split in
        # RAM and params are replicated, so each process evaluates the
        # whole split on its own devices (RUNBOOK "Multi-process").
        stripe = {}
        if self.cfg.parallel.get("multiprocess", False):
            import jax

            stripe = dict(
                process_index=jax.process_index(),
                process_count=jax.process_count(),
            )
        return BatchIterator(
            self.train_set,
            shuffle=True,
            drop_last=True,
            seed=self.cfg.train_seed,
            **self._loader_kwargs(),
            **stripe,
        )

    def val_loader(self) -> BatchIterator:
        return BatchIterator(self.val_set, **self._loader_kwargs())

    test_loader = val_loader
