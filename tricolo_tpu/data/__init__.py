"""Host-side data pipeline + device-side batch preparation.

Layering (SURVEY.md §1 L0/L1 contract, rebuilt TPU-first):

* `datasets` — split loading into RAM (caption maps + per-model npz), with a
  `Synthetic` dataset for CPU tests/smoke runs;
* `loader` — seeded shuffling, fixed-shape batching, background prefetch;
* `device_prep` — jit-side densification of sparse voxel batches and uint8
  image normalization (bandwidth-saving: the host ships uint8/sparse, the
  device does the float work).
"""

from .datasets import GeneralDataset, SyntheticDataset, build_dataset
from .device_prep import densify_voxels, normalize_images, prepare_device_batch
from .loader import BatchIterator, DataModule, collate

__all__ = [
    "GeneralDataset",
    "SyntheticDataset",
    "build_dataset",
    "BatchIterator",
    "DataModule",
    "collate",
    "densify_voxels",
    "normalize_images",
    "prepare_device_batch",
]
