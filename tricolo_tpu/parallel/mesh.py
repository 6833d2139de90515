"""Mesh construction and sharding helpers (data-parallel over ICI).

Design (SURVEY.md §2.3 TPU-native plan): a 1-D mesh with axis ``"data"``;
batches shard along axis 0, parameters/optimizer state replicate. XLA inserts
the psum for gradients and the all-gathers the global-negative loss needs.
The axis layout leaves room for a model axis later (PartitionSpecs thread
through one place), but the TriCoLo-class models (~15-40M params) never need
tensor sharding.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int | str | None = "auto") -> Mesh:
    """A 1-D data-parallel mesh over local devices.

    ``num_devices="auto"`` uses every visible device; an int takes the first
    N (useful for tests pinning mesh size under
    --xla_force_host_platform_device_count).
    """
    devices = jax.devices()
    if num_devices not in (None, "auto"):
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, only {len(devices)} visible"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Mapping[str, Any], mesh: Mesh) -> dict:
    """device_put each array of a host batch with batch-axis sharding.

    Non-array entries (model_id/category string lists, num_valid) stay on
    host — the jitted step never sees them.

    Under a multi-process runtime (jax.distributed initialized, mesh
    spanning hosts) the batch is this process's LOCAL stripe and global
    arrays are assembled via make_array_from_process_local_data — see
    parallel/multiprocess.py.
    """
    if jax.process_count() > 1 and any(
        d.process_index != jax.process_index() for d in mesh.devices.flat
    ):
        from .multiprocess import shard_process_local_batch

        return shard_process_local_batch(batch, mesh)
    sharding = batch_sharding(mesh)
    out = {}
    for key, value in batch.items():
        if isinstance(value, (np.ndarray, jax.Array)):
            if value.ndim == 0:
                raise ValueError(
                    f"batch entry {key!r} is 0-d — scalars like num_valid "
                    "stay on host (plain python ints)"
                )
            if value.shape[0] % mesh.size != 0:
                raise ValueError(
                    f"batch axis {value.shape[0]} of {key!r} not divisible by "
                    f"mesh size {mesh.size}"
                )
            out[key] = jax.device_put(value, sharding)
    return out
