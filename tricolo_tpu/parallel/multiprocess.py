"""Multi-process (multi-host) runtime: jax.distributed init + process-local
batch assembly.

Single-process DP (the parity default) scales across every chip one host
can see; crossing a HOST boundary needs three things, all here:

1. ``maybe_initialize(cfg)`` — bring up the JAX coordination service
   (``jax.distributed.initialize``) when ``parallel.multiprocess=true``,
   after which ``jax.devices()`` spans every process and a single global
   ``Mesh`` covers the pod/slice (ICI within a host, DCN across — XLA
   routes collectives; SURVEY.md §2.3).
2. ``shard_process_local_batch`` — each process ships ONLY its stripe of
   the global batch; ``jax.make_array_from_process_local_data`` assembles
   the global sharded array without any cross-host data motion.
3. Loader striping — every process runs the same seeded permutation and
   takes its ``process_index``-th slice of each global batch
   (``BatchIterator(process_index=, process_count=)``), so the global
   batch is identical to what a single process would have built.

On a real TPU pod ``jax.distributed.initialize()`` auto-detects the
coordinator from the TPU metadata; on CPU (tests) the coordinator/rank
triple comes from config or the JAX_* env vars, and cross-process
collectives use the Gloo backend. Design notes and the host-boundary
runbook live in RUNBOOK.md "Multi-process (multi-host) training".
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import jax
import numpy as np

_INITIALIZED = False


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def maybe_initialize(cfg) -> None:
    """Initialize jax.distributed once iff ``parallel.multiprocess`` is set.

    Resolution order for the coordinator triple: explicit config keys
    (``parallel.coordinator_address`` / ``num_processes`` /
    ``process_id``), then the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), then
    fully automatic detection (real TPU pods). Must run before first
    backend use — call it before building any Mesh.
    """
    global _INITIALIZED
    if not cfg.parallel.get("multiprocess", False) or _INITIALIZED:
        return

    def _get(key, env):
        v = cfg.parallel.get(key, None)
        if v is None:
            v = os.environ.get(env)
        return v

    addr = _get("coordinator_address", "JAX_COORDINATOR_ADDRESS")
    nproc = _get("num_processes", "JAX_NUM_PROCESSES")
    pid = _get("process_id", "JAX_PROCESS_ID")
    kwargs = {}
    if addr is not None:
        kwargs["coordinator_address"] = str(addr)
    if nproc is not None:
        kwargs["num_processes"] = int(nproc)
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True


def local_batch_size(global_batch: int) -> int:
    """Per-process batch: the global batch stays the config contract
    (reference batch 128 at any process count)."""
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by process count {n}"
        )
    return global_batch // n


def shard_process_local_batch(batch: Mapping[str, Any], mesh) -> dict:
    """Assemble globally-sharded device arrays from each process's local
    stripe (no cross-host traffic: every shard lands on the devices of the
    process that produced it)."""
    from .mesh import batch_sharding

    sharding = batch_sharding(mesh)
    out = {}
    for key, value in batch.items():
        if isinstance(value, (np.ndarray, jax.Array)):
            if value.ndim == 0:
                raise ValueError(
                    f"batch entry {key!r} is 0-d — scalars stay on host"
                )
            out[key] = jax.make_array_from_process_local_data(
                sharding, np.asarray(value)
            )
    return out
