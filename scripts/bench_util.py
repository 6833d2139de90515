"""Shared timing helpers for the profiling scripts.

Methodology (PERF.md "Measurement note"): the tunneled runtime acks
dispatch without waiting for execution, and one device->host fetch costs
~33 ms round trip — so measurements issue `iters` executions per scalar
fetch and divide, taking the median over repeats.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(tree) -> None:
    """Drain the dispatch chain via one scalar device->host fetch."""
    leaf = jax.tree.leaves(tree)[0]
    np.asarray(
        jax.device_get(jnp.sum(leaf.astype(jnp.float32)) if leaf.ndim else leaf)
    )


def timeit(fn, args, iters: int, repeats: int = 3) -> float:
    """Median over `repeats` rounds of `iters` executions per fetch; ms/exec."""
    out = fn(*args)
    sync(out)
    times = []
    for _ in range(repeats):
        tic = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        times.append((time.perf_counter() - tic) / iters * 1000)
    return float(np.median(times))
