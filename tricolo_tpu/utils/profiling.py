"""Profiling hooks.

The reference's only tracing is Lightning's `profiler: simple` wall-clock
summary (config.yaml:34). Here:

* the Trainer keeps that simple per-phase summary, and
* ``profile_trace`` adds the TPU-native upgrade — a `jax.profiler` xplane
  trace capture (viewable in XProf/TensorBoard) around any code region,
  enabled with ``trainer.profiler=xplane`` and written under the experiment
  output path.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def profile_trace(enabled: bool, log_dir: str):
    """jax.profiler trace context (no-op when disabled)."""
    if not enabled:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """Rolling per-step wall-clock stats for throughput reporting."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self._start: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        tic = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - tic
            self.counts[name] += 1

    def mean(self, name: str) -> float:
        return self.totals[name] / max(self.counts[name], 1)

    def summary(self) -> dict[str, float]:
        return {name: self.mean(name) for name in self.totals}
