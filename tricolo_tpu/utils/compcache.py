"""Host-feature-namespaced JAX persistent compilation cache directory.

XLA:CPU persists AOT executables keyed only by the HLO; loading an entry
compiled on a host with different CPU features aborts mid-execution
("Compile machine features ... vs host machine features ... could lead to
execution errors such as SIGILL", cpu_aot_loader). A cache dir shared
between hosts (or between this repo's test suite and the driver's dryrun
running on a different machine image) is therefore poisonous: the stale
entry loads fine and then SIGABRTs inside compiled-program execution.

Fix: namespace the cache dir by a short hash of the host's CPU feature
flags in addition to jaxlib + interpreter version, so entries can only be
shared between feature-identical hosts. Used by tests/conftest.py and
``__graft_entry__._ensure_devices`` (the two places that configure the
persistent cache).

This module must stay importable before jax (conftest imports it prior to
backend init) — no jax imports at module level.
"""

from __future__ import annotations

import hashlib
import sys


def _host_cpu_features() -> str:
    """The CPU model + feature-flag lines for processor 0 (best available
    proxy for XLA's "machine features"); falls back to platform identifiers.

    The model name is included as well as the flags: XLA's AOT machine
    features carry model-derived *tuning* choices (+prefer-no-scatter /
    +prefer-no-gather on some Xeon models) that two hosts with identical
    feature flags can still disagree on.
    """
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags", "Features")):
                    parts.append(line.strip())
                if len(parts) == 2:
                    return " | ".join(parts)
    except OSError:
        pass
    if parts:
        return " | ".join(parts)
    import platform

    return f"{platform.machine()} {platform.processor()}"


def compilation_cache_dir() -> str:
    """/tmp cache dir namespaced by jaxlib version, python version, and an
    8-hex-digit hash of the host CPU feature flags."""
    import jaxlib

    feat_hash = hashlib.sha256(_host_cpu_features().encode()).hexdigest()[:8]
    return "/tmp/jax_comp_cache_{}_py{}{}_{}".format(
        jaxlib.__version__, sys.version_info[0], sys.version_info[1], feat_hash
    )
