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


def cache_namespace() -> str:
    """jaxlib version + python version + 8-hex CPU-feature hash — the only
    hosts that may share XLA:CPU AOT entries."""
    import jaxlib

    feat_hash = hashlib.sha256(_host_cpu_features().encode()).hexdigest()[:8]
    return "{}_py{}{}_{}".format(
        jaxlib.__version__, sys.version_info[0], sys.version_info[1], feat_hash
    )


def compilation_cache_dir(seed_from_repo: bool = True) -> str:
    """/tmp cache dir namespaced by `cache_namespace()`.

    When the repo ships a prebuilt cache for THIS namespace
    (tests/compile_cache/<namespace>/ — safe by construction: the
    namespace encodes exactly the compatibility surface), its entries are
    hard-linked/copied into the /tmp dir once, so a cold clone's first
    full test run skips the multi-minute XLA:CPU mesh-program compiles.
    """
    ns = cache_namespace()
    path = "/tmp/jax_comp_cache_" + ns
    if seed_from_repo:
        import os

        repo_seed = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            "tests",
            "compile_cache",
            ns,
        )
        if os.path.isdir(repo_seed):
            os.makedirs(path, exist_ok=True)
            import shutil

            for name in os.listdir(repo_seed):
                dst = os.path.join(path, name)
                if os.path.exists(dst):
                    continue
                src = os.path.join(repo_seed, name)
                try:
                    os.link(src, dst)
                except OSError:
                    try:
                        shutil.copy2(src, dst)
                    except OSError:
                        pass  # seeding is best-effort; compile as usual
    return path
