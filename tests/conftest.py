"""Test harness: run everything on a virtual 8-device CPU mesh.

The JAX-idiomatic fake-backend for distributed tests (SURVEY.md §4): real TPU
hardware is not needed — `xla_force_host_platform_device_count=8` gives eight
CPU devices over which `jax.sharding.Mesh` sharding, collectives and pjit
partitioning execute for real.

Note: this environment's TPU plugin boot (sitecustomize) imports jax at
interpreter startup, so JAX_PLATFORMS env tweaks are too late — the platform
must be overridden through jax.config before first backend use. XLA_FLAGS is
read lazily at backend init, so setting it here still works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # XLA:CPU collectives abort the process after a hard 40 s rendezvous
    # timeout. On a loaded 1-core box the 8 virtual devices' compute
    # serializes, so a step whose per-device work is a few seconds can
    # legitimately skew past 40 s — raise the limit (and the 20 s stuck
    # warning) for tests; a genuine deadlock still terminates.
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the 3D-conv graphs are slow to compile on the
# CPU backend; caching them makes repeated test runs fast.
# Cache dir is namespaced by jaxlib + interpreter version AND host CPU
# features (tricolo_tpu.utils.compcache): XLA:CPU AOT executables compiled
# on a host with different CPU flags load fine and then SIGABRT/SIGILL
# mid-execution, so cross-host cache sharing must be impossible.
from tricolo_tpu.utils.compcache import compilation_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", compilation_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# Test tiers: the compile-heavy modules (full-model jits, 8-device mesh
# programs, interpret-mode Pallas) carry the `slow` marker so
# `pytest -m "not slow"` is a fast cold-start smoke tier (<2 min); the full
# suite is the default. Markers registered in pyproject.toml.
_SLOW_MODULES = {
    "test_bench_watchdog",
    "test_e2e_oracle",
    "test_fullchain_cli",
    "test_serving",
    "test_efficientnet",
    "test_encoders",
    "test_fused_bn_pool",
    "test_multiprocess",
    "test_ops",
    "test_parallel",
    "test_training",
    "test_tricolo_net",
    "test_voxel128",
}


# Interpret-mode pallas_call leaves XLA:CPU runtime state that can abort
# later shard_map programs in the same process ("Fatal Python error:
# Aborted" at test_parallel's fsdp step, jax 0.9.0; reproduced with
# test_ops + test_parallel and seen repeatedly in full runs). Module
# teardowns clear jax caches, but at full-suite scale that is not always
# enough — so the interpret-heavy modules are also ordered LAST, after
# every shard_map consumer.
_INTERPRET_MODULES = {"test_ops", "test_fused_bn_pool"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
    items.sort(key=lambda item: item.module.__name__ in _INTERPRET_MODULES)
