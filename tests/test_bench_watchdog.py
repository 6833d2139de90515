"""bench.py stall-watchdog behavior (subprocess, CPU backend, tiny shapes).

The shared-tunnel runtime has twice been observed to wedge mid-run
(RUNBOOK §6 "Tunnel wedges"): a device→host fetch blocks in native code
indefinitely, which would hang the driver's bench invocation and lose the
recorded artifact. bench.py guards the timed region with a watchdog that
salvages the median of already-completed two-point estimates. These tests
drive both the normal path and the salvage path through the real CLI via
the TRICOLO_BENCH_FAKE_WEDGE_AFTER test hook (bench.py).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Smallest recipe bench.py accepts: 32³ voxels (five 2× pools), 2 views of
# 32², batch 8, 1-step loops on a single-device mesh (no collectives on
# the 1-core CPU host — conftest's rendezvous-timeout note).
TINY = [
    "--voxel-size", "32",
    "--batch-size", "8",
    "--n-points", "256",
    "--idle-wait", "0",
    "--override", "parallel.data_parallel=1",
    "--override", "data.image_size=32",
    "--override", "data.num_views=2",
    "--override", "bench.steps=1",
    "--override", "bench.warmup_steps=1",
]


def run_bench(extra_args, extra_env):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    # Persistent XLA:CPU compile cache (the same feature-namespaced dir
    # conftest uses in-process): the subprocess compiles the tiny train
    # step once (~100 s cold on this 1-core box); every later run — the
    # second test here, suite reruns — loads it in seconds. bench.py only
    # avoids the persistent cache on the tunneled TPU backend.
    from tricolo_tpu.utils.compcache import compilation_cache_dir

    env["JAX_COMPILATION_CACHE_DIR"] = compilation_cache_dir()
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"
    env.update(extra_env)
    try:
        return subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), *TINY, *extra_args],
            capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
        )
    except subprocess.TimeoutExpired as e:
        raise AssertionError(
            f"bench.py subprocess exceeded 900s (cold-compile contention?): "
            f"stdout={e.stdout!r} stderr={(e.stderr or b'')[-2000:]!r}"
        ) from e


def parse_json_line(stdout):
    lines = [l for l in stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, f"expected exactly one JSON line, got: {stdout!r}"
    return json.loads(lines[0])


def test_normal_path_emits_one_json_line():
    result = run_bench(["--pairs", "2"], {})
    assert result.returncode == 0, result.stderr[-2000:]
    rec = parse_json_line(result.stdout)
    assert rec["metric"] == "train_pairs_per_sec_per_chip"
    assert rec["value"] > 0
    assert rec["unit"] == "caption-shape pairs/sec/chip"
    assert rec["vs_baseline"] > 0
    assert "salvaging" not in result.stderr


def test_wedge_salvages_completed_estimates():
    """A wedge after pair 1 of 5 still yields the JSON line and exit 0."""
    result = run_bench(
        ["--pairs", "5"],
        {
            # One 3-step triple takes ~5-10 s at the tiny recipe; 25 s
            # without a completed pair means the (simulated) backend is gone.
            "TRICOLO_BENCH_STALL_S": "25",
            "TRICOLO_BENCH_FAKE_WEDGE_AFTER": "1",
        },
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "salvaging median of 1 completed" in result.stderr
    rec = parse_json_line(result.stdout)
    assert rec["metric"] == "train_pairs_per_sec_per_chip"
    assert rec["value"] > 0
