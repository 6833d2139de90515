#!/usr/bin/env bash
# Nightly / full verification tier, split for pytest-xdist.
#
# `scripts/ci.sh` is the bounded ~9-minute single-core gate; THIS script is
# the full 273-test suite, organized so a multi-core host finishes it fast
# and a single-core host can still run it (serially, >25 min — the
# 8-virtual-device XLA:CPU mesh programs serialize their per-device compute,
# PERF.md "Suite wall clock").
#
# Split rationale:
#   1. fast tier serially — it is already <3 min and warms the compile cache
#      (tests/compile_cache seed) for the workers that follow.
#   2. slow tier minus the interpret-mode Pallas modules under xdist
#      `--dist loadscope`: whole modules/classes stay on one worker, so the
#      in-module fixture ordering holds; serving tests bind ephemeral ports
#      (test_serving.py:139) and the persistent compile cache uses atomic
#      per-entry writes, so workers do not collide.
#   3. the interpret-mode Pallas modules (test_ops, test_fused_bn_pool) run
#      LAST in their own pytest processes: interpret-mode pallas_call leaves
#      XLA:CPU runtime state that can abort later shard_map programs in the
#      same process (tests/conftest.py _INTERPRET_MODULES) — under xdist the
#      round-robin scheduler could otherwise interleave them with shard_map
#      consumers inside one worker.
#
# Worker count: mesh tests want ~1 core per virtual device but memory is the
# real cap (each worker re-initializes its own XLA:CPU client); min(nproc, 8)
# measured safe in 16 GB. On a 1-core host xdist only adds IPC overhead, so
# it falls back to serial (the measured single-core full suite is the >25-min
# figure above; this box has nproc=1, which is why no -n 4 timing is
# recorded — there are no 4 cores to time).
set -euo pipefail
cd "$(dirname "$0")/.."

CORES=$(nproc)
N=$(( CORES < 8 ? CORES : 8 ))
XDIST=()
if [ "$N" -ge 2 ]; then
  XDIST=(-n "$N" --dist loadscope)
fi

python -m pytest tests/ -m "not slow" -q
python -m pytest tests/ -m slow -q \
  --ignore tests/test_ops.py --ignore tests/test_fused_bn_pool.py \
  "${XDIST[@]}" "$@"
python -m pytest tests/test_ops.py tests/test_fused_bn_pool.py -q \
  "${XDIST[@]}" "$@"
