#!/usr/bin/env bash
# Bounded verification gate: the strongest check that fits a ~10-minute
# single-core budget (measured on the round-4 dev box, warm compile cache).
#
# The FULL suite (`pytest tests/ -q`, 273 tests) is execution-bound on a
# 1-core host: the 8-virtual-device XLA:CPU mesh programs serialize their
# per-device compute, and the suite runs >25 min even with every compile
# served from the prebuilt cache (PERF.md "Suite wall clock"). This gate
# keeps the load-bearing coverage and defers the redundant heavy tiers:
#
#   1. fast tier (~157 tests, ~3 min): config, data contracts, loss +
#      retrieval oracles, native loader, tokenizer, conv3d VJP twins.
#   2. the flagship multi-chip equivalence (TestWindowedCompactMesh):
#      windowed_compact on the 8-device mesh == 1-device == packed dense
#      masked, through loss + Adam update.
#   3. the raw-format full-chain CLI test: preprocess -> train -> test ->
#      eval -> calculate_f1 through subprocess CLIs (~4:25 warm; the
#      whole gate measures ~9 min on one core).
#
# Everything else (`-m slow` minus the two picks above) is the nightly
# tier: torch-oracle sweeps, 128-cubed voxels, EfficientNet variants,
# serving HTTP, interpret-mode Pallas — run it when touching those paths
# (`scripts/nightly.sh` runs the whole suite, xdist-split on multi-core).
set -euo pipefail
cd "$(dirname "$0")/.."

python -m pytest tests/ -m "not slow" -q
python -m pytest tests/test_parallel.py -q -k WindowedCompactMesh
python -m pytest tests/test_fullchain_cli.py -q
