"""Snapshot the host's JAX compile cache into the repo's prebuilt seed.

Run AFTER a full `pytest tests/ -q` on the target host:

    python scripts/snapshot_compile_cache.py

Copies /tmp/jax_comp_cache_<namespace>/ into
tests/compile_cache/<namespace>/ so a cold clone on a feature-identical
host (the namespace encodes jaxlib + python + CPU-feature hash — the
exact compatibility surface of XLA:CPU AOT entries) skips the
multi-minute mesh-program compiles. Hosts with any other namespace
ignore the seed entirely, so shipping it can never poison them.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tricolo_tpu.utils.compcache import (
    FEATURES_MANIFEST,
    cache_namespace,
    compilation_cache_dir,
    entry_xla_features,
    probe_host_xla_features,
)


def main():
    ns = cache_namespace()
    src = compilation_cache_dir(seed_from_repo=False)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = os.path.join(repo, "tests", "compile_cache", ns)
    if not os.path.isdir(src):
        raise SystemExit(f"no cache at {src}; run the test suite first")
    os.makedirs(dst, exist_ok=True)
    # The manifest is the seed's admission ticket: compilation_cache_dir
    # refuses to attach a seed whose recorded compile-machine feature
    # string differs from the executing host's probed one (the
    # SIGILL-on-load hazard XLA only warns about). Prefer ground truth
    # from a probe compile; cross-check against the entries themselves.
    host_feats = probe_host_xla_features()
    entry_feats = None
    for name in sorted(os.listdir(src)):
        entry_feats = entry_xla_features(os.path.join(src, name))
        if entry_feats:
            break
    feats = host_feats or entry_feats
    if not feats:
        raise SystemExit(
            "could not determine the XLA compile-machine feature string "
            "(probe failed and no entry yielded one); refusing to snapshot "
            "an unverifiable seed"
        )
    if host_feats and entry_feats and host_feats != entry_feats:
        raise SystemExit(
            "cache entries were compiled on a different machine type than "
            f"this host (probe {host_feats[:60]}... vs entry "
            f"{entry_feats[:60]}...); refusing to snapshot a poisoned cache"
        )
    with open(os.path.join(dst, FEATURES_MANIFEST), "w") as f:
        f.write(feats + "\n")
    n, total = 0, 0
    for name in os.listdir(src):
        s = os.path.join(src, name)
        d = os.path.join(dst, name)
        if not os.path.isfile(s):
            continue
        total += os.path.getsize(s)
        if not os.path.exists(d) or os.path.getsize(d) != os.path.getsize(s):
            shutil.copy2(s, d)
            n += 1
    print(f"seeded {n} new entries into {dst} ({total / 1e6:.1f} MB total)")
    print(f"manifest: {feats[:80]}...")


if __name__ == "__main__":
    main()
