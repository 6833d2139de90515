"""Multi-chip overhead model: loss-collective cost vs mesh size (VERDICT r3 #6).

The v5p-8 projection multiplies a per-chip throughput by 8 assuming the
global-negative loss's collectives are ~free. This script makes that
assumption a measurement: on the virtual CPU mesh it times the jitted
global-negative NT-Xent (value+grad — the only cross-chip traffic besides
the gradient psum) at FIXED per-device batch across mesh sizes 1/2/4/8,
against the local (collective-free) twin, and prints the gathered
bytes/step computed from the program's shapes.

Run SOLO on the dev box (1 core — concurrent load skews everything):

    python scripts/measure_collectives.py

Numbers land in PERF.md "multi-chip overhead model". Wall times on the
virtual mesh measure the COLLECTIVE ORCHESTRATION cost (thread rendezvous
+ copies), not ICI — on real chips the gathered KBs ride ICI at ~100 GB/s
and the cost is link latency, bounded above by these CPU numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from tricolo_tpu.parallel import (
        batch_sharding,
        make_global_nt_xent,
        make_local_nt_xent,
        make_mesh,
    )

    per_device = 128
    dim = 512
    rng = np.random.default_rng(0)

    results = []
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n)
        B = per_device * n
        zis = jax.device_put(
            rng.standard_normal((B, dim)).astype(np.float32), batch_sharding(mesh)
        )
        zjs = jax.device_put(
            rng.standard_normal((B, dim)).astype(np.float32), batch_sharding(mesh)
        )
        for kind, make in (
            ("global", make_global_nt_xent),
            ("local", make_local_nt_xent),
        ):
            loss_fn = make(mesh, 0.1, 0.25)
            step = jax.jit(jax.value_and_grad(lambda a, b: loss_fn(a, b), argnums=(0, 1)))
            out = step(zis, zjs)
            jax.block_until_ready(out)
            times = []
            for _ in range(10):
                t0 = time.perf_counter()
                out = step(zis, zjs)
                jax.block_until_ready(out)
                times.append(time.perf_counter() - t0)
            ms = float(np.median(times) * 1e3)
            # Cross-device traffic of the global loss: each device
            # all-gathers the other devices' zis and zjs shards, forward
            # and again in the grad's transpose (reduce-scatter) — the
            # psum'd scalar is noise.  local mode moves nothing.
            gathered = (
                2 * 2 * per_device * (n - 1) * dim * 4 if kind == "global" else 0
            )
            results.append(
                {
                    "mesh": n,
                    "loss": kind,
                    "ms_per_step": round(ms, 3),
                    "gathered_bytes_per_device": gathered,
                }
            )
            print(json.dumps(results[-1]))

    # Pairwise summary: global-vs-local gap at each mesh size.
    by = {(r["mesh"], r["loss"]): r["ms_per_step"] for r in results}
    for n in (1, 2, 4, 8):
        gap = by[(n, "global")] - by[(n, "local")]
        print(
            f"mesh={n}: global-negative overhead {gap:+.3f} ms/step "
            f"({by[(n, 'global')]:.3f} vs {by[(n, 'local')]:.3f})"
        )


if __name__ == "__main__":
    main()
