"""Training-throughput benchmark on the flagship Tri(I+V) configuration.

Measures steady-state compiled train-step throughput (forward + backward +
Adam update over BiGRU + MVCNN/ResNet18 + VoxelCNN with trimodal NT-Xent) at
the reference training recipe: batch 128, 6 views × 128², 64³ voxels
(reference config/data/base.yaml:5-11). Prints ONE JSON line:

    {"metric": "train_pairs_per_sec_per_chip", "value": N,
     "unit": "caption-shape pairs/sec/chip", "vs_baseline": N}

vs_baseline is value / 2500: the reference publishes no throughput numbers
anywhere (SURVEY.md §6), so 2500 pairs/sec is our documented A100 estimate
for its recipe, derived as: view-batched ResNet18 fwd+bwd (~1.4 TFLOP/step
at bs 768, ~35% realistic MXU efficiency ≈ 13 ms) + the spconv submanifold
stack (sparse CUDA kernels typically 10-15% of peak ≈ 25 ms) + cuDNN GRU,
loss, optimizer and Lightning/dataloader overhead (~15 ms) ≈ 50 ms/step →
~2500 pairs/sec. The north-star target (BASELINE.json) of >2× A100
corresponds to vs_baseline > 2. Note the measurement chip here is a v5e
(197 bf16 TFLOPs vs A100's 312) — per-chip numbers transfer conservatively
to the v5p the target names.
"""

from __future__ import annotations

import argparse
import json
import time

A100_ESTIMATE_PAIRS_PER_SEC = 2500.0


def main():
    import jax
    import numpy as np

    from __graft_entry__ import _flagship_cfg, _host_batch
    from tricolo_tpu.models.tricolo_net import TriCoLoNet
    from tricolo_tpu.parallel import make_mesh, replicated_sharding, shard_batch
    from tricolo_tpu.training import TrainState, make_optimizer, make_train_step

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--config",
        choices=("tri", "bi_i", "bi_v"),
        default="tri",
        help="tri = flagship Tri(I+V) (the driver-recorded metric); "
        "bi_i / bi_v time the bimodal variants for PERF.md",
    )
    ap.add_argument(
        "--voxel-size",
        type=int,
        default=64,
        help="voxel grid resolution (128 = the BASELINE.json C13/128³ "
        "config; pair with --batch-size 32 on a 16 GB chip — the tile "
        "rows are 8× the 64³ footprint at equal batch)",
    )
    ap.add_argument(
        "--batch-size",
        type=int,
        default=128,
        help="per-chip batch (reference recipe 128 at 64³; 32 at 128³)",
    )
    ap.add_argument(
        "--n-points",
        type=int,
        default=None,
        help="occupied voxel sites per sample (default: 8192 scaled by "
        "(voxel_size/64)³; ~24.6k approximates the densest solid "
        "ShapeNet voxelizations at 64³)",
    )
    ap.add_argument(
        "--override",
        action="append",
        default=[],
        help="extra config overrides, e.g. optimizer.flat_update=false",
    )
    ap.add_argument(
        "--trace",
        default=None,
        metavar="DIR",
        help="capture a jax.profiler trace of the timed loop into DIR "
        "(analyze with scripts/trace_report.py DIR --steps N)",
    )
    ap.add_argument(
        "--pairs",
        type=int,
        default=5,
        help="number of independent two-point (2N−N) estimates; the "
        "recorded value is their median (host contention only ever slows "
        "a pair down, so more pairs tighten the one-sided noise)",
    )
    ap.add_argument(
        "--idle-wait",
        type=float,
        default=240.0,
        help="max seconds to wait for host load to drop before timing "
        "(0 disables). Host contention skews even two-point timing "
        "(PERF.md 'Measurement hygiene note'); the guard samples "
        "/proc/loadavg at startup, before this process contributes.",
    )
    args = ap.parse_args()

    # Host-load guard: per-step dispatch rides the host, so another busy
    # process skews the timing several percent (observed: a load-contaminated
    # A/B arm read −7%, PERF.md round 4). Check BEFORE compile/warmup so our
    # own work doesn't trip it; never refuse outright — the driver must
    # always get its JSON line — just wait up to --idle-wait and note on
    # stderr.
    if args.idle_wait > 0:
        import os
        import sys

        deadline = time.monotonic() + args.idle_wait
        while time.monotonic() < deadline:
            try:
                with open("/proc/loadavg") as f:
                    load1 = float(f.read().split()[0])
            except (OSError, ValueError):
                break
            if load1 <= max(0.5, 0.25 * (os.cpu_count() or 1)):
                break
            print(
                f"bench: host load {load1:.2f} — waiting for idle "
                f"(deadline in {deadline - time.monotonic():.0f}s)",
                file=sys.stderr,
            )
            time.sleep(10.0)

    # NOTE: deliberately NO persistent compilation cache here. A
    # warm-cache rerun with jax_compilation_cache_dir configured hung for
    # 25 minutes on the tunneled axon backend (round 3; the cold run with
    # the identical config finished in 6.5 min incl. compile) — until
    # that interaction is understood the cache stays CPU-backend-only.

    # Size knobs go through load_config overrides so ${data.voxel_size}
    # interpolations (e.g. the voxel encoder's grid size) resolve right.
    cfg = _flagship_cfg(
        extra=[
            f"data.voxel_size={args.voxel_size}",
            f"data.batch_size={args.batch_size}",
            *args.override,
        ]
    )
    if args.config == "bi_i":
        cfg.model.voxel_encoder = None
    elif args.config == "bi_v":
        cfg.model.image_encoder = None
    # Representative solid-voxel occupancy: ~8k occupied sites of 64³
    # (scaled 8× at 128³ — same solid fraction).
    n_points = args.n_points or 8192 * (args.voxel_size**3) // (64**3)
    # Deployment input path: the host materializes each 8³ tile's halo'd
    # window during prefetch (data.voxel_transfer=windowed) — H2D overlaps
    # with compute on real hosts — and the voxel encoder runs block 1
    # tile-sparse off the active rows under the masked (submanifold,
    # reference-faithful) semantics: 53.1 vs 58.3 ms fwd+bwd against the
    # round-2 dense unmasked encoder (PERF.md round 3). The A100 estimate
    # likewise excludes the host-side collate.
    if not any(o.startswith("data.voxel_transfer") for o in args.override):
        # windowed_compact at every size: the earlier "128³ windowed exceeds
        # a 25-minute remote compile" observation was a tunnel outage, not
        # the program (compile_diag.py: same ~0.8 MB StableHLO as 64³; the
        # real-chip retry compiles in minutes and runs — PERF.md "128³").
        # The dense-transfer 128³ recipe is no longer viable under the
        # masked-BN default: XLA lays the (B,128³,32) block-1 activation out
        # with C=32 in lanes (4× padding), so batch 32 wants 39.8 GB of
        # 15.75 GB HBM even with remat.
        cfg.data.voxel_transfer = "windowed_compact"
    if args.voxel_size >= 128 and not any(
        o.startswith("precision.remat_voxel") for o in args.override
    ):
        # 128³ memory plan: rematerialize the voxel stack (tile rows at
        # ~31k×14³×4ch still dominate temp memory at this size).
        cfg.precision.remat_voxel = True

    host_batches = [_host_batch(cfg, n_points=n_points, seed=s) for s in range(2)]

    tile_rows = 0
    if (
        cfg.data.voxel_transfer in ("windowed", "windowed_compact")
        and cfg.model.voxel_encoder is not None
    ):
        tg3 = (cfg.data.voxel_size // 8) ** 3
        if cfg.data.voxel_transfer == "windowed_compact":
            # Per-sample row budget, fitted exactly like the production
            # loader's tile_budget="auto" (BatchIterator.tile_budget_rows):
            # k = the measured max per-sample active-tile count, /8 —
            # truncation impossible by construction, zero padding waste
            # beyond the rounding.
            from tricolo_tpu.ops.tile_sparse import (
                host_sample_tile_counts,
                sample_tile_budget,
            )

            budget_cfg = cfg.model.modules.VoxelCNNEncoder.get(
                "tile_budget", "auto"
            )
            explicit = isinstance(budget_cfg, (int, float)) and not isinstance(
                budget_cfg, bool
            )
            worst = max(
                max(host_sample_tile_counts(b["voxel_flat"], cfg.data.voxel_size))
                for b in host_batches
            )
            tile_rows = sample_tile_budget(
                budget_cfg, tg3, None if explicit else worst
            )
        elif not any(
            o.startswith("model.modules.VoxelCNNEncoder.tile_budget")
            for o in args.override
        ):
            # Full-windowed mode compacts on DEVICE with the global
            # tile_budget_frac — fit it to the data the same way the
            # trainer's budget diagnostic recommends.
            from tricolo_tpu.ops.tile_sparse import host_tile_count

            worst = max(
                host_tile_count(b["voxel_flat"], cfg.data.voxel_size)
                for b in host_batches
            )
            budget = -(-int(worst * 1.25) // 256) * 256  # 25% headroom
            frac = min(1.0, budget / (cfg.data.batch_size * tg3))
            cfg.model.modules.VoxelCNNEncoder.tile_budget_frac = frac

    mesh = make_mesh(cfg.parallel.data_parallel)
    model = TriCoLoNet.from_config(cfg)
    tx = make_optimizer(cfg)
    train_step = make_train_step(model, tx, cfg)

    from tricolo_tpu.data.device_prep import densify_on_host

    # windowed halo follows the encoder's sparse depth (single definition
    # shared with loader.DataModule): ≥2 sparse blocks need 14³ rows.
    from tricolo_tpu.ops.tile_sparse import windowed_halo

    halo = windowed_halo(
        cfg.model.modules.VoxelCNNEncoder.get("tile_sparse_blocks", 2)
    )

    def to_transfer(host: dict) -> dict:
        host = dict(host)
        if cfg.data.voxel_transfer == "dense":
            host["voxel_grid"] = densify_on_host(
                host.pop("voxel_flat"), host.pop("voxel_rgb"), cfg.data.voxel_size
            )
        elif cfg.data.voxel_transfer == "windowed":
            from tricolo_tpu.data.device_prep import windowed_on_host

            windows, occ = windowed_on_host(
                host.pop("voxel_flat"), host.pop("voxel_rgb"),
                cfg.data.voxel_size, halo=halo,
            )
            host["voxel_windows"] = windows
            host["voxel_tile_occ"] = occ
        elif cfg.data.voxel_transfer == "windowed_compact":
            from tricolo_tpu.data.device_prep import windowed_compact_on_host

            rows, local_ids, _ = windowed_compact_on_host(
                host.pop("voxel_flat"), host.pop("voxel_rgb"),
                cfg.data.voxel_size, tile_rows, halo=halo,
            )
            host["voxel_rows"] = rows
            host["voxel_row_ids"] = local_ids
        return host

    batches = [shard_batch(to_transfer(b), mesh) for b in host_batches]

    import jax.numpy as jnp
    from tricolo_tpu.data.device_prep import prepare_device_batch

    init_batch = prepare_device_batch(
        {k: jnp.asarray(v) for k, v in _host_batch(cfg, n_points=n_points).items()},
        cfg.data.voxel_size,
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), init_batch)
    state = jax.device_put(TrainState.create(variables, tx), replicated_sharding(mesh))

    rng = jax.random.PRNGKey(0)
    lr = cfg.optimizer.lr

    warmup = cfg.bench.warmup_steps
    steps = cfg.bench.steps
    for i in range(warmup):
        state, losses = train_step(state, batches[i % 2], lr, rng)
    # Force a host fetch: on the tunneled runtime block_until_ready
    # acknowledges dispatch without waiting for execution, so the only
    # reliable synchronization point is a device→host transfer.
    float(losses["train_loss/total_loss"])

    import contextlib

    trace_ctx = (
        jax.profiler.trace(args.trace) if args.trace else contextlib.nullcontext()
    )

    def timed_loop(n):
        nonlocal state
        tic = time.perf_counter()
        for i in range(n):
            state, losses = train_step(state, batches[i % 2], lr, rng)
        float(losses["train_loss/total_loss"])  # sync: drains the whole chain
        return time.perf_counter() - tic

    # Two-point measurement (PERF.md "Measurement note"): the loop's only
    # reliable sync is a device→host fetch, which on the tunneled runtime
    # costs a ~33 ms round trip — at 20 steps that is ~1.7 ms/step of pure
    # HOST LATENCY billed to the device step. Timing N and 2N steps and
    # differencing cancels every constant per-loop cost exactly, leaving
    # the steady-state per-step time (what a production host, whose fetch
    # costs microseconds, actually pays). The recorded number is the
    # MEDIAN of --pairs independent two-point estimates: per-step dispatch
    # rides the host, so a one-off contention spike during the single
    # recorded run would otherwise skew it by several percent (observed in
    # the round-4 explicit_dgrad A/B — PERF.md "Measurement hygiene
    # note"); five pairs cost ~10 s and the median ignores outliers.
    n_pairs = max(1, args.pairs)
    if args.trace:
        # The traced loop exists ONLY to produce the profile: profiler
        # overhead inflates its wall time, so pairing it with an untraced
        # 2N run would bias that estimate low (ADVICE r4). It feeds no
        # estimate; the recorded number always comes from untraced pairs.
        with trace_ctx:
            timed_loop(steps)

    estimates = []

    def emit(ests) -> None:
        elapsed = sorted(ests)[len(ests) // 2]
        pairs_per_sec = cfg.data.batch_size * steps / elapsed
        per_chip = pairs_per_sec / mesh.size
        print(
            json.dumps(
                {
                    "metric": "train_pairs_per_sec_per_chip",
                    "value": round(per_chip, 2),
                    "unit": "caption-shape pairs/sec/chip",
                    "vs_baseline": round(per_chip / A100_ESTIMATE_PAIRS_PER_SEC, 3),
                }
            ),
            flush=True,
        )

    # Stall watchdog over the timed region only. The shared tunnel has
    # twice been observed to wedge mid-run (socket queues frozen 20+ min —
    # RUNBOOK §6 "Tunnel wedges"); a wedged device→host fetch blocks the
    # main thread in native code indefinitely, which would hang the driver
    # and lose the round's recorded artifact. A full triple (N + 2N pairs)
    # completes in ~15 s here, so 300 s without a completed pair means the
    # backend is gone, not slow. If any estimates exist by then they are
    # complete, uncontaminated two-point samples — salvage their median
    # (stderr says so); with zero estimates there is nothing honest to
    # print, so exit non-zero fast instead of hanging.
    import os
    import sys
    import threading

    progress = {"t": time.monotonic(), "done": False}
    STALL_S = float(os.environ.get("TRICOLO_BENCH_STALL_S", "300"))

    def watchdog():
        tick = max(0.2, min(10.0, STALL_S / 5))
        while not progress["done"]:
            time.sleep(tick)
            if progress["done"]:
                return
            if time.monotonic() - progress["t"] > STALL_S:
                if estimates:
                    print(
                        f"bench: no completed pair in {STALL_S:.0f}s (wedged "
                        f"backend?) — salvaging median of {len(estimates)} "
                        f"completed two-point estimates",
                        file=sys.stderr,
                        flush=True,
                    )
                    emit(list(estimates))
                    os._exit(0)
                print(
                    f"bench: backend stalled {STALL_S:.0f}s before any "
                    "two-point estimate completed — aborting",
                    file=sys.stderr,
                    flush=True,
                )
                os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()
    # Test hook: simulate the tunnel wedge after N completed pairs so the
    # salvage path is drivable without a real outage.
    fake_wedge_after = int(os.environ.get("TRICOLO_BENCH_FAKE_WEDGE_AFTER", 0))
    for _ in range(n_pairs):
        e1 = timed_loop(steps)
        estimates.append(timed_loop(2 * steps) - e1)
        progress["t"] = time.monotonic()
        if fake_wedge_after and len(estimates) >= fake_wedge_after:
            time.sleep(10 * STALL_S + 60)  # wedged: only the watchdog exits
    progress["done"] = True
    emit(estimates)


if __name__ == "__main__":
    main()
