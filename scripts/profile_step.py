"""Per-component forward/backward timing of the flagship train step.

Breaks the Tri(I+V) step (bench.py shapes: batch 128, 6 views x 128^2,
64^3 voxels, bf16 compute) into per-encoder forward and forward+backward
timings so PERF.md's component table covers fwd+bwd for all three encoders.
(The reference has no equivalent tooling; its only profiler is Lightning's
`profiler: simple` wall-clock summary, reference config/config.yaml:34.)

Methodology (PERF.md "Measurement note"): the tunneled runtime acks
dispatch without waiting for execution and a device->host fetch carries
~33 ms round trip, so every measurement issues `iters` executions per
scalar fetch and divides. A surrogate loss sum(out * stop_grad(out)) gives
each encoder a dense output cotangent, mimicking its share of the real
step's backward.

Usage: python scripts/profile_step.py [--iters 20] [--batch 128]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


from bench_util import sync as _sync, timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    from __graft_entry__ import _flagship_cfg, _host_batch
    from tricolo_tpu.data.device_prep import prepare_device_batch
    from tricolo_tpu.losses import make_loss_fn, pairwise_losses
    from tricolo_tpu.models.bigru import BiGRUEncoder
    from tricolo_tpu.models.mvcnn import MVCNNEncoder
    from tricolo_tpu.models.tricolo_net import TriCoLoNet
    from tricolo_tpu.models.voxel_cnn import VoxelCNNEncoder
    from tricolo_tpu.training import TrainState, make_optimizer, make_train_step

    cfg = _flagship_cfg()
    cfg.data.batch_size = args.batch

    model = TriCoLoNet.from_config(cfg)
    tx = make_optimizer(cfg)
    train_step = make_train_step(model, tx, cfg)

    host = _host_batch(cfg, n_points=8192)
    batch = {k: jnp.asarray(v) for k, v in host.items()}
    dbatch = prepare_device_batch(batch, cfg.data.voxel_size, jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), dbatch)
    # train_step donates the state (which aliases `variables`); keep
    # independent copies for the standalone measurements below.
    params = jax.tree.map(jnp.copy, variables["params"])
    stats = jax.tree.map(jnp.copy, variables["batch_stats"])
    state = TrainState.create(variables, tx)
    opt_state0 = jax.tree.map(jnp.copy, state.opt_state)
    rng = jax.random.PRNGKey(0)
    lr = cfg.optimizer.lr
    it = args.iters
    rows = []

    # Full step: thread the state through so executions serialize like
    # training does (donated buffers also require it).
    s = state
    step_out = train_step(s, batch, lr, rng)
    _sync(step_out[1])
    s = step_out[0]
    times = []
    for _ in range(3):
        tic = time.perf_counter()
        for _ in range(it):
            s, losses = train_step(s, batch, lr, rng)
        _sync(losses)
        times.append((time.perf_counter() - tic) / it * 1000)
    rows.append(("full train step (fwd+bwd+adam)", float(np.median(times))))

    prep = jax.jit(lambda b: prepare_device_batch(b, cfg.data.voxel_size, jnp.bfloat16))
    rows.append(("voxel densify + image normalize", timeit(prep, (batch,), it)))

    # Whole-model forward + loss, train mode (non-donated params copy).
    loss_pair = make_loss_fn(cfg)

    @jax.jit
    def fwd_loss(p, st, b):
        db = prepare_device_batch(b, cfg.data.voxel_size, jnp.bfloat16)
        out, _ = model.apply(
            {"params": p, "batch_stats": st},
            db, train=True, mutable=["batch_stats"], rngs={"dropout": rng},
        )
        return pairwise_losses(loss_pair, out, "t")["t/total_loss"]

    rows.append(("forward + loss (train mode)", timeit(fwd_loss, (params, stats, batch), it)))

    # --- standalone encoders at flagship hyperparameters ---
    m = cfg.model.modules
    dt = jnp.bfloat16
    encoders = [
        (
            "text BiGRU (128xseq16)",
            BiGRUEncoder(vocab_size=m.BiGRUEncoder.vocab_size, out_dim=cfg.model.out_dim,
                         embed_dim=m.BiGRUEncoder.embed_dim, hidden_dim=m.BiGRUEncoder.hidden_dim,
                         dtype=dt),
            dbatch["tokens"],
            {},
        ),
        (
            "image MVCNN/R18 (768x128^2)",
            MVCNNEncoder(num_views=m.MVCNNEncoder.num_views, z_dim=m.MVCNNEncoder.z_dim,
                         out_dim=cfg.model.out_dim, cnn_name=m.MVCNNEncoder.cnn_name, dtype=dt),
            dbatch["images"],
            dict(train=True),
        ),
        (
            "voxel CNN (128x64^3)",
            VoxelCNNEncoder(voxel_size=m.VoxelCNNEncoder.voxel_size, ef_dim=m.VoxelCNNEncoder.ef_dim,
                            z_dim=m.VoxelCNNEncoder.z_dim, out_dim=cfg.model.out_dim, dtype=dt),
            dbatch["voxels"],
            dict(train=True),
        ),
    ]
    for label, enc, x, kw in encoders:
        v = jax.jit(lambda k, xx, _e=enc, _kw=kw: _e.init(k, xx, **_kw))(
            jax.random.PRNGKey(0), x
        )
        mutable = ["batch_stats"] if "batch_stats" in v else False

        def fwd(vv, xx, _e=enc, _kw=kw, _mut=mutable):
            out = _e.apply(vv, xx, **_kw, mutable=_mut, rngs={"dropout": rng})
            return out[0] if _mut else out

        rows.append((f"{label} fwd", timeit(jax.jit(fwd), (v, x), it)))

        def sloss(p, st, xx, _e=enc, _kw=kw, _mut=mutable):
            vv = {"params": p, **({"batch_stats": st} if st else {})}
            out = _e.apply(vv, xx, **_kw, mutable=_mut, rngs={"dropout": rng})
            out = out[0] if _mut else out
            return jnp.sum(out * jax.lax.stop_gradient(out))

        g = jax.jit(jax.grad(sloss))
        rows.append((f"{label} fwd+bwd", timeit(g, (v["params"], v.get("batch_stats"), x), it)))

    # --- loss fwd+bwd on normalized embeddings ---
    rng0 = np.random.default_rng(0)
    emb = {
        k: jnp.asarray(rng0.standard_normal((args.batch, 512)), jnp.float32)
        for k in ("text_features", "image_features", "voxel_features")
    }
    emb = {k: v / jnp.linalg.norm(v, axis=1, keepdims=True) for k, v in emb.items()}

    def loss_only(e):
        return pairwise_losses(loss_pair, e, "t")["t/total_loss"]

    rows.append(("NT-Xent 3 pairs fwd+bwd", timeit(jax.jit(jax.grad(loss_only)), (emb,), it)))

    # --- torch-Adam update alone ---
    zero_g = jax.tree.map(jnp.zeros_like, params)

    @jax.jit
    def adam(opt_state, gr, p):
        u, s2 = tx.update(gr, opt_state, p)
        newp = jax.tree.map(lambda a, b: (a - lr * b).astype(a.dtype), p, u)
        return s2, newp

    rows.append(("torch-Adam update", timeit(adam, (opt_state0, zero_g, params), it)))

    w = max(len(r[0]) for r in rows)
    print(f"\n{'component':<{w}}   ms/exec")
    for label, ms in rows:
        print(f"{label:<{w}}   {ms:7.2f}")


if __name__ == "__main__":
    main()
