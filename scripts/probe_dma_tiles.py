"""Measure the Pallas DMA tile movers on the chip (block-1/2 scale)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from scripts.bench_util import timeit
from scripts.probe_tile_sparse import make_mask, B, D
from tricolo_tpu.ops.tile_sparse import active_tile_ids, tile_counts
from tricolo_tpu.ops._graveyard.dma_tiles import dma_gather_tiles, dma_scatter_tiles

def main():
    rng = np.random.default_rng(0)
    mask_np = make_mask(rng)
    dtype = jnp.bfloat16
    mask = jnp.asarray(mask_np.astype(np.float32), dtype)
    n_active = int(np.asarray(tile_counts(mask, 8)).sum())
    budget = -(-n_active // 1024) * 1024
    print(f"active {n_active}, budget {budget}", flush=True)
    ids = jax.jit(lambda m: active_tile_ids(m, 8, budget))(mask)

    x4 = jnp.asarray((rng.random((B, D, D, D, 4)) * mask_np[..., None]).astype(np.float32), dtype)
    for group in (32, 64, 128):
        f = jax.jit(lambda x, i: dma_gather_tiles(x, i, 8, 1, group=group))
        t = timeit(f, (x4, ids), 20)
        print(f"[g1] dma gather (T,10^3,4) group={group}: {t:.2f} ms", flush=True)

    x32 = jnp.asarray(rng.random((B, 32, 32, 32, 32)).astype(np.float32), dtype)
    f2 = jax.jit(lambda x, i: dma_gather_tiles(x, i, 4, 1, group=64))
    t = timeit(f2, (x32, ids), 20)
    print(f"[g2] dma gather (T,6^3,32): {t:.2f} ms", flush=True)

    tiles = jnp.asarray(rng.random((budget, 4, 4, 4, 32)).astype(np.float32), dtype)
    f3 = jax.jit(lambda tt, i: dma_scatter_tiles(tt, i, B, 32, group=64))
    t = timeit(f3, (tiles, ids), 20)
    print(f"[s1] dma scatter (T,4^3,32)->(B,32^3,32): {t:.2f} ms (xla tiled-scatter was 10.1)", flush=True)

    tiles2 = jnp.asarray(rng.random((budget, 2, 2, 2, 64)).astype(np.float32), dtype)
    f4 = jax.jit(lambda tt, i: dma_scatter_tiles(tt, i, B, 16, group=64))
    t = timeit(f4, (tiles2, ids), 20)
    print(f"[s2] dma scatter (T,2^3,64)->(B,16^3,64): {t:.2f} ms", flush=True)

if __name__ == "__main__":
    main()
