"""Tile-sparse voxel path: must be EXACT vs the dense masked (submanifold)
path — same values, same BN statistics, same gradients, same variables."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tricolo_tpu.models.voxel_cnn import VoxelCNNEncoder
from tricolo_tpu.ops.tile_sparse import (
    active_tile_ids,
    gather_tiles,
    sample_tile_budget,
    scatter_tiles,
    scatter_tiles_ps,
    tile_counts,
)


def _solid_input(rng, B=2, D=32):
    """RGBA-style input: a solid blob per sample + mask channel."""
    z, y, x = np.ogrid[0:D, 0:D, 0:D]
    vox = np.zeros((B, D, D, D, 4), np.float32)
    for b in range(B):
        c = rng.uniform(0.3 * D, 0.7 * D, 3)
        r = rng.uniform(0.15 * D, 0.3 * D)
        m = ((z - c[0]) ** 2 + (y - c[1]) ** 2 + (x - c[2]) ** 2) <= r * r
        rgb = rng.random((int(m.sum()), 3)).astype(np.float32)
        for ch in range(3):
            vox[b, ..., ch][m] = rgb[:, ch]
        vox[b, ..., 3][m] = 1.0
    return jnp.asarray(vox)


class TestTileOps:
    def test_gather_scatter_roundtrip(self):
        rng = np.random.default_rng(0)
        B, D, C, tile = 2, 16, 3, 4
        mask = np.zeros((B, D, D, D), np.float32)
        mask[0, 0:4, 4:8, 0:4] = 1.0
        mask[1, 12:16, 12:16, 12:16] = 1.0
        x = jnp.asarray(rng.random((B, D, D, D, C)).astype(np.float32)) * jnp.asarray(
            mask
        )[..., None]
        ids = active_tile_ids(jnp.asarray(mask), tile, budget=8)
        assert int((ids < B * (D // tile) ** 3).sum()) == 2
        tiles = gather_tiles(x, ids, tile, halo=0)
        back = scatter_tiles(tiles, ids, B, D)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    @pytest.mark.parametrize(
        "tile,C,grid",
        [
            (2, 64, 16),  # flagship halo-3 handoff: 4 scatters of 128-elem lines
            (4, 32, 32),  # halo-1 handoff: 16 scatters of 128-elem lines
            (2, 1, 16),  # mask scatter: t·C < 128 → transpose fallback
        ],
    )
    def test_scatter_lines_layout_matches_transpose(self, tile, C, grid):
        """The NDHWC line-segment scatter is bit-exact vs the transpose
        layout — values AND custom-VJP gradients — including padding ids."""
        rng = np.random.default_rng(2)
        batch = 2
        tg = grid // tile
        n_rows = batch * tg**3
        T = 12  # 9 active + 3 padding rows
        active = np.sort(rng.choice(n_rows, size=9, replace=False)).astype(np.int32)
        ids = jnp.asarray(np.concatenate([active, np.full(3, n_rows, np.int32)]))
        tiles = jnp.asarray(rng.random((T, tile, tile, tile, C)).astype(np.float32))

        ref = scatter_tiles(tiles, ids, batch, grid, layout="transpose")
        out = scatter_tiles(tiles, ids, batch, grid, layout="lines")
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

        cot = jnp.asarray(rng.random(ref.shape).astype(np.float32))
        g_ref = jax.grad(
            lambda t: (scatter_tiles(t, ids, batch, grid, layout="transpose") * cot).sum()
        )(tiles)
        g_out = jax.grad(
            lambda t: (scatter_tiles(t, ids, batch, grid, layout="lines") * cot).sum()
        )(tiles)
        np.testing.assert_array_equal(np.asarray(g_out), np.asarray(g_ref))

    def test_halo_gather_matches_slices(self):
        rng = np.random.default_rng(1)
        B, D, C, tile = 1, 16, 2, 4
        mask = np.zeros((B, D, D, D), np.float32)
        mask[0, 4:8, 4:8, 4:8] = 1.0
        x = jnp.asarray(rng.random((B, D, D, D, C)).astype(np.float32))
        ids = active_tile_ids(jnp.asarray(mask), tile, budget=4)
        tiles = gather_tiles(x, ids, tile, halo=1)
        padded = np.pad(np.asarray(x), ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        np.testing.assert_array_equal(
            np.asarray(tiles[0]), padded[0, 4:10, 4:10, 4:10]
        )
        # padding tiles come back zero
        np.testing.assert_array_equal(np.asarray(tiles[1]), 0.0)

    def test_budget_truncation_and_counts(self):
        mask = np.zeros((1, 16, 16, 16), np.float32)
        mask[0, :, :, :] = 1.0  # all 64 tiles active
        counts = tile_counts(jnp.asarray(mask), 4)
        assert int(counts[0]) == 64
        ids = active_tile_ids(jnp.asarray(mask), 4, budget=16)
        assert int((ids < 64).sum()) == 16  # truncated, ascending ids kept

    @pytest.mark.parametrize(
        "layout,tile,C",
        [
            ("transpose", 2, 64),
            ("lines", 2, 64),  # flagship halo-3 handoff: t·C = 128 lines
            ("lines", 2, 1),  # t·C < 128 → transpose fallback inside
            ("hybrid", 2, 64),  # transpose fwd + line-gather bwd
            ("hybrid", 2, 1),  # fallback
        ],
    )
    def test_scatter_ps_matches_global(self, layout, tile, C):
        """The per-sample scatter (windowed_compact mesh layout) is
        bit-exact vs the global scatter fed the same tiles with global
        ids — values and custom-VJP gradients, padding included."""
        rng = np.random.default_rng(5)
        B, grid, k = 3, 16, 5
        tg3 = (grid // tile) ** 3
        local = np.full((B, k), tg3, np.int32)
        for b in range(B):
            n = rng.integers(1, k + 1)
            local[b, :n] = np.sort(rng.choice(tg3, size=n, replace=False))
        tiles = jnp.asarray(
            rng.random((B, k, tile, tile, tile, C)).astype(np.float32)
        )
        local_j = jnp.asarray(local)
        # global twin: flatten the per-sample axes, rebase ids by sample
        gids = np.where(
            local < tg3, local + np.arange(B)[:, None] * tg3, B * tg3
        ).astype(np.int32)
        ref = scatter_tiles(
            tiles.reshape(B * k, tile, tile, tile, C),
            jnp.asarray(gids.reshape(-1)),
            B,
            grid,
            layout="transpose",
        )
        out = scatter_tiles_ps(tiles, local_j, grid, layout=layout)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

        cot = jnp.asarray(rng.random(ref.shape).astype(np.float32))
        g_ref = jax.grad(
            lambda t: (
                scatter_tiles(
                    t.reshape(B * k, tile, tile, tile, C),
                    jnp.asarray(gids.reshape(-1)),
                    B,
                    grid,
                    layout="transpose",
                )
                * cot
            ).sum()
        )(tiles)
        g_out = jax.grad(
            lambda t: (scatter_tiles_ps(t, local_j, grid, layout=layout) * cot).sum()
        )(tiles)
        np.testing.assert_array_equal(np.asarray(g_out), np.asarray(g_ref))

    def test_sample_tile_budget(self):
        assert sample_tile_budget(100, 512) == 100  # exact, no rounding
        assert sample_tile_budget("auto", 512, max_tiles=130) == 130
        assert sample_tile_budget("auto", 64, max_tiles=130) == 64  # clamp
        assert sample_tile_budget(3, 512) == 8  # floor
        with pytest.raises(ValueError, match="max per-"):
            sample_tile_budget("auto", 512)
        with pytest.raises(ValueError, match="positive"):
            sample_tile_budget(0, 512)


class TestTileSparseEncoder:
    def _encoders(self, tile_sparse, blocks=2):
        kw = dict(
            voxel_size=32,
            ef_dim=8,
            z_dim=32,
            out_dim=16,
            masked_bn=True,
            tile_sparse=tile_sparse,
            tile_sparse_blocks=blocks,
            tile_budget_frac=0.9,
        )
        return VoxelCNNEncoder(**kw)

    # blocks=2 is the flagship default and stays in the fast tier; the
    # 1- and 3-block variants re-compile the whole sparse program (~20 s
    # each on a cold CPU cache) and run slow-tier only.
    @pytest.mark.parametrize(
        "blocks",
        [
            pytest.param(1, marks=pytest.mark.slow),
            2,
            pytest.param(3, marks=pytest.mark.slow),
        ],
    )
    def test_matches_dense_masked(self, blocks):
        """Forward values, BN batch statistics and parameter gradients of
        the tile-sparse path equal the dense masked path (f32, rtol tied
        to reduction-order noise)."""
        rng = np.random.default_rng(2)
        vox = _solid_input(rng)
        dense = self._encoders(False)
        sparse = self._encoders(True, blocks)
        variables = dense.init(jax.random.PRNGKey(0), vox, True)
        # identical parameter trees
        vs = sparse.init(jax.random.PRNGKey(0), vox, True)
        assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(vs)

        def run(model, v):
            out, mut = model.apply(v, vox, True, mutable=["batch_stats"])
            return out, mut["batch_stats"]

        out_d, stats_d = run(dense, variables)
        out_s, stats_s = run(sparse, variables)
        np.testing.assert_allclose(
            np.asarray(out_s), np.asarray(out_d), rtol=2e-5, atol=2e-6
        )
        for a, b in zip(jax.tree.leaves(stats_d), jax.tree.leaves(stats_s)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
            )

        def loss(v, model):
            out, _ = model.apply(v, vox, True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)

        gd = jax.grad(lambda v: loss(v, dense))(variables)
        gs = jax.grad(lambda v: loss(v, sparse))(variables)
        for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gs)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
            )

    @pytest.mark.slow  # non-default layout; the op-level bit-exactness
    # test in TestTileOps stays fast
    def test_scatter_layout_lines_matches_transpose(self):
        """Encoder-level: scatter_layout="lines" is bit-exact vs
        "transpose" (fwd + grads). ef_dim=16 so t·C ≥ 128 at both sparse
        blocks and the lines layout actually engages (smaller products
        fall back to transpose by design)."""
        rng = np.random.default_rng(7)
        vox = _solid_input(rng)
        kw = dict(
            voxel_size=32, ef_dim=16, z_dim=32, out_dim=16,
            masked_bn=True, tile_sparse=True, tile_sparse_blocks=2,
            tile_budget_frac=0.9,
        )
        enc_t = VoxelCNNEncoder(**kw, scatter_layout="transpose")
        enc_l = VoxelCNNEncoder(**kw, scatter_layout="lines")
        variables = enc_t.init(jax.random.PRNGKey(0), vox, True)

        def loss(v, model):
            out, _ = model.apply(v, vox, True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)

        out_t = enc_t.apply(variables, vox, True, mutable=["batch_stats"])[0]
        out_l = enc_l.apply(variables, vox, True, mutable=["batch_stats"])[0]
        np.testing.assert_array_equal(np.asarray(out_l), np.asarray(out_t))
        gt = jax.grad(lambda v: loss(v, enc_t))(variables)
        gl = jax.grad(lambda v: loss(v, enc_l))(variables)
        for a, b in zip(jax.tree.leaves(gt), jax.tree.leaves(gl)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_eval_mode_matches(self):
        rng = np.random.default_rng(3)
        vox = _solid_input(rng)
        dense = self._encoders(False)
        sparse = self._encoders(True)
        variables = dense.init(jax.random.PRNGKey(0), vox, True)
        out_d = dense.apply(variables, vox, False)
        out_s = sparse.apply(variables, vox, False)
        np.testing.assert_allclose(
            np.asarray(out_s), np.asarray(out_d), rtol=2e-5, atol=2e-6
        )

    def test_requires_masked_bn(self):
        """tile_sparse without masked_bn silently stays dense (the sparse
        restriction is only exact under submanifold zeroing)."""
        rng = np.random.default_rng(4)
        vox = _solid_input(rng)
        enc = VoxelCNNEncoder(
            voxel_size=32, ef_dim=8, z_dim=32, out_dim=16,
            masked_bn=False, tile_sparse=True,
        )
        variables = enc.init(jax.random.PRNGKey(0), vox, True)
        out = enc.apply(variables, vox, False)
        assert out.shape == (2, 16)


class TestWindowedTransfer:
    """voxel_transfer=windowed: host-materialized halo rows must reproduce
    the dense masked path exactly, end to end."""

    def _packed_batch(self, rng, B=2, D=32):
        from tricolo_tpu.data.device_prep import pack_sparse_voxels

        n_pad = 1024
        flat = np.full((B, n_pad), 0xFFFFFFFF, np.uint32)
        rgb = np.zeros((B, n_pad), np.uint32)
        for b in range(B):
            n = 700
            sites = np.sort(rng.choice(D**3, n, replace=False))
            coords = np.stack(
                [sites // (D * D), (sites // D) % D, sites % D], 1
            ).astype(np.uint8)
            feats = rng.integers(0, 256, (n, 3), dtype=np.uint8)
            flat[b], rgb[b] = pack_sparse_voxels(coords, feats, n_pad)
        return flat, rgb

    @pytest.mark.parametrize("halo", [1, 3])
    def test_windowed_matches_dense_masked(self, halo):
        from tricolo_tpu.data.device_prep import (
            densify_on_host,
            unpack_dense_voxels,
            windowed_on_host,
        )

        rng = np.random.default_rng(7)
        D = 32
        flat, rgb = self._packed_batch(rng, D=D)
        windows, occ = windowed_on_host(flat, rgb, D, halo=halo)
        dense = unpack_dense_voxels(
            jnp.asarray(densify_on_host(flat, rgb, D)), jnp.float32, True
        )

        enc = VoxelCNNEncoder(
            voxel_size=D, ef_dim=8, z_dim=32, out_dim=16,
            masked_bn=True, tile_sparse=True, tile_budget_frac=1.0,
        )
        variables = enc.init(jax.random.PRNGKey(0), dense, True)
        vw = enc.init(
            jax.random.PRNGKey(0), None, True, True,
            jnp.asarray(windows), jnp.asarray(occ),
        )
        assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(vw)

        def run(v, *args):
            out, mut = enc.apply(v, *args, mutable=["batch_stats"])
            return out, mut["batch_stats"]

        out_d, stats_d = run(variables, dense, True)
        out_w, stats_w = run(
            variables, None, True, True, jnp.asarray(windows), jnp.asarray(occ)
        )
        np.testing.assert_allclose(
            np.asarray(out_w), np.asarray(out_d), rtol=2e-5, atol=2e-6
        )
        for a, b in zip(jax.tree.leaves(stats_d), jax.tree.leaves(stats_w)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
            )

        def loss(v, *args):
            out, _ = enc.apply(v, *args, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)

        gd = jax.grad(lambda v: loss(v, dense, True))(variables)
        gw = jax.grad(
            lambda v: loss(v, None, True, True, jnp.asarray(windows), jnp.asarray(occ))
        )(variables)
        for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gw)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
            )

    def test_requires_masked_and_sparse(self):
        rng = np.random.default_rng(8)
        flat, rgb = self._packed_batch(rng, D=32)
        from tricolo_tpu.data.device_prep import windowed_on_host

        windows, occ = windowed_on_host(flat, rgb, 32)
        enc = VoxelCNNEncoder(voxel_size=32, ef_dim=8, z_dim=32, out_dim=16)
        with pytest.raises(ValueError, match="windowed"):
            enc.init(
                jax.random.PRNGKey(0), None, True, True,
                jnp.asarray(windows), jnp.asarray(occ),
            )

    @pytest.mark.parametrize("halo", [1, 3])
    def test_compact_matches_full_windowed(self, halo):
        """voxel_transfer=windowed_compact (per-sample rows): host-
        compacted rows must equal the on-device take of the full windows
        (features and grads)."""
        from tricolo_tpu.data.device_prep import (
            windowed_compact_on_host,
            windowed_on_host,
        )

        rng = np.random.default_rng(11)
        B, D = 2, 32
        flat, rgb = self._packed_batch(rng, B=B, D=D)
        windows, occ = windowed_on_host(flat, rgb, D, halo=halo)
        tg3 = (D // 8) ** 3
        k = tg3  # full budget, matching the encoder's frac-1.0 take
        rows, local_ids, counts = windowed_compact_on_host(
            flat, rgb, D, k, halo=halo
        )
        # per-sample compacted rows ARE the active full-window rows
        occ_ps = occ.reshape(B, tg3)
        for b in range(B):
            (ids_np,) = np.nonzero(occ_ps[b])
            n = len(ids_np)
            assert counts[b] == n
            np.testing.assert_array_equal(local_ids[b, :n], ids_np)
            np.testing.assert_array_equal(
                rows[b, :n], windows.reshape(B, tg3, -1)[b, ids_np]
            )
            assert (rows[b, n:] == 0).all() and (local_ids[b, n:] == tg3).all()

        enc = VoxelCNNEncoder(
            voxel_size=D, ef_dim=8, z_dim=32, out_dim=16,
            masked_bn=True, tile_budget_frac=1.0,
        )
        variables = enc.init(
            jax.random.PRNGKey(0), None, True, True,
            jnp.asarray(windows), jnp.asarray(occ),
        )

        def run(*args):
            out, mut = enc.apply(variables, *args, mutable=["batch_stats"])
            return out, mut["batch_stats"]

        out_w, stats_w = run(None, True, True, jnp.asarray(windows), jnp.asarray(occ))
        out_c, stats_c = run(
            None, True, True, jnp.asarray(rows), None, jnp.asarray(local_ids)
        )
        np.testing.assert_allclose(
            np.asarray(out_c), np.asarray(out_w), rtol=1e-5, atol=1e-6
        )
        for a, b in zip(jax.tree.leaves(stats_w), jax.tree.leaves(stats_c)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )

        def loss(v, *args):
            out, _ = enc.apply(v, *args, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)

        gw = jax.grad(
            lambda v: loss(v, None, True, True, jnp.asarray(windows), jnp.asarray(occ))
        )(variables)
        gc = jax.grad(
            lambda v: loss(v, None, True, True, jnp.asarray(rows), None, jnp.asarray(local_ids))
        )(variables)
        for a, b in zip(jax.tree.leaves(gw), jax.tree.leaves(gc)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
            )

    def test_compact_fallback_matches_native(self):
        """The numpy fallback and the C++ compact windowing agree bit-for-
        bit (including over-budget truncation)."""
        from tricolo_tpu import native
        from tricolo_tpu.data import device_prep

        if not native.available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(12)
        flat, rgb = self._packed_batch(rng, D=32)
        for k, halo in ((64, 1), (16, 1), (64, 3)):  # 16 forces truncation
            got = native.packed_to_windowed_compact(flat, rgb, 32, k, halo=halo)
            import unittest.mock as mock

            with mock.patch.object(native, "available", lambda: False):
                want = device_prep.windowed_compact_on_host(
                    flat, rgb, 32, k, halo=halo
                )
            np.testing.assert_array_equal(got[2], want[2])
            np.testing.assert_array_equal(got[0], want[0])
            np.testing.assert_array_equal(got[1], want[1])

    def test_loader_windowed_compact_mode(self):
        """DataModule with voxel_transfer=windowed_compact (the DEFAULT)
        produces the per-sample compacted keys, sized by the auto-fitted
        budget, and the model consumes them end to end."""
        from tricolo_tpu.config import load_config
        from tricolo_tpu.data import DataModule
        from tricolo_tpu.ops.tile_sparse import sample_tile_budget

        cfg = load_config(
            [
                "data=synthetic",
                "model.voxel_encoder=VoxelCNNEncoder",
            ]
        )
        assert cfg.data.voxel_transfer == "windowed_compact"  # the default
        dm = DataModule(cfg)
        dm.setup("fit")
        loader = dm.train_loader()
        batch = next(iter(loader))
        D = cfg.data.voxel_size
        tg3 = (D // 8) ** 3
        B = cfg.data.batch_size
        # tile_budget="auto" fits the split's measured max per-sample count
        k = sample_tile_budget("auto", tg3, loader.dataset.max_voxel_tiles)
        assert loader.tile_budget_rows == k
        # DataModule derives the windowed halo from the encoder's sparse
        # depth: ≥2 tile-sparse blocks → halo 3 (14³ rows), else halo 1.
        blocks = int(cfg.model.modules.VoxelCNNEncoder.tile_sparse_blocks)
        s = 8 + 2 * (3 if blocks >= 2 else 1)
        assert batch["voxel_rows"].shape == (B, k, s**3)
        assert batch["voxel_row_ids"].shape == (B, k)
        assert "voxel_flat" not in batch and "voxel_windows" not in batch

        from tricolo_tpu.models.tricolo_net import TriCoLoNet
        from tricolo_tpu.data.device_prep import prepare_device_batch

        model = TriCoLoNet.from_config(cfg)
        dev = prepare_device_batch(
            {k2: jnp.asarray(v) for k2, v in batch.items() if isinstance(v, np.ndarray)},
            D,
        )
        variables = model.init(jax.random.PRNGKey(0), dev)
        out = model.apply(variables, dev)
        assert out["voxel_features"].shape == (B, 512)

    def test_loader_overflow_policy(self):
        """An explicit too-small tile_budget hard-fails by default
        (data.tile_overflow=error) and truncates loudly per batch under
        tile_overflow=truncate."""
        from tricolo_tpu.config import load_config
        from tricolo_tpu.data import DataModule

        overrides = [
            "data=synthetic",
            "model.voxel_encoder=VoxelCNNEncoder",
            "model.modules.VoxelCNNEncoder.tile_budget=8",  # too small
        ]
        cfg = load_config(overrides)
        dm = DataModule(cfg)
        dm.setup("fit")
        with pytest.raises(ValueError, match="active\\s+tiles > tile_budget"):
            dm.train_loader().peek()

        cfg = load_config(overrides + ["data.tile_overflow=truncate"])
        dm = DataModule(cfg)
        dm.setup("fit")
        loader = dm.train_loader()
        with self._caplog_warning() as records:
            batch = loader.peek()
        assert batch["voxel_rows"].shape[1] == 8
        assert any("tile_budget=8" in r.getMessage() for r in records)

    @staticmethod
    def _caplog_warning():
        import contextlib
        import logging

        @contextlib.contextmanager
        def ctx():
            records = []

            class H(logging.Handler):
                def emit(self, record):
                    records.append(record)

            handler = H()
            logger = logging.getLogger("tricolo_tpu.data.loader")
            logger.addHandler(handler)
            try:
                yield records
            finally:
                logger.removeHandler(handler)

        return ctx()

    @pytest.mark.slow  # non-default transfer mode (flagship is
    # windowed_compact, whose loader test stays fast)
    def test_loader_windowed_mode(self):
        """DataModule with voxel_transfer=windowed produces the windowed
        keys and a train step runs end to end."""
        from tricolo_tpu.config import load_config
        from tricolo_tpu.data import DataModule

        cfg = load_config(
            [
                "data=synthetic",
                "data.voxel_transfer=windowed",
                "model.voxel_encoder=VoxelCNNEncoder",
                "model.modules.VoxelCNNEncoder.masked_bn=true",
                "model.modules.VoxelCNNEncoder.tile_sparse=true",
            ]
        )
        dm = DataModule(cfg)
        dm.setup("fit")
        batch = next(iter(dm.train_loader()))
        D = cfg.data.voxel_size
        tg3 = (D // 8) ** 3
        blocks = int(cfg.model.modules.VoxelCNNEncoder.tile_sparse_blocks)
        s = 8 + 2 * (3 if blocks >= 2 else 1)
        assert batch["voxel_windows"].shape == (cfg.data.batch_size * tg3, s**3)
        assert batch["voxel_tile_occ"].shape == (cfg.data.batch_size * tg3,)
        assert "voxel_flat" not in batch

        from tricolo_tpu.models.tricolo_net import TriCoLoNet
        from tricolo_tpu.data.device_prep import prepare_device_batch

        model = TriCoLoNet.from_config(cfg)
        dev = prepare_device_batch(
            {k: jnp.asarray(v) for k, v in batch.items() if isinstance(v, np.ndarray)},
            D,
        )
        variables = model.init(jax.random.PRNGKey(0), dev)
        out = model.apply(variables, dev)
        assert out["voxel_features"].shape == (cfg.data.batch_size, 512)


class TestBudgetCanary:
    """The trainer's truncation canary (Trainer._check_tile_budget) must
    cover every path where the static budget silently drops tiles on
    device: the dense tile_sparse plan AND the windowed transfer — whose
    encoder runs tile-sparse regardless of the tile_sparse flag."""

    def _stub(self, overrides):
        from tricolo_tpu.config import load_config
        from tricolo_tpu.training.trainer import Trainer

        cfg = load_config(
            [
                "data=synthetic",
                "model.voxel_encoder=VoxelCNNEncoder",
                "data.batch_size=2",
                *overrides,
            ]
        )

        class Stub:
            pass

        stub = Stub()
        stub.cfg = cfg
        return lambda batch: Trainer._check_tile_budget(stub, batch)

    def _batch_spanning_tiles(self, n_tiles, D=64):
        """Packed host batch (B=2) whose sample 0 touches n_tiles distinct
        8³ tiles (one site each)."""
        from tricolo_tpu.data.device_prep import pack_sparse_voxels

        tg = D // 8
        tids = np.arange(n_tiles)
        coords = np.stack(
            [(tids // (tg * tg)) * 8, ((tids // tg) % tg) * 8, (tids % tg) * 8],
            axis=1,
        ).astype(np.uint8)
        feats = np.full((n_tiles, 3), 7, np.uint8)
        flat = np.empty((2, n_tiles), np.uint32)
        rgb = np.empty((2, n_tiles), np.uint32)
        flat[0], rgb[0] = pack_sparse_voxels(coords, feats, n_tiles)
        flat[1], rgb[1] = pack_sparse_voxels(coords[:1], feats[:1], n_tiles)
        return {"voxel_flat": flat, "voxel_rgb": rgb}

    def test_warns_for_windowed_without_tile_sparse(self):
        # budget = ceil(0.1·2·512/256)·256 = 256 < 301 active tiles
        check = self._stub(
            [
                "data.voxel_size=64",
                "data.voxel_transfer=windowed",
                "model.modules.VoxelCNNEncoder.tile_sparse=false",
                "model.modules.VoxelCNNEncoder.tile_budget_frac=0.1",
            ]
        )
        with pytest.warns(UserWarning, match="tile_sparse budget"):
            check(self._batch_spanning_tiles(300))

    def test_budget_clamps_to_physical_tile_count(self):
        # B=2 at 32³: batch·tg³ = 128 < the 256 rounding floor — the canary
        # must compare against the clamped budget (128), not 256.
        check = self._stub(
            [
                "data.voxel_size=32",
                "model.modules.VoxelCNNEncoder.tile_sparse=true",
                "model.modules.VoxelCNNEncoder.tile_budget_frac=1.0",
            ]
        )
        from tricolo_tpu.data.device_prep import pack_sparse_voxels

        # 60 tiles in sample 0 + 60 in sample 1 = 120 ≤ 128: no warning.
        # (tile ids 0..59 of the 64-tile grid, one site each)
        tg = 4
        tids = np.arange(60)
        coords = np.stack(
            [(tids // (tg * tg)) * 8, ((tids // tg) % tg) * 8, (tids % tg) * 8],
            axis=1,
        ).astype(np.uint8)
        feats = np.full((60, 3), 7, np.uint8)
        flat = np.empty((2, 60), np.uint32)
        rgb = np.empty((2, 60), np.uint32)
        for i in range(2):
            flat[i], rgb[i] = pack_sparse_voxels(coords, feats, 60)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("error")
            check({"voxel_flat": flat, "voxel_rgb": rgb})

    def test_no_warning_when_disabled(self):
        check = self._stub(
            [
                "data.voxel_transfer=packed",
                "model.modules.VoxelCNNEncoder.tile_sparse=false",
                "model.modules.VoxelCNNEncoder.tile_budget_frac=0.01",
            ]
        )
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("error")
            check(self._batch_spanning_tiles(300))
