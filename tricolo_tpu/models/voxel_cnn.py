"""Dense 3D CNN voxel encoder — TPU-idiomatic replacement for sparse conv.

The reference encodes solid voxel colors with spconv submanifold sparse CUDA
kernels (tricolo/model/module/voxel_encoder/sparse_cnn.py:7-51): five blocks
of [SubMConv3d(k=3, no bias) → BatchNorm → ReLU → MaxPool(2)] with channels
3→32→64→128→256→512, densified, flattened and passed through an MLP
(Linear(4096→512) → ReLU → Linear(512→512)), then L2-normalized.

On TPU the idiomatic trade is a *dense* convolution stack: the grids are
small (64³ default), the MXU wants large regular contractions, and XLA's 3D
`conv_general_dilated` lowering tiles them efficiently in NDHWC/bfloat16.
Deliberate, documented divergences from the sparse reference:

* convolution outputs are computed at all sites, not only occupied ones
  (submanifold convs zero inactive outputs); empty space carries zeros in
  and, before normalization, zeros out of the first conv since it has no
  bias.
* BatchNorm statistics are taken over all voxels rather than only active
  sites.
* the flatten→MLP width is *derived* from voxel_size ((D/32)³·512) instead of
  hard-coding 4096, which fixes the reference's 64³-only constraint
  (sparse_cnn.py:41 breaks at 32³/128³) while remaining identical at the
  shipped default.

Input: (B, D, D, D, 3) float — RGB at occupied voxels, zeros elsewhere
(the dense view of the reference's sparse {locs, feats} batches,
data_module.py:40-65).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.fused_bn_pool import (
    fused_bn_relu_pool,
    hybrid_bn_relu_pool,
    inference_bn_relu_pool,
    masked_bn_relu_pool,
    masked_hybrid_bn_relu_pool,
    masked_inference_bn_relu_pool,
    reference_bn_relu_pool,
)
from .common import MLPHead, l2_normalize, torch_conv_kernel_init


def padded_rgb_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch Kaiming-uniform for an RGB conv whose input was zero-padded
    3 → 4 channels: draws with the reference fan_in (27·3, matching the
    reference init distribution exactly) and zeros the pad channel's taps.
    The pad channel's input is always zero, so its weights receive zero
    gradient and zero torch-Adam/weight-decay updates — they stay zero and
    the op is numerically identical to the 3-channel conv, while the MXU
    tiles Cin=4 far better (15.0 → 10.1 ms fwd+filter-grad at block-1
    scale, PERF.md)."""
    *spatial, cin, cout = shape
    assert cin == 4, shape
    real = torch_conv_kernel_init(key, (*spatial, 3, cout), dtype)
    return jnp.concatenate(
        [real, jnp.zeros((*spatial, 1, cout), dtype)], axis=-2
    )


class BNReLUPool(nn.Module):
    """BatchNorm → ReLU → MaxPool(2³) with selectable compute paths.

    Owns flax-BatchNorm-compatible variables (params scale/bias, batch_stats
    mean/var) so the path choice is a pure compute toggle over one parameter
    tree. Train-mode paths (ops/fused_bn_pool): `use_fused=None` (default)
    → `hybrid_bn_relu_pool`, XLA forward + hand-derived backward with
    pooled-resolution BN parameter grads (fastest end-to-end, PERF.md);
    `True` → the all-Pallas argmax-saving kernel (loses in the full program,
    kept for study); `False` → the plain XLA composition. All three share
    the normalization formula y·mul + add with per-channel folded constants
    — same math as flax BatchNorm within one rounding — computed in the
    input array's dtype with f32 statistics.
    """

    momentum: float = 0.9  # flax convention; == torch momentum 0.1
    epsilon: float = 1e-5
    param_dtype: Any = jnp.float32
    use_fused: bool | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool = False,
        mask: jax.Array | None = None,
        stats_mask: jax.Array | None = None,
    ):
        features = x.shape[-1]
        scale = self.param(
            "scale", nn.initializers.ones_init(), (features,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (features,), self.param_dtype
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        out_mask = None
        if stats_mask is not None:
            # Two-mask submanifold mode (windowed halo≥3 blocks): reduce
            # statistics over ``stats_mask`` (center occupancy — each
            # active site exactly once across tiles), normalize/zero over
            # ``mask`` (full-region occupancy incl. the halo ring). The
            # returned mask is pool(stats_mask).
            from ..ops.fused_bn_pool import (
                masked_hybrid_bn_relu_pool2,
                masked_inference_bn_relu_pool2,
            )

            if train:
                pooled, mean, var, out_mask = masked_hybrid_bn_relu_pool2(
                    x, scale, bias, stats_mask, mask, self.epsilon
                )
                if not self.is_initializing():
                    ra_mean.value = (
                        self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                    )
                    ra_var.value = (
                        self.momentum * ra_var.value + (1.0 - self.momentum) * var
                    )
            else:
                pooled, out_mask = masked_inference_bn_relu_pool2(
                    x, scale, bias, ra_mean.value, ra_var.value,
                    stats_mask, mask, self.epsilon,
                )
            return pooled, out_mask
        if train:
            if mask is not None:
                # Submanifold-faithful mode: statistics over occupied sites
                # only, inactive sites hard-zeroed. Default (None/"auto") is
                # the hybrid hand-derived backward (pooled-resolution BN
                # param grads); True or False select the plain composition —
                # no Pallas masked kernel exists, so the True "Pallas study"
                # knob falls back to the composed reference path rather than
                # silently aliasing the hybrid.
                op = (
                    masked_hybrid_bn_relu_pool
                    if self.use_fused is None
                    else masked_bn_relu_pool
                )
                pooled, mean, var, out_mask = op(
                    x, scale, bias, mask, self.epsilon
                )
            else:
                # Auto (None) resolves to the hybrid op: XLA forward
                # (conv-epilogue fusions intact) + a hand-derived backward
                # whose BN parameter grads reduce at pooled resolution
                # (31.5 vs 36.2 ms fwd+bwd at block-1 scale, exact grads —
                # ops/fused_bn_pool.hybrid_bn_relu_pool). use_fused=True
                # selects the all-Pallas kernel (loses end-to-end, kept for
                # study); use_fused=False the plain XLA composition.
                if self.use_fused is None:
                    op = hybrid_bn_relu_pool
                elif self.use_fused:
                    op = fused_bn_relu_pool
                else:
                    op = reference_bn_relu_pool
                pooled, mean, var = op(x, scale, bias, self.epsilon)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1.0 - self.momentum) * var
                )
        elif mask is not None:
            pooled, out_mask = masked_inference_bn_relu_pool(
                x, scale, bias, ra_mean.value, ra_var.value, mask, self.epsilon
            )
        else:
            pooled = inference_bn_relu_pool(
                x, scale, bias, ra_mean.value, ra_var.value, self.epsilon
            )
        if mask is not None:
            return pooled, out_mask
        return pooled


class _ValidConv3D(nn.Module):
    """``nn.Conv(kernel 3³, VALID, no bias)`` twin whose input gradient is
    an explicit forward conv (ops/conv3d.py). Identical forward lowering
    and variable layout ({'kernel'}), so checkpoints interchange with the
    nn.Conv path."""

    features: int
    kernel_init: Any
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops.conv3d import conv3d_valid_explicit_dgrad

        kernel = self.param(
            "kernel",
            self.kernel_init,
            (3, 3, 3, x.shape[-1], self.features),
            self.param_dtype,
        )
        x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        return conv3d_valid_explicit_dgrad(x, kernel)


class ConvBlock(nn.Module):
    """Conv3D(k=3, no bias) → BatchNorm → ReLU → MaxPool(2).

    ``valid_padding=True`` is the tile-sparse path: the input arrives as
    gathered halo tiles (T, t+2, t+2, t+2, C) and VALID conv produces the
    (T, t, t, t, F) tile interior — the same kernel parameters either way,
    so dense and tile-sparse checkpoints are interchangeable.
    """

    features: int
    dtype: Any = None
    param_dtype: Any = jnp.float32
    fused_bn_pool: bool | None = None
    kernel_init: Any = torch_conv_kernel_init
    valid_padding: bool = False
    # Opt-in explicit input-gradient conv for the VALID (tile-row) path
    # (ops/conv3d.py — the auto-transposed dgrad runs at 30% of floor on
    # v5e, PERF.md round-4 roofline). Same forward, same variable layout.
    explicit_dgrad: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool = False,
        mask: jax.Array | None = None,
        stats_mask: jax.Array | None = None,
    ):
        if self.valid_padding and self.explicit_dgrad:
            x = _ValidConv3D(
                self.features,
                kernel_init=self.kernel_init,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="Conv_0",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                kernel_size=(3, 3, 3),
                use_bias=False,
                padding="VALID" if self.valid_padding else "SAME",
                kernel_init=self.kernel_init,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x)
        # BNReLUPool computes in the input array's dtype — bf16 on TPU:
        # normalizing the (B, 64³, C) block in f32 costs ~20 ms/step extra
        # HBM traffic on v5e (measured); statistics always accumulate in
        # f32. The module keeps the flax BatchNorm variable layout
        # ("BatchNorm_0" with scale/bias/mean/var) for checkpoint
        # compatibility.
        return BNReLUPool(
            momentum=0.9,  # torch BatchNorm default momentum=0.1
            epsilon=1e-5,
            param_dtype=self.param_dtype,
            use_fused=self.fused_bn_pool,
            name="BatchNorm_0",
        )(x, train=train, mask=mask, stats_mask=stats_mask)


class VoxelCNNEncoder(nn.Module):
    """Voxel encoder: (B, D, D, D, 3) → L2-normalized (B, out_dim)."""

    voxel_size: int = 64
    ef_dim: int = 32
    z_dim: int = 512
    out_dim: int = 512
    dtype: Any = None
    param_dtype: Any = jnp.float32
    # None/auto = XLA BN/ReLU/pool (faster end-to-end, PERF.md); True opts
    # into the Pallas fused kernel.
    fused_bn_pool: bool | None = None
    # Submanifold-faithful BN: statistics over occupied sites only and
    # inactive sites zeroed through the stack (spconv semantics, reference
    # sparse_cnn.py:11-40). The class default stays False (the torch-oracle
    # parity path); the CONFIG default is True since round 3 — PARITY.md
    # records the structured-retrieval experiment behind that choice.
    masked_bn: bool = False
    # Tile-sparse compute (ops/tile_sparse.py): restrict the first
    # ``tile_sparse_blocks`` blocks to active 8³ tiles — EXACT under the
    # masked (submanifold) semantics, which zero everything outside active
    # tiles anyway. Requires masked_bn and a mask channel; ignored
    # otherwise. budget = tile_budget_frac · B · (D/8)³ active tiles
    # (rounded up to 256); batches needing more lose their highest tiles
    # (the trainer warns — see Trainer.init_state).
    tile_sparse: bool = False
    tile_sparse_blocks: int = 2
    tile_budget_frac: float = 0.5
    # Tile→grid handoff layout (ops/tile_sparse.scatter_tiles):
    # None = the module default (SCATTER_LAYOUT global), "transpose" =
    # tile-major rows + transpose, "lines" = direct NDHWC line-segment
    # scatter (no transpose pass). Exact either way (tested).
    scatter_layout: str | None = None
    # Opt-in: express the VALID tile-row convs' input gradient as an
    # explicit forward conv instead of XLA's transposed op
    # (ops/conv3d.py; PERF.md round-4 roofline — fusion.146 at 30% of
    # floor). Same forward bytes; gradients agree to reduction order.
    explicit_dgrad: bool = False

    @nn.compact
    def __call__(
        self,
        voxels: jax.Array | None,
        train: bool = False,
        deterministic: bool = True,
        windows: jax.Array | None = None,
        tile_occ: jax.Array | None = None,
        row_ids: jax.Array | None = None,
    ) -> jax.Array:
        # train/deterministic accept positional passing so nn.remat can mark
        # them static (static_argnums=(2, 3) — the 128³ memory plan wraps
        # this module in a rematerialization boundary, tricolo_net.py).
        if windows is not None:
            # voxel_transfer=windowed: host-materialized halo'd tile rows
            # (R, s³) u32 + per-tile occupancy; block 1 runs tile-sparse
            # directly off the rows, no dense input grid exists at all.
            # With ``row_ids`` (voxel_transfer=windowed_compact) the rows
            # are already compacted to the active tiles.
            return self._windowed_forward(
                windows, tile_occ, train, deterministic, row_ids
            )
        if voxels.shape[1] != self.voxel_size:
            raise ValueError(
                f"expected {self.voxel_size}^3 grids, got {voxels.shape[1:4]}"
            )
        if self.voxel_size % 32 != 0:
            raise ValueError(
                f"voxel_size must be a multiple of 32 (five 2x pools), got {self.voxel_size}"
            )
        compute_dtype = self.dtype or jnp.float32
        x = voxels.astype(compute_dtype)
        mask = None
        if x.shape[-1] == 4:
            # 4th channel = the alpha>0 occupancy flag carried through
            # densification (device_prep voxel_mask path) — split it off so
            # the convs never see it.
            mask = x[..., 3:]
            x = x[..., :3]
            if not self.masked_bn:
                mask = None
        if self.masked_bn and mask is None:
            # Fallback for 3-channel input (no occupancy channel): any
            # nonzero RGB. Diverges from the reference alpha>0 rule for
            # occupied pure-black voxels — feed 4-channel batches
            # (prepare_device_batch(..., voxel_mask=True)) for exactness.
            mask = jnp.any(voxels[..., :3] != 0, axis=-1, keepdims=True).astype(
                compute_dtype
            )
        pad_rgb = x.shape[-1] == 3
        if pad_rgb:
            # Zero-pad RGB → 4 channels: numerically identical (see
            # padded_rgb_conv_kernel_init) but the block-1 conv + filter
            # grad tile the MXU far better at Cin=4 than 3 (measured).
            x = jnp.pad(x, ((0, 0),) * 4 + ((0, 1),))
        channels = (self.ef_dim, self.ef_dim * 2, self.ef_dim * 4, self.ef_dim * 8, self.z_dim)

        # Tile-sparse plan: active tiles from the INPUT occupancy, reused at
        # every level (submanifold never dilates the active set; pooling
        # maps a tile onto the same tile index at half resolution).
        use_sparse = self.tile_sparse and self.masked_bn and mask is not None
        n_sparse = 0
        ids = None
        if use_sparse:
            from ..ops.tile_sparse import active_tile_ids, tile_budget

            tile0 = 8
            # sparse while the block's OUTPUT tile is still ≥ 1 voxel
            n_sparse = min(self.tile_sparse_blocks, 3, len(channels))
            batch = x.shape[0]
            tg3 = (self.voxel_size // tile0) ** 3
            budget = tile_budget(self.tile_budget_frac, batch, tg3)
            ids = active_tile_ids(mask, tile0, budget)

        grid = self.voxel_size
        for i, features in enumerate(channels):
            sparse = i < n_sparse
            block = ConvBlock(
                features,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                fused_bn_pool=self.fused_bn_pool,
                kernel_init=padded_rgb_conv_kernel_init
                if (i == 0 and pad_rgb)
                else torch_conv_kernel_init,
                valid_padding=sparse,
                explicit_dgrad=self.explicit_dgrad,
            )
            if sparse:
                from ..ops.tile_sparse import gather_tiles, scatter_tiles

                tile = tile0 >> i  # tile edge at this block's input grid
                x_t = gather_tiles(x, ids, tile, halo=1)
                m_t = gather_tiles(mask, ids, tile, halo=0)
                x_t, m_t = block(x_t, train=train, mask=m_t)
                batch = x.shape[0]
                x = scatter_tiles(
                    x_t, ids, batch, grid // 2, layout=self.scatter_layout
                )
                mask = scatter_tiles(
                    m_t, ids, batch, grid // 2, layout=self.scatter_layout
                )
            elif mask is not None:
                x, mask = block(x, train=train, mask=mask)
            else:
                x = block(x, train=train)
            grid //= 2
        x = x.reshape(x.shape[0], -1)  # (B, (D/32)^3 * z_dim); 4096 at D=64
        x = MLPHead(self.out_dim, self.out_dim, dtype=self.dtype, param_dtype=self.param_dtype)(
            x, deterministic=deterministic
        )
        return l2_normalize(x.astype(jnp.float32))

    def _windowed_forward(self, windows, tile_occ, train, deterministic, row_ids=None):
        """Block 1 tile-sparse from host-windowed rows; blocks 2+ dense.

        Full mode (voxel_transfer=windowed): ``windows`` (B·tg³, s³) u32
        packed rows (s = 10) + ``tile_occ`` (B·tg³,) occupancy — the active
        rows are taken on device. Compact mode (windowed_compact):
        ``windows`` (B, k, s³) already holds ONLY each sample's active
        rows, ``row_ids`` (B, k) their LOCAL tile ids (tg³-sentinel
        padding). The per-sample compact axes shard with the batch under a
        data-parallel mesh, so the whole tile-sparse stack — conv rows and
        the tile→grid scatter (scatter_tiles_ps) — stays shard-local.
        Same variable tree as the dense path (ConvBlock_0..4 + MLPHead_0
        in order), so checkpoints interchange. Runs inside the parent's
        nn.compact scope.
        """
        if not self.masked_bn:
            # Windowed rows are inherently tile-sparse input; only the
            # masked (submanifold) semantics makes that restriction exact.
            raise ValueError("windowed voxel input requires masked_bn=true")
        from ..data.device_prep import unpack_windowed_rows
        from ..ops.tile_sparse import scatter_tiles, scatter_tiles_ps

        tile0 = 8
        # Halo is encoded in the row length: s³ with s = 8 + 2·halo.
        # halo 1 → block 1 tile-sparse; halo 3 → blocks 1-2 tile-sparse
        # (the host ships each tile's FULL block-2 input support, so
        # block-1 output rows are block-2's windows — no inter-block
        # gather exists; the halo ring recomputes neighbor values, exact
        # under the two-mask BN below).
        s3_in = windows.shape[-1]
        for halo in (1, 3):
            if (tile0 + 2 * halo) ** 3 == s3_in:
                break
        else:
            raise ValueError(
                f"windowed rows have {s3_in} voxels; expected 10³ (halo 1) "
                "or 14³ (halo 3)"
            )
        s = tile0 + 2 * halo
        tg3 = (self.voxel_size // tile0) ** 3
        compute_dtype = self.dtype or jnp.float32
        if row_ids is not None:
            if windows.ndim != 3 or row_ids.ndim != 2:
                raise ValueError(
                    "compact windowed input must be per-sample: rows "
                    f"(B, k, s³) + local ids (B, k); got {windows.shape} / "
                    f"{row_ids.shape}"
                )
            batch, k = windows.shape[0], windows.shape[1]
            ids = None
            rows = windows  # host-compacted: padding rows are already zero
        else:
            from ..ops.tile_sparse import tile_budget

            n_rows = windows.shape[0]
            batch = n_rows // tg3
            budget = tile_budget(self.tile_budget_frac, batch, tg3)

            (ids,) = jnp.nonzero(tile_occ > 0, size=budget, fill_value=n_rows)
            ids = ids.astype(jnp.int32)
            valid = ids < n_rows
            rows = jnp.where(valid[:, None], windows[jnp.where(valid, ids, 0)], 0)
        # One multi-output elementwise pass: RGB (zero-padded to 4 channels,
        # see padded_rgb_conv_kernel_init) + the occupancy mask — the
        # stack→slice→pad chain over a 4-channel unpack cost ~1.9 ms/step
        # of extra HBM materializations at flagship scale (round-4 trace).
        x_t, m_full = unpack_windowed_rows(
            rows.reshape(-1, s, s, s), compute_dtype
        )

        channels = (self.ef_dim, self.ef_dim * 2, self.ef_dim * 4, self.ef_dim * 8, self.z_dim)
        if halo == 1:
            # Block 1 tile-sparse: conv VALID consumes the halo, output is
            # the tile center; single mask = center occupancy.
            m_t = m_full[:, 1:-1, 1:-1, 1:-1, :]
            x_t, m_t = ConvBlock(
                channels[0],
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                fused_bn_pool=self.fused_bn_pool,
                kernel_init=padded_rgb_conv_kernel_init,
                valid_padding=True,
                explicit_dgrad=self.explicit_dgrad,
            )(x_t, train=train, mask=m_t)
            n_dense_from = 1
            grid = self.voxel_size // 2
        else:
            # Blocks 1-2 tile-sparse (halo 3): block-1 conv output covers
            # 12³ (center 8³ + ring). Two-mask BN: statistics over the
            # CENTER occupancy (each active site once across tiles),
            # zeroing over the full-region occupancy so ring values equal
            # what the owning tile computes for its own center.
            mz1 = m_full[:, 1:-1, 1:-1, 1:-1, :]
            ms1 = jnp.pad(
                m_full[:, 3:-3, 3:-3, 3:-3, :],
                ((0, 0), (2, 2), (2, 2), (2, 2), (0, 0)),
            )
            x_t, m_p = ConvBlock(
                channels[0],
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                fused_bn_pool=self.fused_bn_pool,
                kernel_init=padded_rgb_conv_kernel_init,
                valid_padding=True,
                explicit_dgrad=self.explicit_dgrad,
            )(x_t, train=train, mask=mz1, stats_mask=ms1)
            # x_t (T,6³,32) = block-2's windows; pool(ms1) cropped by the
            # valid conv is block-2's (single) center mask.
            m2 = m_p[:, 1:-1, 1:-1, 1:-1, :]
            x_t, m_t = ConvBlock(
                channels[1],
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                fused_bn_pool=self.fused_bn_pool,
                valid_padding=True,
                explicit_dgrad=self.explicit_dgrad,
            )(x_t, train=train, mask=m2)
            n_dense_from = 2
            grid = self.voxel_size // 4
        if ids is None:
            # Per-sample compact rows: shard-local scatter keyed by the
            # (B, k) local ids — the row→sample mapping is the leading axis.
            t = x_t.shape[1]
            x = scatter_tiles_ps(
                x_t.reshape(batch, k, t, t, t, -1), row_ids, grid,
                layout=self.scatter_layout,
            )
            mask = scatter_tiles_ps(
                m_t.reshape(batch, k, t, t, t, -1), row_ids, grid,
                layout=self.scatter_layout,
            )
        else:
            x = scatter_tiles(x_t, ids, batch, grid, layout=self.scatter_layout)
            mask = scatter_tiles(m_t, ids, batch, grid, layout=self.scatter_layout)
        for features in channels[n_dense_from:]:
            x, mask = ConvBlock(
                features,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                fused_bn_pool=self.fused_bn_pool,
            )(x, train=train, mask=mask)
        x = x.reshape(x.shape[0], -1)
        x = MLPHead(
            self.out_dim, self.out_dim, dtype=self.dtype, param_dtype=self.param_dtype
        )(x, deterministic=deterministic)
        return l2_normalize(x.astype(jnp.float32))
