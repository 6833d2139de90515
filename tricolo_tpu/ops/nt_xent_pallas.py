"""Blocked online-softmax NT-Xent (Pallas, custom VJP).

The plain loss (losses/nt_xent.py) materializes the (B, B) logits matrix
twice; fine at the reference batch (128), but at very large global batches
(the whole point of contrastive scaling — e.g. B=65k gives a 17 GB f32
matrix) it stops fitting. This kernel computes the bidirectional InfoNCE
loss flash-attention-style: logits are produced tile-by-tile in VMEM with a
running (max, sum) accumulator per row — nothing of O(B²) ever reaches HBM.

Because softmax(ℓ)ᵀ ≠ softmax(ℓᵀ), both directions are handled by one
kernel that, per row-block of ẑi, streams column-blocks of ẑj and maintains
online-logsumexp for the ab direction; the ba direction runs the same kernel
with the operands swapped. The loss needs only the diagonal logits and the
row logsumexps:

    La = (1/B)·Σ_i (logsumexp_i − ℓ_ii)

Backward is closed-form (softmax rows re-streamed with the saved
logsumexps — same tiling, no O(B²) storage):

    dLa/dẑi = (P_a − I) @ ẑj / (τ·B),   dLa/dẑj = (P_a − I)ᵀ @ ẑi / (τ·B)

and the normalization VJP (ẑ = z/‖z‖) is applied outside in XLA.

Inputs must satisfy B % block 0 and D % 128 0 (the framework's embeddings
are 512-d; batches are powers of two).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.common import l2_normalize

_NEG_INF = -1e30


def _fwd_kernel(zi_ref, zj_ref, out_ref, *, inv_tau: float, block: int):
    """Per row-block: diag logits + online logsumexp over all column blocks.

    Grid: (n_row_blocks,). zi block (block, D); zj full (B, D) resident in
    VMEM (streamed in `block`-column tiles from there — at the sizes this
    framework uses the embeddings always fit VMEM; the HBM-streaming variant
    slots into the same structure with async copies).
    out block (block, 2): [:, 0] = ℓ_ii, [:, 1] = logsumexp_i.
    """
    row_block = pl.program_id(0)
    zi = zi_ref[:].astype(jnp.float32)  # (block, D)
    n_cols = zj_ref.shape[0] // block

    def body(col, carry):
        running_max, running_sum, diag = carry
        zj = zj_ref[pl.ds(col * block, block), :].astype(jnp.float32)
        logits = (
            jax.lax.dot_general(
                zi, zj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * inv_tau
        )  # (block, block)

        # Online logsumexp update.
        tile_max = jnp.max(logits, axis=1, keepdims=True)
        new_max = jnp.maximum(running_max, tile_max)
        running_sum = running_sum * jnp.exp(running_max - new_max) + jnp.sum(
            jnp.exp(logits - new_max), axis=1, keepdims=True
        )

        # Diagonal entries live in the column block matching this row block.
        rows = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
        is_diag = (rows + row_block * block) == (cols + col * block)
        diag = diag + jnp.sum(jnp.where(is_diag, logits, 0.0), axis=1, keepdims=True)
        return new_max, running_sum, diag

    init = (
        jnp.full((block, 1), _NEG_INF, jnp.float32),
        jnp.zeros((block, 1), jnp.float32),
        jnp.zeros((block, 1), jnp.float32),
    )
    running_max, running_sum, diag = jax.lax.fori_loop(0, n_cols, body, init)
    lse = running_max + jnp.log(running_sum)
    out_ref[:, 0:1] = diag
    out_ref[:, 1:2] = lse


def _bwd_kernel(zi_ref, zj_ref, lse_ref, ct_ref, dzi_ref, *, inv_tau: float, block: int):
    """dL/dzi for one direction: (P − I) @ ẑj scaled by ct·inv_tau/B.

    P rows recompute from the saved logsumexp — still tile-streamed.
    The symmetric dL/dẑj term comes from running this same kernel on the
    transposed problem (see the VJP wrapper).
    """
    row_block = pl.program_id(0)
    zi = zi_ref[:].astype(jnp.float32)
    lse = lse_ref[:]  # (block, 1)
    batch = zj_ref.shape[0]
    n_cols = batch // block
    scale = ct_ref[0, 0] * inv_tau / batch

    def body(col, acc):
        zj = zj_ref[pl.ds(col * block, block), :].astype(jnp.float32)
        logits = (
            jax.lax.dot_general(
                zi, zj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * inv_tau
        )
        probs = jnp.exp(logits - lse)
        rows = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
        is_diag = (rows + row_block * block) == (cols + col * block)
        coeff = probs - jnp.where(is_diag, 1.0, 0.0)
        return acc + jax.lax.dot_general(
            coeff, zj, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    acc = jax.lax.fori_loop(0, n_cols, body, jnp.zeros_like(zi))
    dzi_ref[:] = acc * scale


def _choose_block(batch: int) -> int:
    for candidate in (512, 256, 128, 64, 32, 16, 8):
        if batch % candidate == 0 and candidate <= batch:
            return candidate
    raise ValueError(f"batch {batch} must be a multiple of 8")


def _direction_fwd(zi, zj, inv_tau, block, interpret):
    batch, dim = zi.shape
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, inv_tau=inv_tau, block=block),
        grid=(batch // block,),
        in_specs=[
            pl.BlockSpec((block, dim), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, dim), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 2), lambda r: (r, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 2), jnp.float32),
        interpret=interpret,
    )(zi, zj)
    diag, lse = out[:, 0], out[:, 1]
    return jnp.mean(lse - diag), out[:, 1:2]


def _direction_bwd(zi, zj, lse, ct, inv_tau, block, interpret):
    batch, dim = zi.shape
    ct_arr = jnp.full((1, 1), ct, jnp.float32)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, inv_tau=inv_tau, block=block),
        grid=(batch // block,),
        in_specs=[
            pl.BlockSpec((block, dim), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, dim), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda r: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block, dim), lambda r: (r, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, dim), jnp.float32),
        interpret=interpret,
    )(zi, zj, lse, ct_arr)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5)
)
def _pallas_nt_xent_normed(zis, zjs, temperature, alpha_weight, block, interpret):
    loss, _ = _fwd(zis, zjs, temperature, alpha_weight, block, interpret)
    return loss


def _fwd(zis, zjs, temperature, alpha_weight, block, interpret):
    inv_tau = 1.0 / temperature
    loss_a, lse_a = _direction_fwd(zis, zjs, inv_tau, block, interpret)
    loss_b, lse_b = _direction_fwd(zjs, zis, inv_tau, block, interpret)
    loss = alpha_weight * loss_a + (1.0 - alpha_weight) * loss_b
    return loss, (zis, zjs, lse_a, lse_b)


def _bwd(temperature, alpha_weight, block, interpret, residuals, ct):
    zis, zjs, lse_a, lse_b = residuals
    inv_tau = 1.0 / temperature
    ct_a = ct * alpha_weight
    ct_b = ct * (1.0 - alpha_weight)
    # Direction ab: rows = zis. d_zis row term + d_zjs column term; the
    # column term of ab equals the row-kernel applied to the transposed
    # problem with the SAME logsumexps? No — transposing changes the
    # softmax axis, so the column gradients are accumulated by running the
    # row kernel on (zjs, zis) with lse computed along ab's rows... which is
    # exactly direction ba's structure but with lse_a broadcast per COLUMN.
    # Rather than a third kernel, exploit symmetry: for softmax-CE over rows,
    #   d_zj = (P − I)ᵀ @ ẑi·s = run _bwd over rows of the transposed
    # coefficient — implemented by a dedicated kernel call with swapped
    # operands and per-column lse (passed as the row-lse of the swap).
    d_zis = _direction_bwd(zis, zjs, lse_a, ct_a, inv_tau, block, interpret)
    d_zjs_from_a = _direction_bwd_cols(zjs, zis, lse_a, ct_a, inv_tau, block, interpret)
    d_zjs = d_zjs_from_a + _direction_bwd(zjs, zis, lse_b, ct_b, inv_tau, block, interpret)
    d_zis = d_zis + _direction_bwd_cols(zis, zjs, lse_b, ct_b, inv_tau, block, interpret)
    return d_zis, d_zjs


def _bwd_cols_kernel(zj_ref, zi_ref, lse_ref, ct_ref, dzj_ref, *, inv_tau: float, block: int):
    """Column-side gradient of a row-softmax CE: dẑj = (P − I)ᵀ @ ẑi · s.

    Grid over row-blocks of ẑj (i.e. columns of the original logits); for
    each, stream the original ROW blocks (ẑi) whose lse normalizes P.
    """
    col_block = pl.program_id(0)
    zj = zj_ref[:].astype(jnp.float32)  # (block, D) — original columns
    batch = zi_ref.shape[0]
    n_rows = batch // block
    scale = ct_ref[0, 0] * inv_tau / batch

    def body(row, acc):
        zi = zi_ref[pl.ds(row * block, block), :].astype(jnp.float32)
        lse = lse_ref[pl.ds(row * block, block), :]  # (block, 1) per original row
        logits = (
            jax.lax.dot_general(
                zi, zj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * inv_tau
        )  # (rows, cols=block)
        probs = jnp.exp(logits - lse)
        rows = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
        is_diag = (rows + row * block) == (cols + col_block * block)
        coeff = probs - jnp.where(is_diag, 1.0, 0.0)  # (rows, block)
        return acc + jax.lax.dot_general(
            coeff, zi, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    acc = jax.lax.fori_loop(0, n_rows, body, jnp.zeros_like(zj))
    dzj_ref[:] = acc * scale


def _direction_bwd_cols(zj, zi, lse_rows, ct, inv_tau, block, interpret):
    batch, dim = zj.shape
    ct_arr = jnp.full((1, 1), ct, jnp.float32)
    return pl.pallas_call(
        functools.partial(_bwd_cols_kernel, inv_tau=inv_tau, block=block),
        grid=(batch // block,),
        in_specs=[
            pl.BlockSpec((block, dim), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, dim), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, 1), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda r: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block, dim), lambda r: (r, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, dim), jnp.float32),
        interpret=interpret,
    )(zj, zi, lse_rows, ct_arr)


_pallas_nt_xent_normed.defvjp(_fwd, _bwd)


def pallas_nt_xent_loss(
    zis: jax.Array,
    zjs: jax.Array,
    temperature: float = 0.1,
    alpha_weight: float = 0.25,
    norm: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in twin of losses.nt_xent_loss built on the blocked kernel.

    The L2 normalization (and its VJP) stays in XLA; the O(B²) logits work
    runs tile-wise in VMEM.
    """
    zis = zis.astype(jnp.float32)
    zjs = zjs.astype(jnp.float32)
    if norm:
        zis = l2_normalize(zis)
        zjs = l2_normalize(zjs)
    block = _choose_block(zis.shape[0])
    return _pallas_nt_xent_normed(
        zis, zjs, float(temperature), float(alpha_weight), block, interpret
    )
