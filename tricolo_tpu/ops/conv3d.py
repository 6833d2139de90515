"""3-D VALID conv with an explicitly-formulated input gradient (opt-in).

XLA derives the input gradient of a VALID conv by transposing the forward
op. On v5e the round-4 roofline prices the flagship's ConvBlock_1 input
gradient (bf16 [6144, 4³, 64] → [6144, 6³, 32]) at 30% of its bandwidth
floor — layout assignment picks a batch-minor layout for the transposed
conv (PERF.md "Roofline (round-4 trace)", fusion.146). This module
expresses the SAME input gradient as a canonical forward conv — pad dY by
(k−1) on every spatial edge and convolve with the spatially flipped,
in/out-channel-swapped kernel — which layout assignment tiles like the
program's other (near-floor) forward convs. The filter gradient keeps
XLA's own transpose: unchanged numerics and cost.

Mathematically identical to the auto-derived gradient; reduction-order
(ulp-level) differences are possible, so the knob is opt-in
(``model.modules.VoxelCNNEncoder.explicit_dgrad``, defaults.py) and both
paths are pinned against each other in tests/test_conv3d.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# flax nn.Conv's dimension numbers for rank-5 channel-last input.
DIMNUMS = ("NDHWC", "DHWIO", "NDHWC")


def _conv_valid(x: jax.Array, w: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID", dimension_numbers=DIMNUMS
    )


@jax.custom_vjp
def conv3d_valid_explicit_dgrad(x: jax.Array, w: jax.Array) -> jax.Array:
    """VALID 3-D conv, (N, D, H, W, Cin) × (kd, kh, kw, Cin, Cout).

    Forward is byte-for-byte the ``lax.conv_general_dilated`` call flax's
    ``nn.Conv`` makes; only the VJP differs (explicit dgrad conv).
    """
    return _conv_valid(x, w)


def _fwd(x, w):
    return _conv_valid(x, w), (x, w)


def _bwd(res, dy):
    x, w = res
    kd, kh, kw = w.shape[0], w.shape[1], w.shape[2]
    # dX of a VALID stride-1 conv == FULL correlation of dY with the
    # spatially flipped kernel, channels transposed (Cout → Cin).
    w_flip = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    dx = jax.lax.conv_general_dilated(
        dy,
        w_flip,
        (1, 1, 1),
        [(kd - 1, kd - 1), (kh - 1, kh - 1), (kw - 1, kw - 1)],
        dimension_numbers=DIMNUMS,
    )
    # dW stays XLA's own transpose of the forward op (near-floor already).
    _, w_vjp = jax.vjp(lambda w_: _conv_valid(x, w_), w)
    (dw,) = w_vjp(dy)
    return dx, dw


conv3d_valid_explicit_dgrad.defvjp(_fwd, _bwd)
