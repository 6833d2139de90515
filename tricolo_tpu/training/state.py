"""Immutable training state pytree."""

from __future__ import annotations

from typing import Any

import jax
from flax import struct


@struct.dataclass
class TrainState:
    """Everything the compiled train step threads through itself.

    Kept separate from the model definition (the flax Module stays a static,
    hashable argument) so jit caches one executable per model config.
    """

    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables: dict, tx) -> "TrainState":
        import jax.numpy as jnp

        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
        )
