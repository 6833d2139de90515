"""Parameter sharding rules: replicated (default) or FSDP-style.

SURVEY.md §2.3: the models (~15-40M params) need no tensor parallelism for
parity, but the design must leave PartitionSpecs in one place so parameters
*can* shard later. This module is that place:

* ``"replicated"`` — every parameter on every chip (the parity default);
* ``"fsdp"`` — parameters above a size threshold shard along their largest
  mesh-divisible axis over the data axis (ZeRO-3 style). XLA then inserts
  the all-gathers before use and reduce-scatters for gradients
  automatically; the train step needs no code changes. Numerically
  equivalent to replicated (tested on the 8-device mesh).

A future tensor-parallel axis would slot in here as additional rules keyed
by parameter path (e.g. shard GRU/fc kernels along a "model" axis).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def _fsdp_spec(path: tuple, leaf, mesh_size: int, min_size: int) -> P:
    if leaf.size < min_size:
        return P()
    # Largest axis divisible by the mesh wins; ties → later axis (usually
    # the output/features axis, giving contiguous shards).
    best = None
    for axis, dim in enumerate(leaf.shape):
        if dim % mesh_size == 0 and (best is None or dim >= leaf.shape[best]):
            best = axis
    if best is None:
        return P()
    spec = [None] * leaf.ndim
    spec[best] = DATA_AXIS
    return P(*spec)


def param_shardings(
    params: Any,
    mesh: Mesh,
    mode: str = "replicated",
    min_size: int = 2**16,
):
    """A pytree of NamedShardings matching ``params``."""
    if mode == "replicated":
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    if mode != "fsdp":
        raise ValueError(f"unknown param sharding mode: {mode}")

    def spec_for(path, leaf):
        return NamedSharding(mesh, _fsdp_spec(path, leaf, mesh.size, min_size))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_state(state, mesh: Mesh, mode: str = "replicated", min_size: int = 2**16):
    """Place a TrainState: params/opt-state per the rules, counters replicated.

    Optimizer moments follow their parameter's sharding (optax moment trees
    mirror the param tree structure).
    """
    if mode == "replicated":
        return jax.device_put(state, NamedSharding(mesh, P()))

    p_shard = param_shardings(state.params, mesh, mode, min_size)
    new_params = jax.device_put(state.params, p_shard)
    # Optimizer state: param-shaped moment trees (Adam mu/nu) shard like
    # their parameters; everything else (counts) replicates.
    placed_opt = _place_opt_state(state.opt_state, state.params, p_shard, mesh)
    return state.replace(
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
        params=new_params,
        batch_stats=jax.device_put(state.batch_stats, NamedSharding(mesh, P())),
        opt_state=placed_opt,
    )


def _place_opt_state(opt_state, params, p_shard, mesh):
    params_struct = jax.tree_util.tree_structure(params)

    def place(node):
        if jax.tree_util.tree_structure(node) == params_struct:
            return jax.device_put(node, p_shard)
        if isinstance(node, tuple):
            children = [place(child) for child in node]
            if hasattr(node, "_fields"):  # namedtuple (optax states)
                return type(node)(*children)
            return tuple(children)
        if isinstance(node, list):
            return [place(child) for child in node]
        if (
            getattr(node, "ndim", None) == 1
            and node.size >= 2**16
            and node.size % mesh.size == 0
        ):
            # Flat optimizer moment buffers (flat_torch_adam): shard the
            # single axis over the data axis — the ZeRO-style moment
            # sharding the per-leaf path gets from mirroring param specs.
            return jax.device_put(node, NamedSharding(mesh, P(DATA_AXIS)))
        return jax.device_put(node, NamedSharding(mesh, P()))

    return place(opt_state)
