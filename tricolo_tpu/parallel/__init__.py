"""Device mesh, shardings, and explicit-collective loss formulations.

The whole "distributed backend" of this framework (SURVEY.md §2.3): a 1-D
data-parallel `jax.sharding.Mesh` over ICI, PartitionSpec helpers, and a
`shard_map` NT-Xent that gathers embeddings across the mesh so contrastive
negatives span the global batch. The reference has no distribution layer at
all (single-GPU Lightning defaults, per-device negatives only).
"""

from .mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from .collectives import make_global_nt_xent, make_local_nt_xent
from .multiprocess import (
    is_multiprocess,
    local_batch_size,
    maybe_initialize,
    shard_process_local_batch,
)
from .sharding_rules import param_shardings, shard_state

__all__ = [
    "is_multiprocess",
    "local_batch_size",
    "maybe_initialize",
    "shard_process_local_batch",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "make_global_nt_xent",
    "make_local_nt_xent",
    "param_shardings",
    "shard_state",
]
