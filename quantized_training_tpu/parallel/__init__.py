"""Distribution layer: device meshes and sharding rules (all new capability;
the reference has no tensor/data parallelism — SURVEY.md §2.5)."""

from .mesh import (
    create_mesh,
    local_mesh,
    initialize_multihost,
    DATA_AXIS,
    MODEL_AXIS,
)
from .sharding import (
    apply_sharding_rules,
    shard_rules_llama,
    shard_rules_llama_storage,
    shard_rules_transformer,
    shard_pytree,
    batch_sharding,
)
from .grad_compress import (
    compressed_allreduce_mean,
    compressed_grad_sync,
    init_error_state,
)
from .overlap import allgather_matmul, matmul_reducescatter

__all__ = [
    "allgather_matmul",
    "matmul_reducescatter",
    "compressed_allreduce_mean",
    "compressed_grad_sync",
    "init_error_state",
    "create_mesh",
    "local_mesh",
    "initialize_multihost",
    "DATA_AXIS",
    "MODEL_AXIS",
    "apply_sharding_rules",
    "shard_rules_llama",
    "shard_rules_llama_storage",
    "shard_rules_transformer",
    "shard_pytree",
    "batch_sharding",
]
