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
    shard_rules_transformer,
    shard_pytree,
    batch_sharding,
)

__all__ = [
    "create_mesh",
    "local_mesh",
    "initialize_multihost",
    "DATA_AXIS",
    "MODEL_AXIS",
    "apply_sharding_rules",
    "shard_rules_llama",
    "shard_rules_transformer",
    "shard_pytree",
    "batch_sharding",
]
