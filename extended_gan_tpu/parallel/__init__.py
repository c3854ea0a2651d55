from .mesh import (
    MeshContext,
    initialize_distributed,
    shard_params_tp,
    shard_net_state_tp,
    cross_replica_mean,
    local_batch_size,
)

__all__ = [
    "MeshContext",
    "initialize_distributed",
    "shard_params_tp",
    "shard_net_state_tp",
    "cross_replica_mean",
    "local_batch_size",
]
