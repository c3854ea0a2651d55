from .mesh import (
    MeshContext,
    initialize_distributed,
    shard_params_tp,
    shard_net_state_tp,
    cross_replica_mean,
    local_batch_size,
)
from .fsdp import (
    shard_params_fsdp,
    shard_net_state_fsdp,
)
from .pipeline import (
    make_pipeline_apply,
    make_baseline_gat_pipeline,
    stack_stage_params,
    unstack_stage_params,
    shard_stage_params,
    split_baseline_gat_stages,
    microbatch,
    unmicrobatch,
    put_microbatched,
)

__all__ = [
    "MeshContext",
    "initialize_distributed",
    "shard_params_tp",
    "shard_net_state_tp",
    "shard_params_fsdp",
    "shard_net_state_fsdp",
    "cross_replica_mean",
    "local_batch_size",
    "make_pipeline_apply",
    "make_baseline_gat_pipeline",
    "stack_stage_params",
    "unstack_stage_params",
    "shard_stage_params",
    "split_baseline_gat_stages",
    "microbatch",
    "unmicrobatch",
    "put_microbatched",
]
