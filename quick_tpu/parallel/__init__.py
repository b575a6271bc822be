from quick_tpu.parallel.context import ParallelContext
from quick_tpu.parallel.sharding import (
    DATA_AXIS,
    MODEL_AXIS,
    cache_spec,
    create_mesh,
    local_config,
    param_specs,
    prepare_params_for_tp,
    shard_params,
    sharded_forward_fn,
)
from quick_tpu.parallel.context_parallel import (
    SEQ_AXIS,
    context_parallel_forward_fn,
    create_seq_mesh,
)
from quick_tpu.parallel.permute import permute_fused_for_tp, tp_permutation
from quick_tpu.parallel.pipeline import (
    PIPE_AXIS,
    create_pipe_mesh,
    pipeline_forward_fn,
    shard_stacked_blocks,
    stack_blocks,
)

__all__ = [
    "ParallelContext",
    "create_mesh",
    "param_specs",
    "cache_spec",
    "shard_params",
    "local_config",
    "sharded_forward_fn",
    "permute_fused_for_tp",
    "tp_permutation",
    "MODEL_AXIS",
    "DATA_AXIS",
    "PIPE_AXIS",
    "SEQ_AXIS",
    "create_pipe_mesh",
    "pipeline_forward_fn",
    "stack_blocks",
    "shard_stacked_blocks",
    "create_seq_mesh",
    "context_parallel_forward_fn",
]
