from diffulab_tpu.parallel.mesh import MeshConfig, make_mesh
from diffulab_tpu.parallel.moe import ExpertMlp, expert_parallel_mlp, route_top1
from diffulab_tpu.parallel.pipeline import (
    pipeline_apply,
    stack_block_states,
    stage_sharding,
)
from diffulab_tpu.parallel.sharding import (
    batch_sharding,
    get_param_shardings,
    replicated,
    shard_batch,
    shard_model_state,
)

__all__ = [
    "MeshConfig",
    "make_mesh",
    "ExpertMlp",
    "batch_sharding",
    "expert_parallel_mlp",
    "get_param_shardings",
    "pipeline_apply",
    "replicated",
    "route_top1",
    "shard_batch",
    "shard_model_state",
    "stack_block_states",
    "stage_sharding",
]
