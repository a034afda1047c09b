from diffulab_tpu.parallel.mesh import MeshConfig, make_mesh
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
    "batch_sharding",
    "get_param_shardings",
    "pipeline_apply",
    "replicated",
    "shard_batch",
    "shard_model_state",
    "stack_block_states",
    "stage_sharding",
]
