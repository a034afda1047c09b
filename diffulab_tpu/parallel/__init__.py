from diffulab_tpu.parallel.mesh import MeshConfig, make_mesh
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
    "replicated",
    "shard_batch",
    "shard_model_state",
]
