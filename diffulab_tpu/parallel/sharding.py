"""Sharding rules: logical axis names -> mesh axes.

Model weights are annotated with logical axes at creation time
(``nnx.with_partitioning`` in the denoisers):
- "embed": the model width dimension -> sharded over ``fsdp``;
- "hidden": the attention/MLP expansion dimension -> sharded over ``tensor``.

Everything unannotated is replicated. Batches shard over ``(data, fsdp)``
jointly (the fsdp axis contributes to data parallelism too, ZeRO-style).
With these in/out shardings on the jitted train step, XLA inserts all the
collectives (all-gather for fsdp params, all-reduce for tensor partials and
data-parallel gradients) over ICI — the rebuild's replacement for the
reference's NCCL-backed DDP (SURVEY.md §2.1).
"""

from __future__ import annotations

from typing import Any

import jax
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

LOGICAL_RULES: dict[str, str | None] = {
    "embed": "fsdp",
    "hidden": "tensor",
}


def _to_mesh_spec(spec: P | None, mesh: Mesh) -> P:
    """Translate a logical-axis PartitionSpec into mesh axes via LOGICAL_RULES,
    dropping axes whose mesh size is 1 (so single-chip runs need no resharding)."""
    if spec is None:
        return P()
    out = []
    for axis in spec:
        mesh_axis = LOGICAL_RULES.get(axis) if isinstance(axis, str) else None
        if mesh_axis is not None and mesh.shape[mesh_axis] > 1:
            out.append(mesh_axis)
        else:
            out.append(None)
    return P(*out)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Global batch sharded over the combined (data, fsdp) axes."""
    axes = tuple(a for a in ("data", "fsdp") if mesh.shape[a] > 1)
    return NamedSharding(mesh, P(axes if axes else None))


def get_param_shardings(state: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for an nnx State with logical-axis annotations."""
    logical_specs = nnx.get_partition_spec(state)

    def to_named(spec):
        if isinstance(spec, P):
            return NamedSharding(mesh, _to_mesh_spec(spec, mesh))
        return NamedSharding(mesh, P())

    return jax.tree.map(
        to_named, logical_specs,
        is_leaf=lambda x: isinstance(x, P) or x is None,
    )


def shard_model_state(state: Any, mesh: Mesh) -> Any:
    """device_put an nnx State onto the mesh per its annotations."""
    shardings = get_param_shardings(state, mesh)
    return jax.tree.map(jax.device_put, state, shardings)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """device_put a host batch pytree with the global batch sharding."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def global_batch_array(x: Any, mesh: Mesh, sharding: NamedSharding | None = None):
    """Assemble a global batch array from this process's host-local rows.

    Single-process: plain ``device_put``. Multi-host pods: each process holds
    only its slice of the global batch (``DataLoader(process_count=...)``
    yields per-process sub-batches), and
    ``jax.make_array_from_process_local_data`` stitches them into one global
    array under the batch sharding — the multi-host analog of the
    reference's accelerate ``prepare(dataloader)`` per-rank split.
    """
    import numpy as np

    sh = sharding or batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    return jax.make_array_from_process_local_data(sh, np.asarray(x))
