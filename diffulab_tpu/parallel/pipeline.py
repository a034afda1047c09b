"""GPipe-style SPMD pipeline parallelism over a mesh axis.

The reference (torch/accelerate) has no pipeline engine; on TPU pods the
idiomatic formulation is collective-permute pipelining (the "How to Scale
Your Model" recipe): stack the homogeneous transformer blocks along a
leading layer axis, shard that axis over a ``pipe`` mesh axis so each
device holds a contiguous stage of layers, and stream microbatches through
with ``lax.ppermute`` inside one ``lax.scan``. XLA overlaps the permute
(ICI transfer of one microbatch's activations) with the next microbatch's
stage compute, so the only cost is the classic GPipe bubble of
``(S-1)/(M+S-1)``.

Everything is a single jitted program: differentiable end-to-end (the
backward pass reverses the ppermute ring automatically), composable with
the other mesh axes (data/fsdp/tensor shard the per-layer params and the
batch as usual).

Layout contract:
  * ``stacked_params``: pytree whose leaves have leading axis L (total
    layers); L % pipe_size == 0. Each stage owns L / pipe_size layers.
  * ``inputs``: pytree of per-batch arrays, leading axis B; B must be
    divisible by ``n_microbatches``.
  * ``stage_fn(layer_params, state) -> state`` applies ONE layer to the
    carried activation pytree (non-``x`` leaves such as the adaLN vector
    ride along unchanged).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

__all__ = ["pipeline_apply", "stack_block_states", "stage_sharding"]


def _pcast_varying(tree: Any, axis: str) -> Any:
    """Mark replicated arrays as device-varying so they can enter a
    ppermute carry under shard_map's varying-manual-axes checking."""
    return jax.tree.map(lambda a: lax.pcast(a, (axis,), to="varying"), tree)


def pipeline_apply(
    stage_fn: Callable[[Any, Any], Any],
    stacked_params: Any,
    inputs: Any,
    *,
    mesh: Mesh,
    axis: str = "pipe",
    n_microbatches: int,
    batch_axes: tuple[str, ...] = (),
    stream: Any = None,
) -> Any:
    """Run ``inputs`` through all L layers, pipelined over ``mesh[axis]``.

    ``inputs`` are the CIRCULATING activations (transformed by every stage,
    ppermuted around the ring). ``stream`` holds per-microbatch operands the
    stages read but never transform (conditioning vectors, RoPE tables):
    they stay resident on every pipe device and each stage dynamic-indexes
    the microbatch it is currently processing — circulating them would
    multiply ICI traffic per tick for no reason. ``stage_fn`` receives one
    merged dict ``{**inputs_slice, **stream_slice}`` and only the ``inputs``
    keys of its result re-enter the ring.

    Returns a pytree shaped like ``inputs`` holding the final stage's
    activations (broadcast back to every pipe device so downstream
    replicated layers — final norm / head — can consume it anywhere).
    """
    n_stages = mesh.shape[axis]
    leaves = jax.tree.leaves(stacked_params)
    if not leaves:
        raise ValueError("stacked_params has no leaves")
    total_layers = leaves[0].shape[0]
    if total_layers % n_stages:
        raise ValueError(f"L={total_layers} not divisible by pipe={n_stages}")
    # batch_axes: mesh axes the leading (batch) dim of ``inputs`` is sharded
    # over (the trainer's (data, fsdp) batch sharding) — each data shard runs
    # its own microbatch stream so pp composes with dp without gathering.
    dp = 1
    for a in batch_axes:
        dp *= mesh.shape[a]
    batch = jax.tree.leaves(inputs)[0].shape[0]
    if batch % (n_microbatches * dp):
        raise ValueError(f"B={batch} not divisible by M*dp={n_microbatches * dp}")
    m = n_microbatches

    param_specs = jax.tree.map(lambda _: P(axis), stacked_params)
    batch_spec = P(batch_axes if batch_axes else None)
    in_specs = jax.tree.map(lambda _: batch_spec, inputs)
    stream = {} if stream is None else dict(stream)
    stream_specs = jax.tree.map(lambda _: batch_spec, stream)

    def _pipelined(local_params: Any, xs: Any, stream_xs: Any) -> Any:
        s_idx = lax.axis_index(axis)
        local_batch = jax.tree.leaves(xs)[0].shape[0]
        # [B, ...] -> [M, B/M, ...]
        to_mb = lambda a: a.reshape(m, a.shape[0] // m, *a.shape[1:])  # noqa: E731
        xm = jax.tree.map(to_mb, xs)
        stream_m = jax.tree.map(to_mb, stream_xs)
        state0 = _pcast_varying(jax.tree.map(lambda a: jnp.zeros_like(a[0]), xm), axis)
        outs0 = _pcast_varying(jax.tree.map(jnp.zeros_like, xm), axis)

        def run_stage(state: Any, t: jax.Array) -> Any:
            # the microbatch at stage s during tick t is t - s (clamped in
            # the fill/drain phases, where results are never recorded)
            mb_idx = jnp.clip(t - s_idx, 0, m - 1)
            stream_t = jax.tree.map(
                lambda a: lax.dynamic_index_in_dim(a, mb_idx, 0, keepdims=False),
                stream_m,
            )

            def body(st: Any, layer_params: Any):
                out = stage_fn(layer_params, {**st, **stream_t})
                return {k: out[k] for k in st}, None

            st, _ = lax.scan(body, state, local_params)
            return st

        def tick(carry: tuple[Any, Any], t: jax.Array):
            state, outs = carry
            # stage 0 ingests microbatch t (clamped once the stream drains)
            mb = jax.tree.map(
                lambda a: lax.dynamic_index_in_dim(
                    a, jnp.minimum(t, m - 1), 0, keepdims=False
                ),
                xm,
            )
            state = jax.tree.map(
                lambda inj, st: jnp.where(s_idx == 0, inj, st), mb, state
            )
            state = run_stage(state, t)
            # last stage records microbatch t-(S-1) once the fill completes
            record = jnp.logical_and(s_idx == n_stages - 1, t >= n_stages - 1)
            o_idx = jnp.clip(t - (n_stages - 1), 0, m - 1)
            outs = jax.tree.map(
                lambda o, st: jnp.where(
                    record, lax.dynamic_update_index_in_dim(o, st, o_idx, 0), o
                ),
                outs,
                state,
            )
            # rotate activations one stage forward around the ring
            perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
            state = jax.tree.map(lambda st: lax.ppermute(st, axis, perm), state)
            return (state, outs), None

        (_, outs), _ = lax.scan(tick, (state0, outs0), jnp.arange(m + n_stages - 1))
        # broadcast the last stage's outputs to every pipe device
        outs = jax.tree.map(
            lambda o: lax.psum(
                jnp.where(s_idx == n_stages - 1, o, jnp.zeros_like(o)), axis
            ),
            outs,
        )
        return jax.tree.map(lambda o: o.reshape(local_batch, *o.shape[2:]), outs)

    return jax.shard_map(
        _pipelined,
        mesh=mesh,
        in_specs=(param_specs, in_specs, stream_specs),
        out_specs=jax.tree.map(lambda _: batch_spec, inputs),
        check_vma=True,
    )(stacked_params, inputs, stream)


def stack_block_states(make_block: Callable[..., Any], depth: int, seed: int = 0):
    """Create ``depth`` structurally identical nnx blocks and return
    ``(graphdef, stacked_state)`` where every state leaf gains a leading
    layer axis. ``make_block(rngs)`` builds one block.

    The per-layer ``stage_fn`` then merges one slice at a time:
    ``nnx.merge(graphdef, layer_state)`` (graphdefs carry structure, not
    shapes, so a single-layer slice merges cleanly).
    """
    from flax import nnx

    template = make_block(nnx.Rngs(seed))
    graphdef, _ = nnx.split(template)

    def init_layer(key: jax.Array):
        return nnx.split(make_block(nnx.Rngs(key)))[1]

    keys = jax.random.split(jax.random.key(seed), depth)
    stacked = jax.vmap(init_layer)(keys)
    return graphdef, stacked


def stage_sharding(stacked_params: Any, mesh: Mesh, axis: str = "pipe") -> Any:
    """NamedShardings placing each leaf's leading layer axis on ``axis``."""
    return jax.tree.map(
        lambda _: NamedSharding(mesh, P(axis)), stacked_params
    )
