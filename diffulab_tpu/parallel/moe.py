"""Expert parallelism: a mixture-of-experts MLP sharded over an ``expert``
mesh axis with all-to-all token dispatch.

The reference has no MoE; this provides the TPU-idiomatic expert-parallel
building block (the Mesh-TensorFlow / GShard dispatch formulation) so
denoiser MLPs can scale experts across chips:

- the router scores each token, picks its top-1 expert, and builds one-hot
  ``dispatch`` / gate-weighted ``combine`` tensors ``[T, E, C]`` with a
  fixed per-expert capacity ``C`` (static shapes - nothing data-dependent
  reaches XLA's shape system; over-capacity tokens are dropped, standard
  switch-routing semantics);
- tokens and experts are both sharded over the ``expert`` axis: each device
  dispatches its local tokens into ``[E, C_local, d]`` bins with one einsum,
  then one ``lax.all_to_all`` regroups bins so every device holds the full
  token set for its local experts (``[E_local, n*C_local, d]``);
- expert FFNs run as one batched einsum over the local expert dim (MXU
  friendly), a second all_to_all routes results home, and ``combine``
  scatters them back to token order.

Gradients flow through both all_to_alls (they transpose to each other).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx
from jax import lax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

__all__ = ["ExpertMlp", "expert_parallel_mlp", "route_top1"]


class ExpertMlp(nnx.Module):
    """E independent 2-layer MLPs with stacked weights [E, ...] (batched
    einsum over the expert dim keeps the MXU busy; no Python loop)."""

    def __init__(self, n_experts: int, dim: int, hidden: int, *,
                 rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32):
        k1, k2, k3 = jax.random.split(rngs.params(), 3)
        scale_in = (2.0 / dim) ** 0.5
        scale_out = (2.0 / hidden) ** 0.5
        self.w_in = nnx.Param(
            jax.random.normal(k1, (n_experts, dim, hidden), param_dtype) * scale_in)
        self.w_out = nnx.Param(
            jax.random.normal(k2, (n_experts, hidden, dim), param_dtype) * scale_out)
        self.w_gate = nnx.Param(
            jax.random.normal(k3, (dim, n_experts), param_dtype) * scale_in)
        self.n_experts = n_experts
        self.dtype = dtype

    def ffn(self, w_in: jax.Array, w_out: jax.Array, x: jax.Array) -> jax.Array:
        """x [E?, C, d] through the (possibly expert-sharded) stacked FFNs."""
        h = jax.nn.gelu(jnp.einsum("ecd,edh->ech", x, w_in))
        return jnp.einsum("ech,ehd->ecd", h, w_out)


def route_top1(logits: jax.Array, capacity: int) -> tuple[jax.Array, jax.Array]:
    """Switch-style top-1 routing. logits [T, E] -> (dispatch, combine),
    both [T, E, C]; tokens past an expert's capacity are dropped (their
    combine weights are zero, so they pass through as residual-only)."""
    t, e = logits.shape
    gates = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    expert = jnp.argmax(gates, axis=-1)  # [T]
    onehot = jax.nn.one_hot(expert, e, dtype=jnp.float32)  # [T, E]
    # position of each token within its expert's queue (prefix count)
    pos = (jnp.cumsum(onehot, axis=0) - onehot) * onehot  # [T, E]
    keep = onehot * (pos < capacity)
    pos_oh = jax.nn.one_hot(jnp.sum(pos, axis=-1).astype(jnp.int32), capacity,
                            dtype=jnp.float32)  # [T, C]
    dispatch = keep[:, :, None] * pos_oh[:, None, :]  # [T, E, C]
    gate = jnp.sum(gates * keep, axis=-1)  # [T]
    combine = dispatch * gate[:, None, None]
    return dispatch, combine


def moe_mlp_local(mlp: ExpertMlp, x: jax.Array, capacity_factor: float = 2.0):
    """Single-device switch-MoE (no mesh): route, bin, batched-FFN, combine.

    The dense fallback the model uses when no mesh has been injected (CPU
    unit tests, single-chip runs) — identical routing semantics to
    :func:`expert_parallel_mlp` minus the all_to_alls."""
    b, s, d = x.shape
    e = mlp.n_experts
    capacity = max(1, int(capacity_factor * b * s / e))
    xt = x.reshape(-1, d)
    logits = xt.astype(jnp.float32) @ mlp.w_gate[...].astype(jnp.float32)
    dispatch, combine = route_top1(logits, capacity)
    binned = jnp.einsum("tec,td->ecd", dispatch, xt.astype(jnp.float32))
    out = mlp.ffn(mlp.w_in[...].astype(jnp.float32), mlp.w_out[...].astype(jnp.float32), binned)
    yt = jnp.einsum("tec,ecd->td", combine, out)
    gates = jax.nn.softmax(logits, -1)
    entropy = -jnp.mean(jnp.sum(gates * jax.nn.log_softmax(logits, -1), axis=-1))
    frac = jnp.mean(jax.nn.one_hot(jnp.argmax(gates, -1), e), axis=0)
    prob = jnp.mean(gates, axis=0)
    aux = {
        "gate_entropy": entropy,
        "load_balance_loss": e * jnp.sum(frac * prob),
    }
    return yt.reshape(x.shape).astype(x.dtype), aux


def expert_parallel_mlp(
    mlp: ExpertMlp,
    x: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "expert",
    capacity_factor: float = 2.0,
    batch_axes: tuple[str, ...] = (),
):
    """Run tokens [B, S, d] through the expert-parallel MoE over ``mesh[axis]``.

    Tokens shard over ``batch_axes + (axis,)`` on the batch dim (pass the
    mesh axes the batch is already data-parallel over so the shard_map does
    not force an all-gather); expert weights shard on their leading expert
    dim; two all_to_alls move token bins to expert owners and back. Returns
    [B, S, d] plus an aux dict with the router's mean gate entropy and the
    switch-transformer load-balance loss.
    """
    n_dev = mesh.shape[axis]
    for a in batch_axes:
        n_dev_b = mesh.shape[a]
        if x.shape[0] % n_dev_b:
            raise ValueError(f"batch {x.shape[0]} not divisible by axis {a}={n_dev_b}")
    n_batch_shards = 1
    for a in batch_axes:
        n_batch_shards *= mesh.shape[a]
    b, s, d = x.shape
    e = mlp.n_experts
    if e % n_dev:
        raise ValueError(f"experts {e} not divisible by axis size {n_dev}")
    if b % (n_dev * n_batch_shards):
        raise ValueError(
            f"batch {b} not divisible by expert x batch shards {n_dev * n_batch_shards}"
        )
    t_local = (b // (n_dev * n_batch_shards)) * s
    capacity = max(1, int(capacity_factor * t_local / e))

    graphdef, params = nnx.split(mlp)

    def _moe(params, x):
        m = nnx.merge(graphdef, params)  # local expert shard: [E/n, ...]
        xt = x.reshape(-1, d)  # local tokens [T, d]
        # router uses the (replicated) gate weights
        logits = xt.astype(jnp.float32) @ m.w_gate[...].astype(jnp.float32)
        dispatch, combine = route_top1(logits, capacity)
        binned = jnp.einsum("tec,td->ecd", dispatch, xt.astype(jnp.float32))
        # [E, C, d] -> [E/n, n*C, d]: every device receives all tokens bound
        # for its local experts
        binned = lax.all_to_all(binned, axis, split_axis=0, concat_axis=1,
                                tiled=True)
        out = m.ffn(m.w_in[...].astype(jnp.float32),
                    m.w_out[...].astype(jnp.float32), binned)
        out = lax.all_to_all(out, axis, split_axis=1, concat_axis=0, tiled=True)
        yt = jnp.einsum("tec,ecd->td", combine, out)
        gates = jax.nn.softmax(logits, -1)
        entropy = -jnp.mean(jnp.sum(gates * jax.nn.log_softmax(logits, -1), axis=-1))
        # switch-transformer load-balance loss: E * sum_i f_i * P_i, where
        # f_i = fraction of tokens routed to expert i, P_i = mean gate prob.
        # Minimized (=1) at a perfectly uniform assignment; differentiable
        # through P. Add `aux["load_balance_loss"] * coeff` (~1e-2) to the
        # training loss when routing collapse is a concern.
        frac = jnp.mean(jax.nn.one_hot(jnp.argmax(gates, -1), e), axis=0)
        prob = jnp.mean(gates, axis=0)
        balance = e * jnp.sum(lax.pmean(frac, axis) * lax.pmean(prob, axis))
        aux = {
            "gate_entropy": lax.pmean(entropy, axis),
            "load_balance_loss": balance,
        }
        return yt.reshape(x.shape).astype(x.dtype), aux

    param_specs = jax.tree.map(lambda _: P(axis), params)
    # replicate the router gate across devices (it scores all experts)
    param_specs["w_gate"] = jax.tree.map(lambda _: P(), param_specs["w_gate"])
    token_spec = P(batch_axes + (axis,)) if batch_axes else P(axis)
    return jax.shard_map(
        _moe,
        mesh=mesh,
        in_specs=(param_specs, token_spec),
        out_specs=(token_spec, {"gate_entropy": P(), "load_balance_loss": P()}),
        check_vma=False,
    )(params, x)
