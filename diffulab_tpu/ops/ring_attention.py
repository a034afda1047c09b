"""Ring attention: sequence-parallel attention over a mesh axis.

Beyond the reference's scope (SURVEY.md §5.7: it has no sequence/context
parallelism — its only long-context levers are single-device), but the
TPU-native way to scale attention past one chip's memory: K/V shards rotate
around the ring via ``jax.lax.ppermute`` (point-to-point over ICI, overlapped
with compute by XLA) while each device folds the visiting block into running
online-softmax statistics — the cross-device analog of the flash-attention
inner loop (guide: jax-ml scaling-book / Pallas guide §16).

Usage: wrap with ``shard_map`` over a mesh axis that shards the sequence
(see :func:`sequence_parallel_attention`), q/k/v arriving as local shards
``[B, S/n, H, D]``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _block_attn(q, k, v, scale, kv_mask=None):
    """Unnormalized attention against one K/V block: returns (o*l, m, l) where
    m/l are fp32 row max / sum-exp statistics."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :], s, -0.7 * jnp.finfo(jnp.float32).max)
    m = s.max(axis=-1)  # [B, H, Q]
    p = jnp.exp(s - m[..., None])
    l = p.sum(axis=-1)  # [B, H, Q]
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v).astype(jnp.float32)
    return o, m, l


def ring_attention_local(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    kv_mask: jax.Array | None = None,
    scale: float | None = None,
) -> jax.Array:
    """Per-shard body (call inside shard_map). q/k/v: [B, S_local, H, D]."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    b, sq, h, d = q.shape
    # derive the accumulators from q so they inherit its full varying-axes
    # type (shard_map carry typing: q varies over the ring axis AND any
    # batch-parallel axes; fresh constants would be unvarying and the scan
    # carry types would mismatch)
    acc0 = q.astype(jnp.float32) * 0.0
    stat0 = jnp.swapaxes(q[..., 0], 1, 2).astype(jnp.float32) * 0.0  # [B, H, Sq]
    m0 = stat0 - jnp.inf
    l0 = stat0

    def body(carry, _):
        k_blk, v_blk, mask_blk, acc, m, l = carry
        o_blk, m_blk, l_blk = _block_attn(q, k_blk, v_blk, scale, mask_blk)
        m_new = jnp.maximum(m, m_blk)
        alpha = jnp.exp(m - m_new)  # correction for old stats
        beta = jnp.exp(m_blk - m_new)
        l = alpha * l + beta * l_blk
        acc = acc * jnp.moveaxis(alpha, 1, 2)[..., None] + o_blk * jnp.moveaxis(beta, 1, 2)[..., None]
        m = m_new
        # rotate the K/V block to the next device (point-to-point over ICI)
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        if mask_blk is not None:
            mask_blk = jax.lax.ppermute(mask_blk, axis_name, perm)
        return (k_blk, v_blk, mask_blk, acc, m, l), None

    (_, _, _, acc, m, l), _ = jax.lax.scan(body, (k, v, kv_mask, acc0, m0, l0), None, length=n)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = acc / jnp.moveaxis(l_safe, 1, 2)[..., None]
    return out.astype(q.dtype)


def sequence_parallel_attention(
    mesh: Mesh,
    axis: str = "data",
    batch_axis: str | tuple[str, ...] | None = None,
):
    """shard_map-wrapped ring attention: the sequence dim shards over ``axis``.

    ``batch_axis`` (one mesh axis or a tuple) is how the BATCH dim is already
    sharded — pass the data-parallel axes so the shard_map does not force an
    all-gather of the batch. Returns a callable
    ``(q, k, v, kv_mask=None, scale=None) -> out`` on GLOBAL arrays
    [B, S, H, D]; S must divide by the axis size.
    """
    seq_spec = P(batch_axis, axis, None, None)
    mask_spec = P(batch_axis, axis)

    def call(q, k, v, kv_mask=None, scale=None):
        in_specs = (seq_spec, seq_spec, seq_spec)
        args = (q, k, v)
        if kv_mask is not None:
            in_specs = in_specs + (mask_spec,)
            args = args + (kv_mask,)

            def body(q, k, v, m):
                return ring_attention_local(q, k, v, axis, kv_mask=m, scale=scale)
        else:
            def body(q, k, v):
                return ring_attention_local(q, k, v, axis, kv_mask=None, scale=scale)

        fn = jax.shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=seq_spec)
        return fn(*args)

    return call
