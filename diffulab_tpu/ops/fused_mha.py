"""Fused multi-head attention for short sequences (Pallas TPU).

The flash kernel in :mod:`diffulab_tpu.ops.flash_attention` tiles the KV axis
for long sequences; at DiT-scale token counts (256-512, reference
mmdit.py:92-98 runs SDPA on exactly these shapes) its ``(B, H, Sq/b, Skv/b)``
grid degenerates to one tiny program per (batch, head) pair and per-program
overhead dominates — profiled on v5e, attention + softmax cost ~40% of the
DiT-B/2 train step while being <13% of its FLOPs, because XLA materializes
the [B, H, S, S] score tensor in HBM for the backward.

This kernel instead runs ONE program per batch element:

- q/k/v blocks [1, S, H*D] land in VMEM in the layout the qkv projection
  produces (no [B,S,H,D] -> [B,H,S,D] transpose, no per-head HBM tiles);
- all heads are computed in an unrolled loop inside the program — the [S, S]
  score matrix lives only in registers/VMEM, softmax is a plain (not online)
  max/exp/sum, and only o + the log-sum-exp residual are written back;
- the backward is a single kernel (not the dKV/dQ pair): with the whole KV
  in VMEM, dq, dk, dv for all heads come out of one pass, recomputing p from
  the saved lse. ``di = sum(do * o)`` is folded to ``rowsum(p * dp)`` so o
  need not be saved;
- the optional key-padding mask [B, Skv] uses the same finite additive value
  and fully-masked-row handling as the flash kernel.

Numerics match XLA SDPA to bf16 tolerance; scores/softmax accumulate in fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffulab_tpu.ops.flash_attention import DEFAULT_MASK_VALUE

# VMEM working-set cap (bytes) used by the dispatcher: q/k/v/o blocks plus the
# fp32 [Sq, Skv] score + dp matrices must fit alongside pipeline buffers.
FUSED_VMEM_BUDGET = 10 * 1024 * 1024


def fused_vmem_bytes(sq: int, skv: int, h: int, d: int, itemsize: int = 2) -> int:
    """Backward-pass working set (the larger of fwd/bwd): 7 [S, H*D] blocks
    (q, k, v, do, dq, dk, dv) + 2 fp32 [Sq, Skv] score-sized temporaries."""
    return 7 * max(sq, skv) * h * d * itemsize + 2 * sq * skv * 4


def _mha_fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *, sm_scale, n_heads, head_dim):
    """Refs are [1, S, H*D]; heads are static lane slices (Mosaic cannot
    shape-cast through interior unit dims, so 4-D [1, S, H, D] refs fail)."""
    d = head_dim
    mask = None
    if mask_ref is not None:
        mask = mask_ref[0, 0, :][None, :] != 0  # [1, Skv]
    lse_cols = []
    for hh in range(n_heads):
        q = q_ref[0, :, hh * d:(hh + 1) * d]
        k = k_ref[0, :, hh * d:(hh + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [Sq, Skv]
        s *= sm_scale
        if mask is not None:
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        # normalize BEFORE the PV matmul (same op order as XLA SDPA, so the
        # bf16 rounding the MXU applies to the p operand matches it bit-wise)
        p = p / l
        lse = m + jnp.log(l)
        if mask is not None:
            fully_masked = m <= DEFAULT_MASK_VALUE
            p = jnp.where(fully_masked, 0.0, p)
            lse = jnp.where(fully_masked, jnp.inf, lse)
        v = v_ref[0, :, hh * d:(hh + 1) * d]
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[0, :, hh * d:(hh + 1) * d] = o.astype(o_ref.dtype)
        lse_cols.append(lse)
    lse_ref[0] = jnp.concatenate(lse_cols, axis=1)  # [Sq, H]


def _mha_bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, mask_ref,
                    dq_ref, dk_ref, dv_ref, *, sm_scale, n_heads, head_dim):
    d = head_dim
    mask = None
    if mask_ref is not None:
        mask = mask_ref[0, 0, :][None, :] != 0
    for hh in range(n_heads):
        q = q_ref[0, :, hh * d:(hh + 1) * d]
        k = k_ref[0, :, hh * d:(hh + 1) * d]
        v = v_ref[0, :, hh * d:(hh + 1) * d]
        do = do_ref[0, :, hh * d:(hh + 1) * d]
        lse = lse_ref[0, :, hh:hh + 1]  # [Sq, 1]; +inf rows -> p == 0

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s *= sm_scale
        if mask is not None:
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
        p = jnp.exp(s - lse)  # normalized softmax [Sq, Skv]

        # dv = P^T dO
        dv = jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # dP = dO V^T ; di = sum(dO * O) == rowsum(P * dP)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        di = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = p * (dp - di) * sm_scale
        dq = jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk = jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dq_ref[0, :, hh * d:(hh + 1) * d] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, hh * d:(hh + 1) * d] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, hh * d:(hh + 1) * d] = dv.astype(dv_ref.dtype)


def _mha_forward(q, k, v, kv_mask, sm_scale, interpret):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    # [B, S, H, D] -> [B, S, H*D]: free (contiguous), and it is the layout the
    # qkv projection produced anyway
    q3 = q.reshape(b, sq, h * d)
    k3 = k.reshape(b, skv, h * d)
    v3 = v.reshape(b, skv, h * d)
    in_specs = [
        pl.BlockSpec((1, sq, h * d), lambda bi: (bi, 0, 0)),
        pl.BlockSpec((1, skv, h * d), lambda bi: (bi, 0, 0)),
        pl.BlockSpec((1, skv, h * d), lambda bi: (bi, 0, 0)),
    ]
    args = [q3, k3, v3]
    if kv_mask is not None:
        in_specs.append(pl.BlockSpec((1, 1, skv), lambda bi: (bi, 0, 0)))
        args.append(kv_mask.astype(jnp.int32)[:, None, :])
        kernel = functools.partial(_mha_fwd_kernel, sm_scale=sm_scale, n_heads=h, head_dim=d)
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref):
            _mha_fwd_kernel(q_ref, k_ref, v_ref, None, o_ref, lse_ref,
                            sm_scale=sm_scale, n_heads=h, head_dim=d)

    o, lse = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, sq, h * d), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, sq, h), lambda bi: (bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq, h * d), q.dtype),
            jax.ShapeDtypeStruct((b, sq, h), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(*args)
    return o.reshape(b, sq, h, d), lse


def _mha_backward(q, k, v, kv_mask, lse, do, sm_scale, interpret):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    q3 = q.reshape(b, sq, h * d)
    k3 = k.reshape(b, skv, h * d)
    v3 = v.reshape(b, skv, h * d)
    do3 = do.reshape(b, sq, h * d)
    in_specs = [
        pl.BlockSpec((1, sq, h * d), lambda bi: (bi, 0, 0)),
        pl.BlockSpec((1, skv, h * d), lambda bi: (bi, 0, 0)),
        pl.BlockSpec((1, skv, h * d), lambda bi: (bi, 0, 0)),
        pl.BlockSpec((1, sq, h * d), lambda bi: (bi, 0, 0)),
        pl.BlockSpec((1, sq, h), lambda bi: (bi, 0, 0)),
    ]
    args = [q3, k3, v3, do3, lse]
    if kv_mask is not None:
        in_specs.append(pl.BlockSpec((1, 1, skv), lambda bi: (bi, 0, 0)))
        args.append(kv_mask.astype(jnp.int32)[:, None, :])
        kernel = functools.partial(_mha_bwd_kernel, sm_scale=sm_scale, n_heads=h, head_dim=d)
    else:
        def kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dq_ref, dk_ref, dv_ref):
            _mha_bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, None,
                            dq_ref, dk_ref, dv_ref, sm_scale=sm_scale, n_heads=h, head_dim=d)

    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, sq, h * d), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, skv, h * d), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, skv, h * d), lambda bi: (bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q3.shape, q.dtype),
            jax.ShapeDtypeStruct(k3.shape, k.dtype),
            jax.ShapeDtypeStruct(v3.shape, v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(*args)
    return dq.reshape(q.shape), dk.reshape(k.shape), dv.reshape(v.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: jax.Array | None = None,
    sm_scale: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused short-seq attention. q [B,Sq,H,D], k/v [B,Skv,H,D], kv_mask [B,Skv].

    Sq/Skv should be multiples of 8 (sublane width); use
    :mod:`diffulab_tpu.ops.attention` for automatic padding + dispatch.
    Returns [B, Sq, H, D] in q's dtype.
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    o, _ = _mha_forward(q, k, v, kv_mask, sm_scale, interpret)
    return o


def _fused_fwd_rule(q, k, v, kv_mask, sm_scale, interpret):
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    o, lse = _mha_forward(q, k, v, kv_mask, sm_scale, interpret)
    return o, (q, k, v, kv_mask, lse)


def _fused_bwd_rule(sm_scale, interpret, residuals, do):
    q, k, v, kv_mask, lse = residuals
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    dq, dk, dv = _mha_backward(q, k, v, kv_mask, lse, do, sm_scale, interpret)
    return dq, dk, dv, None


fused_mha.defvjp(_fused_fwd_rule, _fused_bwd_rule)
