"""Pallas TPU flash attention (forward + backward), non-causal, with an
optional key-padding mask.

This is the one hand-written kernel the framework owns (SURVEY.md §2: the
reference leans on PyTorch SDPA CUDA kernels at unet.py:313-319 and
mmdit.py:92-98; here attention is a first-class Mosaic kernel). Design follows
the standard online-softmax tiling:

- grid ``(B, H, Sq/block_q, Skv/block_k)`` with the KV dimension sequential
  ("arbitrary") so fp32 running statistics (m, l) and the output accumulator
  live in VMEM scratch across KV tiles;
- QK^T and PV matmuls accumulate in fp32 on the MXU
  (``preferred_element_type``), inputs may be bf16;
- the backward pass is two kernels under a ``custom_vjp``: dKV iterates Q
  tiles per KV tile, dQ iterates KV tiles per Q tile, both reusing the saved
  log-sum-exp residuals and the precomputed ``di = sum(o * do)``;
- masking is a per-key validity vector ``kv_mask [B, Skv]`` (what MMDiT's
  context attention masks need, reference mmdit.py:192-200) applied as an
  additive ``-0.7 * float_max`` (not -inf, to avoid exp(-inf - -inf) NaNs);
  fully-masked rows are detected via the running max and produce zero output
  AND zero gradients (their stored lse is +inf, so the backward's
  ``p = exp(s - lse)`` vanishes).

Layout: q [B, H, Sq, D], k/v [B, H, Skv, D]. Sequence lengths must be padded
to the block size by the caller (diffulab_tpu.ops.attention does this).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
MIN_BLOCK = 128


# fp32 working-set budget per grid step (q/k/v tiles + the block_q x block_k
# score matrix + m/l/acc scratch). Measured on v5e at d=64: 512x2304 compiles,
# 512x4608 and 1536x1536 fail in the Mosaic compiler -> ~8 MB is the usable cap.
VMEM_BUDGET_FLOATS = 2_000_000


def _divisor_block(n: int, cap: int) -> int:
    """Largest multiple of MIN_BLOCK that divides ``n`` and is <= ``cap``
    (falls back to power-of-two halving for non-128-multiple lengths)."""
    cap = max(MIN_BLOCK, (min(cap, n) // MIN_BLOCK) * MIN_BLOCK)
    if n % MIN_BLOCK == 0:
        for c in range(cap, MIN_BLOCK - 1, -MIN_BLOCK):
            if n % c == 0:
                return c
    b = min(cap, n)
    while n % b:
        b //= 2
    return max(b, 1)


def _block_sizes(sq: int, skv: int, block_q: int, block_k: int, d: int) -> tuple[int, int]:
    """Tile sizes <= requested that divide the (padded) lengths.

    Autotuned on v5e (d=64, 4608 tokens, fwd+bwd): 512x512 is ~3.2x faster
    than 128x128, and widening block_k to 1536 is another 1.25x (fewer
    full-pass K/V re-reads per Q tile); beyond ~2304 the working set blows
    VMEM. block_k is therefore the largest divisor within the VMEM budget;
    non-power-of-two divisors (384, 768, 1536...) are valid Mosaic tiles as
    long as they are multiples of the 128 lane width."""
    bq = _divisor_block(sq, block_q)
    bound = (VMEM_BUDGET_FLOATS - bq * (2 * d + 2 * MIN_BLOCK)) // (bq + 2 * d)
    bk = _divisor_block(skv, min(block_k, max(bound, MIN_BLOCK)))
    return bq, bk


# --------------------------------------------------------------------------- #
# Forward
# --------------------------------------------------------------------------- #


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *, sm_scale, n_kv):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]  # [block_q, d]
    k = k_ref[0, 0]  # [block_k, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [block_q, block_k]
    s *= sm_scale

    if mask_ref is not None:
        mask = mask_ref[0] != 0  # [1, block_k] -> broadcast rows
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

    # Stats are lane-replicated [block_q, LANES] per the TPU T(8,128) layout.
    m_prev = m_scr[...]
    l_prev = l_scr[...]
    m_curr = jnp.max(s, axis=-1, keepdims=True)  # [block_q, 1]
    m_next = jnp.maximum(m_prev, m_curr)  # [block_q, LANES]
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])  # [block_q, block_k]
    l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    m_scr[...] = m_next
    l_scr[...] = l_next

    v = v_ref[0, 0]  # [block_k, d]
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        l_final = l_scr[:, :1]
        m_final = m_scr[:, :1]
        l_safe = jnp.where(l_final == 0.0, 1.0, l_final)
        o = acc_scr[...] / l_safe
        lse = m_final + jnp.log(l_safe)
        if mask_ref is not None:
            # A fully-masked row has every score pinned at DEFAULT_MASK_VALUE
            # (the additive mask is finite, so p=1 per key and l=Skv — the
            # l==0 branch never fires). Detect it via the running max and
            # force o=0; lse=+inf makes the backward's p=exp(s-lse) exactly 0
            # so dq/dk/dv contributions from these rows vanish too.
            fully_masked = m_final <= DEFAULT_MASK_VALUE
            o = jnp.where(fully_masked, 0.0, o)
            lse = jnp.where(fully_masked, jnp.inf, lse)
        o_ref[0, 0] = o.astype(o_ref.dtype)
        lse_ref[0, 0] = lse


def _flash_forward(q, k, v, kv_mask, sm_scale, block_q, block_k, interpret):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    block_q, block_k = _block_sizes(sq, skv, block_q, block_k, d)
    assert sq % block_q == 0 and skv % block_k == 0, (sq, skv, block_q, block_k)
    n_q, n_kv = sq // block_q, skv // block_k
    grid = (b, h, n_q, n_kv)

    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
    ]
    args = [q, k, v]
    if kv_mask is not None:
        in_specs.append(pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki)))
        args.append(kv_mask.astype(jnp.int32)[:, None, :])
        kernel = functools.partial(_fwd_kernel, sm_scale=sm_scale, n_kv=n_kv)
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr):
            _fwd_kernel(
                q_ref, k_ref, v_ref, None, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                sm_scale=sm_scale, n_kv=n_kv,
            )

    out_shape = [
        jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        jax.ShapeDtypeStruct((b, h, sq, 1), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
    ]
    scratch_shapes = [
        pltpu.VMEM((block_q, MIN_BLOCK), jnp.float32),
        pltpu.VMEM((block_q, MIN_BLOCK), jnp.float32),
        pltpu.VMEM((block_q, d), jnp.float32),
    ]
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    return o, lse


# --------------------------------------------------------------------------- #
# Backward
# --------------------------------------------------------------------------- #


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, mask_ref, dk_ref, dv_ref,
                    dk_scr, dv_scr, *, sm_scale, n_q):
    q_idx = pl.program_id(3)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0, 0]          # [block_q, d]
    k = k_ref[0, 0]          # [block_k, d]
    v = v_ref[0, 0]
    do = do_ref[0, 0]        # [block_q, d]
    lse = lse_ref[0, 0]      # [block_q, 1]
    di = di_ref[0, 0]        # [block_q, 1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s *= sm_scale
    if mask_ref is not None:
        mask = mask_ref[0] != 0
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    p = jnp.exp(s - lse)  # [block_q, block_k]

    # dv += P^T @ dO
    dv_scr[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dP = dO @ V^T ; dS = P * (dP - di) * scale
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - di) * sm_scale
    # dk += dS^T @ Q
    dk_scr[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(q_idx == n_q - 1)
    def _store():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, mask_ref, dq_ref, dq_scr,
                   *, sm_scale, n_kv):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0]
    di = di_ref[0, 0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s *= sm_scale
    if mask_ref is not None:
        mask = mask_ref[0] != 0
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - di) * sm_scale
    dq_scr[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _flash_backward(q, k, v, kv_mask, o, lse, do, sm_scale, block_q, block_k, interpret):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    block_q, block_k = _block_sizes(sq, skv, block_q, block_k, d)
    n_q, n_kv = sq // block_q, skv // block_k

    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1, keepdims=True)  # [B,H,Sq,1]

    has_mask = kv_mask is not None
    mask_arg = [kv_mask.astype(jnp.int32)[:, None, :]] if has_mask else []

    # --- dKV: grid (B, H, n_kv, n_q), accumulate over q tiles -------------
    dkv_in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, ki, qi: (bi, hi, qi, 0)),  # q
        pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0)),  # k
        pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0)),  # v
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, ki, qi: (bi, hi, qi, 0)),  # do
        pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, ki, qi: (bi, hi, qi, 0)),   # lse
        pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, ki, qi: (bi, hi, qi, 0)),   # di
    ]
    if has_mask:
        dkv_in_specs.append(pl.BlockSpec((1, 1, block_k), lambda bi, hi, ki, qi: (bi, 0, ki)))
        dkv_kernel = functools.partial(_bwd_dkv_kernel, sm_scale=sm_scale, n_q=n_q)
    else:
        def dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dk_ref, dv_ref, dk_scr, dv_scr):
            _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, None,
                            dk_ref, dv_ref, dk_scr, dv_scr, sm_scale=sm_scale, n_q=n_q)

    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b, h, n_kv, n_q),
        in_specs=dkv_in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, di, *mask_arg)

    # --- dQ: grid (B, H, n_q, n_kv), accumulate over kv tiles --------------
    dq_in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),  # q
        pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),  # k
        pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),  # v
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),  # do
        pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),   # lse
        pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),   # di
    ]
    if has_mask:
        dq_in_specs.append(pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki)))
        dq_kernel = functools.partial(_bwd_dq_kernel, sm_scale=sm_scale, n_kv=n_kv)
    else:
        def dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref, dq_scr):
            _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, None,
                           dq_ref, dq_scr, sm_scale=sm_scale, n_kv=n_kv)

    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, h, n_q, n_kv),
        in_specs=dq_in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, di, *mask_arg)

    return dq, dk, dv


# --------------------------------------------------------------------------- #
# custom_vjp wrapper
# --------------------------------------------------------------------------- #


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: jax.Array | None = None,
    sm_scale: float | None = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention. q [B,H,Sq,D], k/v [B,H,Skv,D], kv_mask [B,Skv] bool.

    Sq/Skv must be multiples of the (possibly clamped) block sizes; use
    :mod:`diffulab_tpu.ops.attention` for automatic padding + dispatch.
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    o, _ = _flash_forward(q, k, v, kv_mask, sm_scale, block_q, block_k, interpret)
    return o


def _flash_fwd_rule(q, k, v, kv_mask, sm_scale, block_q, block_k, interpret):
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    o, lse = _flash_forward(q, k, v, kv_mask, sm_scale, block_q, block_k, interpret)
    return o, (q, k, v, kv_mask, o, lse)


def _flash_bwd_rule(sm_scale, block_q, block_k, interpret, residuals, do):
    q, k, v, kv_mask, o, lse = residuals
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    dq, dk, dv = _flash_backward(q, k, v, kv_mask, o, lse, do, sm_scale, block_q, block_k, interpret)
    return dq, dk, dv, None


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)
