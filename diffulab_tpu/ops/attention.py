"""Attention dispatch: Pallas kernels on TPU, XLA SDPA elsewhere.

The models call one entry point, ``dot_product_attention(q, k, v, kv_mask)``,
with the reference's [B, S, H, D] layout (what SDPA receives after the qkv
reshape in reference mmdit.py:85-99). Dispatch rules (v5e-measured):

- short sequences (working set fits VMEM, DiT-scale 256-1024 tokens) -> the
  fused whole-softmax multi-head kernel (:mod:`diffulab_tpu.ops.fused_mha`),
  which keeps the [S, S] score matrix out of HBM entirely;
- long sequences -> the KV-tiled flash kernel
  (:mod:`diffulab_tpu.ops.flash_attention`);
- non-TPU backends (CPU tests) -> ``jax.nn.dot_product_attention`` (XLA).

Sequence lengths are auto-padded to block multiples with a synthesized
padding mask; padded query rows are sliced off. The choice can be forced
with ``impl=`` for A/B benchmarking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffulab_tpu.ops.flash_attention import MIN_BLOCK, flash_attention
from diffulab_tpu.ops.fused_mha import FUSED_VMEM_BUDGET, fused_mha, fused_vmem_bytes


def _pad_to(x: jax.Array, axis: int, target: int) -> jax.Array:
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


FLASH_MIN_SEQ = 1024


def use_flash(q_shape: tuple[int, ...], kv_len: int | None = None,
              backend: str | None = None) -> bool:
    """v5e measurements with the tuned 512x512 blocks: XLA SDPA wins below
    ~1k tokens (its fused short-seq path is excellent); flash wins above
    (1.2x at 1k, 1.5x at 4k, 13.5x at 8k, and XLA OOMs in backward beyond
    ~4k where flash runs fine). Head dim only needs lane alignment (the
    tile's trailing block equals the full head dim)."""
    backend = backend or jax.default_backend()
    head_dim = q_shape[-1]
    seq = max(q_shape[1], kv_len or 0)
    return (
        backend == "tpu"
        and head_dim % 8 == 0
        and head_dim <= 512
        and seq >= FLASH_MIN_SEQ
    )


def use_fused(q_shape: tuple[int, ...], kv_len: int, backend: str | None = None) -> bool:
    """Fused whole-softmax MHA: wins whenever its VMEM working set fits
    (v5e: 2.4x over XLA SDPA fwd+bwd at DiT-B/2's 256 tokens, and it removes
    the [B,H,S,S] HBM score round-trips that dominate short-seq attention)."""
    backend = backend or jax.default_backend()
    b, sq, h, d = q_shape
    sq_p = _round_up(sq, MIN_BLOCK)
    skv_p = _round_up(kv_len, MIN_BLOCK)
    return (
        backend == "tpu"
        and d % 8 == 0
        and fused_vmem_bytes(sq_p, skv_p, h, d) <= FUSED_VMEM_BUDGET
    )


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: jax.Array | None = None,
    scale: float | None = None,
    impl: str = "auto",
) -> jax.Array:
    """Bidirectional attention. q [B,Sq,H,D], k/v [B,Skv,H,D], kv_mask [B,Skv].

    Returns [B, Sq, H, D] in q's dtype.
    """
    assert impl in ("auto", "fused", "flash", "xla")
    if impl == "fused" or (impl == "auto" and use_fused(q.shape, k.shape[1])):
        return _fused_path(q, k, v, kv_mask, scale)
    if impl == "flash" or (impl == "auto" and use_flash(q.shape, k.shape[1])):
        return _flash_path(q, k, v, kv_mask, scale)
    return _xla_path(q, k, v, kv_mask, scale)


def _xla_path(q, k, v, kv_mask, scale):
    mask = None
    if kv_mask is not None:
        mask = kv_mask[:, None, None, :]  # [B,1,1,Skv] broadcast over heads+queries
    return jax.nn.dot_product_attention(q, k, v, mask=mask, scale=scale)


TUNED_BLOCK_Q = 512
TUNED_BLOCK_K = 1536  # v5e autotune at 4608 tokens: 1.25x over 512 (see flash_attention._block_sizes)
TUNED_BLOCK = TUNED_BLOCK_Q  # pad granularity


def _pad_target(s: int) -> int:
    """Pad to a multiple of the tuned 512 block once the sequence is at
    least one block long. 512x512 tiles are ~3.2x faster than the 128x128
    fallback, which dwarfs the padded work (worst case +33% at 1152->1536;
    e.g. 4224-token txt2img would otherwise silently run 128-blocks because
    4224 = 2^7 * 33 has no larger power-of-two divisor). Padded KV columns
    are masked; padded Q rows are sliced off."""
    return _round_up(s, TUNED_BLOCK if s >= TUNED_BLOCK else MIN_BLOCK)


def _fused_path(q, k, v, kv_mask, scale, interpret: bool = False):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    sq_p = _round_up(sq, MIN_BLOCK)
    skv_p = _round_up(skv, MIN_BLOCK)

    if kv_mask is None and skv_p != skv:
        kv_mask = jnp.ones((b, skv), dtype=bool)
    qp = _pad_to(q, 1, sq_p)
    kp = _pad_to(k, 1, skv_p)
    vp = _pad_to(v, 1, skv_p)
    maskp = _pad_to(kv_mask, 1, skv_p) if kv_mask is not None else None
    o = fused_mha(qp, kp, vp, maskp, scale, interpret)
    return o[:, :sq]


def _flash_path(q, k, v, kv_mask, scale, interpret: bool = False):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    sq_p = _pad_target(sq)
    skv_p = _pad_target(skv)

    if kv_mask is None and skv_p != skv:
        kv_mask = jnp.ones((b, skv), dtype=bool)
    qp = _pad_to(q, 1, sq_p)
    kp = _pad_to(k, 1, skv_p)
    vp = _pad_to(v, 1, skv_p)
    maskp = _pad_to(kv_mask, 1, skv_p) if kv_mask is not None else None

    # [B,S,H,D] -> [B,H,S,D]
    qp = jnp.swapaxes(qp, 1, 2)
    kp = jnp.swapaxes(kp, 1, 2)
    vp = jnp.swapaxes(vp, 1, 2)
    o = flash_attention(qp, kp, vp, maskp, scale, TUNED_BLOCK_Q, TUNED_BLOCK_K, interpret)
    o = jnp.swapaxes(o, 1, 2)
    return o[:, :sq]
