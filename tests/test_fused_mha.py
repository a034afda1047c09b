"""Fused short-seq MHA kernel vs XLA SDPA (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from diffulab_tpu.ops.attention import _fused_path, _xla_path, use_fused
from diffulab_tpu.ops.fused_mha import FUSED_VMEM_BUDGET, fused_vmem_bytes

fused_interp = functools.partial(_fused_path, interpret=True)


def _rand_qkv(key, b=2, sq=128, skv=128, h=4, d=64, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    return (
        jax.random.normal(kq, (b, sq, h, d), dtype),
        jax.random.normal(kk, (b, skv, h, d), dtype),
        jax.random.normal(kv, (b, skv, h, d), dtype),
    )


def test_forward_matches_xla():
    q, k, v = _rand_qkv(jax.random.key(0))
    np.testing.assert_allclose(
        np.asarray(fused_interp(q, k, v, None, None)),
        np.asarray(_xla_path(q, k, v, None, None)), atol=2e-5, rtol=2e-5,
    )


def test_forward_with_kv_mask():
    q, k, v = _rand_qkv(jax.random.key(1), skv=256)
    kv_mask = jnp.arange(256)[None, :] < jnp.array([[200], [77]])
    np.testing.assert_allclose(
        np.asarray(fused_interp(q, k, v, kv_mask, None)),
        np.asarray(_xla_path(q, k, v, kv_mask, None)), atol=2e-5, rtol=2e-5,
    )


def test_unaligned_lengths_padded():
    q, k, v = _rand_qkv(jax.random.key(2), sq=100, skv=300)
    out = fused_interp(q, k, v, None, None)
    assert out.shape == (2, 100, 4, 64)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_xla_path(q, k, v, None, None)), atol=2e-5, rtol=2e-5,
    )


def test_cross_attention():
    q, k, v = _rand_qkv(jax.random.key(3), sq=256, skv=128)
    np.testing.assert_allclose(
        np.asarray(fused_interp(q, k, v, None, None)),
        np.asarray(_xla_path(q, k, v, None, None)), atol=2e-5, rtol=2e-5,
    )


def test_gradients_match_xla():
    q, k, v = _rand_qkv(jax.random.key(4), b=1, sq=128, skv=128, h=2)
    kv_mask = jnp.arange(128)[None, :] < jnp.array([[90]])
    gf = jax.grad(lambda *a: (fused_interp(*a, kv_mask, None) ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda *a: (_xla_path(*a, kv_mask, None) ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        # the backward recomputes p from the saved lse (a different rounding
        # path than XLA's saved softmax) — tolerance covers that
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3)


def test_fully_masked_rows_zero_output_and_grads():
    q, k, v = _rand_qkv(jax.random.key(5), b=2, sq=128, skv=128, h=2)
    kv_mask = jnp.stack([jnp.zeros(128, bool), jnp.ones(128, bool)])
    out = fused_interp(q, k, v, kv_mask, None)
    np.testing.assert_array_equal(np.asarray(out[0]), 0.0)
    gq, gk, gv = jax.grad(
        lambda *a: (fused_interp(*a, kv_mask, None) ** 2).sum(), argnums=(0, 1, 2)
    )(q, k, v)
    np.testing.assert_array_equal(np.asarray(gq[0]), 0.0)
    np.testing.assert_array_equal(np.asarray(gk[0]), 0.0)
    np.testing.assert_array_equal(np.asarray(gv[0]), 0.0)


def test_bf16_forward():
    q, k, v = _rand_qkv(jax.random.key(6), dtype=jnp.bfloat16)
    out = fused_interp(q, k, v, None, None)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32),
        np.asarray(_xla_path(q, k, v, None, None), np.float32), atol=3e-2, rtol=3e-2,
    )


def test_dispatch_vmem_gate():
    # DiT-B/2 shape fits; an 8k-token shape must NOT use the fused kernel
    assert fused_vmem_bytes(256, 256, 12, 64) <= FUSED_VMEM_BUDGET
    assert fused_vmem_bytes(8192, 8192, 12, 64) > FUSED_VMEM_BUDGET
    assert not use_fused((2, 8192, 12, 64), 8192, backend="tpu")
    assert not use_fused((2, 256, 12, 64), 256, backend="cpu")
    assert use_fused((64, 256, 12, 64), 256, backend="tpu")
