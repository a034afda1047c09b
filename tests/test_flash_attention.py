"""Flash-attention kernel vs XLA SDPA reference (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffulab_tpu.ops.attention import _flash_path, _xla_path, dot_product_attention


def _rand_qkv(key, b=2, sq=256, skv=256, h=4, d=64, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, sq, h, d), dtype)
    k = jax.random.normal(kk, (b, skv, h, d), dtype)
    v = jax.random.normal(kv, (b, skv, h, d), dtype)
    return q, k, v


flash_interp = functools.partial(_flash_path, interpret=True)


def test_forward_matches_xla():
    q, k, v = _rand_qkv(jax.random.key(0))
    out_flash = flash_interp(q, k, v, None, None)
    out_xla = _xla_path(q, k, v, None, None)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_xla), atol=2e-5, rtol=2e-5)


def test_forward_with_kv_mask():
    q, k, v = _rand_qkv(jax.random.key(1), skv=256)
    kv_mask = jnp.arange(256)[None, :] < jnp.array([[200], [77]])
    out_flash = flash_interp(q, k, v, kv_mask, None)
    out_xla = _xla_path(q, k, v, kv_mask, None)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_xla), atol=2e-5, rtol=2e-5)


def test_forward_unaligned_lengths_padded():
    q, k, v = _rand_qkv(jax.random.key(2), sq=100, skv=300)
    out_flash = flash_interp(q, k, v, None, None)
    out_xla = _xla_path(q, k, v, None, None)
    assert out_flash.shape == (2, 100, 4, 64)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_xla), atol=2e-5, rtol=2e-5)


def test_cross_attention_shapes():
    q, k, v = _rand_qkv(jax.random.key(3), sq=256, skv=128)
    out = flash_interp(q, k, v, None, None)
    assert out.shape == (2, 256, 4, 64)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_xla_path(q, k, v, None, None)), atol=2e-5, rtol=2e-5
    )


def test_gradients_match_xla():
    q, k, v = _rand_qkv(jax.random.key(4), b=1, sq=128, skv=128, h=2, d=64)

    def loss_flash(q, k, v):
        return (flash_interp(q, k, v, None, None) ** 2).sum()

    def loss_xla(q, k, v):
        return (_xla_path(q, k, v, None, None) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4)


def test_gradients_with_mask_match_xla():
    q, k, v = _rand_qkv(jax.random.key(5), b=2, sq=128, skv=128, h=2, d=64)
    kv_mask = jnp.arange(128)[None, :] < jnp.array([[90], [128]])

    gf = jax.grad(lambda *a: (flash_interp(*a, kv_mask, None) ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda *a: (_xla_path(*a, kv_mask, None) ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4)


def test_scale_override():
    q, k, v = _rand_qkv(jax.random.key(6), sq=128, skv=128)
    out_flash = flash_interp(q, k, v, None, 0.5)
    out_xla = _xla_path(q, k, v, None, 0.5)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_xla), atol=2e-5, rtol=2e-5)


def test_dispatch_uses_xla_on_cpu():
    q, k, v = _rand_qkv(jax.random.key(7), sq=64, skv=64)
    out = dot_product_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_xla_path(q, k, v, None, None)), atol=1e-6
    )


@pytest.mark.parametrize("dtype", [jnp.bfloat16])
def test_bf16_forward(dtype):
    q, k, v = _rand_qkv(jax.random.key(8), sq=128, skv=128, dtype=dtype)
    out_flash = flash_interp(q, k, v, None, None)
    out_xla = _xla_path(q, k, v, None, None)
    assert out_flash.dtype == dtype
    np.testing.assert_allclose(
        np.asarray(out_flash, np.float32), np.asarray(out_xla, np.float32), atol=3e-2, rtol=3e-2
    )


def test_padding_to_tuned_block_matches_xla():
    """Sequences >= 512 pad to a 512 multiple (not just 128): numerics must
    be unaffected — padded KV columns are masked, padded Q rows sliced off."""
    key = jax.random.key(7)
    q = jax.random.normal(key, (1, 600, 2, 16))  # 600 -> padded to 1024
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 600, 2, 16))
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 600, 2, 16))
    out = flash_interp(q, k, v, None, None)
    ref = _xla_path(q, k, v, None, None)
    assert out.shape == (1, 600, 2, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_fully_masked_rows_zero_output_and_grads():
    """A batch row whose kv_mask is all-False must produce exactly zero output
    and contribute zero gradient everywhere (the additive finite mask would
    otherwise leak mean(V) through those rows)."""
    q, k, v = _rand_qkv(jax.random.key(9), b=2, sq=128, skv=128, h=2, d=64)
    kv_mask = jnp.stack([jnp.zeros(128, bool), jnp.ones(128, bool)])  # row 0 fully masked

    out = flash_interp(q, k, v, kv_mask, None)
    np.testing.assert_array_equal(np.asarray(out[0]), 0.0)
    # unmasked row matches XLA
    ref = _xla_path(q, k, v, kv_mask, None)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]), atol=2e-5, rtol=2e-5)

    gq, gk, gv = jax.grad(
        lambda *a: (flash_interp(*a, kv_mask, None) ** 2).sum(), argnums=(0, 1, 2)
    )(q, k, v)
    np.testing.assert_array_equal(np.asarray(gq[0]), 0.0)
    np.testing.assert_array_equal(np.asarray(gk[0]), 0.0)
    np.testing.assert_array_equal(np.asarray(gv[0]), 0.0)
    assert np.isfinite(np.asarray(gq)).all()
