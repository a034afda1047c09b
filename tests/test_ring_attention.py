"""Ring attention vs single-device full attention on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffulab_tpu.ops.attention import _xla_path
from diffulab_tpu.ops.ring_attention import sequence_parallel_attention


def _mesh_1d(name="sp"):
    return Mesh(np.asarray(jax.devices()).reshape(-1), (name,))


def test_ring_matches_full_attention():
    mesh = _mesh_1d()
    B, S, H, D = 2, 64, 4, 16  # S/8 = 8 tokens per shard
    q = jax.random.normal(jax.random.key(0), (B, S, H, D))
    k = jax.random.normal(jax.random.key(1), (B, S, H, D))
    v = jax.random.normal(jax.random.key(2), (B, S, H, D))

    ring = sequence_parallel_attention(mesh, axis="sp")
    with mesh:
        out_ring = ring(q, k, v)
    out_full = _xla_path(q, k, v, None, None)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_full), atol=2e-5, rtol=2e-5)


def test_ring_with_kv_mask():
    mesh = _mesh_1d()
    B, S, H, D = 2, 64, 2, 8
    q = jax.random.normal(jax.random.key(0), (B, S, H, D))
    k = jax.random.normal(jax.random.key(1), (B, S, H, D))
    v = jax.random.normal(jax.random.key(2), (B, S, H, D))
    kv_mask = jnp.arange(S)[None, :] < jnp.array([[40], [64]])

    ring = sequence_parallel_attention(mesh, axis="sp")
    with mesh:
        out_ring = ring(q, k, v, kv_mask=kv_mask)
    out_full = _xla_path(q, k, v, kv_mask, None)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_full), atol=2e-5, rtol=2e-5)


def test_ring_under_jit_with_sharded_inputs():
    mesh = _mesh_1d()
    B, S, H, D = 2, 64, 2, 8
    sh = NamedSharding(mesh, P(None, "sp", None, None))
    q = jax.device_put(jax.random.normal(jax.random.key(0), (B, S, H, D)), sh)
    k = jax.device_put(jax.random.normal(jax.random.key(1), (B, S, H, D)), sh)
    v = jax.device_put(jax.random.normal(jax.random.key(2), (B, S, H, D)), sh)
    ring = sequence_parallel_attention(mesh, axis="sp")
    with mesh:
        out = jax.jit(lambda q, k, v: ring(q, k, v))(q, k, v)
    out_full = _xla_path(q, k, v, None, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_full), atol=2e-5, rtol=2e-5)


def test_ring_grads_match():
    mesh = _mesh_1d()
    B, S, H, D = 1, 32, 2, 8
    q = jax.random.normal(jax.random.key(0), (B, S, H, D))
    k = jax.random.normal(jax.random.key(1), (B, S, H, D))
    v = jax.random.normal(jax.random.key(2), (B, S, H, D))
    ring = sequence_parallel_attention(mesh, axis="sp")

    with mesh:
        g_ring = jax.grad(lambda *a: (ring(*a) ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(lambda *a: (_xla_path(*a, None, None) ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5)
