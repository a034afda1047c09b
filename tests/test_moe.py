"""Expert parallelism: all-to-all MoE vs a dense per-token reference."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax.sharding import Mesh

from diffulab_tpu.parallel.moe import ExpertMlp, expert_parallel_mlp, route_top1


def _mesh(n=4):
    return Mesh(np.asarray(jax.devices()[:n]), ("expert",))


def _dense_reference(mlp: ExpertMlp, x: np.ndarray) -> np.ndarray:
    """Route each token to its argmax expert at full precision, no capacity."""
    w_gate = np.asarray(mlp.w_gate[...], np.float32)
    w_in = np.asarray(mlp.w_in[...], np.float32)
    w_out = np.asarray(mlp.w_out[...], np.float32)
    xt = x.reshape(-1, x.shape[-1]).astype(np.float32)
    logits = xt @ w_gate
    gates = np.asarray(jax.nn.softmax(logits, axis=-1))
    expert = logits.argmax(-1)
    out = np.zeros_like(xt)
    for i, (tok, e) in enumerate(zip(xt, expert)):
        h = np.asarray(jax.nn.gelu(tok @ w_in[e]))
        out[i] = gates[i, e] * (h @ w_out[e])
    return out.reshape(x.shape)


def test_route_top1_shapes_and_capacity():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(6, 2)), jnp.float32)
    dispatch, combine = route_top1(logits, capacity=2)
    assert dispatch.shape == (6, 2, 2)
    # each token occupies at most one slot; each (expert, slot) holds <= 1 token
    assert float(dispatch.sum(axis=(1, 2)).max()) <= 1.0
    assert float(dispatch.sum(axis=0).max()) <= 1.0
    # combine weights are the softmax gate of the kept tokens
    kept = np.asarray(dispatch.sum(axis=(1, 2)) > 0)
    gates = np.asarray(jax.nn.softmax(logits, -1).max(-1))
    np.testing.assert_allclose(
        np.asarray(combine.sum(axis=(1, 2)))[kept], gates[kept], rtol=1e-6
    )


def test_expert_parallel_matches_dense():
    mesh = _mesh(4)
    mlp = ExpertMlp(8, 16, 32, rngs=nnx.Rngs(0))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 8, 16)), jnp.float32)
    # capacity_factor = n_experts -> capacity == local token count -> no drops
    y, aux = jax.jit(
        lambda x: expert_parallel_mlp(mlp, x, mesh=mesh, capacity_factor=8.0)
    )(x)
    ref = _dense_reference(mlp, np.asarray(x))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-4, atol=2e-4)
    assert 0.0 <= float(aux["gate_entropy"]) <= np.log(8) + 1e-5
    # load-balance loss is >= 1 (== 1 only at perfectly uniform routing)
    assert float(aux["load_balance_loss"]) >= 1.0 - 1e-5


def test_expert_parallel_gradients_finite():
    mesh = _mesh(4)
    mlp = ExpertMlp(4, 8, 16, rngs=nnx.Rngs(0))
    graphdef, params = nnx.split(mlp)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 4, 8)), jnp.float32)

    def loss(params, x):
        m = nnx.merge(graphdef, params)
        y, aux = expert_parallel_mlp(m, x, mesh=mesh, capacity_factor=4.0)
        # include the aux loss so router grads flow too
        return jnp.sum(y**2) + 1e-2 * aux["load_balance_loss"]

    g = jax.jit(jax.grad(loss))(params, x)
    leaves = jax.tree.leaves(g)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # expert weights actually receive gradient (tokens reached the FFNs)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_expert_parallel_capacity_drops_pass_through():
    """With capacity 1 slot per expert, over-capacity tokens get zero output
    (residual-only) rather than wrong values."""
    mesh = _mesh(4)
    mlp = ExpertMlp(4, 8, 16, rngs=nnx.Rngs(3))
    x = jnp.asarray(np.random.default_rng(3).normal(size=(4, 8, 8)), jnp.float32)
    y, _ = jax.jit(
        lambda x: expert_parallel_mlp(mlp, x, mesh=mesh, capacity_factor=0.5)
    )(x)
    ref = _dense_reference(mlp, np.asarray(x))
    yf = np.asarray(y).reshape(-1, 8)
    rf = ref.reshape(-1, 8)
    # every token's output is either the dense value or exactly zero
    zero = np.abs(yf).sum(-1) < 1e-6
    np.testing.assert_allclose(yf[~zero], rf[~zero], rtol=2e-4, atol=2e-4)
    assert zero.any(), "capacity 0.5 should drop some tokens"
