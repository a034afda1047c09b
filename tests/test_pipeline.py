"""Pipeline parallelism: GPipe-over-ppermute correctness on a virtual mesh.

Checks the pipelined execution is numerically identical to running the
same stacked layers sequentially, that gradients flow through the ring,
and that real DiT blocks (via stack_block_states) pipeline correctly.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax.sharding import Mesh

from diffulab_tpu.networks.denoisers.mmdit import DiTBlock
from diffulab_tpu.networks.nn import get_cos_sin_ndim_grid
from diffulab_tpu.parallel.pipeline import (
    pipeline_apply,
    stack_block_states,
    stage_sharding,
)


def _pipe_mesh(n=4):
    return Mesh(np.asarray(jax.devices()[:n]), ("pipe",))


def _toy_stage(layer_params, state):
    state = dict(state)
    state["x"] = jnp.tanh(state["x"] @ layer_params["w"] + layer_params["b"])
    return state


def _toy_params(layers=8, d=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(rng.normal(scale=0.3, size=(layers, d, d)), jnp.float32),
        "b": jnp.asarray(rng.normal(scale=0.1, size=(layers, d)), jnp.float32),
    }


def _sequential(params, x):
    for i in range(params["w"].shape[0]):
        x = _toy_stage(jax.tree.map(lambda a: a[i], params), {"x": x})["x"]
    return x


def test_pipeline_matches_sequential():
    mesh = _pipe_mesh(4)
    params = _toy_params(layers=8, d=16)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(12, 16)), jnp.float32)

    out = pipeline_apply(
        _toy_stage, params, {"x": x}, mesh=mesh, axis="pipe", n_microbatches=4
    )["x"]
    ref = _sequential(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pipeline_single_microbatch_and_uneven_fill():
    # M < S and M=1 exercise the bubble/clamping paths
    mesh = _pipe_mesh(4)
    params = _toy_params(layers=4, d=8)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 8)), jnp.float32)
    for m in (1, 2):
        out = pipeline_apply(
            _toy_stage, params, {"x": x}, mesh=mesh, axis="pipe", n_microbatches=m
        )["x"]
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_sequential(params, x)), rtol=2e-5, atol=2e-5
        )


def test_pipeline_gradients_match_sequential():
    mesh = _pipe_mesh(4)
    params = _toy_params(layers=8, d=8)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(8, 8)), jnp.float32)

    def loss_pipe(p):
        y = pipeline_apply(
            _toy_stage, p, {"x": x}, mesh=mesh, axis="pipe", n_microbatches=4
        )["x"]
        return jnp.sum(y**2)

    def loss_seq(p):
        return jnp.sum(_sequential(p, x) ** 2)

    g_pipe = jax.jit(jax.grad(loss_pipe))(params)
    g_seq = jax.grad(loss_seq)(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        g_pipe,
        g_seq,
    )


def test_dit_blocks_pipeline():
    """Real adaLN DiT blocks, stacked + staged over a 4-way pipe axis."""
    mesh = _pipe_mesh(4)
    inner, heads, depth = 32, 2, 4
    rope_axes = (8, 8)

    def make_block(rngs):
        return DiTBlock(inner, inner, heads, 2, rope_axes, rngs=rngs)

    graphdef, stacked = stack_block_states(make_block, depth, seed=0)
    stacked = jax.device_put(stacked, stage_sharding(stacked, mesh))

    b, s = 8, 16
    key = jax.random.key(0)
    x = jax.random.normal(key, (b, s, inner))
    y = jax.random.normal(jax.random.fold_in(key, 1), (b, inner))
    side = int(s**0.5)
    pos = jnp.stack(
        jnp.meshgrid(jnp.arange(side), jnp.arange(side), indexing="ij"), axis=-1
    ).reshape(1, s, 2)
    cos, sin = get_cos_sin_ndim_grid(jnp.tile(pos, (b, 1, 1)), 10_000.0, rope_axes)

    def stage_fn(layer_state, state):
        block = nnx.merge(graphdef, layer_state)
        state = dict(state)
        state["x"] = block(state["x"], state["y"], (state["cos"], state["sin"]))
        return state

    inputs = {"x": x, "y": y, "cos": cos, "sin": sin}
    out = pipeline_apply(
        stage_fn, stacked, inputs, mesh=mesh, axis="pipe", n_microbatches=2
    )["x"]

    # sequential reference: merge each layer slice and apply in order
    ref = x
    for i in range(depth):
        layer = jax.tree.map(lambda a: a[i], stacked)
        ref = nnx.merge(graphdef, layer)(ref, y, (cos, sin))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_pipeline_rejects_bad_divisibility():
    mesh = _pipe_mesh(4)
    params = _toy_params(layers=6, d=8)  # 6 % 4 != 0
    x = jnp.zeros((8, 8))
    try:
        pipeline_apply(_toy_stage, params, {"x": x}, mesh=mesh, n_microbatches=2)
        raise RuntimeError("should have raised")
    except ValueError as e:
        assert "divisible" in str(e)


def test_pipeline_composes_with_second_mesh_axis():
    """Pipe stages on a 2-D (pipe, tensor) mesh: stage params replicated over
    the tensor axis still pipeline correctly (composability with tp/fsdp)."""
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("pipe", "tensor"))
    params = _toy_params(layers=8, d=16)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(8, 16)), jnp.float32)
    out = pipeline_apply(
        _toy_stage, params, {"x": x}, mesh=mesh, axis="pipe", n_microbatches=4
    )["x"]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_sequential(params, x)), rtol=2e-5, atol=2e-5
    )
