"""Product-surface pipeline parallelism: MMDiT block stack over a 'pipe'
mesh axis (configs/train_cifar10_pipeline.yaml path), validated against the
sequential forward and through gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from diffulab_tpu.networks.denoisers.mmdit import MMDiT
from diffulab_tpu.parallel.mesh import MeshConfig, make_mesh


def _model(pipeline_microbatches=None):
    return MMDiT(
        simple_dit=True, input_channels=3, inner_dim=32, embedding_dim=32,
        num_heads=4, mlp_ratio=2, patch_size=2, depth=4, n_classes=10,
        classifier_free=True, pipeline_microbatches=pipeline_microbatches,
        rngs=nnx.Rngs(0),
    )


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_mmdit_pipeline_matches_sequential():
    mesh = make_mesh(MeshConfig(data=2, pipe=4))
    seq_model = _model()
    pp_model = _model(pipeline_microbatches=2)
    pp_model.set_parallel_mesh(mesh)

    x = jax.random.normal(jax.random.key(1), (8, 8, 8, 3))
    t = jnp.linspace(0.1, 0.9, 8)
    y = jnp.arange(8) % 10

    ref = seq_model(x, t, cond={"y": y})["x"]
    with mesh:
        out = jax.jit(lambda x, t, y: pp_model(x, t, cond={"y": y})["x"])(x, t, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_mmdit_pipeline_grads_match_sequential():
    mesh = make_mesh(MeshConfig(data=2, pipe=4))
    seq_model = _model()
    pp_model = _model(pipeline_microbatches=2)
    pp_model.set_parallel_mesh(mesh)

    x = jax.random.normal(jax.random.key(2), (4, 8, 8, 3))
    t = jnp.linspace(0.1, 0.9, 4)
    y = jnp.arange(4) % 10

    def loss(model, x, t, y):
        return jnp.mean(model(x, t, cond={"y": y})["x"] ** 2)

    g_ref = nnx.grad(loss)(seq_model, x, t, y)
    with mesh:
        g_pp = jax.jit(nnx.grad(loss))(pp_model, x, t, y)

    ref_leaves = jax.tree.leaves(g_ref)
    pp_leaves = jax.tree.leaves(g_pp)
    assert len(ref_leaves) == len(pp_leaves)
    for a, b in zip(ref_leaves, pp_leaves):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5, rtol=5e-4)
