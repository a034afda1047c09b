"""Multi-device sharding tests on the virtual 8-CPU mesh (SURVEY.md §4:
per-device grads must match single-device math — the property DDP gives the
reference implicitly)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx
from jax.sharding import Mesh, PartitionSpec as P

from diffulab_tpu.diffuse import Diffuser
from diffulab_tpu.networks.denoisers.mmdit import MMDiT
from diffulab_tpu.parallel.mesh import MeshConfig, make_mesh
from diffulab_tpu.parallel.sharding import batch_sharding, get_param_shardings, replicated


def _model_and_data(seed=0, batch=16):
    model = MMDiT(
        simple_dit=True, input_channels=4, inner_dim=64, embedding_dim=64, num_heads=4,
        mlp_ratio=2, patch_size=2, depth=2, n_classes=10, classifier_free=True,
        rngs=nnx.Rngs(seed),
    )
    rng = jax.random.key(seed)
    x0 = jax.random.normal(rng, (batch, 8, 8, 4))
    y = jax.random.randint(jax.random.key(seed + 1), (batch,), 0, 10)
    return model, x0, y


def _loss_fn_builder(graphdef, rest, diffusion):
    def loss_fn(params, x0, y, rng):
        m = nnx.merge(graphdef, params, rest)
        t_rng, n_rng = jax.random.split(rng)
        t = diffusion.draw_timesteps(t_rng, x0.shape[0])
        noise = jax.random.normal(n_rng, x0.shape)
        return diffusion.compute_loss(
            lambda **kw: m(**kw), x0, {"y": y}, t, noise
        )["loss"]

    return loss_fn


def test_mesh_config_resolution():
    assert MeshConfig(data=-1, fsdp=2, tensor=2).resolve(8) == (2, 2, 2, 1, 1, 1)
    assert MeshConfig(data=8).resolve(8) == (8, 1, 1, 1, 1, 1)
    mesh = make_mesh(MeshConfig(data=4, fsdp=2, tensor=1))
    assert dict(mesh.shape) == {"data": 4, "fsdp": 2, "tensor": 1, "sp": 1, "expert": 1, "pipe": 1}


def test_param_shardings_follow_logical_rules():
    model, _, _ = _model_and_data()
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    _, params, _ = nnx.split(model, nnx.Param, ...)
    sh = get_param_shardings(params, mesh)
    flat = dict(jax.tree_util.tree_flatten_with_path(sh)[0][0:0])  # noqa: F841
    leaves = jax.tree_util.tree_leaves_with_path(sh)
    qkv = [s for path, s in leaves if "qkv" in str(path) and "kernel" in str(path)]
    assert qkv, "qkv kernels must be present"
    for s in qkv:
        assert s.spec == P("fsdp", "tensor")  # embed -> fsdp, hidden -> tensor
    bias_or_norm = [s for path, s in leaves if "scale" in str(path)]
    for s in bias_or_norm:
        assert s.spec == P()  # norms replicated


def test_sharded_grads_match_single_device():
    """The core DDP-parity property: grads on a dp2 x fsdp2 x tp2 mesh equal
    single-device grads for the same global batch."""
    model, x0, y = _model_and_data()
    diffuser = Diffuser(model, sampling_method="euler", model_type="rectified_flow", n_steps=4)
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    loss_fn = _loss_fn_builder(graphdef, rest, diffuser.diffusion)
    rng = jax.random.key(42)

    # single device (all replicated on a trivial mesh)
    grads_single = jax.jit(jax.grad(loss_fn))(params, x0, y, rng)
    loss_single = jax.jit(loss_fn)(params, x0, y, rng)

    # full 3-axis mesh
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    param_sh = get_param_shardings(params, mesh)
    params_sharded = jax.tree.map(jax.device_put, params, param_sh)
    x0_s = jax.device_put(x0, batch_sharding(mesh))
    y_s = jax.device_put(y, batch_sharding(mesh))
    with mesh:
        grads_sharded = jax.jit(jax.grad(loss_fn))(params_sharded, x0_s, y_s, rng)
        loss_sharded = jax.jit(loss_fn)(params_sharded, x0_s, y_s, rng)

    np.testing.assert_allclose(float(loss_single), float(loss_sharded), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(grads_single), jax.tree.leaves(grads_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_sharded_train_step_runs_and_updates():
    model, x0, y = _model_and_data()
    diffuser = Diffuser(model, sampling_method="euler", model_type="rectified_flow", n_steps=4)
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    loss_fn = _loss_fn_builder(graphdef, rest, diffuser.diffusion)
    optimizer = optax.adamw(1e-3)

    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    param_sh = get_param_shardings(params, mesh)
    params = jax.tree.map(jax.device_put, params, param_sh)
    opt_state = jax.device_put(optimizer.init(params), replicated(mesh))
    x0 = jax.device_put(x0, batch_sharding(mesh))
    y = jax.device_put(y, batch_sharding(mesh))

    @jax.jit
    def step(params, opt_state, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, x0, y, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    with mesh:
        losses = []
        for i in range(5):
            params, opt_state, loss = step(params, opt_state, jax.random.key(i))
            losses.append(float(loss))
    assert all(np.isfinite(v) for v in losses)
    assert losses[-1] < losses[0]  # learning on a sharded mesh


def test_profiling_step_timer():
    from diffulab_tpu.training.profiling import StepTimer

    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    stats = StepTimer(warmup=1).time_fn(f, x, n_iters=5)
    assert stats["mean_s"] > 0 and stats["p50_s"] > 0
