"""UNet architecture tests at tiny dims (configs/model/unet.yaml scale-down)."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from diffulab_tpu.networks.denoisers.unet import UNetModel
from diffulab_tpu.networks.embedders.precomputed import PrecomputedEmbedder


def _tiny_unet(**kw):
    args = dict(
        image_size=[16, 16], in_channels=1, model_channels=32, out_channels=1,
        num_res_blocks=1, attention_resolutions=[4], num_heads=2,
        channel_mult="1, 2", resblock_updown=True, use_scale_shift_norm=True,
        n_classes=10, classifier_free=True, rngs=nnx.Rngs(0),
    )
    args.update(kw)
    return UNetModel(**args)


def test_unet_shapes_class_conditional():
    model = _tiny_unet()
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 1))
    out = model(x, jnp.array([10, 500]), cond={"y": jnp.array([1, 2])})
    assert out["x"].shape == (2, 16, 16, 1)
    assert np.isfinite(np.asarray(out["x"])).all()


def test_unet_output_zero_at_init():
    """zero-init final conv -> output exactly zero at init (guided-diffusion)."""
    model = _tiny_unet()
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 1))
    out = model(x, jnp.array([10, 500]), cond={"y": jnp.array([1, 2])})
    np.testing.assert_allclose(np.asarray(out["x"]), 0.0)


def test_unet_separate_updown_path():
    model = _tiny_unet(resblock_updown=False)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 1))
    out = model(x, jnp.array([0, 1]), cond={"y": jnp.array([0, 1])})
    assert out["x"].shape == (2, 16, 16, 1)


def test_unet_with_text_context():
    embedder = PrecomputedEmbedder(
        null_embedding=np.zeros((6, 32), np.float32), null_embedding_seq_len=3,
    )
    model = _tiny_unet(n_classes=None, context_embedder=embedder)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 1))
    ctx = {
        "embeddings": jax.random.normal(jax.random.key(1), (2, 6, 32)),
        "attn_mask": jnp.ones((2, 6), bool),
    }
    out = model(x, jnp.array([0, 1]), cond={"context": ctx})
    assert out["x"].shape == (2, 16, 16, 1)


def test_unet_grads_flow():
    model = _tiny_unet()
    graphdef, params, others = nnx.split(model, nnx.Param, ...)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 1))

    def loss_fn(params):
        m = nnx.merge(graphdef, params, others)
        out = m(x, jnp.array([10, 20]), cond={"y": jnp.array([0, 1])})["x"]
        # loss through model internals requires perturbing beyond zero-init head:
        return (out.astype(jnp.float32) ** 2).mean() + 0.0

    g = jax.grad(loss_fn)(params)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in jax.tree.leaves(g))


def test_unet_train_step_decreases_loss():
    """One denoiser training signal: the zero-init head must learn a constant."""
    import optax

    model = _tiny_unet()
    graphdef, params, others = nnx.split(model, nnx.Param, ...)
    x = jax.random.normal(jax.random.key(0), (4, 16, 16, 1))
    target = jnp.ones_like(x) * 0.5
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            m = nnx.merge(graphdef, p, others)
            out = m(x, jnp.array([1, 2, 3, 4]), cond={"y": jnp.array([0, 1, 2, 3])})["x"]
            return ((out - target) ** 2).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(10):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
