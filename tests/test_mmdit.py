"""DiT/MMDiT architecture tests at tiny dims (configs/model/dit.yaml scale-down)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from diffulab_tpu.networks.denoisers.mmdit import MMDiT
from diffulab_tpu.networks.embedders.precomputed import PrecomputedEmbedder


def _simple_dit(**kw):
    args = dict(
        simple_dit=True, input_channels=3, inner_dim=64, embedding_dim=64,
        num_heads=4, mlp_ratio=2, patch_size=2, depth=2, n_classes=10,
        classifier_free=True, rngs=nnx.Rngs(0),
    )
    args.update(kw)
    return MMDiT(**args)


def _mm_dit(**kw):
    embedder = PrecomputedEmbedder(
        null_embedding=np.random.default_rng(0).normal(size=(8, 32)).astype(np.float32),
        null_embedding_seq_len=4,
    )
    args = dict(
        simple_dit=False, input_channels=4, inner_dim=64, embedding_dim=64,
        num_heads=4, mlp_ratio=2, patch_size=2, depth=2, n_single_stream_blocks=1,
        classifier_free=True, context_embedder=embedder, rngs=nnx.Rngs(0),
    )
    args.update(kw)
    return MMDiT(**args)


def test_simple_dit_shapes():
    model = _simple_dit()
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    t = jnp.array([0.1, 0.9])
    out = model(x, t, cond={"y": jnp.array([1, 2])})
    assert out["x"].shape == (2, 8, 8, 3)
    assert np.isfinite(np.asarray(out["x"])).all()


def test_simple_dit_output_zero_at_init():
    """adaLN-zero: at init the final layer's modulation is zero but the final
    linear is xavier — the output equals linear(norm(patch tokens)) which is
    NOT necessarily zero; what must hold: block residuals are identity."""
    model = _simple_dit(depth=1)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    t = jnp.array([0.5, 0.5])
    tokens, grid = model.patchify(x)
    # block with zero-init modulation: output == input
    emb = jnp.zeros((2, 64))
    cos_sin = (jnp.zeros((2, 16, 8)), jnp.zeros((2, 16, 8)))
    out_tokens = model.layers[0](tokens, emb, cos_sin)
    np.testing.assert_allclose(np.asarray(out_tokens), np.asarray(tokens), atol=1e-5)


def test_simple_dit_cfg_drop_changes_output():
    model = _simple_dit()
    # adaLN-zero makes conditioning invisible at init; perturb the final
    # modulation so the label pathway reaches the output
    model.last_layer.adaLN_modulation.lin.kernel[...] = (
        0.1 * jax.random.normal(jax.random.key(9), model.last_layer.adaLN_modulation.lin.kernel.shape)
    )
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    t = jnp.array([0.5, 0.5])
    y = jnp.array([3, 7])
    out_keep = model(x, t, cond={"y": y}, drop=jnp.array([False, False]))["x"]
    out_drop = model(x, t, cond={"y": y}, drop=jnp.array([True, True]))["x"]
    assert not np.allclose(np.asarray(out_keep), np.asarray(out_drop))


def test_mmdit_shapes_with_context_and_mask():
    model = _mm_dit()
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    t = jnp.array([0.3, 0.6])
    ctx = {
        "embeddings": jax.random.normal(jax.random.key(1), (2, 8, 32)),
        "attn_mask": jnp.arange(8)[None, :] < jnp.array([[5], [8]]),
    }
    out = model(x, t, cond={"context": ctx})
    assert out["x"].shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out["x"])).all()


def test_mmdit_context_mask_effect():
    """Masked-out context tokens must not influence the output."""
    model = _mm_dit()
    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
    t = jnp.array([0.3])
    emb = jax.random.normal(jax.random.key(1), (1, 8, 32))
    mask = jnp.arange(8)[None, :] < 4
    out1 = model(x, t, cond={"context": {"embeddings": emb, "attn_mask": mask}})["x"]
    emb2 = emb.at[:, 4:].set(99.0)  # mutate only masked tokens
    out2 = model(x, t, cond={"context": {"embeddings": emb2, "attn_mask": mask}})["x"]
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_mmdit_jits_and_grads():
    model = _mm_dit()
    graphdef, params, others = nnx.split(model, nnx.Param, ...)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    t = jnp.array([0.3, 0.6])
    ctx = {"embeddings": jax.random.normal(jax.random.key(1), (2, 8, 32))}

    @jax.jit
    def loss_fn(params):
        m = nnx.merge(graphdef, params, others)
        out = m(x, t, cond={"context": ctx})["x"]
        return (out.astype(jnp.float32) ** 2).mean()

    g = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in flat)
    # qkv weights must receive gradient
    assert any(float(jnp.abs(leaf).max()) > 0 for leaf in flat)


def test_feature_capture_for_repa():
    model = _simple_dit(feature_layers=(0,))
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    out = model(x, jnp.array([0.5, 0.5]), cond={"y": jnp.array([0, 1])}, capture_features=True)
    assert len(out["features"]) == 1
    assert out["features"][0].shape == (2, 16, 64)  # [B, tokens, inner_dim]


def test_use_checkpoint_same_output():
    m1 = _simple_dit(use_checkpoint=False)
    m2 = _simple_dit(use_checkpoint=True)
    # identical init seeds -> identical params
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    t = jnp.array([0.5, 0.5])
    o1 = m1(x, t, cond={"y": jnp.array([0, 1])})["x"]
    o2 = m2(x, t, cond={"y": jnp.array([0, 1])})["x"]
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_x_context_channel_concat():
    model = _mm_dit(input_channels=6)  # 4 latent + 2 context channels
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    x_ctx = jax.random.normal(jax.random.key(1), (2, 8, 8, 2))
    ctx = {"embeddings": jax.random.normal(jax.random.key(2), (2, 8, 32))}
    out = model(x, jnp.array([0.5, 0.5]), cond={"context": ctx, "x_context": x_ctx})
    assert out["x"].shape == (2, 8, 8, 6)


def test_rejects_both_y_and_context():
    model = _simple_dit()
    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 3))
    with pytest.raises(AssertionError):
        model(x, jnp.array([0.5]), cond={"y": jnp.array([0]), "context": {"embeddings": jnp.zeros((1, 4, 32))}})
