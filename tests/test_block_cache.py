"""Sampling-time block caching (Delta-DiT-style, arXiv:2406.01125).

Validates the three layers of the feature:
- MMDiT._cached_block_stack: refresh steps are bit-exact with the uncached
  stack; reuse steps apply the cached span delta;
- the formalizations' denoise scans thread the cache through the carry with
  the every-K-steps refresh schedule (checked against a hand-rolled eager
  loop over one_step_denoise with explicit refresh flags);
- the Diffuser facade config surface (set_block_cache / disable / guards).

No reference counterpart (the reference has no sampling acceleration beyond
fewer steps).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from diffulab_tpu.diffuse import Diffuser
from diffulab_tpu.networks.denoisers.mmdit import MMDiT
from diffulab_tpu.networks.embedders.precomputed import PrecomputedEmbedder

SHAPE = (2, 8, 8, 3)


def _simple_dit(depth=4, **kw):
    args = dict(
        simple_dit=True, input_channels=3, inner_dim=64, embedding_dim=64,
        num_heads=4, mlp_ratio=2, patch_size=2, depth=depth, n_classes=10,
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
        num_heads=4, mlp_ratio=2, patch_size=2, depth=3, n_single_stream_blocks=1,
        classifier_free=True, context_embedder=embedder, rngs=nnx.Rngs(0),
    )
    args.update(kw)
    return MMDiT(**args)


def _randomize(model, seed=3):
    """Break adaLN-zero init so blocks actually transform the stream."""
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    leaves, treedef = jax.tree.flatten(params)
    rng = jax.random.key(seed)
    keys = jax.random.split(rng, len(leaves))
    leaves = [0.02 * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)]
    return nnx.merge(graphdef, jax.tree.unflatten(treedef, leaves), rest)


# --- model-level semantics ---------------------------------------------------

def test_refresh_step_is_exact():
    model = _randomize(_simple_dit())
    model.set_block_cache_span((1, 3))
    x = jax.random.normal(jax.random.key(1), SHAPE)
    t = jnp.array([0.3, 0.7])
    cond = {"y": jnp.array([1, 2])}
    drop = jnp.zeros((2,), bool)
    plain = model(x, t, cond=cond, drop=drop)
    zeros = model.init_block_cache(SHAPE, cond, use_cfg=False)
    cached = model(x, t, cond=cond, drop=drop,
                   block_cache=zeros, cache_refresh=jnp.asarray(True))
    np.testing.assert_allclose(
        np.asarray(cached["x"]), np.asarray(plain["x"]), atol=1e-6,
        err_msg="a refresh step must be bit-exact with the uncached stack",
    )
    assert jax.tree.structure(cached["block_cache"]) == jax.tree.structure(zeros)
    # the span transforms the stream, so the cached delta is non-trivial
    assert float(jnp.abs(cached["block_cache"][0]).max()) > 0


def test_reuse_step_passes_cache_through():
    model = _randomize(_simple_dit())
    model.set_block_cache_span((1, 3))
    x = jax.random.normal(jax.random.key(1), SHAPE)
    t = jnp.array([0.3, 0.7])
    cond = {"y": jnp.array([1, 2])}
    drop = jnp.zeros((2,), bool)
    zeros = model.init_block_cache(SHAPE, cond, use_cfg=False)
    fresh = model(x, t, cond=cond, drop=drop,
                  block_cache=zeros, cache_refresh=jnp.asarray(True))
    reused = model(x, t, cond=cond, drop=drop,
                   block_cache=fresh["block_cache"], cache_refresh=jnp.asarray(False))
    # reuse returns the incoming deltas unchanged...
    for a, b in zip(reused["block_cache"], fresh["block_cache"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    # ...and with the delta captured at the same input, reuse == refresh
    np.testing.assert_allclose(
        np.asarray(reused["x"]), np.asarray(fresh["x"]), atol=1e-5)
    # a ZERO delta (skip the span entirely) is a different function
    skipped = model(x, t, cond=cond, drop=drop,
                    block_cache=zeros, cache_refresh=jnp.asarray(False))
    assert float(jnp.abs(skipped["x"] - fresh["x"]).max()) > 1e-6


def test_span_validation():
    model = _simple_dit(depth=4)
    with pytest.raises(AssertionError):
        model.set_block_cache_span((0, 5))
    with pytest.raises(AssertionError):
        model.set_block_cache_span((3, 3))
    model.set_block_cache_span((0, 4))
    model.set_block_cache_span(None)
    assert model.cache_span is None


# --- scan threading vs a hand-rolled eager loop ------------------------------

@pytest.mark.parametrize("guidance", [0.0, 2.0])
def test_flow_cached_scan_matches_manual_loop(guidance):
    model = _randomize(_simple_dit())
    diffuser = Diffuser(model, sampling_method="euler",
                        model_type="rectified_flow", n_steps=6)
    diffuser.set_block_cache(2, span=(1, 3))
    cond = {"y": jnp.array([1, 2])}
    use_cfg = guidance > 0

    out = diffuser.generate(jax.random.key(7), cond, data_shape=SHAPE,
                            guidance_scale=guidance)

    # eager replay of flow.denoise's rng/schedule handling with explicit
    # per-step refresh flags
    diffusion = diffuser.diffusion
    ts_np = diffusion.timesteps
    rng = jax.random.key(7)
    rng, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, SHAPE, dtype=jnp.float32)
    step_rng = rng
    holder = {"c": model.init_block_cache(SHAPE, cond, use_cfg=use_cfg)}
    for i in range(len(ts_np) - 1):
        t_curr, t_prev = float(ts_np[i]), float(ts_np[i + 1])
        step_rng, _ = jax.random.split(step_rng)
        refresh = jnp.asarray((i % 2) == 0)

        def mfn(**kw):
            o = model(**kw, train=False, block_cache=holder["c"], cache_refresh=refresh)
            holder["c"] = o["block_cache"]
            return o

        step = diffusion.one_step_denoise(
            mfn, x, cond, jnp.float32(t_prev), jnp.float32(t_curr),
            guidance_scale=jnp.float32(guidance), use_cfg=use_cfg,
        )
        x = step["x_prev"].astype(x.dtype)

    np.testing.assert_allclose(np.asarray(out["x"]), np.asarray(x),
                               atol=2e-5, rtol=1e-5)


def test_cached_differs_from_uncached_and_disable_restores():
    model = _randomize(_simple_dit())
    diffuser = Diffuser(model, sampling_method="euler",
                        model_type="rectified_flow", n_steps=6)
    cond = {"y": jnp.array([1, 2])}
    base = diffuser.generate(jax.random.key(7), cond, data_shape=SHAPE)
    diffuser.set_block_cache(3, span=(1, 3))
    cached = diffuser.generate(jax.random.key(7), cond, data_shape=SHAPE)
    assert float(jnp.abs(cached["x"] - base["x"]).max()) > 1e-6
    assert np.isfinite(np.asarray(cached["x"])).all()
    diffuser.set_block_cache(None)
    back = diffuser.generate(jax.random.key(7), cond, data_shape=SHAPE)
    np.testing.assert_allclose(np.asarray(back["x"]), np.asarray(base["x"]), atol=0)


@pytest.mark.parametrize("model_type,method,steps", [
    ("gaussian_diffusion", "ddim", 8),
    ("edm", "euler", 6),
])
def test_other_formalizations_smoke(model_type, method, steps):
    model = _randomize(_simple_dit())
    kwargs = {"n_steps": 32} if model_type == "gaussian_diffusion" else {"n_steps": steps}
    diffuser = Diffuser(model, sampling_method=method, model_type=model_type, **kwargs)
    if model_type == "gaussian_diffusion":
        diffuser.set_steps(steps)
    cond = {"y": jnp.array([1, 2])}
    base = diffuser.generate(jax.random.key(5), cond, data_shape=SHAPE,
                             guidance_scale=1.5)
    diffuser.set_block_cache(2, span=(1, 3))
    cached = diffuser.generate(jax.random.key(5), cond, data_shape=SHAPE,
                               guidance_scale=1.5)
    assert np.isfinite(np.asarray(cached["x"])).all()
    assert float(jnp.abs(cached["x"] - base["x"]).max()) > 1e-7


def test_multistep_sampler_composes():
    model = _randomize(_simple_dit())
    diffuser = Diffuser(model, sampling_method="dpmpp_2m",
                        model_type="rectified_flow", n_steps=6)
    diffuser.set_block_cache(2, span=(1, 3))
    cond = {"y": jnp.array([1, 2])}
    out = diffuser.generate(jax.random.key(2), cond, data_shape=SHAPE,
                            guidance_scale=1.5)
    assert np.isfinite(np.asarray(out["x"])).all()


def test_mmdit_dual_stream_cache():
    model = _randomize(_mm_dit())
    model.set_block_cache_span((0, 2))
    b = 2
    x = jax.random.normal(jax.random.key(1), (b, 8, 8, 4))
    t = jnp.array([0.3, 0.7])
    ctx = {"embeddings": jax.random.normal(jax.random.key(2), (b, 8, 32))}
    cond = {"context": ctx}
    drop = jnp.zeros((b,), bool)
    zeros = model.init_block_cache((b, 8, 8, 4), cond, use_cfg=False)
    assert len(zeros) == 2  # (x delta, context delta)
    plain = model(x, t, cond=cond, drop=drop)
    fresh = model(x, t, cond=cond, drop=drop,
                  block_cache=zeros, cache_refresh=jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(fresh["x"]), np.asarray(plain["x"]),
                               atol=1e-6)
    reused = model(x, t, cond=cond, drop=drop,
                   block_cache=fresh["block_cache"], cache_refresh=jnp.asarray(False))
    assert np.isfinite(np.asarray(reused["x"])).all()


def test_mmdit_generate_with_cache():
    model = _randomize(_mm_dit())
    diffuser = Diffuser(model, sampling_method="euler",
                        model_type="rectified_flow", n_steps=5)
    diffuser.set_block_cache(2, span=(0, 2))
    ctx = {"embeddings": jax.random.normal(jax.random.key(2), (2, 8, 32))}
    out = diffuser.generate(jax.random.key(9), {"context": ctx},
                            data_shape=(2, 8, 8, 4), guidance_scale=2.0)
    assert out["x"].shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out["x"])).all()


def test_set_block_cache_guards():
    model = _simple_dit()
    diffuser = Diffuser(model, sampling_method="euler",
                        model_type="rectified_flow", n_steps=4)
    with pytest.raises(AssertionError):
        diffuser.set_block_cache(2)  # span required

    class NoCacheDenoiser:
        pass

    diffuser.denoiser = NoCacheDenoiser()
    with pytest.raises(AssertionError):
        diffuser.set_block_cache(2, span=(0, 1))


# --- UNet DeepCache -----------------------------------------------------------

def _tiny_unet(**kw):
    from diffulab_tpu.networks.denoisers.unet import UNetModel

    args = dict(
        image_size=[16, 16], in_channels=1, model_channels=32, out_channels=1,
        num_res_blocks=1, attention_resolutions=[4], num_heads=2,
        channel_mult="1, 2", resblock_updown=True, use_scale_shift_norm=True,
        n_classes=10, classifier_free=True, rngs=nnx.Rngs(0),
    )
    args.update(kw)
    return UNetModel(**args)


def test_unet_refresh_step_is_exact():
    model = _randomize(_tiny_unet())
    n = len(model.input_blocks)
    model.set_block_cache_span((2, n))
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 1))
    t = jnp.array([10, 500])
    cond = {"y": jnp.array([1, 2])}
    drop = jnp.zeros((2,), bool)
    plain = model(x, t, cond=cond, drop=drop)
    zeros = model.init_block_cache((2, 16, 16, 1), cond, use_cfg=False)
    cached = model(x, t, cond=cond, drop=drop,
                   block_cache=zeros, cache_refresh=jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(cached["x"]), np.asarray(plain["x"]),
                               atol=1e-5)
    assert cached["block_cache"][0].shape == zeros[0].shape
    # reuse with the fresh cache at the same input reproduces the output
    reused = model(x, t, cond=cond, drop=drop,
                   block_cache=cached["block_cache"], cache_refresh=jnp.asarray(False))
    np.testing.assert_allclose(np.asarray(reused["x"]), np.asarray(cached["x"]),
                               atol=1e-5)
    # a zero deep feature is a different function
    skipped = model(x, t, cond=cond, drop=drop,
                    block_cache=zeros, cache_refresh=jnp.asarray(False))
    assert float(jnp.abs(skipped["x"] - cached["x"]).max()) > 1e-6


def test_unet_span_validation():
    model = _tiny_unet()
    n = len(model.input_blocks)
    with pytest.raises(AssertionError):
        model.set_block_cache_span((1, n - 1))  # hi must be N
    with pytest.raises(AssertionError):
        model.set_block_cache_span((0, n))  # k must keep >= 1 shallow group
    model.set_block_cache_span(None)
    assert model.cache_split is None


def test_unet_ddpm_generate_with_cache():
    model = _randomize(_tiny_unet())
    diffuser = Diffuser(model, sampling_method="ddim",
                        model_type="gaussian_diffusion", n_steps=32)
    diffuser.set_steps(8)
    cond = {"y": jnp.array([1, 2])}
    shape = (2, 16, 16, 1)
    base = diffuser.generate(jax.random.key(4), cond, data_shape=shape,
                             guidance_scale=1.5)
    n = len(model.input_blocks)
    diffuser.set_block_cache(2, span=(2, n))
    cached = diffuser.generate(jax.random.key(4), cond, data_shape=shape,
                               guidance_scale=1.5)
    assert np.isfinite(np.asarray(cached["x"])).all()
    assert float(jnp.abs(cached["x"] - base["x"]).max()) > 1e-7


# --- composition with autoguidance (each model carries its own cache) --------

@pytest.mark.parametrize("model_type,method,steps", [
    ("rectified_flow", "euler", 6),
    ("gaussian_diffusion", "ddim", 50),
    ("edm", "dpmpp_2m", 6),
])
def test_block_cache_composes_with_autoguidance(model_type, method, steps):
    """Autoguidance calls the main model at batch B (not the fused 2x CFG
    batch) and the guide model gets its own cache in the (main, guide) pair
    (diffuse/caching.py) — this traced crash-free end-to-end is the
    regression test for the 2x-batched-cache shape mismatch."""
    main = _randomize(_simple_dit())
    guide = _simple_dit()  # different weights = a genuinely degraded sibling
    diffuser = Diffuser(main, model_type=model_type, n_steps=steps,
                        sampling_method=method)
    diffuser.set_block_cache(2, span=(1, 3))
    cond = {"y": jnp.array([1, 2])}

    cached = diffuser.generate(jax.random.key(3), cond, data_shape=SHAPE,
                               guidance_scale=2.0, guide_denoiser=guide)
    assert np.isfinite(np.asarray(cached["x"])).all()

    # interval=1... disabling restores the uncached autoguidance path, and
    # caching actually changed the trajectory (the spans were skipped)
    diffuser.set_block_cache(None)
    plain = diffuser.generate(jax.random.key(3), cond, data_shape=SHAPE,
                              guidance_scale=2.0, guide_denoiser=guide)
    assert not np.allclose(np.asarray(cached["x"]), np.asarray(plain["x"]))
