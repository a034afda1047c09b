"""CFG shaping: guidance interval (arXiv:2404.07724) + std-rescale
(arXiv:2305.08891) across all three formalizations (diffuse/guidance.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffulab_tpu.diffuse.edm import EDM
from diffulab_tpu.diffuse.flow import Flow
from diffulab_tpu.diffuse.gaussian_diffusion import GaussianDiffusion
from diffulab_tpu.diffuse.guidance import combine_cfg, effective_scale


def toy_model_fn(x, timesteps, cond, drop):
    """Per-sample deterministic toy: conditional shift suppressed by drop."""
    shift = cond["y"].reshape(-1, *([1] * (x.ndim - 1))).astype(x.dtype)
    dropb = drop.reshape(-1, *([1] * (x.ndim - 1)))
    # the conditional term must vary spatially or std-rescale is a no-op
    # (adding a per-sample constant leaves the std unchanged)
    return {"x": -0.5 * x + jnp.where(dropb, 0.0, shift * (1.0 + 0.3 * jnp.sin(x)))}


def _cond(batch):
    return {"y": jnp.linspace(-1.0, 1.0, batch, dtype=jnp.float32)}


def test_effective_scale_windows():
    t = jnp.array([0.05, 0.3, 0.7, 0.95])
    s = effective_scale(3.0, t, (0.2, 0.8))
    np.testing.assert_allclose(np.asarray(s), [1.0, 3.0, 3.0, 1.0])
    # None = identity (plain CFG everywhere)
    assert effective_scale(3.0, t, None) == 3.0


def test_combine_cfg_rescale_matches_cond_std():
    rng = jax.random.key(0)
    k1, k2 = jax.random.split(rng)
    cond = jax.random.normal(k1, (4, 8, 8, 3))
    uncond = cond + 0.3 * jax.random.normal(k2, (4, 8, 8, 3))
    guided = combine_cfg(cond, uncond, 7.5, rescale=0.0)
    rescaled = combine_cfg(cond, uncond, 7.5, rescale=1.0)
    axes = (1, 2, 3)
    # plain CFG inflates std; full rescale restores the conditional std
    assert (jnp.std(guided, axis=axes) > jnp.std(cond, axis=axes)).all()
    np.testing.assert_allclose(
        np.asarray(jnp.std(rescaled, axis=axes)),
        np.asarray(jnp.std(cond, axis=axes)), rtol=1e-5,
    )
    # phi blends linearly between the two
    half = combine_cfg(cond, uncond, 7.5, rescale=0.5)
    np.testing.assert_allclose(
        np.asarray(half), np.asarray(0.5 * rescaled + 0.5 * guided), rtol=1e-5
    )
    # per-sample vector scale broadcasts over non-batch dims
    vec = combine_cfg(cond, uncond, jnp.array([1.0, 2.0, 3.0, 4.0]))
    np.testing.assert_allclose(
        np.asarray(vec[0]), np.asarray(uncond[0] + 1.0 * (cond[0] - uncond[0])),
        rtol=1e-5,
    )


@pytest.mark.parametrize("rescale", [0.0, 0.7])
def test_flow_interval_full_window_equals_plain_cfg(rescale):
    """A window covering every t must reproduce plain CFG exactly (rescale=0),
    and the whole path must run jitted with interval+rescale on."""
    base = Flow(n_steps=6, sampling_method="euler")
    shaped = Flow(n_steps=6, sampling_method="euler",
                  guidance_interval=[0.0, 1.0], guidance_rescale=rescale)
    rng = jax.random.key(1)
    x0 = jax.random.normal(jax.random.key(11), (4, 8, 8, 3))
    kwargs = dict(cond=_cond(4), rng=rng, x=x0,
                  guidance_scale=2.5, use_cfg=True)
    out_base = jax.jit(base.denoise, static_argnums=0, static_argnames=("use_cfg",))(toy_model_fn, **kwargs)["x"]
    out_shaped = jax.jit(shaped.denoise, static_argnums=0, static_argnames=("use_cfg",))(toy_model_fn, **kwargs)["x"]
    if rescale == 0.0:
        np.testing.assert_allclose(np.asarray(out_base), np.asarray(out_shaped), atol=1e-6)
    else:
        assert not np.allclose(np.asarray(out_base), np.asarray(out_shaped))


def test_flow_empty_window_equals_scale_one():
    """A window covering no t degrades CFG to the conditional prediction."""
    never = Flow(n_steps=6, sampling_method="euler", guidance_interval=[2.0, 3.0])
    plain = Flow(n_steps=6, sampling_method="euler")
    rng = jax.random.key(2)
    kwargs = dict(cond=_cond(4), rng=rng, data_shape=(4, 8, 8, 3), use_cfg=True)
    out_never = never.denoise(toy_model_fn, guidance_scale=5.0, **kwargs)["x"]
    out_one = plain.denoise(toy_model_fn, guidance_scale=1.0, **kwargs)["x"]
    np.testing.assert_allclose(np.asarray(out_never), np.asarray(out_one), atol=1e-6)


def test_flow_mid_window_differs_from_both():
    mid = Flow(n_steps=8, sampling_method="euler", guidance_interval=[0.3, 0.9])
    plain = Flow(n_steps=8, sampling_method="euler")
    rng = jax.random.key(3)
    kwargs = dict(cond=_cond(4), rng=rng, data_shape=(4, 8, 8, 3),
                  guidance_scale=4.0, use_cfg=True)
    out_mid = mid.denoise(toy_model_fn, **kwargs)["x"]
    out_plain = plain.denoise(toy_model_fn, **kwargs)["x"]
    out_off = plain.denoise(toy_model_fn, **{**kwargs, "guidance_scale": 1.0})["x"]
    assert not np.allclose(np.asarray(out_mid), np.asarray(out_plain))
    assert not np.allclose(np.asarray(out_mid), np.asarray(out_off))


def test_edm_interval_and_rescale_run_and_gate():
    base = EDM(n_steps=6, sampling_method="heun")
    # sigma window [0.5, 10]: guidance active only mid-schedule
    shaped = EDM(n_steps=6, sampling_method="heun",
                 guidance_interval=[0.5, 10.0], guidance_rescale=0.5)
    full = EDM(n_steps=6, sampling_method="heun",
               guidance_interval=[0.0, base.sigma_max], guidance_rescale=0.0)
    rng = jax.random.key(4)
    x0 = jax.random.normal(jax.random.key(12), (4, 8, 8, 3))
    kwargs = dict(cond=_cond(4), rng=rng, x=x0,
                  guidance_scale=3.0, use_cfg=True)
    out_base = jax.jit(base.denoise, static_argnums=0, static_argnames=("use_cfg",))(toy_model_fn, **kwargs)["x"]
    out_full = jax.jit(full.denoise, static_argnums=0, static_argnames=("use_cfg",))(toy_model_fn, **kwargs)["x"]
    out_shaped = jax.jit(shaped.denoise, static_argnums=0, static_argnames=("use_cfg",))(toy_model_fn, **kwargs)["x"]
    np.testing.assert_allclose(np.asarray(out_base), np.asarray(out_full), atol=1e-5)
    assert not np.allclose(np.asarray(out_base), np.asarray(out_shaped))


@pytest.mark.parametrize("var_mode", ["fixed_small", "learned_range"])
def test_gaussian_interval_and_rescale(var_mode):
    sampler_params = {"var_type": var_mode}
    common = dict(n_steps=20, sampling_method="ddim", sampler_parameters=sampler_params)
    base = GaussianDiffusion(**common)
    full = GaussianDiffusion(**common, guidance_interval=[0.0, 1.0])
    shaped = GaussianDiffusion(**common, guidance_interval=[0.3, 0.9],
                               guidance_rescale=0.3)

    def model_fn(x, timesteps, cond, drop):
        out = toy_model_fn(x, timesteps, cond, drop)["x"]
        if var_mode == "learned_range":
            out = jnp.concatenate([out, jnp.zeros_like(out)], axis=-1)
        return {"x": out}

    rng = jax.random.key(5)
    x0 = jax.random.normal(jax.random.key(12), (4, 8, 8, 3))
    kwargs = dict(cond=_cond(4), rng=rng, x=x0,
                  guidance_scale=3.0, use_cfg=True)
    out_base = jax.jit(base.denoise, static_argnums=0, static_argnames=("use_cfg",))(model_fn, **kwargs)["x"]
    out_full = jax.jit(full.denoise, static_argnums=0, static_argnames=("use_cfg",))(model_fn, **kwargs)["x"]
    out_shaped = jax.jit(shaped.denoise, static_argnums=0, static_argnames=("use_cfg",))(model_fn, **kwargs)["x"]
    np.testing.assert_allclose(np.asarray(out_base), np.asarray(out_full), atol=1e-5)
    assert not np.allclose(np.asarray(out_base), np.asarray(out_shaped))


def test_set_steps_preserves_guidance_config():
    f = Flow(n_steps=10, sampling_method="euler",
             guidance_interval=[0.2, 0.8], guidance_rescale=0.4)
    f2 = f.set_steps(20)
    assert f2.guidance_interval == [0.2, 0.8] and f2.guidance_rescale == 0.4
    e = EDM(n_steps=10, guidance_interval=[0.5, 10.0]).set_steps(5)
    assert e.guidance_interval == [0.5, 10.0]
    g = GaussianDiffusion(n_steps=50, guidance_interval=[0.1, 0.9]).set_steps(10)
    assert g.guidance_interval == [0.1, 0.9]
