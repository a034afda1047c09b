"""EDM formalization tests (diffuse/edm.py; reference roadmap item "add
EDM", unimplemented there) against Karras et al. 2022 closed forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffulab_tpu.diffuse import Diffuser
from diffulab_tpu.diffuse.edm import EDM


def _perfect_F(x0, sigma_data=0.5):
    """The raw network F for which the preconditioned D(x; sigma) == x0."""

    def model_fn(x, timesteps, cond, drop):
        # invert the preconditioning: timesteps == c_noise == ln(sigma)/4
        sigma = jnp.exp(4.0 * timesteps).reshape(-1, *([1] * (x.ndim - 1)))
        sd = sigma_data
        c_skip = sd**2 / (sigma**2 + sd**2)
        c_out = sigma * sd / jnp.sqrt(sigma**2 + sd**2)
        c_in = 1.0 / jnp.sqrt(sigma**2 + sd**2)
        x_raw = x / c_in  # undo the input scaling applied by _denoised
        return {"x": (x0 - c_skip * x_raw) / c_out}

    return model_fn


def test_karras_schedule_endpoints():
    edm = EDM(n_steps=18)
    ts = edm.timesteps
    assert ts.shape == (19,)
    np.testing.assert_allclose(ts[0], 80.0, rtol=1e-5)
    np.testing.assert_allclose(ts[-2], 0.002, rtol=1e-4)
    assert ts[-1] == 0.0
    assert (np.diff(ts) < 0).all()


def test_loss_zero_for_perfect_model():
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, (4, 8, 8, 3))
    noise = jax.random.normal(jax.random.key(1), (4, 8, 8, 3))
    edm = EDM()
    sigmas = edm.draw_timesteps(jax.random.key(2), 4)
    losses = edm.compute_loss(_perfect_F(x0), x0, {}, sigmas, noise)
    assert float(losses["loss"]) < 1e-8


def test_sigma_draws_lognormal():
    edm = EDM()
    s = np.asarray(edm.draw_timesteps(jax.random.key(3), 20_000))
    assert (s > 0).all()
    np.testing.assert_allclose(np.log(s).mean(), edm.p_mean, atol=0.05)
    np.testing.assert_allclose(np.log(s).std(), edm.p_std, atol=0.05)


@pytest.mark.parametrize("method", ["euler", "heun"])
def test_denoise_recovers_x0_for_perfect_model(method):
    """With D == x0 the ODE trajectory is linear in sigma, so both solvers
    integrate it exactly from x_T = x0 + sigma_max * eps."""
    rng = jax.random.key(4)
    x0 = jax.random.normal(rng, (2, 8, 8, 1))
    eps = jax.random.normal(jax.random.key(5), (2, 8, 8, 1))
    edm = EDM(n_steps=12, sampling_method=method)
    xT = x0 + edm.sigma_max * eps
    out = edm.denoise(_perfect_F(x0), cond={}, rng=jax.random.key(6), x=xT)
    np.testing.assert_allclose(np.asarray(out["x"]), np.asarray(x0), atol=1e-3, rtol=1e-3)


def test_heun_beats_euler_on_curved_field():
    """sigma-dependent D: Heun's corrector wins at equal step counts."""
    u = jax.random.normal(jax.random.key(7), (2, 4, 4, 1))

    def curved_F(x, timesteps, cond, drop):
        sigma = jnp.exp(4.0 * timesteps).reshape(-1, 1, 1, 1)
        sd = 0.5
        c_skip = sd**2 / (sigma**2 + sd**2)
        c_out = sigma * sd / jnp.sqrt(sigma**2 + sd**2)
        c_in = 1.0 / jnp.sqrt(sigma**2 + sd**2)
        x_raw = x / c_in
        # sigma-curved AND x-dependent D (an x-free D makes the final
        # sigma->0 Euler step collapse every trajectory onto D(sigma_min),
        # which hides all solver error)
        target_d = jnp.cos(jnp.log1p(sigma)) * u + 0.8 * jnp.tanh(0.5 * x_raw)
        return {"x": (target_d - c_skip * x_raw) / c_out}

    eps = jax.random.normal(jax.random.key(8), (2, 4, 4, 1))
    xT = 80.0 * eps
    truth = np.asarray(
        EDM(n_steps=1000, sampling_method="heun").denoise(
            curved_F, cond={}, rng=jax.random.key(9), x=xT
        )["x"]
    )
    errs = {}
    for method in ("euler", "heun"):
        out = EDM(n_steps=24, sampling_method=method).denoise(
            curved_F, cond={}, rng=jax.random.key(9), x=xT
        )
        errs[method] = float(np.abs(np.asarray(out["x"]) - truth).max())
    # measured on this field: euler 0.020, heun 0.008 (2.5x)
    assert errs["heun"] < 0.6 * errs["euler"], errs


def test_edm_through_diffuser_facade_jit_and_cfg():
    from flax import nnx

    from diffulab_tpu.networks.denoisers.mmdit import MMDiT

    model = MMDiT(
        simple_dit=True, input_channels=3, inner_dim=32, embedding_dim=32,
        num_heads=4, mlp_ratio=2, patch_size=2, depth=2, n_classes=10,
        classifier_free=True, rngs=nnx.Rngs(0),
    )
    diffuser = Diffuser(model, sampling_method="heun", model_type="edm", n_steps=6,
                        extra_args={"sigma_data": 0.5})
    # training loss path
    x0 = jax.random.normal(jax.random.key(0), (4, 8, 8, 3))
    t = diffuser.draw_timesteps(jax.random.key(1), 4)
    losses = diffuser.compute_loss(x0, {"y": jnp.arange(4)}, timesteps=t,
                                   rng=jax.random.key(2))
    assert np.isfinite(float(losses["loss"]))
    # jitted cached sampling with CFG
    out = diffuser.generate(jax.random.key(3), {"y": jnp.arange(4)},
                            data_shape=(4, 8, 8, 3), guidance_scale=2.0, clamp_x=True)
    assert out["x"].shape == (4, 8, 8, 3)
    assert np.isfinite(np.asarray(out["x"])).all()
    out2 = diffuser.generate(jax.random.key(4), {"y": jnp.arange(4)},
                             data_shape=(4, 8, 8, 3), guidance_scale=2.0, clamp_x=True)
    assert not np.allclose(np.asarray(out["x"]), np.asarray(out2["x"]))


def test_dpmpp_on_edm_beats_euler_and_single_eval():
    """VE-schedule DPM++(2M): 2nd order at one eval per step."""
    u = jax.random.normal(jax.random.key(7), (2, 4, 4, 1))
    calls = {"n": 0}

    def curved_F(x, timesteps, cond, drop):
        calls["n"] += 1  # trace-time call count = model evals per step fn
        sigma = jnp.exp(4.0 * timesteps).reshape(-1, 1, 1, 1)
        sd = 0.5
        c_skip = sd**2 / (sigma**2 + sd**2)
        c_out = sigma * sd / jnp.sqrt(sigma**2 + sd**2)
        c_in = 1.0 / jnp.sqrt(sigma**2 + sd**2)
        x_raw = x / c_in
        target_d = jnp.cos(jnp.log1p(sigma)) * u + 0.8 * jnp.tanh(0.5 * x_raw)
        return {"x": (target_d - c_skip * x_raw) / c_out}

    eps = jax.random.normal(jax.random.key(8), (2, 4, 4, 1))
    xT = 80.0 * eps
    truth = np.asarray(
        EDM(n_steps=1000, sampling_method="heun").denoise(
            curved_F, cond={}, rng=jax.random.key(9), x=xT
        )["x"]
    )
    errs = {}
    for method in ("euler", "dpmpp_2m"):
        calls["n"] = 0
        out = EDM(n_steps=24, sampling_method=method).denoise(
            curved_F, cond={}, rng=jax.random.key(9), x=xT
        )
        errs[method] = float(np.abs(np.asarray(out["x"]) - truth).max())
        # single-eval per scan step + the final collapse eval (traced once each)
        assert calls["n"] == 2
    assert errs["dpmpp_2m"] < 0.6 * errs["euler"], errs


def test_unipc_on_edm_exact_for_perfect_model():
    rng = jax.random.key(4)
    x0 = jax.random.normal(rng, (2, 8, 8, 1))
    eps = jax.random.normal(jax.random.key(5), (2, 8, 8, 1))
    edm = EDM(n_steps=12, sampling_method="unipc")
    xT = x0 + edm.sigma_max * eps
    out = edm.denoise(_perfect_F(x0), cond={}, rng=jax.random.key(6), x=xT)
    np.testing.assert_allclose(np.asarray(out["x"]), np.asarray(x0), atol=1e-3, rtol=1e-3)


def test_unipc_on_edm_beats_dpmpp_at_one_eval_per_step():
    """The UniC corrector refines each transition at no extra model evals."""
    u = jax.random.normal(jax.random.key(7), (2, 4, 4, 1))
    calls = {"n": 0}

    def curved_F(x, timesteps, cond, drop):
        calls["n"] += 1
        sigma = jnp.exp(4.0 * timesteps).reshape(-1, 1, 1, 1)
        sd = 0.5
        c_skip = sd**2 / (sigma**2 + sd**2)
        c_out = sigma * sd / jnp.sqrt(sigma**2 + sd**2)
        c_in = 1.0 / jnp.sqrt(sigma**2 + sd**2)
        x_raw = x / c_in
        target_d = jnp.cos(jnp.log1p(sigma)) * u + 0.8 * jnp.tanh(0.5 * x_raw)
        return {"x": (target_d - c_skip * x_raw) / c_out}

    eps = jax.random.normal(jax.random.key(8), (2, 4, 4, 1))
    xT = 80.0 * eps
    truth = np.asarray(
        EDM(n_steps=1000, sampling_method="heun").denoise(
            curved_F, cond={}, rng=jax.random.key(9), x=xT
        )["x"]
    )
    errs = {}
    for method in ("euler", "dpmpp_2m", "unipc"):
        calls["n"] = 0
        out = EDM(n_steps=24, sampling_method=method).denoise(
            curved_F, cond={}, rng=jax.random.key(9), x=xT
        )
        errs[method] = float(np.abs(np.asarray(out["x"]) - truth).max())
        assert calls["n"] == 2  # one eval per scan step + the final collapse
    assert errs["unipc"] < errs["dpmpp_2m"], errs
