"""Gaussian diffusion (DDPM/DDIM) tests against guided-diffusion closed forms."""

import jax
import jax.numpy as jnp
import numpy as np

from diffulab_tpu.diffuse.gaussian_diffusion import GaussianDiffusion
from diffulab_tpu.diffuse.samplers.gaussian import DDIM, DDPM
from diffulab_tpu.diffuse.schedules import get_variance_schedule


def _betas(n=100):
    return get_variance_schedule(n, "linear")


def test_ddpm_posterior_moments_match_formulas():
    betas = _betas()
    s = DDPM().with_betas(betas)
    alphas = 1 - betas
    alphas_bar = np.cumprod(alphas)
    alphas_bar_prev = np.concatenate([[1.0], alphas_bar[:-1]])
    np.testing.assert_allclose(
        s.posterior_variance, betas * (1 - alphas_bar_prev) / (1 - alphas_bar), rtol=1e-12
    )
    np.testing.assert_allclose(
        s.posterior_mean_coef1, betas * np.sqrt(alphas_bar_prev) / (1 - alphas_bar), rtol=1e-12
    )
    np.testing.assert_allclose(
        s.posterior_mean_coef2, (1 - alphas_bar_prev) * np.sqrt(alphas) / (1 - alphas_bar), rtol=1e-12
    )


def test_x_start_recovery_roundtrip():
    """eps -> x0 -> eps roundtrip must be identity."""
    s = DDPM().with_betas(_betas())
    rng = jax.random.key(0)
    xt = jax.random.normal(rng, (4, 8))
    eps = jax.random.normal(jax.random.key(1), (4, 8))
    t = jnp.array([3, 20, 50, 90])
    x_start = s._get_x_start_from_eps(eps, xt, t)
    eps_back = s._get_eps_from_xstart(x_start, xt, t)
    np.testing.assert_allclose(np.asarray(eps_back), np.asarray(eps), rtol=1e-3, atol=1e-4)


def test_add_noise_matches_closed_form():
    gd = GaussianDiffusion(n_steps=100)
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, (3, 4, 4, 1))
    noise = jax.random.normal(jax.random.key(1), (3, 4, 4, 1))
    t = jnp.array([0, 50, 99])
    xt, _ = gd.add_noise(x0, t, noise)
    ab = np.cumprod(1 - gd.betas)
    for i, ti in enumerate([0, 50, 99]):
        expected = np.sqrt(ab[ti]) * np.asarray(x0[i]) + np.sqrt(1 - ab[ti]) * np.asarray(noise[i])
        np.testing.assert_allclose(np.asarray(xt[i]), expected, rtol=1e-5, atol=1e-6)


def test_ddim_eta0_perfect_model_recovers_x0():
    """With a model that predicts the exact noise, DDIM(eta=0) recovers x0."""
    gd = GaussianDiffusion(n_steps=50, sampling_method="ddim")
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, (2, 4, 4, 1))
    eps = jax.random.normal(jax.random.key(1), (2, 4, 4, 1))
    ab = jnp.asarray(np.cumprod(1 - gd.betas), dtype=jnp.float32)

    def model_fn(x, timesteps, cond, drop):
        # true eps consistent with xt: eps = (xt - sqrt(ab) x0) / sqrt(1-ab)
        a = ab[timesteps].reshape(-1, 1, 1, 1)
        return {"x": (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)}

    xT = jnp.sqrt(ab[-1]) * x0 + jnp.sqrt(1 - ab[-1]) * eps
    out = gd.denoise(model_fn, cond={}, rng=jax.random.key(2), x=xT)
    np.testing.assert_allclose(np.asarray(out["x"]), np.asarray(x0), atol=1e-3)


def test_ddpm_step_t0_returns_mean():
    s = DDPM().with_betas(_betas())
    pred = jnp.zeros((2, 4))
    xt = jnp.ones((2, 4))
    t = jnp.zeros((2,), jnp.int32)
    res = s.step(pred, t, xt, rng=jax.random.key(0))
    np.testing.assert_allclose(np.asarray(res["x_prev"]), np.asarray(res["x_prev_mean"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(res["logprob"]), 0.0, atol=1e-6)  # masked at t=0


def test_learned_range_variance_interpolates():
    s = DDPM(var_type="learned_range").with_betas(_betas())
    t = jnp.array([10, 50])
    # w=+1 -> max_log = log(beta_t); w=-1 -> min_log = posterior_log_var_clipped
    var_hi, lv_hi = s.get_variance(t, 2, log_var=jnp.ones((2, 4)))
    var_lo, lv_lo = s.get_variance(t, 2, log_var=-jnp.ones((2, 4)))
    np.testing.assert_allclose(np.asarray(lv_hi)[:, 0], np.log(s.betas)[np.array([10, 50])], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(lv_lo)[:, 0], s.posterior_log_variance_clipped[np.array([10, 50])], rtol=1e-5
    )


def test_learned_variance_channel_split_nhwc():
    s = DDPM(var_type="learned_range").with_betas(_betas())
    pred = jnp.concatenate([jnp.zeros((2, 4, 4, 3)), jnp.zeros((2, 4, 4, 3))], axis=-1)
    res = s.step(pred, jnp.array([5, 5]), jnp.ones((2, 4, 4, 3)), rng=jax.random.key(0))
    assert res["x_prev"].shape == (2, 4, 4, 3)


def test_respacing_model_sees_training_timesteps():
    gd = GaussianDiffusion(n_steps=1000).set_steps(50)
    assert gd.steps == 50
    assert gd.timestep_map is not None and len(gd.timestep_map) == 50
    seen = []

    def model_fn(x, timesteps, cond, drop):
        seen.append(timesteps)
        return {"x": jnp.zeros_like(x)}

    gd.one_step_denoise(model_fn, jnp.zeros((1, 2, 2, 1)), {}, jnp.int32(49), rng=jax.random.key(0))
    # respaced index 49 must map to a training timestep near 999
    assert int(seen[0][0]) == int(gd.timestep_map[49])
    assert int(seen[0][0]) > 900


def test_denoise_scan_runs_under_jit():
    # (n_steps must be large enough for the Ho-et-al linear schedule to keep
    # beta < 1; respace down to 10 sampling steps instead)
    gd = GaussianDiffusion(n_steps=100).set_steps(10)

    def model_fn(x, timesteps, cond, drop):
        return {"x": jnp.zeros_like(x)}

    fn = jax.jit(lambda r: gd.denoise(model_fn, {}, r, data_shape=(2, 4, 4, 1))["x"])
    out = fn(jax.random.key(0))
    assert out.shape == (2, 4, 4, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_draw_timesteps_in_range():
    gd = GaussianDiffusion(n_steps=100)
    t = gd.draw_timesteps(jax.random.key(0), 256)
    assert t.dtype == jnp.int32
    assert int(t.min()) >= 0 and int(t.max()) < 100


def test_ddim_with_eta_returns_logprob():
    s = DDIM(eta=0.5).with_betas(_betas())
    pred = jnp.zeros((2, 4))
    res = s.step(pred, jnp.array([5, 5]), jnp.ones((2, 4)), rng=jax.random.key(0))
    assert "logprob" in res and "x_prev_std" in res
    assert np.isfinite(np.asarray(res["logprob"])).all()


def test_sampler_parameters_plumb_through():
    gd = GaussianDiffusion(n_steps=100, sampling_method="ddim",
                           sampler_parameters={"eta": 0.3, "var_type": "fixed_large"})
    assert gd.sampler.eta == 0.3
    assert gd.sampler.var_type == "fixed_large"


def test_learned_variance_hybrid_training_loss():
    """Hybrid VLB loss: finite, gradients reach the variance head, and the
    MSE part ignores the variance channels (Improved DDPM)."""
    gd = GaussianDiffusion(n_steps=100, sampler_parameters={"var_type": "learned_range"})
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, (4, 8, 8, 2))
    noise = jax.random.normal(jax.random.key(1), (4, 8, 8, 2))
    t = jnp.array([0, 10, 50, 99])

    def make_model(var_value):
        def model_fn(x, timesteps, cond, drop):
            return {"x": jnp.concatenate([noise, jnp.full_like(x, var_value)], axis=-1)}
        return model_fn

    losses = gd.compute_loss(make_model(0.0), x0, {}, t, noise)
    assert set(losses) == {"loss", "vlb"}
    assert float(losses["loss"]) < 1e-10  # perfect eps prediction
    assert np.isfinite(float(losses["vlb"]))
    # vlb responds to the variance head while mse does not
    losses_hi = gd.compute_loss(make_model(0.9), x0, {}, t, noise)
    assert float(losses_hi["loss"]) < 1e-10
    assert abs(float(losses_hi["vlb"]) - float(losses["vlb"])) > 1e-8


def test_min_snr_loss_weighting():
    """min-SNR-gamma (arXiv:2303.09556): per-sample MSE scaled by the table-1
    factor for each prediction head; equals plain MSE where SNR <= gamma."""
    gd = GaussianDiffusion(n_steps=100, loss_weighting="min_snr", min_snr_gamma=5.0)
    x0 = jax.random.normal(jax.random.key(0), (4, 4, 4, 1))
    noise = jax.random.normal(jax.random.key(1), (4, 4, 4, 1))
    t = jnp.array([0, 10, 50, 99])
    pred = noise + 0.1  # uniform epsilon error -> per-sample mse identical
    loss = float(gd.compute_loss(lambda x, timesteps, cond, drop: {"x": pred},
                                 x0, {}, t, noise)["loss"])
    ab = gd.alphas_bar[np.asarray(t)]
    snr = ab / (1 - ab)
    w = np.minimum(snr, 5.0) / snr  # epsilon-prediction factor
    expected = float(np.mean(w * 0.1**2))
    assert abs(loss - expected) < 1e-6
    # low-noise steps (snr > gamma) are down-weighted; high-noise untouched
    assert w[0] < 1.0 and w[-1] == 1.0

    # v-prediction factor: min(snr, gamma)/(snr+1)
    gd_v = GaussianDiffusion(n_steps=100, loss_weighting="min_snr",
                             prediction_type="v", min_snr_gamma=5.0)
    loss_v = gd_v.compute_loss(lambda x, timesteps, cond, drop: {"x": pred},
                               x0, {}, t, noise)["loss"]
    assert np.isfinite(float(loss_v))


def test_fixed_variance_loss_unchanged():
    gd = GaussianDiffusion(n_steps=100)
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, (2, 4, 4, 1))
    noise = jax.random.normal(jax.random.key(1), (2, 4, 4, 1))
    losses = gd.compute_loss(lambda x, timesteps, cond, drop: {"x": noise},
                             x0, {}, jnp.array([5, 50]), noise)
    assert set(losses) == {"loss"}
    assert float(losses["loss"]) < 1e-10


def test_dpmpp_gaussian_perfect_model_recovers_x0():
    """Exact-noise model => x0-prediction is constant along the trajectory, so
    the DPM-Solver++ exponential integrator is exact at EVERY step count."""
    for n in (5, 50):
        gd = GaussianDiffusion(n_steps=1000, sampling_method="dpmpp_2m").set_steps(n_steps=n)
        rng = jax.random.key(0)
        x0 = jax.random.normal(rng, (2, 4, 4, 1))
        eps = jax.random.normal(jax.random.key(1), (2, 4, 4, 1))
        # model sees TRAINING indices (respacing maps them back)
        ab_train = jnp.asarray(
            np.cumprod(1 - GaussianDiffusion(n_steps=1000).betas), dtype=jnp.float32
        )

        def model_fn(x, timesteps, cond, drop):
            a = ab_train[timesteps].reshape(-1, 1, 1, 1)
            return {"x": (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)}

        ab_last = jnp.asarray(np.cumprod(1 - gd.betas), jnp.float32)[-1]
        xT = jnp.sqrt(ab_last) * x0 + jnp.sqrt(1 - ab_last) * eps
        out = gd.denoise(model_fn, cond={}, rng=jax.random.key(2), x=xT)
        np.testing.assert_allclose(np.asarray(out["x"]), np.asarray(x0), atol=2e-3)


def test_dpmpp_gaussian_beats_ddim_at_few_steps():
    """Time-varying eps field: 10-step DPM++(2M) lands closer to the
    1000-step DDIM (fine ODE) solution than 10-step DDIM."""
    u = jax.random.normal(jax.random.key(3), (2, 4, 4, 1))
    w = jax.random.normal(jax.random.key(4), (2, 4, 4, 1))

    def model_fn(x, timesteps, cond, drop):
        # timesteps here are TRAINING indices (respacing maps them); scale to [0,1]
        s = (timesteps.astype(jnp.float32) / 1000.0).reshape(-1, 1, 1, 1)
        return {"x": u + jnp.sin(4.0 * s) * w + 0.1 * x}

    xT = jax.random.normal(jax.random.key(5), (2, 4, 4, 1))

    fine = GaussianDiffusion(n_steps=1000, sampling_method="ddim")
    truth = np.asarray(fine.denoise(model_fn, cond={}, rng=jax.random.key(6), x=xT)["x"])

    errs = {}
    for method in ("ddim", "dpmpp_2m"):
        gd = GaussianDiffusion(n_steps=1000, sampling_method=method).set_steps(n_steps=10)
        out = gd.denoise(model_fn, cond={}, rng=jax.random.key(7), x=xT)
        errs[method] = float(np.abs(np.asarray(out["x"]) - truth).max())
    assert errs["dpmpp_2m"] < 0.6 * errs["ddim"], errs


def test_dpmpp_gaussian_jits_with_respacing_and_intermediates():
    gd = GaussianDiffusion(n_steps=100, sampling_method="dpmpp_2m").set_steps(n_steps=8)

    def model_fn(x, timesteps, cond, drop):
        return {"x": jnp.zeros_like(x)}

    @jax.jit
    def run(rng):
        return gd.denoise(model_fn, cond={}, rng=rng, data_shape=(2, 4, 4, 1),
                          return_intermediates=True)

    out = run(jax.random.key(8))
    assert out["x"].shape == (2, 4, 4, 1)
    assert out["xt"].shape == (2, 9, 4, 4, 1)
    assert np.isfinite(np.asarray(out["x"])).all()


def test_prediction_parametrizations_equivalent():
    """x0- and v-parametrized heads sample identically to the epsilon head
    when each predicts its exact target (reference roadmap: 'add the
    different possible parametrization for the loss (eps, x0, v)')."""
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, (2, 4, 4, 1))
    eps = jax.random.normal(jax.random.key(1), (2, 4, 4, 1))
    ab = jnp.asarray(np.cumprod(1 - GaussianDiffusion(n_steps=50).betas), jnp.float32)

    def a_s(timesteps, ndim):
        a = ab[timesteps].reshape(-1, *([1] * (ndim - 1)))
        return jnp.sqrt(a), jnp.sqrt(1 - a)

    def eps_model(x, timesteps, cond, drop):
        a, s = a_s(timesteps, x.ndim)
        return {"x": (x - a * x0) / s}

    def x0_model(x, timesteps, cond, drop):
        return {"x": jnp.broadcast_to(x0, x.shape)}

    def v_model(x, timesteps, cond, drop):
        a, s = a_s(timesteps, x.ndim)
        true_eps = (x - a * x0) / s
        return {"x": a * true_eps - s * x0}

    xT = jnp.sqrt(ab[-1]) * x0 + jnp.sqrt(1 - ab[-1]) * eps
    outs = {}
    for ptype, model in (("epsilon", eps_model), ("xstart", x0_model), ("v", v_model)):
        gd = GaussianDiffusion(n_steps=50, sampling_method="ddim", prediction_type=ptype)
        outs[ptype] = np.asarray(gd.denoise(model, cond={}, rng=jax.random.key(2), x=xT)["x"])
        np.testing.assert_allclose(outs[ptype], np.asarray(x0), atol=2e-3)
    np.testing.assert_allclose(outs["xstart"], outs["epsilon"], atol=1e-4)
    np.testing.assert_allclose(outs["v"], outs["epsilon"], atol=1e-4)


def test_prediction_parametrization_losses_zero_for_perfect_model():
    rng = jax.random.key(3)
    x0 = jax.random.normal(rng, (4, 4, 4, 2))
    noise = jax.random.normal(jax.random.key(4), (4, 4, 4, 2))
    t = jnp.array([1, 10, 25, 49])
    ab = jnp.asarray(np.cumprod(1 - GaussianDiffusion(n_steps=50).betas), jnp.float32)
    a = jnp.sqrt(ab[t]).reshape(-1, 1, 1, 1)
    s = jnp.sqrt(1 - ab[t]).reshape(-1, 1, 1, 1)
    targets = {
        "epsilon": noise,
        "xstart": x0,
        "v": a * noise - s * x0,
    }
    for ptype, target in targets.items():
        gd = GaussianDiffusion(n_steps=50, prediction_type=ptype)
        losses = gd.compute_loss(
            lambda x, timesteps, cond, drop: {"x": jnp.broadcast_to(target, x.shape)},
            x0, {}, t, noise,
        )
        assert float(losses["loss"]) < 1e-10, (ptype, float(losses["loss"]))


def test_v_parametrization_with_learned_variance():
    """v head + learned_range variance: loss/vlb finite, grads flow, and the
    variance channels are excluded from the MSE."""
    gd = GaussianDiffusion(n_steps=50, prediction_type="v",
                           sampler_parameters={"var_type": "learned_range"})
    rng = jax.random.key(5)
    x0 = jax.random.normal(rng, (2, 4, 4, 2))
    noise = jax.random.normal(jax.random.key(6), (2, 4, 4, 2))
    t = jnp.array([3, 30])

    def model_fn(x, timesteps, cond, drop):
        return {"x": jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], axis=-1)}

    losses = gd.compute_loss(model_fn, x0, {}, t, noise)
    assert set(losses) == {"loss", "vlb"}
    assert np.isfinite(float(losses["loss"])) and np.isfinite(float(losses["vlb"]))


def test_unipc_gaussian_perfect_model_recovers_x0():
    for n in (5, 50):
        gd = GaussianDiffusion(n_steps=1000, sampling_method="unipc").set_steps(n_steps=n)
        rng = jax.random.key(0)
        x0 = jax.random.normal(rng, (2, 4, 4, 1))
        eps = jax.random.normal(jax.random.key(1), (2, 4, 4, 1))
        ab_train = jnp.asarray(
            np.cumprod(1 - GaussianDiffusion(n_steps=1000).betas), dtype=jnp.float32
        )

        def model_fn(x, timesteps, cond, drop):
            a = ab_train[timesteps].reshape(-1, 1, 1, 1)
            return {"x": (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)}

        ab_last = jnp.asarray(np.cumprod(1 - gd.betas), jnp.float32)[-1]
        xT = jnp.sqrt(ab_last) * x0 + jnp.sqrt(1 - ab_last) * eps
        out = gd.denoise(model_fn, cond={}, rng=jax.random.key(2), x=xT)
        np.testing.assert_allclose(np.asarray(out["x"]), np.asarray(x0), atol=2e-3)


def test_unipc_gaussian_beats_dpmpp_at_few_steps():
    """Same eval budget, the UniC corrector tightens the 10-step solve."""
    u = jax.random.normal(jax.random.key(3), (2, 4, 4, 1))
    w = jax.random.normal(jax.random.key(4), (2, 4, 4, 1))

    def model_fn(x, timesteps, cond, drop):
        s = (timesteps.astype(jnp.float32) / 1000.0).reshape(-1, 1, 1, 1)
        return {"x": u + jnp.sin(4.0 * s) * w + 0.1 * x}

    xT = jax.random.normal(jax.random.key(5), (2, 4, 4, 1))
    fine = GaussianDiffusion(n_steps=1000, sampling_method="ddim")
    truth = np.asarray(fine.denoise(model_fn, cond={}, rng=jax.random.key(6), x=xT)["x"])

    errs = {}
    for method in ("ddim", "dpmpp_2m", "unipc"):
        gd = GaussianDiffusion(n_steps=1000, sampling_method=method).set_steps(n_steps=10)
        out = gd.denoise(model_fn, cond={}, rng=jax.random.key(7), x=xT)
        errs[method] = float(np.abs(np.asarray(out["x"]) - truth).max())
    assert errs["unipc"] < errs["dpmpp_2m"], errs
