"""Unit tests for timestep schedules and table math against closed forms."""

import numpy as np
import pytest

from diffulab_tpu.diffuse.schedules import (
    betas_for_alpha_bar,
    flow_linear_timesteps,
    get_variance_schedule,
    respace_betas,
    shift_timestep,
    space_timesteps,
)


def test_space_timesteps_ddim_uniform():
    assert space_timesteps(1000, 10, ddim=True) == set(range(0, 1000, 100))


def test_space_timesteps_sections():
    steps = space_timesteps(100, 10)
    assert len(steps) == 10
    assert min(steps) == 0 and max(steps) == 99


def test_space_timesteps_string_sections():
    steps = space_timesteps(100, "5,5")
    assert len(steps) == 10


def test_space_timesteps_full():
    assert space_timesteps(10, 10) == set(range(10))


def test_space_timesteps_too_many_raises():
    with pytest.raises(ValueError):
        space_timesteps(10, 20)


def test_linear_schedule_matches_ho_et_al():
    betas = get_variance_schedule(1000, "linear")
    assert betas.dtype == np.float64
    np.testing.assert_allclose(betas[0], 0.0001)
    np.testing.assert_allclose(betas[-1], 0.02)
    # scaled for any number of steps: same total-noise ballpark
    betas100 = get_variance_schedule(100, "linear")
    np.testing.assert_allclose(betas100[0], 0.001)
    np.testing.assert_allclose(betas100[-1], 0.2)


def test_cosine_schedule_bounded():
    betas = get_variance_schedule(1000, "cosine")
    assert (betas > 0).all() and (betas <= 0.999).all()
    # alpha_bar should roughly follow cos^2 curve midpoint
    alphas_bar = np.cumprod(1 - betas)
    assert 0.4 < alphas_bar[len(alphas_bar) // 2] < 0.6


def test_betas_for_alpha_bar_realizes_curve():
    target = lambda t: np.exp(-2.0 * t)  # noqa: E731  (stays above the 0.999 beta clip)
    betas = betas_for_alpha_bar(10, target)
    alphas_bar = np.cumprod(1 - betas)
    for i in range(10):
        np.testing.assert_allclose(alphas_bar[i], target((i + 1) / 10), rtol=1e-10)


def test_respacing_preserves_alpha_bar():
    betas = get_variance_schedule(1000, "linear")
    alphas_bar = np.cumprod(1 - betas)
    use = space_timesteps(1000, 50)
    new_betas, tmap = respace_betas(betas, use)
    assert len(new_betas) == 50 and len(tmap) == 50
    new_alphas_bar = np.cumprod(1 - new_betas)
    np.testing.assert_allclose(new_alphas_bar, alphas_bar[tmap], rtol=1e-12)


def test_shift_timestep_identity_and_limits():
    t = np.linspace(0, 1, 11)
    np.testing.assert_allclose(shift_timestep(t, 1.0), t)
    shifted = shift_timestep(t, 3.0)
    assert shifted[0] == 0.0 and shifted[-1] == 1.0
    assert (shifted[1:-1] > t[1:-1]).all()  # alpha>1 pushes toward noise


def test_flow_linear_timesteps():
    ts = flow_linear_timesteps(50)
    assert ts.shape == (51,)
    assert ts[0] == 1.0 and ts[-1] == 0.0
    assert (np.diff(ts) < 0).all()
    ts_shifted = flow_linear_timesteps(50, shift=3.0)
    assert ts_shifted[0] == 1.0 and ts_shifted[-1] == 0.0
