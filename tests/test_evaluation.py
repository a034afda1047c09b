"""FID evaluation math tests against closed forms."""

import numpy as np

from diffulab_tpu.training.evaluation import (
    compute_fid,
    feature_statistics,
    frechet_distance,
)


def test_identical_distributions_zero():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(2000, 16))
    assert abs(compute_fid(feats, feats)) < 1e-8


def test_mean_shift_closed_form():
    """For equal covariances, FID == |mu1 - mu2|^2."""
    rng = np.random.default_rng(0)
    base = rng.normal(size=(200_0, 8))
    shift = np.ones(8) * 2.0
    fid = compute_fid(base, base + shift)
    np.testing.assert_allclose(fid, float(shift @ shift), rtol=1e-6)


def test_frechet_distance_diagonal_gaussians():
    """Closed form for diagonal Gaussians: sum((m1-m2)^2) + sum((s1-s2)^2)."""
    mu1, mu2 = np.zeros(4), np.array([1.0, 0, 0, 0])
    s1 = np.diag([1.0, 1, 1, 1])
    s2 = np.diag([4.0, 1, 1, 1])
    fid = frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(fid, 1.0 + (1 - 2) ** 2, rtol=1e-8)


def test_statistics_shapes():
    mu, sig = feature_statistics(np.random.default_rng(0).normal(size=(100, 5)))
    assert mu.shape == (5,) and sig.shape == (5, 5)
    np.testing.assert_allclose(sig, sig.T)


def test_fid_monotone_in_noise():
    rng = np.random.default_rng(0)
    real = rng.normal(size=(3000, 8))
    small = real + rng.normal(scale=0.1, size=real.shape)
    big = real + rng.normal(scale=1.0, size=real.shape)
    assert compute_fid(real, small) < compute_fid(real, big)
