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


def test_precision_recall_identical_sets():
    from diffulab_tpu.training.evaluation import compute_precision_recall

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(300, 16))
    pr = compute_precision_recall(feats, feats.copy(), k=3)
    # identical sets: every sample sits inside the other manifold
    assert pr["precision"] == 1.0 and pr["recall"] == 1.0
    assert pr["coverage"] == 1.0 and pr["density"] > 0.5


def test_precision_recall_disjoint_sets():
    from diffulab_tpu.training.evaluation import compute_precision_recall

    rng = np.random.default_rng(1)
    real = rng.normal(size=(300, 16))
    fake = rng.normal(size=(300, 16)) + 100.0  # far-away cluster
    pr = compute_precision_recall(real, fake, k=3)
    assert pr["precision"] == 0.0 and pr["recall"] == 0.0
    assert pr["density"] == 0.0 and pr["coverage"] == 0.0


def test_precision_recall_separates_fidelity_from_coverage():
    """Mode dropping hurts recall/coverage but not precision; off-manifold
    samples hurt precision/density but not recall of the covered mode."""
    from diffulab_tpu.training.evaluation import compute_precision_recall

    rng = np.random.default_rng(2)
    # real = two well-separated modes
    mode_a = rng.normal(size=(200, 8))
    mode_b = rng.normal(size=(200, 8)) + 50.0
    real = np.concatenate([mode_a, mode_b])

    # fake covers only mode A -> precision high, recall ~0.5
    fake_dropped = rng.normal(size=(400, 8))
    pr = compute_precision_recall(real, fake_dropped, k=3)
    assert pr["precision"] > 0.8
    assert 0.3 < pr["recall"] < 0.7
    assert 0.3 < pr["coverage"] < 0.7

    # fake = half mode A, half garbage -> precision ~0.5
    garbage = rng.uniform(-200, 200, size=(200, 8))
    fake_noisy = np.concatenate([rng.normal(size=(200, 8)), garbage])
    pr2 = compute_precision_recall(real, fake_noisy, k=3)
    assert pr2["precision"] < 0.7


def test_precision_recall_chunked_matches_dense():
    """Streaming with a tiny chunk must reproduce the one-shot result, and
    unequal set sizes must be handled (M != N)."""
    from diffulab_tpu.training.evaluation import compute_precision_recall

    rng = np.random.default_rng(3)
    real = rng.normal(size=(257, 12))
    fake = np.concatenate([rng.normal(size=(100, 12)),
                           rng.normal(size=(83, 12)) + 3.0])
    dense = compute_precision_recall(real, fake, k=3, chunk=4096)
    chunked = compute_precision_recall(real, fake, k=3, chunk=17)
    for key in dense:
        np.testing.assert_allclose(chunked[key], dense[key], rtol=1e-6)


def test_kid_zero_for_identical_distributions():
    from diffulab_tpu.training.evaluation import compute_kid

    rng = np.random.default_rng(0)
    real = rng.normal(size=(2000, 16))
    fake = rng.normal(size=(2000, 16))  # same distribution, different draws
    kid = compute_kid(real, fake, subset_size=500, n_subsets=20)
    # unbiased estimator: mean ~ 0 within a few standard errors
    assert abs(kid["kid"]) < 5 * max(kid["kid_std"], 1e-6)


def test_kid_monotone_in_shift_and_positive_when_different():
    from diffulab_tpu.training.evaluation import compute_kid

    rng = np.random.default_rng(1)
    real = rng.normal(size=(1000, 8))
    small = compute_kid(real, real + 0.3, subset_size=400, n_subsets=10)["kid"]
    big = compute_kid(real, real + 2.0, subset_size=400, n_subsets=10)["kid"]
    assert 0 < small < big


def test_kid_deterministic_per_seed():
    from diffulab_tpu.training.evaluation import compute_kid

    rng = np.random.default_rng(2)
    real = rng.normal(size=(500, 8))
    fake = rng.normal(size=(500, 8)) + 0.5
    a = compute_kid(real, fake, subset_size=200, n_subsets=5, seed=7)
    b = compute_kid(real, fake, subset_size=200, n_subsets=5, seed=7)
    assert a == b
