"""Sample-quality evaluation: FID (Frechet distance) over pluggable features.

The north-star metric is FID parity (BASELINE.md); the reference ships no
evaluation code at all. This module computes the Frechet distance between
feature distributions:

    FID = |mu_r - mu_f|^2 + tr(C_r + C_f - 2 (C_r C_f)^{1/2})

with the matrix square root via eigendecomposition of the symmetrized
product (numerically stable for PSD covariances). Features come from any
callable mapping image batches to [B, D] vectors — classic InceptionV3 pool3
features when a local checkpoint is available, or a DINOv2 encoder
(``dinov2_features``), whose Frechet distance (FDD) is a stronger
discriminator than Inception-FID in recent literature.
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

FeatureFn = Callable[[np.ndarray], np.ndarray]


def _matrix_sqrt_psd(mat: np.ndarray) -> np.ndarray:
    """Square root of a (nearly) PSD symmetric matrix via eigendecomposition."""
    vals, vecs = np.linalg.eigh((mat + mat.T) / 2.0)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray,
                     mu2: np.ndarray, sigma2: np.ndarray) -> float:
    """Frechet distance between two Gaussians.

    tr((C1 C2)^{1/2}) is computed as tr((C1^{1/2} C2 C1^{1/2})^{1/2}), which is
    symmetric-PSD by construction (avoids sqrtm on a non-symmetric product).
    """
    diff = mu1 - mu2
    s1_half = _matrix_sqrt_psd(sigma1)
    covmean = _matrix_sqrt_psd(s1_half @ sigma2 @ s1_half)
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2.0 * np.trace(covmean))


def feature_statistics(features: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(mean, covariance) of [N, D] features (fp64 accumulation)."""
    features = np.asarray(features, np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, np.atleast_2d(sigma)


def compute_fid(real_features: np.ndarray, fake_features: np.ndarray) -> float:
    mu_r, sig_r = feature_statistics(real_features)
    mu_f, sig_f = feature_statistics(fake_features)
    return frechet_distance(mu_r, sig_r, mu_f, sig_f)


def _pairwise_sq_dists(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Squared euclidean distances [N, M] between feature rows (fp32)."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    a2 = (a * a).sum(axis=1)[:, None]
    b2 = (b * b).sum(axis=1)[None, :]
    return np.maximum(a2 + b2 - 2.0 * (a @ b.T), 0.0)


def _knn_sq_radii(features: np.ndarray, k: int, chunk: int = 2048) -> np.ndarray:
    """Per-point squared distance to its k-th nearest neighbor (self excluded).

    Streams row blocks so memory stays O(chunk * N) instead of O(N^2) — at
    the standard 50k-sample FID protocol a dense matrix would be 20 GB.
    """
    features = np.asarray(features, np.float32)
    n = len(features)
    radii = np.empty(n, np.float32)
    for start in range(0, n, chunk):
        d = _pairwise_sq_dists(features[start:start + chunk], features)
        d[np.arange(d.shape[0]), np.arange(start, start + d.shape[0])] = np.inf
        radii[start:start + d.shape[0]] = np.partition(d, k - 1, axis=1)[:, k - 1]
    return radii


def compute_precision_recall(
    real_features: np.ndarray,
    fake_features: np.ndarray,
    k: int = 3,
    chunk: int = 2048,
) -> dict[str, float]:
    """Improved precision/recall + density/coverage over feature manifolds.

    Precision/recall per Kynkaanniemi et al. (arXiv:1904.06991): a sample is
    covered when it falls inside any k-NN ball of the other set — precision
    measures sample fidelity (fakes on the real manifold), recall measures
    mode coverage (reals reachable from the fake manifold). Density/coverage
    per Naeem et al. (arXiv:2002.09797) are the outlier-robust variants
    (density counts overlapping balls; coverage anchors the test on real
    k-NN balls only). All four diagnose what a single FID number conflates:
    fidelity collapse (low precision/density) vs mode dropping (low
    recall/coverage).

    Cross-set distances stream in fake-row blocks (O(chunk * N) memory), so
    50k-vs-50k protocols run on ordinary hosts.
    """
    real_features = np.asarray(real_features, np.float32)
    fake_features = np.asarray(fake_features, np.float32)
    radii_real = _knn_sq_radii(real_features, k, chunk)
    radii_fake = _knn_sq_radii(fake_features, k, chunk)
    m, n = len(fake_features), len(real_features)
    in_any_real = np.zeros(m, bool)          # precision: fake inside a real ball
    ball_counts = np.zeros(m, np.int64)      # density: overlapping real balls
    min_to_fake = np.full(n, np.inf, np.float32)  # coverage: per-real nearest fake
    real_covered = np.zeros(n, bool)         # recall: real inside a fake ball
    for start in range(0, m, chunk):
        d = _pairwise_sq_dists(fake_features[start:start + chunk], real_features)
        in_real_balls = d <= radii_real[None, :]
        in_any_real[start:start + d.shape[0]] = in_real_balls.any(axis=1)
        ball_counts[start:start + d.shape[0]] = in_real_balls.sum(axis=1)
        np.minimum(min_to_fake, d.min(axis=0), out=min_to_fake)
        real_covered |= (d <= radii_fake[start:start + d.shape[0], None]).any(axis=0)
    return {"precision": float(in_any_real.mean()),
            "recall": float(real_covered.mean()),
            "density": float(ball_counts.mean() / k),
            "coverage": float((min_to_fake <= radii_real).mean())}


def compute_kid(
    real_features: np.ndarray,
    fake_features: np.ndarray,
    subset_size: int = 1000,
    n_subsets: int = 100,
    seed: int = 0,
) -> dict[str, float]:
    """Kernel Inception Distance (Binkowski et al., arXiv:1801.01401).

    Unbiased MMD^2 with the polynomial kernel k(x, y) = (x.y / d + 1)^3,
    averaged over ``n_subsets`` random subsets of ``subset_size`` — unlike
    FID, the estimator is unbiased, so it ranks models reliably at small
    sample counts where FID's bias dominates. Returns mean and the standard
    error across subsets (deterministic per seed).
    """
    real = np.asarray(real_features, np.float64)
    fake = np.asarray(fake_features, np.float64)
    d = real.shape[1]
    m = min(subset_size, len(real), len(fake))
    rng = np.random.default_rng(seed)
    scores = np.empty(n_subsets)
    for i in range(n_subsets):
        xr = real[rng.choice(len(real), m, replace=False)]
        xf = fake[rng.choice(len(fake), m, replace=False)]
        k_rr = (xr @ xr.T / d + 1.0) ** 3
        k_ff = (xf @ xf.T / d + 1.0) ** 3
        k_rf = (xr @ xf.T / d + 1.0) ** 3
        sum_rr = (k_rr.sum() - np.trace(k_rr)) / (m * (m - 1))
        sum_ff = (k_ff.sum() - np.trace(k_ff)) / (m * (m - 1))
        scores[i] = sum_rr + sum_ff - 2.0 * k_rf.mean()
    return {"kid": float(scores.mean()),
            "kid_std": float(scores.std() / np.sqrt(n_subsets))}


def extract_features(
    images: Iterable[np.ndarray],
    feature_fn: FeatureFn,
    batch_size: int = 64,
) -> np.ndarray:
    """Run a feature fn over image batches; images NHWC in [-1, 1] or [0, 1]."""
    chunks = []
    buffer: list[np.ndarray] = []
    for img in images:
        buffer.append(np.asarray(img))
        if len(buffer) == batch_size:
            chunks.append(np.asarray(feature_fn(np.stack(buffer))))
            buffer = []
    if buffer:
        chunks.append(np.asarray(feature_fn(np.stack(buffer))))
    return np.concatenate(chunks, axis=0)


def dinov2_features(encoder) -> FeatureFn:
    """Mean-pooled DINOv2 patch features as the FID feature space (FDD)."""
    pooled = jax.jit(lambda x: encoder(x).mean(axis=1))

    def fn(batch: np.ndarray) -> np.ndarray:
        x = jnp.asarray(batch, jnp.float32)
        x = jnp.clip(x * 0.5 + 0.5, 0.0, 1.0) if float(x.min()) < 0 else x
        return np.asarray(pooled(x))

    return fn


def evaluate_fid(
    diffuser,
    real_images: np.ndarray,
    cond: dict,
    feature_fn: FeatureFn,
    n_samples: int | None = None,
    batch_size: int = 32,
    guidance_scale: float = 0.0,
    seed: int = 0,
    data_shape: tuple[int, ...] | None = None,
) -> float:
    """Sample from the diffuser and compute FID against ``real_images``."""
    n = n_samples or len(real_images)
    rng = jax.random.key(seed)
    shape = data_shape or real_images.shape[1:]
    fakes = []
    for start in range(0, n, batch_size):
        bsz = min(batch_size, n - start)
        sub_cond = jax.tree.map(lambda v: v[start % len(real_images):][:bsz], cond)
        out = diffuser.generate(
            jax.random.fold_in(rng, start), sub_cond,
            data_shape=(bsz, *shape), guidance_scale=guidance_scale, clamp_x=True,
        )
        fakes.append(np.asarray(out["x"], np.float32))
    fake = np.concatenate(fakes, axis=0)
    real_feats = extract_features(real_images[:n], feature_fn, batch_size)
    fake_feats = extract_features(fake, feature_fn, batch_size)
    return compute_fid(real_feats, fake_feats)


# Bump when frozen_vit_features changes in ANY way (architecture, seed,
# pooling, preprocessing): it keys real-feature caches, and numbers from
# different feature spaces must never be mixed.
FEATURE_SPACE_VERSION = "vit_s4_seed1234_meanpool_v1"


def frozen_vit_features(image_size: int, feature_seed: int = 1234) -> FeatureFn:
    """Mean-pooled patch features from a frozen, fixed-seed ViT-S/4.

    Random-init features are a valid (weaker) Frechet feature space: the
    distance is still zero iff the pooled-feature distributions match, and
    the fixed seed makes the number reproducible across runs/machines.
    (Canonical home of the evaluate_fid.py feature space, shared with
    evaluate_txt2img.py — one definition, one version string.)
    """
    from flax import nnx

    from diffulab_tpu.networks.repa.vit import ViTEncoder

    enc = ViTEncoder(
        img_size=image_size, patch_size=4, embed_dim=384, depth=6, num_heads=6,
        num_register_tokens=0, layerscale=False, rngs=nnx.Rngs(feature_seed),
    )
    graphdef, state = nnx.split(enc)

    @jax.jit
    def run(state, x):
        m = nnx.merge(graphdef, state)
        return m(x)["patch_tokens"].mean(axis=1)

    def fn(batch: np.ndarray) -> np.ndarray:
        x = jnp.asarray(batch, jnp.float32)  # [-1, 1] NHWC
        if x.shape[-1] == 1:  # grayscale datasets (MNIST): tile to RGB
            x = jnp.tile(x, (1, 1, 1, 3))
        return np.asarray(run(state, x))

    return fn
