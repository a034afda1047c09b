"""Procedural shapes dataset + FID-calibration tests (data/synthetic.py)."""

import numpy as np

from diffulab_tpu.data import SyntheticShapesDataset
from diffulab_tpu.training.evaluation import compute_fid


def _flat_feats(images_u8: np.ndarray, dim: int = 64, seed: int = 0) -> np.ndarray:
    """Cheap fixed random projection as a stand-in feature space."""
    x = images_u8.reshape(len(images_u8), -1).astype(np.float64) / 127.5 - 1.0
    proj = np.random.default_rng(seed).normal(size=(x.shape[1], dim)) / np.sqrt(x.shape[1])
    return x @ proj


def test_shapes_deterministic_and_normalized():
    a = SyntheticShapesDataset(n_samples=64, seed=3)
    b = SyntheticShapesDataset(n_samples=64, seed=3)
    assert (a.images == b.images).all() and (a.labels == b.labels).all()
    assert a.images.dtype == np.uint8 and a.images.shape == (64, 32, 32, 3)
    batch = a.get_batch(range(8))
    x = batch["model_inputs"]["x"]
    assert x.dtype == np.float32 and x.min() >= -1.0 and x.max() <= 1.0
    assert batch["model_inputs"]["y"].dtype == np.int64


def test_shapes_split_and_seed_disjoint():
    train = SyntheticShapesDataset(n_samples=64, train=True)
    val = SyntheticShapesDataset(n_samples=64, train=False)
    other = SyntheticShapesDataset(n_samples=64, train=True, seed=7)
    assert not np.array_equal(train.images, val.images)
    assert not np.array_equal(train.images, other.images)


def test_fid_discriminates_distributions():
    """FID(train, val) must be far below FID(val, noise) — the calibration
    property the end-to-end recipe (examples/evaluate_fid.py) relies on."""
    train = SyntheticShapesDataset(n_samples=256, train=True)
    val = SyntheticShapesDataset(n_samples=256, train=False)
    noise = np.random.default_rng(0).integers(0, 256, size=val.images.shape).astype(np.uint8)
    floor = compute_fid(_flat_feats(train.images), _flat_feats(val.images))
    ceiling = compute_fid(_flat_feats(val.images), _flat_feats(noise))
    assert floor < 0.1 * ceiling
    assert floor >= 0.0


def test_colorize_task_ships_luma_context():
    ds = SyntheticShapesDataset(n_samples=16, task="colorize")
    batch = ds.get_batch(range(4))
    mi = batch["model_inputs"]
    assert set(mi) == {"x", "y", "x_context"}
    assert mi["x_context"].shape == (4, 32, 32, 1)
    # luma of the [-1,1] RGB, BT.601 weights
    expected = mi["x"] @ np.asarray([0.299, 0.587, 0.114], np.float32)
    np.testing.assert_allclose(mi["x_context"][..., 0], expected, atol=1e-6)
    item = ds[0]
    assert item["model_inputs"]["x_context"].shape == (32, 32, 1)
