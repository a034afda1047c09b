"""ImageFolderDataset: bring-your-own-images directory loading.

No reference counterpart; covers label-from-subdir mapping, the stable
filename-hash split, center-crop + resize preprocessing, and the fused
native batch path inherited from BaseDataset.
"""

import numpy as np
import pytest
from PIL import Image

from diffulab_tpu.data.folder import ImageFolderDataset


@pytest.fixture()
def image_root(tmp_path):
    rng = np.random.default_rng(0)
    for cls in ("cat", "dog"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(12):
            arr = rng.integers(0, 256, (40, 48, 3), np.uint8)  # non-square
            Image.fromarray(arr).save(d / f"{cls}_{i:03d}.png")
    return tmp_path


def test_labels_from_sorted_subdirs_and_shapes(image_root):
    ds = ImageFolderDataset(str(image_root), image_size=16, split="all")
    assert ds.class_names == ["cat", "dog"]
    assert ds.n_classes == 2
    assert ds.images.shape == (24, 16, 16, 3) and ds.images.dtype == np.uint8
    assert set(np.unique(ds.labels)) == {0, 1}
    item = ds[0]
    x = item["model_inputs"]["x"]
    assert x.shape == (16, 16, 3) and -1.0 <= x.min() and x.max() <= 1.0


def test_split_is_stable_and_disjoint(image_root):
    train = ImageFolderDataset(str(image_root), image_size=16, split="train",
                               val_fraction=0.25)
    val = ImageFolderDataset(str(image_root), image_size=16, split="val",
                             val_fraction=0.25)
    assert len(train) + len(val) == 24
    assert len(val) > 0
    # re-instantiation reproduces the exact same split
    train2 = ImageFolderDataset(str(image_root), image_size=16, split="train",
                                val_fraction=0.25)
    np.testing.assert_array_equal(train.images, train2.images)


def test_flat_directory_is_single_class(tmp_path):
    rng = np.random.default_rng(1)
    for i in range(4):
        Image.fromarray(rng.integers(0, 256, (8, 8, 3), np.uint8)).save(
            tmp_path / f"img{i}.jpg")
    ds = ImageFolderDataset(str(tmp_path), image_size=8, split="all")
    assert ds.n_classes == 1
    assert (ds.labels == 0).all()


def test_native_batch_path(image_root):
    ds = ImageFolderDataset(str(image_root), image_size=16, split="all")
    batch = ds.get_batch([0, 5, 13])
    assert batch["model_inputs"]["x"].shape == (3, 16, 16, 3)
    np.testing.assert_allclose(
        batch["model_inputs"]["x"][0], ds[0]["model_inputs"]["x"], atol=1e-6)


def test_missing_folder_and_empty_raise(tmp_path):
    with pytest.raises(FileNotFoundError):
        ImageFolderDataset(str(tmp_path / "nope"), image_size=8)
    (tmp_path / "empty").mkdir()
    with pytest.raises(FileNotFoundError):
        ImageFolderDataset(str(tmp_path / "empty"), image_size=8)
