"""Native C++ data-path kernels vs NumPy reference."""

import numpy as np

from diffulab_tpu.data import native
from diffulab_tpu.data.base import BaseDataset
from diffulab_tpu.data.loader import DataLoader


def test_normalize_u8_matches_numpy():
    src = np.random.default_rng(0).integers(0, 256, (1000, 7), dtype=np.uint8)
    out = native.normalize_u8_to_f32(src)
    ref = src.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(out, ref, atol=1e-6)
    assert out.dtype == np.float32


def test_gather_collate_matches_numpy():
    store = np.random.default_rng(0).normal(size=(100, 4, 4, 3)).astype(np.float32)
    idx = np.array([5, 0, 99, 50])
    out = native.gather_collate_f32(store, idx)
    np.testing.assert_allclose(out, store[idx])


def test_gather_normalize_matches_numpy():
    store = np.random.default_rng(0).integers(0, 256, (100, 8, 8, 3), dtype=np.uint8)
    idx = np.array([3, 7, 7, 0])
    out = native.gather_normalize_u8(store, idx)
    ref = store[idx].astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_dataset_fast_batch_equals_itemwise():
    class DS(BaseDataset):
        def __init__(self):
            super().__init__()
            rng = np.random.default_rng(0)
            self.images = rng.integers(0, 256, (32, 8, 8, 3), dtype=np.uint8)
            self.labels = rng.integers(0, 10, 32)

        def preprocess_image(self, image):
            return (image.astype(np.float32) / 255.0 - 0.5) / 0.5

    ds = DS()
    fast = ds.get_batch([1, 5, 9])
    slow = np.stack([ds[i]["model_inputs"]["x"] for i in (1, 5, 9)])
    np.testing.assert_allclose(fast["model_inputs"]["x"], slow, atol=1e-6)
    np.testing.assert_array_equal(fast["model_inputs"]["y"], ds.labels[[1, 5, 9]])

    # loader takes the fast path (same content, one batch object)
    dl = DataLoader(ds, batch_size=8, shuffle=False, prefetch=0)
    batch = next(iter(dl))
    assert batch["model_inputs"]["x"].shape == (8, 8, 8, 3)
    np.testing.assert_allclose(
        batch["model_inputs"]["x"][0], ds[0]["model_inputs"]["x"], atol=1e-6
    )


def test_loader_process_sharding_partitions_global_batch():
    """Multi-host loader contract: identical shuffled order on every process,
    each loading a disjoint contiguous slice whose union is the global batch."""
    from diffulab_tpu.data.loader import DataLoader

    class Idx:
        def __len__(self):
            return 64
        def get_batch(self, idx):
            import numpy as np
            return {"model_inputs": {"x": np.asarray(idx, np.int64)}}

    pc = 4
    loaders = [
        DataLoader(Idx(), batch_size=16, shuffle=True, seed=7, prefetch=0,
                   process_index=pi, process_count=pc)
        for pi in range(pc)
    ]
    ref = DataLoader(Idx(), batch_size=16, shuffle=True, seed=7, prefetch=0,
                     process_index=0, process_count=1)
    for global_batch, locals_ in zip(iter(ref), zip(*[iter(ld) for ld in loaders])):
        g = global_batch["model_inputs"]["x"]
        parts = [lb["model_inputs"]["x"] for lb in locals_]
        assert all(len(p) == 4 for p in parts)
        import numpy as np
        np.testing.assert_array_equal(np.concatenate(parts), g)


def test_loader_len_matches_iteration_on_multihost():
    """__len__ must count exactly the batches _batch_indices yields, including
    multi-host trimming (batches smaller than process_count are dropped)."""
    from diffulab_tpu.data.loader import DataLoader

    class Idx:
        def __init__(self, n):
            self.n = n
        def __len__(self):
            return self.n
        def get_batch(self, idx):
            import numpy as np
            return {"x": np.asarray(idx, np.int64)}

    for n, bs, pc, drop_last in [
        (18, 8, 4, False),  # trailing batch of 2 < pc=4: dropped
        (18, 8, 4, True),
        (20, 8, 4, False),  # trailing batch of 4 == pc: kept
        (18, 8, 1, False),  # single process keeps ceil behavior
        (16, 8, 2, False),
    ]:
        dl = DataLoader(Idx(n), batch_size=bs, shuffle=False, prefetch=0,
                        drop_last=drop_last, process_index=0, process_count=pc)
        assert len(dl) == sum(1 for _ in dl), (n, bs, pc, drop_last)
