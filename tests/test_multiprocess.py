"""Two-process jax.distributed smoke test (VERDICT r2 missing item 4).

Validates the multi-host story end-to-end on CPU: two REAL processes (2
virtual devices each) form a 4-device data mesh; each process's DataLoader
loads only its contiguous slice of every global batch
(``process_index``/``process_count`` sharding), ``global_batch_array``
stitches the local rows into global arrays, and the jitted gradient step's
cross-process mean matches the single-process computation exactly — the
property the reference gets implicitly from accelerate's per-rank dataloader
split + DDP allreduce (base_trainer.py:277-279).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_data_sharding_matches_single_process(tmp_path):
    worker = Path(__file__).parent / "_mp_worker.py"
    coordinator = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",  # keep the TPU tunnel out of subprocesses
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "JAX_NUM_CPU_DEVICES": "2",
    })
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coordinator, str(i), str(tmp_path)],
            env=env, cwd=str(worker.parent.parent),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=240)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    got = np.load(tmp_path / "grads.npy")
    assert got.shape == (4, 4)  # 32 samples / global batch 8 -> 4 steps

    # single-process oracle: same seeded shuffle over the full global batches
    from diffulab_tpu.data.loader import DataLoader

    class Idx:
        def __len__(self):
            return 32

        def get_batch(self, idx):
            idx = np.asarray(idx, np.int64)
            x = np.stack([np.sin(np.arange(4, dtype=np.float64) + i) for i in idx])
            y = np.sin(idx.astype(np.float64))
            return {"x": x.astype(np.float32), "y": y.astype(np.float32)}

    loader = DataLoader(Idx(), batch_size=8, shuffle=True, seed=11, prefetch=0,
                        process_index=0, process_count=1)
    w = np.linspace(0.0, 1.0, 4, dtype=np.float32)
    want = []
    for batch in loader:
        pred = batch["x"] @ w
        err = pred - batch["y"]
        want.append(2.0 / len(err) * batch["x"].T @ err)
    np.testing.assert_allclose(got, np.stack(want), rtol=1e-5, atol=1e-6)
