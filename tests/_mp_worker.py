"""Worker for the two-process jax.distributed smoke test
(tests/test_multiprocess.py). Each process owns 2 virtual CPU devices; the
pair forms a 4-device data mesh. Run as:

    python tests/_mp_worker.py <coordinator> <process_id> <out_dir>
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main() -> None:
    coordinator, process_id, out_dir = sys.argv[1], int(sys.argv[2]), Path(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=2, process_id=process_id
    )
    assert jax.process_count() == 2
    assert jax.device_count() == 4, jax.devices()

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from diffulab_tpu.data.loader import DataLoader
    from diffulab_tpu.parallel.sharding import global_batch_array

    class Idx:
        def __len__(self):
            return 32

        def get_batch(self, idx):
            idx = np.asarray(idx, np.int64)
            x = np.stack([np.sin(np.arange(4, dtype=np.float64) + i) for i in idx])
            y = np.sin(idx.astype(np.float64))
            return {"x": x.astype(np.float32), "y": y.astype(np.float32)}

    # the GLOBAL batch size is 8; each process loads its contiguous 4 rows
    loader = DataLoader(Idx(), batch_size=8, shuffle=True, seed=11, prefetch=0)
    assert loader.process_count == 2 and loader.process_index == process_id

    mesh = Mesh(np.array(jax.devices()).reshape(4), ("data",))
    batch_sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    w = jax.device_put(jnp.linspace(0.0, 1.0, 4, dtype=jnp.float32), rep)

    @jax.jit
    def grad_step(w, batch):
        def loss(w):
            pred = batch["x"] @ w
            return jnp.mean((pred - batch["y"]) ** 2)

        return jax.grad(loss)(w)

    grads = []
    for batch in loader:
        assert batch["x"].shape[0] == 4  # local rows only
        gb = {k: global_batch_array(v, mesh, batch_sh) for k, v in batch.items()}
        assert gb["x"].shape[0] == 8  # global batch reassembled
        grads.append(np.asarray(jax.device_get(grad_step(w, gb))))

    if process_id == 0:
        np.save(out_dir / "grads.npy", np.stack(grads))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
