"""restore_train_modules must mirror BaseTrainer.train's three-way trainable
split (ADVICE r2: frozen-embedder checkpoints failed to restore because the
helper always used plain nnx.Param)."""

import numpy as np
from flax import nnx

from diffulab_tpu.networks.denoisers.mmdit import MMDiT
from diffulab_tpu.networks.embedders.precomputed import PrecomputedEmbedder
from diffulab_tpu.training.checkpoint import restore_train_modules, save_checkpoint
from diffulab_tpu.training.trainer import _TrainModules


def _mm_dit(seed=0):
    embedder = PrecomputedEmbedder(
        null_embedding=np.random.default_rng(0).normal(size=(8, 32)).astype(np.float32),
        null_embedding_seq_len=4,
    )
    return MMDiT(
        simple_dit=False, input_channels=4, inner_dim=64, embedding_dim=64,
        num_heads=4, mlp_ratio=2, patch_size=2, depth=2, n_single_stream_blocks=1,
        classifier_free=True, context_embedder=embedder, rngs=nnx.Rngs(seed),
    )


def test_restore_frozen_embedder_layout(tmp_path):
    # save with the trainer's frozen-embedder split: params excludes the
    # context_embedder subtree (it rides in rest)
    modules = _TrainModules(_mm_dit(seed=0), [])
    trainable = nnx.All(nnx.Param, nnx.Not(nnx.PathContains("context_embedder")))
    _, params, _, rest = nnx.split(modules, trainable, nnx.RngState, ...)
    save_checkpoint(tmp_path / "denoiser", {"params": params, "rest": rest})

    # restoring into a differently-seeded model must reproduce the saved tree
    target = _TrainModules(_mm_dit(seed=1), [])
    restore_train_modules(tmp_path / "denoiser", target)
    got = nnx.state(target, nnx.Param)
    want = nnx.state(modules, nnx.Param)
    for (pa, a), (pb, b) in zip(
        nnx.to_flat_state(got), nnx.to_flat_state(want)
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a.value), np.asarray(b.value))


def test_restore_train_embedder_layout(tmp_path):
    # a train_embedder=True run stores everything under params
    modules = _TrainModules(_mm_dit(seed=0), [])
    _, params, _, rest = nnx.split(modules, nnx.Param, nnx.RngState, ...)
    save_checkpoint(tmp_path / "denoiser", {"params": params, "rest": rest})

    target = _TrainModules(_mm_dit(seed=1), [])
    restore_train_modules(tmp_path / "denoiser", target, train_embedder=True)
    a = nnx.to_flat_state(nnx.state(target, nnx.Param))
    b = nnx.to_flat_state(nnx.state(modules, nnx.Param))
    for (pa, va), (pb, vb) in zip(a, b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va.value), np.asarray(vb.value))


def test_async_checkpointer_snapshots_before_write(tmp_path):
    """AsyncCheckpointer must save the values at save() time even if the live
    arrays are re-assigned (or donated) immediately afterwards, and wait()
    must surface background write errors."""
    import jax.numpy as jnp

    from diffulab_tpu.training.checkpoint import AsyncCheckpointer, restore_checkpoint

    ckptr = AsyncCheckpointer()
    params = {"w": jnp.arange(8, dtype=jnp.float32), "step": 3}
    ckptr.save({tmp_path / "a": {"params": params}})
    # mutate the python refs right away; the on-device snapshot is independent
    params["w"] = params["w"] * 100
    ckptr.wait()
    restored = restore_checkpoint(tmp_path / "a")
    np.testing.assert_array_equal(restored["params"]["w"], np.arange(8, dtype=np.float32))
    assert int(restored["params"]["step"]) == 3

    # write errors surface on wait()
    bad = AsyncCheckpointer()
    bad.save({"/proc/definitely/not/writable/x": {"p": jnp.zeros(2)}})
    import pytest

    with pytest.raises(BaseException):
        bad.wait()


def test_trainer_async_checkpointing_end_to_end(tmp_path):
    """The trainer's default async save path produces the same durable orbax
    artifact set once train() returns."""
    import jax
    import jax.numpy as jnp

    from diffulab_tpu.data.loader import DataLoader
    from diffulab_tpu.diffuse import Diffuser
    from diffulab_tpu.training.optim import adamw
    from diffulab_tpu.training.trainer import BaseTrainer

    class DS:
        def __init__(self, n=32, seed=0):
            rng = np.random.default_rng(seed)
            self.x = rng.normal(0, 0.5, (n, 8, 8, 3)).astype(np.float32)
            self.y = rng.integers(0, 5, n)
        def __len__(self):
            return len(self.x)
        def __getitem__(self, i):
            return {"model_inputs": {"x": self.x[i], "y": np.int64(self.y[i])}}

    model = MMDiT(simple_dit=True, input_channels=3, inner_dim=32, embedding_dim=32,
                  num_heads=2, mlp_ratio=2, patch_size=2, depth=1, n_classes=5,
                  classifier_free=True, rngs=nnx.Rngs(0))
    diffuser = Diffuser(model, sampling_method="euler", model_type="rectified_flow", n_steps=4)
    trainer = BaseTrainer(n_epoch=1, save_path=tmp_path, project_name="async",
                          use_ema=True, async_checkpointing=True)
    trainer.train(diffuser, adamw(lr=1e-3), DataLoader(DS(), 16, prefetch=0),
                  DataLoader(DS(16, 1), 16, shuffle=False, prefetch=0),
                  log_validation_images=False)
    base = tmp_path / "async" / "checkpoints"
    for name in ("denoiser", "optimizer", "ema", "scheduler"):
        assert (base / name).exists(), name
    # the saved checkpoint restores into a fresh model without error
    target = _TrainModules(
        MMDiT(simple_dit=True, input_channels=3, inner_dim=32, embedding_dim=32,
              num_heads=2, mlp_ratio=2, patch_size=2, depth=1, n_classes=5,
              classifier_free=True, rngs=nnx.Rngs(1)), [])
    restore_train_modules(base / "denoiser", target)
