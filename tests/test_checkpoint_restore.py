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
