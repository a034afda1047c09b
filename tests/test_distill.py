"""Guidance distillation (arXiv:2210.03142; no reference counterpart).

The student regresses onto the FROZEN teacher's CFG-guided prediction so
guidance_scale=0 sampling reproduces guided quality in one forward per step.
Checks: the distill target is exactly the teacher's fused-CFG call, the
trainer leaves the teacher untouched (no grads, no weight decay), the distill
loss decreases, and EDM/gaussian variants compute finite losses (gaussian
rejects learned-variance students).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from diffulab_tpu.data.loader import DataLoader
from diffulab_tpu.diffuse import Diffuser
from diffulab_tpu.diffuse.flow import _cfg_model_call
from diffulab_tpu.networks.denoisers.mmdit import MMDiT
from diffulab_tpu.training.optim import adamw
from diffulab_tpu.training.trainer import BaseTrainer


class SyntheticDataset:
    def __init__(self, n=64, size=8, channels=3, n_classes=5, seed=0):
        rng = np.random.default_rng(seed)
        self.labels = rng.integers(0, n_classes, size=n)
        base = (self.labels / (n_classes - 1) * 2 - 1).astype(np.float32)
        self.images = np.tile(base[:, None, None, None], (1, size, size, channels))
        self.images += rng.normal(0, 0.05, self.images.shape).astype(np.float32)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        return {"model_inputs": {"x": self.images[idx], "y": np.int64(self.labels[idx])}}


def _tiny_model(seed=0):
    return MMDiT(
        simple_dit=True, input_channels=3, inner_dim=32, embedding_dim=32,
        num_heads=2, mlp_ratio=2, patch_size=2, depth=2, n_classes=5,
        classifier_free=True, rngs=nnx.Rngs(seed),
    )


def _randomize(model, seed=3):
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.key(seed), len(leaves))
    leaves = [0.02 * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)]
    return nnx.merge(graphdef, jax.tree.unflatten(treedef, leaves), rest)


def test_flow_distill_target_is_teacher_guided_prediction():
    student = _randomize(_tiny_model(0), seed=3)
    teacher = _randomize(_tiny_model(1), seed=4)
    diffusion = Diffuser(student, sampling_method="euler",
                         model_type="rectified_flow", n_steps=8).diffusion
    x0 = jax.random.normal(jax.random.key(0), (4, 8, 8, 3))
    cond = {"y": jnp.array([0, 1, 2, 3])}
    t = jnp.array([0.2, 0.4, 0.6, 0.8])
    noise = jax.random.normal(jax.random.key(1), x0.shape)
    w = 2.0

    def student_fn(**kw):
        return student(**kw, train=False)

    def teacher_fn(**kw):
        return teacher(**kw, train=False)

    losses = diffusion.compute_loss(student_fn, x0, cond, t, noise,
                                    distill_fn=teacher_fn, distill_guidance=w)
    # manual replication
    xt, _ = diffusion.add_noise(x0, t, noise)
    drop = jnp.zeros((4,), bool)
    guided = _cfg_model_call(teacher_fn, xt, t, cond, w, use_cfg=True)
    pred = student(xt, t, cond=cond, drop=drop)["x"]
    manual = jnp.mean((guided - pred) ** 2)
    np.testing.assert_allclose(float(losses["loss"]), float(manual), rtol=1e-5)
    # w > 0 with distinct cond/uncond branches -> non-degenerate target
    assert float(losses["loss"]) > 0


@pytest.mark.parametrize("model_type,extra", [
    ("edm", {}),
    ("gaussian_diffusion", {"n_steps": 32}),
])
def test_other_formalizations_distill_loss_finite(model_type, extra):
    student = _randomize(_tiny_model(0), seed=3)
    teacher = _randomize(_tiny_model(1), seed=4)
    kwargs = {"n_steps": 8, **extra}
    diffusion = Diffuser(student, sampling_method="euler" if model_type == "edm" else "ddpm",
                         model_type=model_type, **kwargs).diffusion
    x0 = jax.random.normal(jax.random.key(0), (4, 8, 8, 3))
    cond = {"y": jnp.array([0, 1, 2, 3])}
    t = diffusion.draw_timesteps(jax.random.key(2), 4)
    noise = jax.random.normal(jax.random.key(1), x0.shape)

    losses = diffusion.compute_loss(
        lambda **kw: student(**kw, train=False), x0, cond, t, noise,
        distill_fn=lambda **kw: teacher(**kw, train=False), distill_guidance=1.5,
    )
    assert np.isfinite(float(losses["loss"]))


def test_gaussian_distill_rejects_learned_variance():
    student = MMDiT(
        simple_dit=True, input_channels=3, output_channels=6, inner_dim=32,
        embedding_dim=32, num_heads=2, mlp_ratio=2, patch_size=2, depth=2,
        n_classes=5, classifier_free=True, rngs=nnx.Rngs(0),
    )
    diffusion = Diffuser(
        student, sampling_method="ddpm", model_type="gaussian_diffusion",
        n_steps=32, extra_args={"sampler_parameters": {"var_type": "learned_range"}},
    ).diffusion
    x0 = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    cond = {"y": jnp.array([0, 1])}
    t = diffusion.draw_timesteps(jax.random.key(2), 2)
    noise = jax.random.normal(jax.random.key(1), x0.shape)
    with pytest.raises(AssertionError):
        diffusion.compute_loss(
            lambda **kw: student(**kw, train=False), x0, cond, t, noise,
            distill_fn=lambda **kw: student(**kw, train=False), distill_guidance=1.5,
        )


def test_distill_training_freezes_teacher_and_learns(tmp_path):
    teacher = _randomize(_tiny_model(1), seed=4)
    teacher_params_before = jax.tree.map(
        np.asarray, nnx.split(teacher, nnx.Param, ...)[1]
    )
    student = _randomize(_tiny_model(0), seed=3)
    student_params_before = jax.tree.map(
        np.asarray, nnx.split(student, nnx.Param, ...)[1]
    )
    diffuser = Diffuser(student, sampling_method="euler",
                        model_type="rectified_flow", n_steps=8)
    ds = SyntheticDataset()
    train_dl = DataLoader(ds, batch_size=16, shuffle=True, prefetch=0)
    val_dl = DataLoader(SyntheticDataset(n=16, seed=1), batch_size=16,
                        shuffle=False, prefetch=0)

    trainer = BaseTrainer(n_epoch=3, save_path=tmp_path, project_name="distill",
                          distill_guidance=1.5)
    trainer.train(
        diffuser, adamw(lr=2e-3, weight_decay=0.1), train_dl, val_dl,
        val_steps=4, log_validation_images=False, seed=0,
        distill_teacher=teacher,
    )

    # the teacher is bit-identical after training (no grads, no weight decay)
    teacher_params_after = jax.tree.map(
        np.asarray, nnx.split(teacher, nnx.Param, ...)[1]
    )
    jax.tree.map(np.testing.assert_array_equal,
                 teacher_params_before, teacher_params_after)
    # the student moved
    student_params_after = jax.tree.map(
        np.asarray, nnx.split(diffuser.denoiser, nnx.Param, ...)[1]
    )
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(a - b).max()),
        student_params_before, student_params_after))
    assert max(moved) > 1e-5

    # the distill loss decreases over epochs
    rows = [json.loads(line)
            for line in (tmp_path / "distill" / "metrics.jsonl").read_text().splitlines()]
    train_losses = [r["train/loss"] for r in rows if "train/loss" in r]
    assert len(train_losses) == 3
    assert train_losses[-1] < train_losses[0], f"distill loss did not decrease: {train_losses}"

    # the saved checkpoint is the student split only (no teacher leaves):
    # it must restore through restore_train_modules into a teacher-free
    # bundle, exactly like every non-distill run's checkpoint
    from diffulab_tpu.training.checkpoint import restore_train_modules
    from diffulab_tpu.training.trainer import _TrainModules

    ckpt = tmp_path / "distill" / "checkpoints" / "denoiser"
    assert ckpt.exists()
    fresh = _tiny_model(0)
    restore_train_modules(ckpt, _TrainModules(fresh, []))
    restored = jax.tree.map(np.asarray, nnx.split(fresh, nnx.Param, ...)[1])
    jax.tree.map(np.testing.assert_array_equal, student_params_after, restored)


def test_distill_requires_guidance():
    diffuser = Diffuser(_tiny_model(0), sampling_method="euler",
                        model_type="rectified_flow", n_steps=8)
    ds = SyntheticDataset(n=16)
    dl = DataLoader(ds, batch_size=16, shuffle=False, prefetch=0)
    trainer = BaseTrainer(n_epoch=1, save_path=None, project_name="x")
    with pytest.raises(AssertionError):
        trainer.train(diffuser, adamw(lr=1e-3), dl, None,
                      distill_teacher=_tiny_model(1), val_steps=1,
                      log_validation_images=False)
