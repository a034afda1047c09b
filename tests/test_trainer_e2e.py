"""End-to-end smoke: tiny DiT + Flow + BaseTrainer on synthetic data
(SURVEY.md §4: one optimizer step decreases loss; sampler output finite)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from diffulab_tpu.data.loader import DataLoader
from diffulab_tpu.diffuse import Diffuser
from diffulab_tpu.networks.denoisers.mmdit import MMDiT
from diffulab_tpu.training.optim import adamw
from diffulab_tpu.training.trainer import BaseTrainer


class SyntheticDataset:
    """Tiny class-conditional blobs: class k -> constant image of value k/5 - 1."""

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


def _tiny_diffuser():
    model = MMDiT(
        simple_dit=True, input_channels=3, inner_dim=32, embedding_dim=32,
        num_heads=2, mlp_ratio=2, patch_size=2, depth=2, n_classes=5,
        classifier_free=True, rngs=nnx.Rngs(0),
    )
    return Diffuser(model, sampling_method="euler", model_type="rectified_flow", n_steps=8)


def test_train_loop_decreases_loss(tmp_path):
    diffuser = _tiny_diffuser()
    ds = SyntheticDataset()
    train_dl = DataLoader(ds, batch_size=16, shuffle=True, prefetch=0)
    val_dl = DataLoader(SyntheticDataset(n=16, seed=1), batch_size=16, shuffle=False, prefetch=0)

    trainer = BaseTrainer(
        n_epoch=3, save_path=tmp_path, project_name="smoke", use_ema=True,
        ema_update_after_step=0, ema_update_every=1,
    )
    trainer.train(
        diffuser, adamw(lr=2e-3), train_dl, val_dl,
        p_classifier_free_guidance=0.1, val_steps=4, log_validation_images=True, seed=0,
    )

    metrics_file = tmp_path / "smoke" / "metrics.jsonl"
    assert metrics_file.exists()
    rows = [json.loads(line) for line in metrics_file.read_text().splitlines()]
    train_losses = [r["train/loss"] for r in rows if "train/loss" in r]
    assert len(train_losses) == 3
    assert train_losses[-1] < train_losses[0], f"loss did not decrease: {train_losses}"

    # checkpoint written on best val
    assert (tmp_path / "smoke" / "checkpoints" / "denoiser").exists()
    # validation image grid written
    assert any((tmp_path / "smoke" / "images").glob("*.png"))


def test_generate_after_training_finite(tmp_path):
    diffuser = _tiny_diffuser()
    out = diffuser.generate(
        jax.random.key(0), cond={"y": jnp.array([0, 1])}, data_shape=(2, 8, 8, 3),
        guidance_scale=2.0, clamp_x=True,
    )
    assert out["x"].shape == (2, 8, 8, 3)
    assert np.isfinite(np.asarray(out["x"])).all()
    assert float(jnp.abs(out["x"]).max()) <= 1.0


def test_resume_from_checkpoint(tmp_path):
    diffuser = _tiny_diffuser()
    ds = SyntheticDataset(n=32)
    train_dl = DataLoader(ds, batch_size=16, shuffle=True, prefetch=0)
    val_dl = DataLoader(SyntheticDataset(n=16, seed=1), batch_size=16, shuffle=False, prefetch=0)
    trainer = BaseTrainer(n_epoch=1, save_path=tmp_path, project_name="ckpt", use_ema=True)
    trainer.train(diffuser, adamw(lr=1e-3), train_dl, val_dl, log_validation_images=False)

    ckpt = tmp_path / "ckpt" / "checkpoints"
    diffuser2 = _tiny_diffuser()
    trainer2 = BaseTrainer(n_epoch=1, save_path=tmp_path, project_name="ckpt2", use_ema=True)
    trainer2.train(
        diffuser2, adamw(lr=1e-3), train_dl, val_dl,
        denoiser_ckpt=str(ckpt / "denoiser"),
        optimizer_ckpt=str(ckpt / "optimizer"),
        ema_ckpt=str(ckpt / "ema"),
        log_validation_images=False,
    )
    assert (tmp_path / "ckpt2" / "checkpoints" / "denoiser").exists()


def test_resume_continues_ema_ramp(tmp_path):
    """Resume must continue the raw step counter: a 1+1-epoch resumed run's
    EMA equals the 2-epoch uninterrupted run's EMA. With the counter reset
    to 0, the EMA warmup restarts and the restored EMA silently becomes a
    near-copy of the live weights (measured as a phantom 3.5x FID win on
    resumed recipes — BASELINE.md round 3)."""
    from diffulab_tpu.training.checkpoint import restore_checkpoint

    ds = SyntheticDataset(n=32)
    val_ds = SyntheticDataset(n=16, seed=1)

    def loaders():
        # shuffle=True also covers set_epoch: the trainer pins the loader's
        # shuffle epoch so the resumed epoch replays the same batch order an
        # uninterrupted run would have used
        return (DataLoader(ds, batch_size=16, shuffle=True, prefetch=0),
                DataLoader(val_ds, batch_size=16, shuffle=False, prefetch=0))

    kw = dict(use_ema=True, ema_update_after_step=0, ema_update_every=1, ema_rate=0.9)

    train_dl, val_dl = loaders()
    straight = BaseTrainer(n_epoch=2, save_path=tmp_path, project_name="straight", **kw)
    straight.train(_tiny_diffuser(), adamw(lr=1e-3), train_dl, val_dl,
                   log_validation_images=False, seed=0)

    train_dl, val_dl = loaders()
    part1 = BaseTrainer(n_epoch=1, save_path=tmp_path, project_name="part1", **kw)
    part1.train(_tiny_diffuser(), adamw(lr=1e-3), train_dl, val_dl,
                log_validation_images=False, seed=0)

    ckpt = tmp_path / "part1" / "checkpoints"
    train_dl, val_dl = loaders()
    part2 = BaseTrainer(n_epoch=2, save_path=tmp_path, project_name="part2", **kw)
    part2.train(_tiny_diffuser(), adamw(lr=1e-3), train_dl, val_dl,
                denoiser_ckpt=str(ckpt / "denoiser"),
                optimizer_ckpt=str(ckpt / "optimizer"),
                ema_ckpt=str(ckpt / "ema"),
                epoch_start=1,
                log_validation_images=False, seed=0)

    ema_a = restore_checkpoint(tmp_path / "straight" / "checkpoints" / "ema")
    ema_b = restore_checkpoint(tmp_path / "part2" / "checkpoints" / "ema")
    leaves_a = jax.tree.leaves(ema_a)
    leaves_b = jax.tree.leaves(ema_b)
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_auto_resume_from_latest_checkpoint(tmp_path):
    """Preemption recovery: save_every_n_epochs writes checkpoints_latest/,
    and a re-launched trainer with auto_resume=True continues the SAME run —
    final EMA matches an uninterrupted sibling to numerical tolerance."""
    from diffulab_tpu.training.checkpoint import restore_checkpoint

    ds = SyntheticDataset(n=32)
    val_ds = SyntheticDataset(n=16, seed=1)

    def loaders():
        return (DataLoader(ds, batch_size=16, shuffle=True, prefetch=0),
                DataLoader(val_ds, batch_size=16, shuffle=False, prefetch=0))

    # gradient_accumulation_step=2 also regression-tests the resumed step
    # counter: it advances per MICRO-batch, so the resume start must NOT be
    # multiplied by the accumulation factor (a stray *accum shifted the EMA
    # ramp of every resumed accum>1 run). posthoc_ema=True covers the phema
    # track restore across the preemption (fp16 snapshot roundtrip).
    kw = dict(use_ema=True, ema_update_after_step=0, ema_update_every=1,
              ema_rate=0.9, save_every_n_epochs=1, gradient_accumulation_step=2,
              posthoc_ema=True)

    train_dl, val_dl = loaders()
    straight = BaseTrainer(n_epoch=2, save_path=tmp_path, project_name="straight2", **kw)
    straight.train(_tiny_diffuser(), adamw(lr=1e-3), train_dl, val_dl,
                   log_validation_images=False, seed=0)

    # "preempted" run: 1 epoch, then a fresh process picks it up with
    # auto_resume (same save_path/project) and runs to 2
    train_dl, val_dl = loaders()
    phase1 = BaseTrainer(n_epoch=1, save_path=tmp_path, project_name="preempt", **kw)
    phase1.train(_tiny_diffuser(), adamw(lr=1e-3), train_dl, val_dl,
                 log_validation_images=False, seed=0)
    from diffulab_tpu.training.trainer import Trainer

    latest = Trainer.find_latest_checkpoint(tmp_path / "preempt" / "checkpoints_latest")
    assert latest is not None and latest.name == "ep000001" and (latest / "ema").exists()

    train_dl, val_dl = loaders()
    phase2 = BaseTrainer(n_epoch=2, save_path=tmp_path, project_name="preempt", **kw)
    phase2.train(_tiny_diffuser(), adamw(lr=1e-3), train_dl, val_dl,
                 log_validation_images=False, seed=0, auto_resume=True)

    def _latest(project):
        from diffulab_tpu.training.trainer import Trainer

        return Trainer.find_latest_checkpoint(tmp_path / project / "checkpoints_latest")

    ema_a = restore_checkpoint(_latest("straight2") / "ema")
    ema_b = restore_checkpoint(_latest("preempt") / "ema")
    for a, b in zip(jax.tree.leaves(ema_a), jax.tree.leaves(ema_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    meta = restore_checkpoint(_latest("preempt") / "scheduler")
    assert int(meta["epoch"]) == 2

    # phema tracks survive the preemption: the resumed run's final snapshots
    # match the uninterrupted run's to fp16-roundtrip tolerance
    from diffulab_tpu.training.posthoc_ema import list_snapshots

    snaps_a = list_snapshots(tmp_path / "straight2" / "checkpoints" / "phema")
    snaps_b = list_snapshots(tmp_path / "preempt" / "checkpoints" / "phema")
    final_a = {g: p for s, g, p in snaps_a if s == max(r[0] for r in snaps_a)}
    final_b = {g: p for s, g, p in snaps_b if s == max(r[0] for r in snaps_b)}
    assert final_a.keys() == final_b.keys() and len(final_a) == 2
    for g in final_a:
        tree_a = restore_checkpoint(final_a[g])["params"]
        tree_b = restore_checkpoint(final_b[g])["params"]
        for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)):
            np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                       rtol=2e-3, atol=2e-3)


def test_save_optimizer_false_skips_moments(tmp_path):
    """Ablation-arm mode: best-val checkpoints omit the optimizer dir (2x the
    param bytes) while denoiser/ema/scheduler still land."""
    diffuser = _tiny_diffuser()
    train_dl = DataLoader(SyntheticDataset(n=32), batch_size=16, shuffle=True, prefetch=0)
    val_dl = DataLoader(SyntheticDataset(n=16, seed=1), batch_size=16, shuffle=False, prefetch=0)

    trainer = BaseTrainer(
        n_epoch=1, save_path=tmp_path, project_name="noopt", use_ema=True,
        ema_update_after_step=0, ema_update_every=1, save_optimizer=False,
    )
    trainer.train(diffuser, adamw(lr=1e-3), train_dl, val_dl,
                  p_classifier_free_guidance=0.1, val_steps=2,
                  log_validation_images=False, seed=0)
    base = tmp_path / "noopt" / "checkpoints"
    assert (base / "denoiser").exists()
    assert (base / "ema").exists()
    assert (base / "scheduler").exists()
    assert not (base / "optimizer").exists()
