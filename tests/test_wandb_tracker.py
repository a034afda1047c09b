"""Execute the Tracker's wandb branch with a recorded fake ``wandb`` module.

The reference's default observability backend is wandb
(``Accelerator(log_with="wandb")`` + ``init_trackers``,
reference trainers/common.py:107-114); the zero-egress image has no wandb,
so without this shim the branch in ``training/logging.py`` that replaces it
would be transcription-trusted, never executed (VERDICT round 3, item 7).
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest


class _FakeRun:
    def __init__(self, recorder):
        self._rec = recorder

    def log(self, metrics, step=None):
        self._rec.append(("log", metrics, step))

    def finish(self):
        self._rec.append(("finish",))


class _FakeImage:
    def __init__(self, data, caption=None):
        self.data = np.asarray(data)
        self.caption = caption


@pytest.fixture
def fake_wandb(monkeypatch):
    """Install a recording ``wandb`` module; yields its call list."""
    calls: list[tuple] = []
    mod = types.ModuleType("wandb")
    mod.Image = _FakeImage

    def init(project=None, dir=None, config=None, **kw):
        calls.append(("init", project, dir, config, kw))
        return _FakeRun(calls)

    mod.init = init
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return calls


def test_tracker_wandb_branch(fake_wandb, tmp_path):
    from diffulab_tpu.training.logging import Tracker

    tracker = Tracker(tmp_path, project_name="proj", run_config={"a": 1},
                      init_kwargs={"wandb": {"tags": ["t"]}})
    assert [c[0] for c in fake_wandb] == ["init"]
    _, project, rundir, config, kw = fake_wandb[0]
    assert project == "proj" and config == {"a": 1} and kw == {"tags": ["t"]}

    tracker.log({"train/loss": 0.5}, step=3)
    imgs = np.random.default_rng(0).uniform(0, 1, (4, 8, 8, 3)).astype(np.float32)
    tracker.log_images(imgs, step=3)                      # grid path
    tracker.log_images(imgs, step=4, captions=list("abcd"))  # per-image path
    tracker.finish()

    kinds = [c[0] for c in fake_wandb]
    assert kinds == ["init", "log", "log", "log", "finish"]
    assert fake_wandb[1][1] == {"train/loss": 0.5} and fake_wandb[1][2] == 3
    # grid: ONE wandb.Image of the tiled grid
    grid_payload = fake_wandb[2][1]["val/images"]
    assert isinstance(grid_payload, _FakeImage) and grid_payload.caption is None
    # captions: one wandb.Image per sample, captioned
    cap_payload = fake_wandb[3][1]["val/images"]
    assert [im.caption for im in cap_payload] == list("abcd")
    assert all(isinstance(im, _FakeImage) for im in cap_payload)
    # wandb mode must NOT double-write the JSONL fallback
    assert not (tmp_path / "metrics.jsonl").exists()


def test_trainer_logs_through_wandb(fake_wandb, tmp_path):
    """A real (tiny) BaseTrainer run drives init/log/Image/finish end-to-end."""
    from flax import nnx

    from diffulab_tpu.data.loader import DataLoader
    from diffulab_tpu.diffuse import Diffuser
    from diffulab_tpu.networks.denoisers.mmdit import MMDiT
    from diffulab_tpu.training.optim import adamw
    from diffulab_tpu.training.trainer import BaseTrainer
    from tests.test_trainer_e2e import SyntheticDataset

    model = MMDiT(
        simple_dit=True, input_channels=3, inner_dim=32, embedding_dim=32,
        num_heads=2, mlp_ratio=2, patch_size=2, depth=2, n_classes=5,
        classifier_free=True, rngs=nnx.Rngs(0),
    )
    diffuser = Diffuser(model, sampling_method="euler",
                        model_type="rectified_flow", n_steps=4)
    train_dl = DataLoader(SyntheticDataset(n=32), batch_size=16, shuffle=True, prefetch=0)
    val_dl = DataLoader(SyntheticDataset(n=16, seed=1), batch_size=16,
                        shuffle=False, prefetch=0)

    trainer = BaseTrainer(n_epoch=2, save_path=tmp_path, project_name="wandb_smoke",
                          init_kwargs={"wandb": {"tags": ["smoke"]}})
    trainer.train(diffuser, adamw(lr=1e-3), train_dl, val_dl,
                  p_classifier_free_guidance=0.1, val_steps=2,
                  log_validation_images=True, seed=0)

    kinds = [c[0] for c in fake_wandb]
    assert kinds[0] == "init" and kinds[-1] == "finish"
    logged_keys = {k for c in fake_wandb if c[0] == "log" for k in c[1]}
    assert {"train/loss", "val/loss"} <= logged_keys
    # validation grids went through wandb.Image, not PNG fallback
    assert "val/images" in logged_keys
    assert not (tmp_path / "wandb_smoke" / "images").exists()
    assert not (tmp_path / "wandb_smoke" / "metrics.jsonl").exists()
