"""ReFlow: coupled-pair generation + straightening loop (data/reflow.py,
examples/reflow.py; reference roadmap item, unimplemented there)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from diffulab_tpu.data.reflow import ReflowPairsDataset, generate_pairs
from diffulab_tpu.diffuse import Diffuser
from diffulab_tpu.networks.denoisers.mmdit import MMDiT

REPO = Path(__file__).parent.parent


def _tiny_diffuser(n_steps=4):
    model = MMDiT(
        simple_dit=True, input_channels=3, inner_dim=32, embedding_dim=32,
        num_heads=4, mlp_ratio=2, patch_size=2, depth=2, n_classes=10,
        classifier_free=True, rngs=nnx.Rngs(0),
    )
    return Diffuser(model, sampling_method="euler", model_type="rectified_flow",
                    n_steps=n_steps)


def test_generate_pairs_couples_noise_to_samples():
    diffuser = _tiny_diffuser()
    ds = generate_pairs(diffuser, 12, (8, 8, 3), n_classes=10, batch_size=8, seed=3)
    assert len(ds) == 12
    assert ds.x.shape == ds.noise.shape == (12, 8, 8, 3)
    assert ds.labels.shape == (12,)
    # the coupling is real: re-solving the ODE from the stored z under the
    # same conditioning reproduces the stored x-hat
    out = diffuser.generate(
        jax.random.fold_in(jax.random.key(3), 0),
        {"y": jnp.asarray(ds.labels[:8])}, x=jnp.asarray(ds.noise[:8]), clamp_x=True,
    )
    np.testing.assert_allclose(np.asarray(out["x"]), ds.x[:8], atol=1e-5)
    # batch protocol carries the noise key for the trainer
    batch = ds.get_batch([0, 1])
    assert set(batch["model_inputs"]) == {"x", "coupled_noise", "y"}


def test_trainer_uses_coupled_noise():
    """With n_steps=1 timesteps are always t=1, so x_t = noise exactly; a
    model that is right ONLY at the coupled z shows loss ~ straightness
    residual — proving the batch noise, not fresh noise, enters the loss."""
    from diffulab_tpu.diffuse.flow import Flow

    flow = Flow(n_steps=1)
    x = np.zeros((4, 8, 8, 3), np.float32)
    z = np.random.default_rng(0).standard_normal((4, 8, 8, 3)).astype(np.float32)

    def model_fn(x=None, timesteps=None, cond=None, drop=None, **_):
        return {"x": x}  # v-prediction = x_t; correct iff x_t == z and x0 == 0

    # timesteps drawn uniformly; with coupled noise z and x0=0: x_t = t*z,
    # target v = z - 0 = z, prediction = t*z -> loss = E[(t-1)^2] * E[z^2]
    t = jnp.asarray([0.25, 0.5, 0.75, 1.0])
    losses = flow.compute_loss(model_fn, jnp.asarray(x), {}, t, jnp.asarray(z))
    expected = float(np.mean(((np.asarray(t) - 1.0).reshape(-1, 1, 1, 1) * z) ** 2))
    np.testing.assert_allclose(float(losses["loss"]), expected, rtol=1e-5)


def test_reflow_cli_end_to_end(tmp_path):
    """Full subprocess drive: train 1 epoch -> reflow on its checkpoint."""
    env_overrides = [
        "model.inner_dim=32", "model.embedding_dim=32", "model.num_heads=4",
        "model.depth=2", "dataset.train.n_samples=64", "dataset.val.n_samples=32",
        "dataloader.batch_size=16", "diffuser.n_steps=4",
        f"trainer.save_path={tmp_path}", "trainer.precision_type=no",
    ]
    # force real CPU in the subprocesses: the container's sitecustomize pins
    # the TPU tunnel backend, and a "CPU" subprocess silently grabbing the
    # relay wedges any concurrent chip job (CLAUDE.md environment gotchas)
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    train = subprocess.run(
        [sys.executable, "examples/train_diffusion.py", "--config-name",
         "train_synthetic_flow_matching", "trainer.n_epoch=1", "trainer.val_steps=4",
         *env_overrides],
        cwd=REPO, capture_output=True, text=True, timeout=1800, env=env,
    )
    assert train.returncode == 0, train.stdout[-2000:] + train.stderr[-2000:]
    ckpt = tmp_path / "synthetic_flow_matching" / "checkpoints" / "denoiser"

    reflow = subprocess.run(
        [sys.executable, "examples/reflow.py", "--config-name",
         "train_synthetic_flow_matching", "--ckpt", str(ckpt),
         "--n-pairs", "32", "--val-pairs", "16", "--epochs", "1",
         "--batch-size", "16", *env_overrides],
        cwd=REPO, capture_output=True, text=True, timeout=1800, env=env,
    )
    assert reflow.returncode == 0, reflow.stdout[-2000:] + reflow.stderr[-2000:]
    metrics = tmp_path / "synthetic_flow_matching_reflow" / "metrics.jsonl"
    rows = [json.loads(line) for line in metrics.read_text().splitlines()]
    losses = [v for r in rows for k, v in r.items() if k == "train/loss"]
    assert losses and all(np.isfinite(v) for v in losses)
