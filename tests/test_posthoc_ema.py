"""Post-hoc EMA (training/posthoc_ema.py): power-function averaging math,
offline reconstruction accuracy, and trainer/CLI integration.

Validation strategy mirrors the paper's construction (Karras et al.
arXiv:2312.02696): the online recursion must equal the closed-form
profile weights on a scalar trajectory, and a reconstruction from two
stored tracks must match the EMA that a third track with the target
exponent would have produced, had it been maintained during training.
"""

import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from diffulab_tpu.training.posthoc_ema import (
    DEFAULT_GAMMAS,
    gamma_to_sigma_rel,
    power_ema_update,
    reconstruct_from_dir,
    sigma_rel_to_gamma,
    solve_weights,
)


def _run_power_ema(traj: np.ndarray, gamma: float) -> np.ndarray:
    """Online recursion over a scalar/vector trajectory (1-indexed steps)."""
    ema = jnp.asarray(traj[0])
    for t in range(1, len(traj) + 1):
        ema = power_ema_update(ema, jnp.asarray(traj[t - 1]), jnp.asarray(t), gamma)
    return np.asarray(ema)


def _exact_profile_average(traj: np.ndarray, gamma: float) -> np.ndarray:
    """The recursion's exact closed form: w_t = (1 - ((t-1)/t)**(g+1)) * (t/T)**(g+1).

    (Unrolling ema_T = sum_t (1-beta_t) * prod_{s>t} beta_s * theta_t with
    beta_t = ((t-1)/t)**(g+1); the telescoping product gives (t/T)**(g+1).)
    """
    T = len(traj)
    t = np.arange(1, T + 1, dtype=np.float64)
    w = (1.0 - ((t - 1.0) / t) ** (gamma + 1.0)) * (t / T) ** (gamma + 1.0)
    assert abs(w.sum() - 1.0) < 1e-12
    return np.tensordot(w, traj.astype(np.float64), axes=(0, 0))


def test_sigma_rel_gamma_roundtrip():
    # paper-standard pairs
    assert gamma_to_sigma_rel(6.94) == pytest.approx(0.0999, abs=2e-4)
    assert gamma_to_sigma_rel(16.97) == pytest.approx(0.05, abs=2e-4)
    for sr in (0.02, 0.05, 0.10, 0.15, 0.20, 0.28):
        assert gamma_to_sigma_rel(sigma_rel_to_gamma(sr)) == pytest.approx(sr, rel=1e-9)


def test_recursion_matches_closed_form_weights():
    rng = np.random.default_rng(0)
    traj = rng.normal(size=(200, 3)).astype(np.float32).cumsum(axis=0)
    for gamma in DEFAULT_GAMMAS:
        online = _run_power_ema(traj, gamma)
        exact = _exact_profile_average(traj, gamma)
        np.testing.assert_allclose(online, exact, rtol=2e-5, atol=2e-5)


def test_closed_form_is_power_profile():
    # the discrete weights track tau**gamma: correlation with the continuous
    # profile should be essentially exact away from the first few steps
    T, gamma = 500, 6.94
    t = np.arange(1, T + 1, dtype=np.float64)
    w = (1.0 - ((t - 1.0) / t) ** (gamma + 1.0)) * (t / T) ** (gamma + 1.0)
    cont = (gamma + 1.0) * t**gamma / T ** (gamma + 1.0)
    # the first-order (gamma+1)/t factor deviates ~gamma/(2t) relatively, so
    # compare where the profile actually carries mass (w(tau) ~ tau**6.94
    # makes the first half's weights ~1e-3 of the peak)
    np.testing.assert_allclose(w[T // 2:], cont[T // 2:], rtol=2e-2)
    assert w[: T // 2].sum() < 0.01


def test_reconstruction_matches_held_out_track():
    """Two stored tracks + snapshots -> reconstruct a target gamma that was
    never maintained; compare against actually maintaining it."""
    rng = np.random.default_rng(1)
    T = 240
    traj = rng.normal(size=(T, 8)).astype(np.float32).cumsum(axis=0) / np.sqrt(T)

    snap_every = 20
    snaps, ts, gammas = [], [], []
    emas = {g: jnp.asarray(traj[0]) for g in DEFAULT_GAMMAS}
    target_gamma = sigma_rel_to_gamma(0.08)
    held_out = jnp.asarray(traj[0])
    for t in range(1, T + 1):
        x = jnp.asarray(traj[t - 1])
        for g in DEFAULT_GAMMAS:
            emas[g] = power_ema_update(emas[g], x, jnp.asarray(t), g)
        held_out = power_ema_update(held_out, x, jnp.asarray(t), target_gamma)
        if t % snap_every == 0:
            for g in DEFAULT_GAMMAS:
                # store fp16 like the trainer does
                snaps.append(np.asarray(emas[g], np.float16))
                ts.append(t)
                gammas.append(g)

    w = solve_weights(ts, gammas, T, target_gamma)
    recon = sum(float(wi) * s.astype(np.float64) for wi, s in zip(w, snaps))
    scale = np.abs(np.asarray(held_out)).mean()
    err = np.abs(recon - np.asarray(held_out, np.float64)).max()
    assert err < 0.02 * scale, f"reconstruction error {err} vs scale {scale}"


def test_reconstruction_recovers_stored_track_exactly():
    """Target equal to a stored track at the final step -> the solver should
    put (nearly) all weight on that final snapshot."""
    ts = [20, 40, 60, 20, 40, 60]
    gs = [6.94] * 3 + [16.97] * 3
    w = solve_weights(ts, gs, 60, 16.97)
    assert w[-1] == pytest.approx(1.0, abs=1e-6)
    assert np.abs(np.delete(w, -1)).max() < 1e-6


def test_trainer_snapshots_and_cli_reconstruction(tmp_path):
    from diffulab_tpu.data.loader import DataLoader
    from diffulab_tpu.diffuse import Diffuser
    from diffulab_tpu.networks.denoisers.mmdit import MMDiT
    from diffulab_tpu.training.optim import adamw
    from diffulab_tpu.training.trainer import BaseTrainer, _TrainModules
    from tests.test_trainer_e2e import SyntheticDataset

    model = MMDiT(
        simple_dit=True, input_channels=3, inner_dim=32, embedding_dim=32,
        num_heads=2, mlp_ratio=2, patch_size=2, depth=2, n_classes=5,
        classifier_free=True, rngs=nnx.Rngs(0),
    )
    diffuser = Diffuser(model, sampling_method="euler", model_type="rectified_flow", n_steps=4)
    train_dl = DataLoader(SyntheticDataset(n=32), batch_size=16, shuffle=True, prefetch=0)
    val_dl = DataLoader(SyntheticDataset(n=16, seed=1), batch_size=16, shuffle=False, prefetch=0)

    trainer = BaseTrainer(
        n_epoch=3, save_path=tmp_path, project_name="phema", use_ema=True,
        posthoc_ema=True, async_checkpointing=False,
    )
    trainer.train(diffuser, adamw(lr=1e-3), train_dl, val_dl, log_validation_images=False)

    phema_dir = tmp_path / "phema" / "checkpoints" / "phema"
    # 3 epochs x 2 tracks
    snap_dirs = sorted(phema_dir.glob("step*_g*"))
    assert len(snap_dirs) == 6, snap_dirs

    # library-level reconstruction: params-tree layout matches the ema ckpt
    result = reconstruct_from_dir(phema_dir, sigma_rel=0.10)
    leaves = jax.tree.leaves(result["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    # CLI end-to-end + restore through the shared checkpoint path. The
    # subprocess MUST force CPU: the parent's conftest pins jax to CPU but a
    # child inherits the container's axon (TPU relay) default, and a second
    # relay client wedges any concurrent chip job (BASELINE.md house rule).
    import os

    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "examples/reconstruct_ema.py", "--run-dir",
         str(tmp_path / "phema"), "--sigma-rel", "0.1"],
        capture_output=True, text=True, timeout=300, cwd=Path(__file__).parent.parent,
        env=env,
    )
    assert out.returncode == 0, out.stderr
    recon_dir = tmp_path / "phema" / "checkpoints" / "phema_sr0.1"
    assert recon_dir.exists()

    from diffulab_tpu.training.checkpoint import restore_train_modules

    modules = _TrainModules(diffuser.denoiser, list(diffuser.extra_losses))
    restore_train_modules(recon_dir, modules)
    sample = diffuser.generate(
        jax.random.key(0), cond={"y": jnp.array([0, 1])}, data_shape=(2, 8, 8, 3),
    )
    assert np.isfinite(np.asarray(sample["x"])).all()
