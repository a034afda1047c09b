"""EMA semantics vs ema-pytorch (the library the reference wraps,
base_trainer.py:247-253)."""

import jax.numpy as jnp
import numpy as np

from diffulab_tpu.training.ema import EMAConfig, ema_decay, ema_update


def test_ema_decay_matches_ema_pytorch_ramp():
    """ema-pytorch get_current_decay: epoch = clamp(step - update_after_step - 1, 0);
    decay = clamp(1 - (1 + epoch/inv_gamma) ** -power, 0, beta) — the raw step
    count drives the ramp, update_every only gates the cadence."""
    cfg = EMAConfig(beta=0.999, update_after_step=10, update_every=10)
    for step in [0, 5, 11, 12, 21, 111, 1011, 100_011]:
        epoch = max(step - cfg.update_after_step - 1, 0)
        expected = min(max(1.0 - (1.0 + epoch / cfg.inv_gamma) ** -cfg.power, 0.0), cfg.beta)
        got = float(ema_decay(cfg, jnp.asarray(step, jnp.float32)))
        assert np.isclose(got, expected, atol=1e-6), (step, got, expected)


def test_ema_update_warmup_copies_then_lerps():
    cfg = EMAConfig(beta=0.9, update_after_step=2, update_every=1)
    ema = {"w": jnp.zeros(3)}
    params = {"w": jnp.ones(3)}
    # during warmup the EMA hard-copies online params
    out = ema_update(cfg, ema, params, jnp.asarray(1))
    np.testing.assert_allclose(np.asarray(out["w"]), 1.0)
    # after warmup it lerps with the ramped decay
    out = ema_update(cfg, ema, params, jnp.asarray(10))
    d = float(ema_decay(cfg, jnp.asarray(10, jnp.float32)))
    np.testing.assert_allclose(np.asarray(out["w"]), (1.0 - d), rtol=1e-6)


def test_ema_update_respects_cadence():
    cfg = EMAConfig(beta=0.9, update_after_step=0, update_every=10)
    ema = {"w": jnp.zeros(3)}
    params = {"w": jnp.ones(3)}
    # off-cadence step after warmup: EMA unchanged
    out = ema_update(cfg, ema, params, jnp.asarray(11))
    np.testing.assert_allclose(np.asarray(out["w"]), 0.0)
