"""Exponential moving average of parameters, ema-pytorch semantics.

The reference wraps the denoiser in ``ema_pytorch.EMA(beta=rate,
update_after_step, update_every)`` (base_trainer.py:247-253). That library's
decay ramps up as ``1 - (1 + step/inv_gamma) ** -power`` capped at ``beta``
(defaults inv_gamma=1, power=2/3), counts steps only after
``update_after_step``, and copies parameters verbatim until then. This module
reimplements those semantics as a pure pytree update that runs inside the
jitted train step (``lax.cond`` on the step counter).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EMAConfig:
    beta: float = 0.999
    update_after_step: int = 100
    update_every: int = 10
    inv_gamma: float = 1.0
    power: float = 2.0 / 3.0


def ema_decay(config: EMAConfig, step: jax.Array) -> jax.Array:
    """Current decay for a raw train-step counter (ema-pytorch ramp).

    ema-pytorch's ``get_current_decay`` uses the raw step count in the ramp
    (NOT divided by ``update_every`` — only the update *cadence* is gated on
    it), so the warmup length is measured in train steps.
    """
    epoch = jnp.clip(step - config.update_after_step - 1.0, min=0.0)
    value = 1.0 - (1.0 + epoch / config.inv_gamma) ** -config.power
    return jnp.clip(value, min=0.0, max=config.beta)


def ema_update(config: EMAConfig, ema_params: Any, params: Any, step: jax.Array) -> Any:
    """One (conditional) EMA update; call every train step with the raw counter.

    - step <= update_after_step: hard copy (ema tracks online params);
    - afterwards, every ``update_every`` steps: lerp with the ramped decay.
    """
    decay = ema_decay(config, step)
    should_update = (step % config.update_every) == 0
    warmup = step <= config.update_after_step

    def lerp(e, p):
        e32 = e.astype(jnp.float32)
        p32 = p.astype(jnp.float32)
        new = jnp.where(warmup, p32, e32 * decay + p32 * (1.0 - decay))
        new = jnp.where(should_update | warmup, new, e32)
        return new.astype(e.dtype)

    return jax.tree.map(lerp, ema_params, params)
