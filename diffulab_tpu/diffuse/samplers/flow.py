"""Flow-matching samplers: Euler ODE and Euler–Maruyama SDE.

Behavioral parity with reference src/diffulab/diffuse/samplers/flow/euler.py:22-41
and euler_meruyama.py:11-57, re-expressed as pure functions whose timestep
arguments may be traced scalars (so a whole reverse trajectory runs inside one
`jax.lax.scan` under jit).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from diffulab_tpu.diffuse.samplers.common import FlowSampler, StepResult


@dataclasses.dataclass(frozen=True)
class Euler(FlowSampler):
    """Deterministic Euler ODE step: ``x_prev = x_t - v * (t_curr - t_prev)``."""

    name = "euler"

    def step(
        self,
        x_t: jax.Array,
        v: jax.Array,
        t_curr: jax.Array,
        t_prev: jax.Array,
        *,
        rng: jax.Array | None = None,
        x_prev: jax.Array | None = None,
    ) -> StepResult:
        del rng, x_prev
        dt = t_curr - t_prev  # positive: time flows 1 -> 0
        return {
            "x_prev": x_t - v * dt,
            "estimated_x0": x_t - v * t_curr,
        }


@dataclasses.dataclass(frozen=True)
class EulerMaruyama(FlowSampler):
    """Stochastic SDE sampler with per-element transition log-probs (GRPO).

    sigma(t) = eta * sqrt(t / (1 - min(t, tmax))) where ``tmax`` is the second
    timestep of the schedule (avoids the 1/(1-t) singularity at t=1; reference
    euler_meruyama.py:16-22). The drift adds a score-correction term so the SDE
    marginals match the ODE flow (reference euler_meruyama.py:41-43).

    When ``x_prev`` is provided the step does not sample; it only re-evaluates
    the transition log-density of that forced sample (off-policy GRPO re-eval).
    """

    name = "euler_maruyama"
    eta: float = 0.7
    tmax: float | None = None

    def with_timesteps(self, timesteps) -> "EulerMaruyama":
        return dataclasses.replace(self, tmax=float(timesteps[1]))

    def step(
        self,
        x_t: jax.Array,
        v: jax.Array,
        t_curr: jax.Array,
        t_prev: jax.Array,
        *,
        rng: jax.Array | None = None,
        x_prev: jax.Array | None = None,
    ) -> StepResult:
        assert self.tmax is not None, "with_timesteps must be called before step"
        t_curr = jnp.asarray(t_curr, dtype=jnp.float32)
        t_prev = jnp.asarray(t_prev, dtype=jnp.float32)
        sigma = jnp.sqrt(t_curr / (1.0 - jnp.minimum(t_curr, self.tmax))) * self.eta
        dt = t_curr - t_prev
        x_prev_mean = x_t - (v + sigma**2 / (2.0 * t_curr) * (x_t + (1.0 - t_curr) * v)) * dt
        x_prev_std = sigma * jnp.sqrt(dt)

        if x_prev is None:
            assert rng is not None, "rng required to sample from Euler-Maruyama"
            noise = jax.random.normal(rng, x_t.shape, dtype=x_t.dtype)
            x_prev = x_prev_mean + x_prev_std * noise

        estimated_x0 = x_t - v * t_curr
        logprob = -(
            (jax.lax.stop_gradient(x_prev) - x_prev_mean) ** 2 / (2.0 * x_prev_std**2)
            + jnp.log(x_prev_std)
            + 0.5 * math.log(2.0 * math.pi)
        )
        return {
            "x_prev": x_prev,
            "estimated_x0": estimated_x0,
            "x_prev_mean": x_prev_mean,
            "x_prev_std": jnp.broadcast_to(x_prev_std, (1,)),
            "logprob": logprob,
        }


@dataclasses.dataclass(frozen=True)
class Heun(FlowSampler):
    """Second-order Heun (predictor-corrector) ODE step.

    Not in the reference (its flow samplers are Euler and Euler-Maruyama);
    added per the project north star's sampler list. The formalization
    supplies the corrector velocity ``v2`` evaluated at the Euler-predicted
    point (Flow.one_step_denoise runs the second model eval):

        x_e    = x_t - v * dt            (predictor)
        x_prev = x_t - dt/2 * (v + v2)   (trapezoidal corrector)
    """

    name = "heun"
    needs_second_eval = True

    def predict(self, x_t: jax.Array, v: jax.Array, t_curr, t_prev) -> jax.Array:
        return x_t - v * (t_curr - t_prev)

    def step(
        self,
        x_t: jax.Array,
        v: jax.Array,
        t_curr: jax.Array,
        t_prev: jax.Array,
        *,
        v2: jax.Array | None = None,
        rng: jax.Array | None = None,
        x_prev: jax.Array | None = None,
    ) -> StepResult:
        del rng, x_prev
        dt = t_curr - t_prev
        if v2 is None:  # degrade to Euler when no corrector velocity is given
            v2 = v
        return {
            "x_prev": x_t - 0.5 * dt * (v + v2),
            "estimated_x0": x_t - v * t_curr,
        }
