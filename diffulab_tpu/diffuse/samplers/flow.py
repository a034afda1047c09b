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

from diffulab_tpu.diffuse.samplers.common import (
    FlowSampler,
    StepResult,
    unipc_bh2_correction,
)


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
class DPMSolverPP2M(FlowSampler):
    """Multistep DPM-Solver++(2M) under the rectified-flow schedule.

    Not in the reference (its flow samplers are Euler and Euler-Maruyama);
    added because quality-at-few-steps is the sampling headline: one model
    eval per step (same cost as Euler) with second-order accuracy from the
    previous step's data prediction — 10-15 DPM++ steps match ~50 Euler
    steps (measured in BASELINE.md "few-step sampling").

    Rectified flow is the alpha_t = 1-t, sigma_t = t diffusion schedule, so
    DPM-Solver++ (Lu et al. 2022, arXiv:2211.01095, data-prediction
    multistep variant) applies with half-log-SNR
    ``lambda(t) = log((1-t)/t)``:

        h      = lambda(t_prev) - lambda(t_curr)          (> 0)
        D      = (1 + 1/2r) x0_i - 1/2r x0_{i-1},  r = h_last / h
        x_prev = (sig_prev/sig_curr) x_t - alpha_prev (e^{-h} - 1) D

    The first step and the final step (t_prev ~ 0, where 1/r blows up) use
    the first-order update — ``lower_order_final`` in diffusers' multistep
    solver — which at t_prev = 0 returns the data prediction exactly.

    Multistep: carries ``{x0_prev, h_last, has_prev}`` through the denoise
    scan (``is_multistep`` protocol; flow.py threads it).
    """

    name = "dpmpp_2m"
    is_multistep = True
    t_eps: float = 1e-5

    def init_state(self, x: jax.Array) -> dict[str, jax.Array]:
        return {
            "x0_prev": jnp.zeros_like(x),
            "h_last": jnp.zeros((), jnp.float32),
            "has_prev": jnp.zeros((), bool),
        }

    def _lam(self, t: jax.Array) -> jax.Array:
        t = jnp.clip(t, self.t_eps, 1.0 - self.t_eps)
        return jnp.log((1.0 - t) / t)

    def step(
        self,
        x_t: jax.Array,
        v: jax.Array,
        t_curr: jax.Array,
        t_prev: jax.Array,
        *,
        rng: jax.Array | None = None,
        x_prev: jax.Array | None = None,
        state: dict[str, jax.Array] | None = None,
    ) -> StepResult:
        del rng, x_prev
        assert state is not None, "multistep sampler: denoise must thread init_state"
        t_curr = jnp.asarray(t_curr, jnp.float32)
        t_prev = jnp.asarray(t_prev, jnp.float32)
        x0 = x_t - v * t_curr

        h = self._lam(t_prev) - self._lam(t_curr)
        r_safe = jnp.maximum(state["h_last"] / h, 1e-8)
        d2 = (1.0 + 1.0 / (2.0 * r_safe)) * x0.astype(jnp.float32) \
            - (1.0 / (2.0 * r_safe)) * state["x0_prev"].astype(jnp.float32)
        # first-order on the first step and on the final (t_prev ~ 0) step
        first_order = jnp.logical_or(~state["has_prev"], t_prev <= self.t_eps)
        d = jnp.where(first_order, x0.astype(jnp.float32), d2)

        sig_ratio = jnp.clip(t_prev, self.t_eps, 1.0) / jnp.clip(t_curr, self.t_eps, 1.0)
        sig_ratio = jnp.where(t_prev <= self.t_eps, 0.0, sig_ratio)
        em1 = jnp.expm1(-h)  # e^{-h} - 1, exactly -1 at the final step
        em1 = jnp.where(t_prev <= self.t_eps, -1.0, em1)
        alpha_prev = 1.0 - t_prev
        x_next = sig_ratio * x_t.astype(jnp.float32) - alpha_prev * em1 * d

        return {
            "x_prev": x_next.astype(x_t.dtype),
            "estimated_x0": x0,
            "state": {
                "x0_prev": x0.astype(x_t.dtype),
                "h_last": h,
                "has_prev": jnp.ones((), bool),
            },
        }


@dataclasses.dataclass(frozen=True)
class UniPC(FlowSampler):
    """UniPC (unified predictor-corrector, arXiv:2302.04867) under the
    rectified-flow schedule, solver order 2, B(h) = e^h - 1 ("bh2").

    Not in the reference (its flow samplers are Euler and Euler-Maruyama);
    added for the few-step headline: still one model eval per step, but each
    step's fresh eval also *corrects the previous transition* (UniC) before
    the order-2 predictor (UniP) advances — locally third-order accurate at
    DPM-Solver++(2M) cost. The UniP-2/bh2 predictor alone is algebraically
    identical to DPM++(2M); the corrector is the net gain.

    Rectified flow is the alpha_t = 1-t, sigma_t = t schedule with
    half-log-SNR ``lambda(t) = log((1-t)/t)``. Following the data-prediction
    updates of the paper (and the diffusers ``UniPCMultistepScheduler``
    semantics): the corrector for the transition s -> t consumes the model
    output evaluated at the *predicted* (uncorrected) x_t; the final step
    (t_prev ~ 0) is first-order, which returns the data prediction exactly;
    early steps ramp the order up as history accumulates.

    Multistep state carried through the denoise scan (``is_multistep``):
    ``x_last`` (sample the last transition started from), ``m_last``/
    ``m_last2`` (previous data predictions), ``lam_last``/``lam_last2``,
    and ``n_prev`` (history depth, saturating at 2).
    """

    name = "unipc"
    is_multistep = True
    t_eps: float = 1e-5

    def init_state(self, x: jax.Array) -> dict[str, jax.Array]:
        return {
            "x_last": jnp.zeros_like(x),
            "m_last": jnp.zeros_like(x),
            "m_last2": jnp.zeros_like(x),
            "lam_last": jnp.zeros((), jnp.float32),
            "lam_last2": jnp.zeros((), jnp.float32),
            "n_prev": jnp.zeros((), jnp.int32),
        }

    def _lam(self, t: jax.Array) -> jax.Array:
        t = jnp.clip(t, self.t_eps, 1.0 - self.t_eps)
        return jnp.log((1.0 - t) / t)

    def step(
        self,
        x_t: jax.Array,
        v: jax.Array,
        t_curr: jax.Array,
        t_prev: jax.Array,
        *,
        rng: jax.Array | None = None,
        x_prev: jax.Array | None = None,
        state: dict[str, jax.Array] | None = None,
    ) -> StepResult:
        del rng, x_prev
        assert state is not None, "multistep sampler: denoise must thread init_state"
        t_curr = jnp.asarray(t_curr, jnp.float32)
        t_prev = jnp.asarray(t_prev, jnp.float32)
        f32 = jnp.float32
        m0 = (x_t - v * t_curr).astype(f32)
        lam_curr = self._lam(t_curr)
        n_prev = state["n_prev"]
        m_last = state["m_last"].astype(f32)
        m_last2 = state["m_last2"].astype(f32)

        # ---- UniC: correct the previous transition t_last -> t_curr using
        # the model output m0 just evaluated at the (uncorrected) x_t
        hh_c = state["lam_last"] - lam_curr  # = -(lam_curr - lam_last) < 0
        hh_c_safe = jnp.where(n_prev > 0, hh_c, -1.0)
        # rk normalizes lambda gaps by h = lam_curr - lam_last > 0 (phi/B use
        # hh = -h, the data-prediction convention) => r0 < 0 for past points;
        # the bh2 coefficient solve is shared (samplers/common.py)
        r0c = (state["lam_last2"] - state["lam_last"]) / (-hh_c_safe)
        r0c_safe = jnp.where(n_prev > 1, r0c, -1.0)
        phi1_c, corr = unipc_bh2_correction(
            hh_c_safe, r0c_safe, n_prev, m0, m_last, m_last2
        )
        t_last = jax.nn.sigmoid(-state["lam_last"])  # inverse of _lam
        x_corr = (
            (t_curr / jnp.maximum(t_last, self.t_eps)) * state["x_last"].astype(f32)
            - (1.0 - t_curr) * phi1_c * m_last
            - (1.0 - t_curr) * phi1_c * corr
        )
        x_used = jnp.where(n_prev > 0, x_corr, x_t.astype(f32))

        # ---- UniP: order-2 predictor t_curr -> t_prev from the corrected x
        hh = lam_curr - self._lam(t_prev)  # < 0
        phi1 = jnp.expm1(hh)
        r0p = (state["lam_last"] - lam_curr) / (-hh)  # < 0 (see corrector note)
        r0p_safe = jnp.where(n_prev > 0, r0p, -1.0)
        d1_p = (m_last - m0) / r0p_safe
        sig_ratio = jnp.clip(t_prev, self.t_eps, 1.0) / jnp.clip(t_curr, self.t_eps, 1.0)
        final = t_prev <= self.t_eps
        sig_ratio = jnp.where(final, 0.0, sig_ratio)
        phi1 = jnp.where(final, -1.0, phi1)
        base = sig_ratio * x_used - (1.0 - t_prev) * phi1 * m0
        pred2 = base - (1.0 - t_prev) * phi1 * 0.5 * d1_p  # B_h = phi1 (bh2)
        first_order = jnp.logical_or(n_prev == 0, final)
        x_next = jnp.where(first_order, base, pred2)

        return {
            "x_prev": x_next.astype(x_t.dtype),
            "estimated_x0": m0.astype(x_t.dtype),
            "state": {
                "x_last": x_used.astype(x_t.dtype),
                "m_last": m0.astype(x_t.dtype),
                "m_last2": state["m_last"],
                "lam_last": lam_curr,
                "lam_last2": state["lam_last"],
                "n_prev": jnp.minimum(n_prev + 1, 2),
            },
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
