"""Sampler interfaces (reference src/diffulab/diffuse/samplers/common.py:7-32).

A sampler step is a *pure function* of the current state: it takes the current
sample, the model prediction, the timestep(s), and an optional PRNG key, and
returns a :class:`StepResult` dict. All per-schedule state (tmax, beta tables)
lives in the frozen sampler dataclass, so a configured sampler can be closed
over by a jitted `lax.scan` body with zero mutable state.

``StepResult`` keys (each sampler returns a fixed subset, so results stack
cleanly as scan outputs):
- ``x_prev`` (always): the updated sample at the previous (less noisy) time.
- ``estimated_x0`` (always): the predicted clean sample.
- ``x_prev_mean`` / ``x_prev_std`` / ``logprob`` (stochastic samplers): the
  Gaussian transition parameters and per-element log-density, used by GRPO.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax

StepResult = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class Sampler:
    name: str = dataclasses.field(default="", init=False)

    def step(self, *args: Any, **kwargs: Any) -> StepResult:  # pragma: no cover - interface
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class FlowSampler(Sampler):
    """Flow samplers integrate `dx/dt = v` from t_curr down to t_prev.

    Signature (reference samplers/flow/common.py:9-43):
    ``step(x_t, v, t_curr, t_prev, *, rng=None, x_prev=None)``.
    """

    def with_timesteps(self, timesteps) -> "FlowSampler":
        """Functional analog of the reference's mutable ``set_steps``: returns a
        new sampler with any schedule-derived constants bound."""
        return self


@dataclasses.dataclass(frozen=True)
class GaussianSampler(Sampler):
    """Discrete-time samplers over a beta table.

    Signature (reference samplers/gaussian_diffusion/common.py:9-42):
    ``step(model_prediction, timesteps, xt, *, rng=None, clamp_x=False)``.
    """

    def with_betas(self, betas) -> "GaussianSampler":
        raise NotImplementedError


def unipc_bh2_correction(hh_c_safe, r0c_safe, n_prev, m0, m_last, m_last2):
    """UniPC-2 (bh2 variant) corrector algebra shared by all three schedules
    (arXiv:2302.04867, eq. 14-16): given the safe negative lambda gap
    ``hh_c_safe = lam_last - lam_curr`` of the transition being corrected, the
    normalized gap ``r0c_safe`` to the second history point, and the data
    predictions ``m0`` (fresh eval), ``m_last``, ``m_last2``, return
    ``(phi1_c, corr)`` — the phi_1 factor and the correction term. Falls back
    to the order-1 corrector (rho = 1/2 on D1_t) until two history points
    exist. The schedule-specific parts (lambda definitions, the x-update
    coefficients) stay with each caller; this keeps the error-prone
    coefficient solve in one place (flow / gaussian / EDM previously carried
    three identical copies)."""
    import jax.numpy as jnp

    phi1_c = jnp.expm1(hh_c_safe)
    d1_t = m0 - m_last
    hk1 = phi1_c / hh_c_safe - 1.0
    b1 = hk1 / phi1_c
    b2 = (hk1 / hh_c_safe - 0.5) * 2.0 / phi1_c
    # order-2 corrector: solve [[1, 1], [r0, 1]] @ rhos = [b1, b2]
    det = jnp.where(jnp.abs(1.0 - r0c_safe) > 1e-8, 1.0 - r0c_safe, 1.0)
    rho0 = (b1 - b2) / det
    rho1 = (b2 - r0c_safe * b1) / det
    d1_0 = (m_last2 - m_last) / r0c_safe
    corr = jnp.where(n_prev > 1, rho0 * d1_0 + rho1 * d1_t, 0.5 * d1_t)
    return phi1_c, corr
