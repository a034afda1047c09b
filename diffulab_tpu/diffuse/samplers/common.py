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
