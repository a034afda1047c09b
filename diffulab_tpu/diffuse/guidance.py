"""Classifier-free-guidance shaping shared by all formalizations.

Two measured levers on top of plain CFG (reference has only the plain combine,
src/diffulab/diffuse/modelizations/flow.py:256-259):

- **guidance interval** (Kynkaanniemi et al., arXiv:2404.07724): apply the
  guidance scale only inside a noise-level window and fall back to the plain
  conditional prediction (scale 1) outside it. High noise levels get distorted
  by CFG (mode-seeking pushes samples off-manifold early) and the lowest
  levels gain nothing; restricting guidance to a mid interval improves FID at
  equal compute — measured (BASELINE.md round 4, interval [0.05, 0.75] on
  the flow recipe): FID 1.01 -> 0.745 at CFG 1.5, 2.53 -> 0.94 at CFG 3.0.
  The window is expressed in each formalization's own noise
  units: flow time ``t`` in (0, 1], EDM ``sigma``, gaussian fraction
  ``t/(T-1)``.
- **guidance rescale** (Lin et al., arXiv:2305.08891 sec. 3.4): CFG inflates
  the per-sample std of the prediction, which shows up as over-exposure /
  over-saturation at high scales. ``rescale`` in [0, 1] blends toward a
  variant renormalized to the conditional prediction's std. (Measured
  neutral-to-negative on the 32x32 synthetic recipe — BASELINE.md round 4;
  it targets high-resolution saturation artifacts.)

Both are static config (compiled into the sampling scan); the interval test
runs on the traced per-sample noise level, so one compiled program serves the
whole schedule.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def effective_scale(
    guidance_scale: float | jax.Array,
    noise_level: jax.Array,
    interval: Sequence[float] | None,
) -> float | jax.Array:
    """Per-sample CFG scale: ``guidance_scale`` inside [lo, hi], 1 outside.

    ``noise_level`` is a [B] vector in the caller's noise units. With
    ``interval=None`` this is the identity (plain CFG everywhere).
    """
    if interval is None:
        return guidance_scale
    lo, hi = float(interval[0]), float(interval[1])
    inside = (noise_level >= lo) & (noise_level <= hi)
    return jnp.where(inside, guidance_scale, 1.0)


def combine_cfg(
    out_cond: jax.Array,
    out_uncond: jax.Array,
    scale: float | jax.Array,
    rescale: float = 0.0,
) -> jax.Array:
    """``uncond + scale * (cond - uncond)``, optionally std-rescaled.

    ``scale`` may be a scalar or a [B] vector (from :func:`effective_scale`);
    ``rescale`` is the static phi of arXiv:2305.08891 eq. 15-16.
    """
    if isinstance(scale, jax.Array) and scale.ndim == 1:
        scale = scale.reshape(-1, *([1] * (out_cond.ndim - 1)))
    guided = out_uncond + scale * (out_cond - out_uncond)
    if rescale:
        axes = tuple(range(1, guided.ndim))
        std_cond = jnp.std(out_cond, axis=axes, keepdims=True)
        std_cfg = jnp.std(guided, axis=axes, keepdims=True)
        renorm = guided * (std_cond / jnp.maximum(std_cfg, 1e-12))
        guided = rescale * renorm + (1.0 - rescale) * guided
    return guided
