"""Timestep schedules and table utilities for the diffusion formalizations.

Pure NumPy/JAX re-derivations of the schedule math in the reference:
- ``space_timesteps``: reference src/diffulab/diffuse/modelizations/utils.py:1-57
- ``get_variance_schedule`` / ``betas_for_alpha_bar``:
  reference src/diffulab/diffuse/modelizations/gaussian_diffusion.py:135-194
- ``shift_timestep``: reference src/diffulab/diffuse/modelizations/flow.py:84-99
- ``extract_into_tensor``: reference src/diffulab/diffuse/utils.py:6-19

Beta tables are precomputed host-side in float64 (NumPy) for numerical parity
with the reference's fp64 tables, then used as fp32 constants inside jit.
"""

from __future__ import annotations

import math
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np


def shift_timestep(t: Union[jax.Array, np.ndarray, float], alpha: float):
    """Time-shifting s(alpha, t) = alpha*t / (1 + (alpha - 1) * t).

    alpha > 1 concentrates samples at higher noise levels.
    """
    return alpha * t / (1 + (alpha - 1) * t)


def flow_linear_timesteps(n_steps: int, shift: float | None = None) -> np.ndarray:
    """Descending flow-matching time grid 1 -> 0 with ``n_steps + 1`` points.

    Optionally applies :func:`shift_timestep` pointwise (reference flow.py:124-130).
    """
    ts = np.linspace(1.0, 0.0, n_steps + 1, dtype=np.float64)
    if shift is not None:
        ts = shift_timestep(ts, shift)
    return ts.astype(np.float32)


def get_variance_schedule(n_steps: int, schedule: str = "linear") -> np.ndarray:
    """DDPM beta schedule in float64 (linear from Ho et al., scaled; or cosine)."""
    if schedule == "linear":
        scale = 1000 / n_steps
        beta_start = scale * 0.0001
        beta_end = scale * 0.02
        return np.linspace(beta_start, beta_end, n_steps, dtype=np.float64)
    elif schedule == "cosine":
        return betas_for_alpha_bar(
            n_steps,
            lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2,
        )
    raise NotImplementedError(f"unknown beta schedule: {schedule}")


def betas_for_alpha_bar(n_steps: int, alpha_bar, max_beta: float = 0.999) -> np.ndarray:
    """Betas realizing a target cumulative alpha_bar(t) curve (Nichol & Dhariwal)."""
    betas = []
    for i in range(n_steps):
        t1 = i / n_steps
        t2 = (i + 1) / n_steps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


def space_timesteps(num_timesteps: int, section_counts: str | int, ddim: bool = False) -> set[int]:
    """Select a subset of training timesteps for respaced sampling.

    OpenAI guided-diffusion style section spacing, or a uniform stride for DDIM.
    Mirrors reference modelizations/utils.py:1-57, except that the DDIM branch
    searches ALL strides before raising (the reference raises on the first
    non-matching stride, modelizations/utils.py:27-31, making every DDIM
    respacing other than the identity unreachable — an upstream bug we fix).
    """
    if ddim:
        assert isinstance(section_counts, int)
        for i in range(1, num_timesteps):
            if len(range(0, num_timesteps, i)) == section_counts:
                return set(range(0, num_timesteps, i))
        raise ValueError(f"cannot create exactly {section_counts} steps with an integer stride")

    if isinstance(section_counts, str):
        section_counts_list = [int(x) for x in section_counts.split(",")]
    else:
        section_counts_list = [section_counts]

    size_per = num_timesteps // len(section_counts_list)
    extra = num_timesteps % len(section_counts_list)
    start_idx = 0
    all_steps: list[int] = []
    for i, section_count in enumerate(section_counts_list):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        if section_count <= 1:
            frac_stride = 1.0
        else:
            frac_stride = (size - 1) / (section_count - 1)
        cur_idx = 0.0
        taken_steps: list[int] = []
        for _ in range(section_count):
            taken_steps.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        all_steps += taken_steps
        start_idx += size
    return set(all_steps)


def respace_betas(betas: np.ndarray, use_timesteps: set[int]) -> tuple[np.ndarray, np.ndarray]:
    """Recompute betas over a subset of timesteps, preserving alpha_bar.

    Returns ``(new_betas, timestep_map)`` where ``timestep_map[i]`` is the
    original training timestep for respaced step ``i``
    (reference gaussian_diffusion.py:120-133).
    """
    alphas_bar = np.cumprod(1.0 - betas)
    last_alpha_bar = 1.0
    new_betas: list[float] = []
    timestep_map: list[int] = []
    for i, alpha_bar in enumerate(alphas_bar):
        if i in use_timesteps:
            new_betas.append(1.0 - alpha_bar / last_alpha_bar)
            last_alpha_bar = alpha_bar
            timestep_map.append(i)
    return np.array(new_betas, dtype=np.float64), np.array(timestep_map, dtype=np.int32)


def extract_into_tensor(arr: jax.Array, timesteps: jax.Array, broadcast_ndim: int) -> jax.Array:
    """Gather per-timestep table values and reshape for broadcasting.

    ``arr``: 1-D table [T]; ``timesteps``: int indices [B]; returns fp32
    ``[B, 1, ..., 1]`` with ``broadcast_ndim`` dims total
    (reference diffuse/utils.py:6-19, returning a broadcast-ready view).
    """
    res = jnp.asarray(arr, dtype=jnp.float32)[timesteps]
    return res.reshape(res.shape[0], *([1] * (broadcast_ndim - 1)))
