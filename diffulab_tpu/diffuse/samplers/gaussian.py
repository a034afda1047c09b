"""Gaussian-diffusion samplers: DDPM ancestral and DDIM.

Posterior-moment machinery re-derived from the reference
src/diffulab/diffuse/samplers/gaussian_diffusion/ddpm.py:49-363 and
ddim.py:28-103 (itself OpenAI guided-diffusion lineage). Tables are
precomputed in float64 on the host and baked as fp32 constants into the jitted
sampling scan.

Layout note: this framework is NHWC (TPU-native); the learned-variance channel
split therefore chunks the LAST axis, where the reference (NCHW) chunks axis 1.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from diffulab_tpu.diffuse.samplers.common import (
    GaussianSampler,
    StepResult,
    unipc_bh2_correction,
)
from diffulab_tpu.diffuse.schedules import extract_into_tensor

MEAN_TYPES = ("epsilon", "xstart", "xprev")
VAR_TYPES = ("learned", "fixed_small", "fixed_large", "learned_range")


@dataclasses.dataclass(frozen=True)
class DDPM(GaussianSampler):
    """DDPM ancestral sampler with selectable mean/variance parameterizations."""

    name = "ddpm"
    mean_type: str = "epsilon"
    var_type: str = "fixed_small"
    # Precomputed fp64 tables (None until with_betas); treated as jit constants.
    betas: np.ndarray | None = None
    alphas_bar: np.ndarray | None = None
    alphas_bar_prev: np.ndarray | None = None
    alphas_bar_next: np.ndarray | None = None
    sqrt_alphas_bar: np.ndarray | None = None
    posterior_variance: np.ndarray | None = None
    posterior_log_variance_clipped: np.ndarray | None = None
    posterior_mean_coef1: np.ndarray | None = None
    posterior_mean_coef2: np.ndarray | None = None

    def __post_init__(self):
        if self.mean_type not in MEAN_TYPES:
            raise ValueError(f"mean_type must be one of {MEAN_TYPES}")
        if self.var_type not in VAR_TYPES:
            raise ValueError(f"var_type must be one of {VAR_TYPES}")

    def with_betas(self, betas: np.ndarray) -> "DDPM":
        """Precompute posterior tables for a beta schedule (fp64 host-side)."""
        betas = np.asarray(betas, dtype=np.float64)
        alphas = 1.0 - betas
        alphas_bar = np.cumprod(alphas)
        alphas_bar_prev = np.concatenate([[1.0], alphas_bar[:-1]])
        alphas_bar_next = np.concatenate([alphas_bar[1:], [0.0]])
        posterior_variance = betas * (1.0 - alphas_bar_prev) / (1.0 - alphas_bar)
        # log is clipped because posterior variance is 0 at t=0
        posterior_log_variance_clipped = np.log(
            np.concatenate([posterior_variance[1:2], posterior_variance[1:]])
        )
        return dataclasses.replace(
            self,
            betas=betas,
            alphas_bar=alphas_bar,
            alphas_bar_prev=alphas_bar_prev,
            alphas_bar_next=alphas_bar_next,
            sqrt_alphas_bar=np.sqrt(alphas_bar),
            posterior_variance=posterior_variance,
            posterior_log_variance_clipped=posterior_log_variance_clipped,
            posterior_mean_coef1=betas * np.sqrt(alphas_bar_prev) / (1.0 - alphas_bar),
            posterior_mean_coef2=(1.0 - alphas_bar_prev) * np.sqrt(alphas) / (1.0 - alphas_bar),
        )

    # --- x0 recovery ------------------------------------------------------
    def _get_x_start_from_x_prev(self, x_prev, xt, t):
        c1 = extract_into_tensor(self.posterior_mean_coef1, t, x_prev.ndim)
        c2 = extract_into_tensor(self.posterior_mean_coef2, t, xt.ndim)
        return (1.0 / c1) * x_prev - (c2 / c1) * xt

    def _get_x_start_from_eps(self, eps, xt, t):
        sab = extract_into_tensor(self.sqrt_alphas_bar, t, xt.ndim)
        ab = extract_into_tensor(self.alphas_bar, t, eps.ndim)
        return (1.0 / sab) * xt - (jnp.sqrt(1.0 - ab) / sab) * eps

    def _get_eps_from_xstart(self, x_start, xt, t):
        sab = extract_into_tensor(self.sqrt_alphas_bar, t, xt.ndim)
        ab = extract_into_tensor(self.alphas_bar, t, xt.ndim)
        return ((1.0 / sab) * xt - x_start) / jnp.sqrt(1.0 / ab - 1.0)

    def get_x_start(self, model_output, xt, t, clamp_x: bool = False):
        if self.mean_type == "xprev":
            x_start = self._get_x_start_from_x_prev(model_output, xt, t)
        elif self.mean_type == "xstart":
            x_start = model_output
        elif self.mean_type == "epsilon":
            x_start = self._get_x_start_from_eps(model_output, xt, t)
        else:  # pragma: no cover - validated in __post_init__
            raise ValueError(f"Unknown mean type: {self.mean_type}")
        if clamp_x:
            x_start = jnp.clip(x_start, -1.0, 1.0)
        return x_start

    def _get_mean_from_x_start(self, xt, x_start, t):
        return (
            extract_into_tensor(self.posterior_mean_coef1, t, x_start.ndim) * x_start
            + extract_into_tensor(self.posterior_mean_coef2, t, xt.ndim) * xt
        )

    # --- variance dispatch ------------------------------------------------
    def get_variance(self, t, x_ndim: int, log_var=None):
        if self.var_type == "fixed_small":
            var = extract_into_tensor(self.posterior_variance, t, x_ndim)
            lv = extract_into_tensor(self.posterior_log_variance_clipped, t, x_ndim)
        elif self.var_type == "fixed_large":
            v_seq = np.concatenate([self.posterior_variance[1:2], self.betas[1:]])
            var = extract_into_tensor(v_seq, t, x_ndim)
            lv = extract_into_tensor(np.log(v_seq), t, x_ndim)
        elif self.var_type == "learned":
            assert log_var is not None, "log_var must be provided for learned variance"
            var, lv = jnp.exp(log_var), log_var
        elif self.var_type == "learned_range":
            assert log_var is not None, "log_var must be provided for learned_range variance"
            min_log = extract_into_tensor(self.posterior_log_variance_clipped, t, x_ndim)
            max_log = extract_into_tensor(np.log(self.betas), t, x_ndim)
            w = (log_var + 1.0) / 2.0
            lv = w * max_log + (1.0 - w) * min_log
            var = jnp.exp(lv)
        else:  # pragma: no cover
            raise ValueError(f"Unknown model var type: {self.var_type}")
        return var, lv

    def _get_p_mean_var(self, prediction, xt, t, clamp_x: bool = False):
        model_output = prediction
        log_var = None
        if self.var_type in ("learned", "learned_range"):
            assert model_output.shape[-1] % 2 == 0
            model_output, log_var = jnp.split(model_output, 2, axis=-1)
        x_start = self.get_x_start(model_output, xt, t, clamp_x)
        mean = self._get_mean_from_x_start(xt, x_start, t)
        var, log_var = self.get_variance(t, xt.ndim, log_var)
        return mean, var, log_var, x_start

    # --- ancestral step ----------------------------------------------------
    def step(
        self,
        model_prediction: jax.Array,
        timesteps: jax.Array,
        xt: jax.Array,
        *,
        rng: jax.Array | None = None,
        clamp_x: bool = False,
        x_prev: jax.Array | None = None,
    ) -> StepResult:
        mean, var, log_var, x_start = self._get_p_mean_var(model_prediction, xt, timesteps, clamp_x)
        t_mask = (timesteps > 0).astype(mean.dtype).reshape(-1, *([1] * (mean.ndim - 1)))

        if x_prev is None:
            assert rng is not None, "rng required to sample the DDPM ancestral step"
            noise = jax.random.normal(rng, mean.shape, dtype=mean.dtype)
            x_prev = mean + t_mask * noise * jnp.exp(0.5 * log_var)

        var_safe = jnp.maximum(var, 1e-20)
        const = 0.5 * jnp.log(2.0 * math.pi * var_safe)
        elem = -((jax.lax.stop_gradient(x_prev) - mean) ** 2) / (2.0 * var_safe) - const
        logprob = elem * t_mask  # zero at t==0 (degenerate transition)

        return {
            "x_prev": x_prev,
            "estimated_x0": x_start,
            "x_prev_mean": mean,
            "x_prev_std": jnp.sqrt(var_safe),
            "logprob": logprob,
        }


@dataclasses.dataclass(frozen=True)
class DDIM(DDPM):
    """DDIM update (deterministic at eta=0; stochastic with logprobs when eta>0)."""

    name = "ddim"
    eta: float = 0.0

    def _sample_x_prev_ddim(self, xt, eps, x_start, t, rng):
        ab = extract_into_tensor(self.alphas_bar, t, xt.ndim)
        ab_prev = extract_into_tensor(self.alphas_bar_prev, t, xt.ndim)
        sigma = self.eta * jnp.sqrt((1.0 - ab_prev) / (1.0 - ab)) * jnp.sqrt(1.0 - ab / ab_prev)
        mean_pred = x_start * jnp.sqrt(ab_prev) + jnp.sqrt(1.0 - ab_prev - sigma**2) * eps
        t_mask = (t > 0).astype(mean_pred.dtype).reshape(-1, *([1] * (mean_pred.ndim - 1)))
        if self.eta > 0:
            assert rng is not None, "rng required for stochastic DDIM"
            noise = jax.random.normal(rng, mean_pred.shape, dtype=mean_pred.dtype)
            x_prev = mean_pred + t_mask * sigma * noise
        else:
            x_prev = mean_pred
        return x_prev, mean_pred, sigma

    def step(
        self,
        model_prediction: jax.Array,
        timesteps: jax.Array,
        xt: jax.Array,
        *,
        rng: jax.Array | None = None,
        clamp_x: bool = False,
        x_prev: jax.Array | None = None,
    ) -> StepResult:
        del x_prev
        _, _, _, x_start = self._get_p_mean_var(model_prediction, xt, timesteps, clamp_x)
        eps = self._get_eps_from_xstart(x_start, xt, timesteps)
        x_prev_s, ddim_mean, ddim_std = self._sample_x_prev_ddim(xt, eps, x_start, timesteps, rng)

        out: StepResult = {
            "x_prev": x_prev_s,
            "estimated_x0": x_start,
            "x_prev_mean": ddim_mean,
        }
        if self.eta > 0:
            logprob = -(
                (jax.lax.stop_gradient(x_prev_s) - ddim_mean) ** 2 / (2.0 * ddim_std**2)
                + jnp.log(ddim_std)
                + 0.5 * math.log(2.0 * math.pi)
            )
            out["x_prev_std"] = ddim_std
            out["logprob"] = logprob
        return out


# --------------------------------------------------------------------------- #
# Variational-bound terms (Improved DDPM, Nichol & Dhariwal 2021) — used by
# GaussianDiffusion's hybrid learned-variance training loss. The reference
# leaves this unimplemented (its TODO at gaussian_diffusion.py:267); provided
# here so learned/learned_range variance heads can actually train.
# --------------------------------------------------------------------------- #


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N(mean1, e^logvar1) || N(mean2, e^logvar2)), elementwise."""
    return 0.5 * (
        -1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


@dataclasses.dataclass(frozen=True)
class DPMSolverPPGaussian(DDPM):
    """Multistep DPM-Solver++(2M) over the discrete DDPM schedule.

    Not in the reference; the flow-side sibling is
    :class:`diffulab_tpu.diffuse.samplers.flow.DPMSolverPP2M` (same Lu et
    al. 2022 data-prediction exponential integrator). Here
    ``alpha = sqrt(alpha_bar)``, ``sigma = sqrt(1 - alpha_bar)``,
    ``lambda = log(alpha/sigma)``; x0 comes from the DDPM machinery
    (:meth:`DDPM._get_p_mean_var`), so every mean type and the
    learned-variance channel split work unchanged — the variance output is
    simply unused (deterministic ODE solver). Composes with respacing: the
    tables are the respaced ones, and indices are respaced indices.

    The first step and the final step (alpha_bar_prev = 1, sigma_prev = 0,
    where 1/r diverges) run first-order; the final first-order step returns
    the data prediction exactly.
    """

    name = "dpmpp_2m"
    is_multistep = True

    def init_state(self, x: jax.Array) -> dict[str, jax.Array]:
        return {
            "x0_prev": jnp.zeros_like(x),
            # per-sample: one_step_denoise is public API and may carry
            # heterogeneous per-sample timesteps like DDPM/DDIM
            "h_last": jnp.zeros((x.shape[0],) + (1,) * (x.ndim - 1), jnp.float32),
            "has_prev": jnp.zeros((), bool),
        }

    def step(
        self,
        model_prediction: jax.Array,
        timesteps: jax.Array,
        xt: jax.Array,
        *,
        rng: jax.Array | None = None,
        clamp_x: bool = False,
        x_prev: jax.Array | None = None,
        state: dict[str, jax.Array] | None = None,
    ) -> StepResult:
        del rng, x_prev
        assert state is not None, "multistep sampler: denoise must thread init_state"
        _, _, _, x0 = self._get_p_mean_var(model_prediction, xt, timesteps, clamp_x)

        # per-sample schedule scalars, broadcast-shaped [B, 1, ...]
        ab = extract_into_tensor(self.alphas_bar, timesteps, xt.ndim).astype(jnp.float32)
        abp = extract_into_tensor(self.alphas_bar_prev, timesteps, xt.ndim).astype(jnp.float32)
        eps_ = 1e-12
        alpha_t, sigma_t = jnp.sqrt(ab), jnp.sqrt(1.0 - ab)
        alpha_p, sigma_p = jnp.sqrt(abp), jnp.sqrt(jnp.maximum(1.0 - abp, 0.0))
        final = sigma_p <= eps_

        lam_t = 0.5 * jnp.log(jnp.maximum(ab, eps_) / jnp.maximum(1.0 - ab, eps_))
        lam_p = 0.5 * jnp.log(
            jnp.maximum(abp, eps_) / jnp.maximum(1.0 - abp, eps_)
        )
        h = lam_p - lam_t

        r_safe = jnp.maximum(state["h_last"] / jnp.maximum(h, eps_), 1e-8)
        x0f = x0.astype(jnp.float32)
        d2 = (1.0 + 1.0 / (2.0 * r_safe)) * x0f - (1.0 / (2.0 * r_safe)) * state[
            "x0_prev"
        ].astype(jnp.float32)
        first_order = jnp.logical_or(~state["has_prev"], final)
        d = jnp.where(first_order, x0f, d2)

        sig_ratio = jnp.where(final, 0.0, sigma_p / jnp.maximum(sigma_t, eps_))
        em1 = jnp.where(final, -1.0, jnp.expm1(-h))
        x_next = sig_ratio * xt.astype(jnp.float32) - alpha_p * em1 * d

        return {
            "x_prev": x_next.astype(xt.dtype),
            "estimated_x0": x0,
            "state": {
                "x0_prev": x0.astype(xt.dtype),
                "h_last": h,
                "has_prev": jnp.ones((), bool),
            },
        }


@dataclasses.dataclass(frozen=True)
class UniPCGaussian(DDPM):
    """UniPC-2/bh2 (arXiv:2302.04867) over the discrete DDPM schedule.

    Same VP parameterization as :class:`DPMSolverPPGaussian`
    (``alpha = sqrt(alpha_bar)``, ``sigma = sqrt(1 - alpha_bar)``,
    ``lambda = log(alpha/sigma)``) and the same per-sample broadcast shapes;
    the added UniC corrector reuses each step's fresh model eval to refine
    the previous transition before the order-2 predictor advances — still
    one eval per step (see samplers/flow.py::UniPC for the flow sibling and
    the coefficient derivation). x0 comes from the DDPM machinery, so all
    mean types, learned-variance splits, and respacing compose unchanged.
    """

    name = "unipc"
    is_multistep = True

    def init_state(self, x: jax.Array) -> dict[str, jax.Array]:
        bshape = (x.shape[0],) + (1,) * (x.ndim - 1)
        return {
            "x_last": jnp.zeros_like(x),
            "m_last": jnp.zeros_like(x),
            "m_last2": jnp.zeros_like(x),
            "lam_last": jnp.zeros(bshape, jnp.float32),
            "lam_last2": jnp.zeros(bshape, jnp.float32),
            "sig_last": jnp.ones(bshape, jnp.float32),
            "n_prev": jnp.zeros((), jnp.int32),
        }

    def step(
        self,
        model_prediction: jax.Array,
        timesteps: jax.Array,
        xt: jax.Array,
        *,
        rng: jax.Array | None = None,
        clamp_x: bool = False,
        x_prev: jax.Array | None = None,
        state: dict[str, jax.Array] | None = None,
    ) -> StepResult:
        del rng, x_prev
        assert state is not None, "multistep sampler: denoise must thread init_state"
        _, _, _, x0 = self._get_p_mean_var(model_prediction, xt, timesteps, clamp_x)
        m0 = x0.astype(jnp.float32)

        ab = extract_into_tensor(self.alphas_bar, timesteps, xt.ndim).astype(jnp.float32)
        abp = extract_into_tensor(self.alphas_bar_prev, timesteps, xt.ndim).astype(jnp.float32)
        eps_ = 1e-12
        alpha_t, sigma_t = jnp.sqrt(ab), jnp.sqrt(jnp.maximum(1.0 - ab, eps_))
        alpha_p, sigma_p = jnp.sqrt(abp), jnp.sqrt(jnp.maximum(1.0 - abp, 0.0))
        lam_t = 0.5 * jnp.log(jnp.maximum(ab, eps_) / jnp.maximum(1.0 - ab, eps_))
        lam_p = 0.5 * jnp.log(jnp.maximum(abp, eps_) / jnp.maximum(1.0 - abp, eps_))
        n_prev = state["n_prev"]
        m_last = state["m_last"].astype(jnp.float32)

        # ---- UniC: correct the previous transition with this step's eval
        hh_c = state["lam_last"] - lam_t  # -h_c < 0 once history exists
        hh_c_safe = jnp.where(n_prev > 0, jnp.minimum(hh_c, -eps_), -1.0)
        # shared bh2 coefficient solve (samplers/common.py)
        r0c = (state["lam_last2"] - state["lam_last"]) / (-hh_c_safe)
        r0c_safe = jnp.where(n_prev > 1, r0c, -1.0)
        phi1_c, corr = unipc_bh2_correction(
            hh_c_safe, r0c_safe, n_prev, m0, m_last,
            state["m_last2"].astype(jnp.float32),
        )
        x_corr = (
            (sigma_t / jnp.maximum(state["sig_last"], eps_)) * state["x_last"].astype(jnp.float32)
            - alpha_t * phi1_c * m_last - alpha_t * phi1_c * corr
        )
        x_used = jnp.where(n_prev > 0, x_corr, xt.astype(jnp.float32))

        # ---- UniP: order-2 predictor (== DPMSolverPPGaussian with history)
        h = lam_p - lam_t
        final = sigma_p <= eps_
        r0p = (state["lam_last"] - lam_t) / jnp.maximum(h, eps_)
        r0p_safe = jnp.where(n_prev > 0, jnp.minimum(r0p, -1e-8), -1.0)
        d1_p = (m_last - m0) / r0p_safe
        sig_ratio = jnp.where(final, 0.0, sigma_p / jnp.maximum(sigma_t, eps_))
        em1 = jnp.where(final, -1.0, jnp.expm1(-h))
        base = sig_ratio * x_used - alpha_p * em1 * m0
        first_order = jnp.logical_or(n_prev == 0, final)
        x_next = jnp.where(first_order, base, base - alpha_p * em1 * 0.5 * d1_p)

        return {
            "x_prev": x_next.astype(xt.dtype),
            "estimated_x0": x0,
            "state": {
                "x_last": x_used.astype(xt.dtype),
                "m_last": m0.astype(xt.dtype),
                "m_last2": state["m_last"],
                "lam_last": lam_t,
                "lam_last2": state["lam_last"],
                "sig_last": sigma_t,
                "n_prev": jnp.minimum(n_prev + 1, 2),
            },
        }


def _approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, means, log_scales):
    """log p(x) for images discretized to 255 bins, x in [-1, 1]."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_plus = _approx_standard_normal_cdf(plus_in)
    cdf_min = _approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12, None))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12, None))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, 1e-12, None))),
    )
