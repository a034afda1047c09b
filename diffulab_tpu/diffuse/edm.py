"""EDM formalization (Karras et al. 2022, arXiv:2206.00364) — the reference
README's unimplemented roadmap item "add EDM".

The denoiser is preconditioned around a raw network F:

    D(x; sigma) = c_skip x + c_out * F(c_in x, c_noise)
    c_skip = sd^2/(sigma^2+sd^2)        c_out  = sigma*sd/sqrt(sigma^2+sd^2)
    c_in   = 1/sqrt(sigma^2+sd^2)       c_noise = ln(sigma)/4

so any of this framework's denoisers (continuous-timestep conditioning)
drops in as F unchanged. Training draws log-normal sigmas and minimizes the
lambda(sigma)-weighted D-vs-x0 MSE; sampling integrates the probability-flow
ODE ``dx/dsigma = (x - D)/sigma`` down the Karras rho-schedule with Heun's
2nd-order method (optionally stochastic via S_churn noise injection) or
plain Euler. Same scan-fused, CFG-batched structure as the other two
formalizations; `timesteps` throughout are CONTINUOUS sigma values.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from diffulab_tpu.diffuse.caching import wrap_block_cache
from diffulab_tpu.diffuse.guidance import combine_cfg, effective_scale
from diffulab_tpu.diffuse.samplers.common import unipc_bh2_correction

ModelFn = Callable[..., dict[str, jax.Array]]


@dataclasses.dataclass(frozen=True)
class EDM:
    """Karras-EDM: preconditioning, log-normal sigma draws, rho-schedule."""

    n_steps: int = 18
    sampling_method: str = "heun"
    latent_diffusion: bool = False
    sigma_data: float = 0.5
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    rho: float = 7.0
    p_mean: float = -1.2
    p_std: float = 1.2
    # stochastic sampling (S_churn > 0 re-noises each step; 0 = deterministic)
    s_churn: float = 0.0
    s_noise: float = 1.0
    # CFG shaping (diffuse/guidance.py): [lo, hi] window in SIGMA units
    # outside which the effective scale is 1 (arXiv:2404.07724 expresses its
    # intervals in exactly these units), and the arXiv:2305.08891 std-rescale
    guidance_interval: Sequence[float] | None = None
    guidance_rescale: float = 0.0

    def __post_init__(self):
        if self.sampling_method not in ("heun", "euler", "dpmpp_2m", "unipc"):
            raise ValueError(
                "EDM sampling_method must be 'heun', 'euler', 'dpmpp_2m', or 'unipc'")

    # --- schedule ---------------------------------------------------------
    @property
    def steps(self) -> int:
        """Sampling step count, uniform across formalizations (Flow/Gaussian parity)."""
        return self.n_steps

    @property
    def timesteps(self) -> np.ndarray:
        """Karras sigma grid [n_steps+1], descending, final entry exactly 0."""
        i = np.arange(self.n_steps, dtype=np.float64)
        inv_rho = 1.0 / self.rho
        sig = (
            self.sigma_max**inv_rho
            + i / max(self.n_steps - 1, 1) * (self.sigma_min**inv_rho - self.sigma_max**inv_rho)
        ) ** self.rho
        return np.concatenate([sig, [0.0]]).astype(np.float32)

    def set_steps(self, n_steps: int, **kwargs: Any) -> "EDM":
        return dataclasses.replace(self, n_steps=n_steps, **kwargs)

    # --- forward process --------------------------------------------------
    def draw_timesteps(self, rng: jax.Array, batch_size: int) -> jax.Array:
        """Log-normal sigma draw (EDM table 1 training column)."""
        return jnp.exp(
            self.p_mean + self.p_std * jax.random.normal(rng, (batch_size,))
        )

    def add_noise(
        self, x: jax.Array, timesteps: jax.Array, noise: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        sigma = timesteps.reshape(-1, *([1] * (x.ndim - 1))).astype(x.dtype)
        return x + sigma * noise, noise

    # --- preconditioned model call ---------------------------------------
    def _denoised(self, model_fn: ModelFn, x, sigma, cond, drop,
                  return_prediction: bool = False):
        sd = self.sigma_data
        s = sigma.reshape(-1, *([1] * (x.ndim - 1))).astype(jnp.float32)
        xf = x.astype(jnp.float32)
        c_skip = sd**2 / (s**2 + sd**2)
        c_out = s * sd / jnp.sqrt(s**2 + sd**2)
        c_in = 1.0 / jnp.sqrt(s**2 + sd**2)
        c_noise = jnp.log(jnp.maximum(sigma, 1e-20)).astype(jnp.float32) / 4.0
        pred = model_fn(
            x=(c_in * xf).astype(x.dtype), timesteps=c_noise, cond=cond, drop=drop
        )
        d = c_skip * xf + c_out * pred["x"].astype(jnp.float32)
        return (d, pred) if return_prediction else d

    def _denoised_cfg(self, model_fn, x, sigma, cond, guidance_scale, use_cfg,
                      guide_fn=None):
        if not use_cfg:
            drop = jnp.zeros((x.shape[0],), bool)
            return self._denoised(model_fn, x, sigma, cond, drop)
        b = x.shape[0]
        if guide_fn is not None:
            # autoguidance (arXiv:2406.02507 — the paper's own formalization
            # IS EDM): the negative branch is a conditional forward of a
            # degraded model; see flow.py::_cfg_model_call
            drop = jnp.zeros((b,), bool)
            d_cond = self._denoised(model_fn, x, sigma, cond, drop)
            d_bad = self._denoised(guide_fn, x, sigma, cond, drop)
            scale = effective_scale(guidance_scale, sigma, self.guidance_interval)
            return combine_cfg(d_cond, d_bad, scale, self.guidance_rescale)
        x2 = jnp.concatenate([x, x], axis=0)
        s2 = jnp.concatenate([sigma, sigma], axis=0)
        cond2 = jax.tree.map(lambda c: jnp.concatenate([c, c], axis=0), cond)
        drop = jnp.concatenate([jnp.zeros((b,), bool), jnp.ones((b,), bool)])
        d = self._denoised(model_fn, x2, s2, cond2, drop)
        d_cond, d_uncond = jnp.split(d, 2, axis=0)
        scale = effective_scale(guidance_scale, sigma, self.guidance_interval)
        return combine_cfg(d_cond, d_uncond, scale, self.guidance_rescale)

    # --- training loss ----------------------------------------------------
    def compute_loss(
        self,
        model_fn: ModelFn,
        x0: jax.Array,
        cond: dict[str, Any],
        timesteps: jax.Array,
        noise: jax.Array,
        drop: jax.Array | None = None,
        extra_losses: Sequence[Any] = (),
        extra_args: dict[str, Any] | None = None,
        distill_fn: ModelFn | None = None,
        distill_guidance: float = 0.0,
    ) -> dict[str, jax.Array]:
        xt, noise = self.add_noise(x0, timesteps, noise)
        if drop is None:
            drop = jnp.zeros((x0.shape[0],), bool)
        denoised, prediction = self._denoised(
            model_fn, xt, timesteps, cond, drop, return_prediction=True
        )
        sd = self.sigma_data
        s = timesteps.reshape(-1, *([1] * (x0.ndim - 1))).astype(jnp.float32)
        weight = (s**2 + sd**2) / (s * sd) ** 2
        # guidance distillation (arXiv:2210.03142; see flow.py::compute_loss):
        # regress the student's D(x;sigma) onto the frozen teacher's guided
        # denoised image under the same lambda(sigma) weighting
        target = x0.astype(jnp.float32)
        if distill_fn is not None:
            target = jax.lax.stop_gradient(
                self._denoised_cfg(distill_fn, xt, timesteps, cond,
                                   distill_guidance, use_cfg=True)
            )
        loss = jnp.mean(weight * (denoised - target) ** 2)
        loss_dict = {"loss": loss}
        for extra_loss in extra_losses:
            # forward the full raw prediction (captured features etc.) with
            # the preconditioned output in "x", matching Flow/GaussianDiffusion;
            # x0 rides along as a default for live-encoder REPA on pixel runs
            loss_dict[extra_loss.name] = extra_loss(
                model_output={**prediction, "x": denoised},
                **{"x0": x0, **(extra_args or {})},
            )
        return loss_dict

    # --- sampling ---------------------------------------------------------
    def one_step_denoise(
        self,
        model_fn: ModelFn,
        x: jax.Array,
        cond: dict[str, Any],
        sigma_next: jax.Array,
        sigma: jax.Array,
        guidance_scale: float | jax.Array = 0.0,
        use_cfg: bool = False,
        rng: jax.Array | None = None,
        sampler_args: dict[str, Any] | None = None,
        guide_fn: ModelFn | None = None,
    ) -> dict[str, jax.Array]:
        """One Karras step sigma -> sigma_next.

        'heun': 2nd-order predictor-corrector (2 model evals);
        'dpmpp_2m': multistep DPM-Solver++ on the VE (alpha = 1) schedule —
        2nd order at ONE eval per step using the previous data prediction
        threaded through ``sampler_args['state']``;
        'unipc': UniPC-2/bh2 (arXiv:2302.04867) on the same VE schedule —
        the DPM++(2M)-equivalent predictor plus a corrector that reuses each
        step's fresh eval to refine the previous transition (still one eval
        per step, locally 3rd-order; see samplers/flow.py::UniPC);
        'euler': 1st order.
        """
        b = x.shape[0]
        sig = jnp.full((b,), sigma, jnp.float32)

        if self.sampling_method == "unipc":
            state = (sampler_args or {})["state"]
            m0 = self._denoised_cfg(model_fn, x, sig, cond, guidance_scale, use_cfg, guide_fn)
            lam_curr = -jnp.log(jnp.maximum(sigma, 1e-12))
            n_prev = state["n_prev"]
            m_last = state["m_last"].astype(jnp.float32)

            # UniC: correct the previous transition using this step's eval
            # (shared bh2 coefficient solve: samplers/common.py)
            hh_c = state["lam_last"] - lam_curr  # -h_c < 0
            hh_c_safe = jnp.where(n_prev > 0, hh_c, -1.0)
            r0c = (state["lam_last2"] - state["lam_last"]) / (-hh_c_safe)
            r0c_safe = jnp.where(n_prev > 1, r0c, -1.0)
            phi1_c, corr = unipc_bh2_correction(
                hh_c_safe, r0c_safe, n_prev, m0, m_last,
                state["m_last2"].astype(jnp.float32),
            )
            x_corr = (
                jnp.exp(hh_c_safe) * state["x_last"].astype(jnp.float32)
                - phi1_c * m_last - phi1_c * corr
            )
            x_used = jnp.where(n_prev > 0, x_corr, x.astype(jnp.float32))

            # UniP: order-2 predictor (== dpmpp_2m above when history exists)
            hh = -jnp.log(sigma / jnp.maximum(sigma_next, 1e-12))  # -h < 0
            phi1 = jnp.expm1(hh)
            r0p = (state["lam_last"] - lam_curr) / (-hh)
            r0p_safe = jnp.where(n_prev > 0, r0p, -1.0)
            d1_p = (m_last - m0) / r0p_safe
            base = jnp.exp(hh) * x_used - phi1 * m0
            x_next = jnp.where(n_prev == 0, base, base - phi1 * 0.5 * d1_p)
            return {
                "x_prev": x_next.astype(x.dtype),
                "estimated_x0": m0.astype(x.dtype),
                "state": {
                    "x_last": x_used.astype(x.dtype),
                    "m_last": m0.astype(x.dtype),
                    "m_last2": state["m_last"],
                    "lam_last": lam_curr,
                    "lam_last2": state["lam_last"],
                    "n_prev": jnp.minimum(n_prev + 1, 2),
                },
            }

        if self.sampling_method == "dpmpp_2m":
            state = (sampler_args or {})["state"]
            d0 = self._denoised_cfg(model_fn, x, sig, cond, guidance_scale, use_cfg, guide_fn)
            # lambda = ln(1/sigma); h = lambda_next - lambda = ln(sigma/sigma_next)
            h = jnp.log(sigma / jnp.maximum(sigma_next, 1e-12))
            r_safe = jnp.maximum(state["h_last"] / jnp.maximum(h, 1e-12), 1e-8)
            d2 = (1.0 + 1.0 / (2.0 * r_safe)) * d0 - (1.0 / (2.0 * r_safe)) * state[
                "x0_prev"
            ].astype(jnp.float32)
            d = jnp.where(state["has_prev"], d2, d0)
            # VE update: x_next = (sig_next/sig) x - (e^{-h} - 1) D,
            # e^{-h} = sig_next/sig  (alpha = 1)
            ratio = sigma_next / jnp.maximum(sigma, 1e-12)
            x_next = ratio * x.astype(jnp.float32) + (1.0 - ratio) * d
            return {
                "x_prev": x_next.astype(x.dtype),
                "estimated_x0": d0.astype(x.dtype),
                "state": {
                    "x0_prev": d0.astype(x.dtype),
                    "h_last": h,
                    "has_prev": jnp.ones((), bool),
                },
            }

        if self.s_churn > 0 and rng is not None:
            gamma = jnp.minimum(self.s_churn / self.n_steps, float(np.sqrt(2.0) - 1.0))
            sig_hat = sig * (1.0 + gamma)
            extra = jnp.sqrt(jnp.maximum(sig_hat**2 - sig**2, 0.0))
            eps = jax.random.normal(rng, x.shape, dtype=x.dtype) * self.s_noise
            x = x + extra.reshape(-1, *([1] * (x.ndim - 1))).astype(x.dtype) * eps
            sig = sig_hat

        d0 = self._denoised_cfg(model_fn, x, sig, cond, guidance_scale, use_cfg, guide_fn)
        sigv = sig.reshape(-1, *([1] * (x.ndim - 1)))
        dxds = (x.astype(jnp.float32) - d0) / sigv
        dt = sigma_next - sigv
        x_euler = x.astype(jnp.float32) + dt * dxds

        if self.sampling_method == "heun":
            # callers never take a Heun step INTO sigma = 0 (denoise peels the
            # final step off as the exact x -> D collapse), so sigma_next > 0
            sig_next_b = jnp.full((b,), sigma_next, jnp.float32)
            d1 = self._denoised_cfg(
                model_fn, x_euler.astype(x.dtype), sig_next_b,
                cond, guidance_scale, use_cfg, guide_fn,
            )
            x_next = x.astype(jnp.float32) + dt * 0.5 * (dxds + (x_euler - d1) / sigma_next)
        else:
            x_next = x_euler

        return {"x_prev": x_next.astype(x.dtype), "estimated_x0": d0.astype(x.dtype)}

    def denoise(
        self,
        model_fn: ModelFn,
        cond: dict[str, Any],
        rng: jax.Array,
        data_shape: tuple[int, ...] | None = None,
        x: jax.Array | None = None,
        clamp_x: bool = False,
        guidance_scale: float | jax.Array = 0.0,
        use_cfg: bool = False,
        return_intermediates: bool = False,
        dtype: jnp.dtype = jnp.float32,
        inpaint: dict[str, jax.Array] | None = None,
        img2img_init: jax.Array | None = None,
        img2img_strength: float = 1.0,
        guide_fn: ModelFn | None = None,
        block_cache0: Any = None,
        cache_interval: int = 1,
    ) -> dict[str, jax.Array]:
        """Full Karras reverse ODE as one `lax.scan`. Initial noise is scaled
        by sigma_max (EDM prior: x_T ~ N(0, sigma_max^2 I)).

        ``inpaint`` = ``{"known": x0-like, "mask": 1 = keep}`` blends
        ``known + sigma * noise`` after every step (RePaint-lite; see
        flow.py::denoise) and the clean known after the final collapse.
        ``img2img_init`` + ``img2img_strength`` start from
        ``init + sigma_start * noise`` at the grid entry ``1 - strength`` of
        the way in and run only that tail (SDEdit; see flow.py::denoise).
        """
        ts_np = self.timesteps  # host sigma grid: slicing below is static
        start_idx = 0
        if img2img_init is not None:
            k = min(max(int(round(img2img_strength * self.n_steps)), 1), self.n_steps)
            start_idx = self.n_steps - k
            rng, init_rng = jax.random.split(rng)
            noise = jax.random.normal(init_rng, img2img_init.shape, dtype=dtype)
            x = img2img_init.astype(dtype) + float(ts_np[start_idx]) * noise
        if x is None:
            assert data_shape is not None, "'data_shape' must be provided if 'x' is not given"
            rng, init_rng = jax.random.split(rng)
            x = jax.random.normal(init_rng, data_shape, dtype=dtype) * self.sigma_max
        ts = jnp.asarray(ts_np)
        # all but the final (sigma_min -> 0) interval run through the solver;
        # the final step is the exact collapse x -> D(x; sigma_min) for BOTH
        # methods (Euler from sigma to 0 gives exactly D), which saves the
        # Heun corrector's wasted model eval at sigma = 0
        pairs = jnp.stack([ts[:-2], ts[1:-1]], axis=1)[start_idx:]
        multistep = self.sampling_method in ("dpmpp_2m", "unipc")
        if self.sampling_method == "dpmpp_2m":
            s_state0 = {
                "x0_prev": jnp.zeros_like(x),
                "h_last": jnp.zeros((), jnp.float32),
                "has_prev": jnp.zeros((), bool),
            }
        elif self.sampling_method == "unipc":
            s_state0 = {
                "x_last": jnp.zeros_like(x),
                "m_last": jnp.zeros_like(x),
                "m_last2": jnp.zeros_like(x),
                "lam_last": jnp.zeros((), jnp.float32),
                "lam_last2": jnp.zeros((), jnp.float32),
                "n_prev": jnp.zeros((), jnp.int32),
            }
        else:
            s_state0 = {}

        mcache0 = block_cache0 if block_cache0 is not None else ()

        def body(carry, xs):
            x_t, step_rng, s_state, mcache = carry
            pair, step_idx = xs
            step_rng, use_rng = jax.random.split(step_rng)
            # sampling-time block caching (diffuse/caching.py); the final
            # sigma_min -> 0 collapse below stays uncached (exact)
            step_model_fn, step_guide_fn, cell = wrap_block_cache(
                model_fn, guide_fn, mcache, step_idx, cache_interval,
                enabled=block_cache0 is not None,
            )

            step = self.one_step_denoise(
                step_model_fn, x_t, cond, pair[1], pair[0],
                guidance_scale=guidance_scale, use_cfg=use_cfg,
                rng=use_rng if self.s_churn > 0 else None,
                sampler_args={"state": s_state} if multistep else None,
                guide_fn=step_guide_fn,
            )
            s_state = step.pop("state", s_state)
            x_next = step["x_prev"]
            if inpaint is not None:
                step_rng, ip_rng = jax.random.split(step_rng)
                known = inpaint["known"].astype(x_next.dtype)
                noise = jax.random.normal(ip_rng, known.shape, dtype=x_next.dtype)
                mask = inpaint["mask"].astype(x_next.dtype)
                x_next = mask * (known + pair[1] * noise) + (1.0 - mask) * x_next
                step["x_prev"] = x_next
            ys = {k: step[k] for k in step} if return_intermediates else None
            return (x_next.astype(x_t.dtype), step_rng, s_state, cell["c"]), ys

        (x_last, _, _, _), ys = jax.lax.scan(
            body, (x, rng, s_state0, mcache0),
            (pairs, jnp.arange(pairs.shape[0])),
        )
        sig_last = jnp.full((x.shape[0],), ts[-2], jnp.float32)
        x_final = self._denoised_cfg(
            model_fn, x_last, sig_last, cond, guidance_scale, use_cfg, guide_fn
        ).astype(x.dtype)
        if inpaint is not None:
            mask = inpaint["mask"].astype(x_final.dtype)
            x_final = mask * inpaint["known"].astype(x_final.dtype) + (1.0 - mask) * x_final
        if clamp_x:
            x_final = jnp.clip(x_final, -1.0, 1.0)
        out: dict[str, jax.Array] = {"x": x_final}
        if return_intermediates and ys is not None:
            out["xt"] = jnp.concatenate(
                [x[:, None], jnp.moveaxis(ys["x_prev"], 0, 1), x_final[:, None]],
                axis=1,
            )
            out["estimated_x0"] = jnp.concatenate(
                [jnp.moveaxis(ys["estimated_x0"], 0, 1), x_final[:, None]], axis=1
            )
        return out
