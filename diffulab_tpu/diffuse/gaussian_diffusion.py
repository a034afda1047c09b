"""Gaussian (DDPM) diffusion formalization.

Behavioral parity with reference
src/diffulab/diffuse/modelizations/gaussian_diffusion.py:18-447 (itself OpenAI
guided-diffusion lineage), redesigned as pure functions:

- beta tables (linear / cosine) are precomputed host-side in float64 and baked
  into jitted functions as fp32 constants (the reference keeps fp64 torch
  tensors, gaussian_diffusion.py:157-194);
- respacing selects a subset of training timesteps and recomputes betas with a
  ``timestep_map`` back to training indices (reference :87-133);
- the training loss is epsilon-prediction MSE (reference :268-311);
- the reverse process is one fused `jax.lax.scan` over descending step indices
  with classifier-free guidance as a single batched 2x forward.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from diffulab_tpu.diffuse.caching import wrap_block_cache
from diffulab_tpu.diffuse.guidance import combine_cfg, effective_scale
from diffulab_tpu.diffuse.samplers.common import StepResult
from diffulab_tpu.diffuse.samplers.gaussian import (
    DDIM,
    DDPM,
    DPMSolverPPGaussian,
    UniPCGaussian,
    discretized_gaussian_log_likelihood,
    normal_kl,
)
from diffulab_tpu.diffuse.schedules import (
    extract_into_tensor,
    get_variance_schedule,
    respace_betas,
    space_timesteps,
)

ModelFn = Callable[..., dict[str, jax.Array]]

SAMPLER_REGISTRY = {
    "ddpm": DDPM,
    "ddim": DDIM,
    "dpmpp_2m": DPMSolverPPGaussian,
    "unipc": UniPCGaussian,
}


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """DDPM (Ho et al. 2020) with respacing and selectable samplers."""

    n_steps: int = 1000
    sampling_method: str = "ddpm"
    schedule: str = "linear"
    latent_diffusion: bool = False
    sampler_parameters: dict[str, Any] = dataclasses.field(default_factory=dict)
    # Respacing config: number of sampling steps (defaults to n_steps = no respacing)
    sampling_steps: int | None = None
    section_counts: int | str | None = None
    # Training-loss parametrization (reference README roadmap item "add the
    # different possible parametrization for the loss (eps, x0, v ...)"):
    # what the model's first C output channels predict. Sampling converts
    # every head back to epsilon, so all samplers/mean types work unchanged.
    #   "epsilon": noise (DDPM default)
    #   "xstart":  the clean sample x0
    #   "v":       alpha*eps - sigma*x0 (Salimans & Ho progressive-distillation)
    prediction_type: str = "epsilon"
    # Per-timestep loss weighting. "min_snr" (Hang et al., arXiv:2303.09556)
    # clamps each timestep's effective x0-weight to min(SNR, gamma): the
    # low-noise steps (huge SNR) stop dominating the epsilon objective, which
    # is the standard convergence fix for short-budget DDPM training (the
    # reference trains plain epsilon-MSE, gaussian_diffusion.py:268-311).
    loss_weighting: str = "none"
    min_snr_gamma: float = 5.0
    # CFG shaping (diffuse/guidance.py): [lo, hi] window as a FRACTION of the
    # training schedule (t / (n_steps-1), 1 = pure noise) outside which the
    # effective scale is 1, and the arXiv:2305.08891 std-rescale blend
    guidance_interval: Sequence[float] | None = None
    guidance_rescale: float = 0.0

    def __post_init__(self):
        if self.sampling_method not in SAMPLER_REGISTRY:
            raise ValueError(f"sampling method must be one of {list(SAMPLER_REGISTRY)}")
        if self.prediction_type not in ("epsilon", "xstart", "v"):
            raise ValueError("prediction_type must be 'epsilon', 'xstart', or 'v'")
        if self.loss_weighting not in ("none", "min_snr"):
            raise ValueError("loss_weighting must be 'none' or 'min_snr'")
        if (
            self.prediction_type != "epsilon"
            and self.sampler_parameters.get("mean_type", "epsilon") != "epsilon"
        ):
            # _prediction_to_eps always emits an epsilon head; a non-epsilon
            # sampler mean_type would reinterpret it as x0/x_{t-1}
            raise ValueError(
                "non-epsilon prediction_type requires the sampler's default "
                "mean_type='epsilon' (the head is converted to epsilon before sampling)"
            )

    @property
    def training_steps(self) -> int:
        return self.n_steps

    @property
    def steps(self) -> int:
        return self.sampling_steps if self.sampling_steps is not None else self.n_steps

    @cached_property
    def _tables(self) -> tuple[np.ndarray, np.ndarray | None]:
        """(betas, timestep_map) after optional respacing (reference :87-133)."""
        betas = get_variance_schedule(self.training_steps, self.schedule)
        section_counts = self.section_counts
        if self.steps != self.training_steps:
            section_counts = section_counts or self.steps
        if section_counts:
            use = space_timesteps(
                num_timesteps=self.training_steps,
                section_counts=section_counts,
                ddim=self.sampling_method == "ddim",
            )
            new_betas, timestep_map = respace_betas(betas, use)
            return new_betas, timestep_map
        return betas, None

    @property
    def betas(self) -> np.ndarray:
        return self._tables[0]

    @property
    def timestep_map(self) -> np.ndarray | None:
        return self._tables[1]

    @cached_property
    def alphas_bar(self) -> np.ndarray:
        return np.cumprod(1.0 - self.betas)

    @cached_property
    def sqrt_alphas_bar(self) -> np.ndarray:
        return np.sqrt(self.alphas_bar)

    @cached_property
    def sampler(self):
        s = SAMPLER_REGISTRY[self.sampling_method](**self.sampler_parameters)
        return s.with_betas(self.betas)

    def set_steps(
        self, n_steps: int, schedule: str | None = None, section_counts: int | str | None = None
    ) -> "GaussianDiffusion":
        """Functional set_steps (reference :87-133): returns a new formalization
        whose sampling grid (and respaced tables) differ; training steps stay."""
        return dataclasses.replace(
            self,
            schedule=schedule or self.schedule,
            sampling_steps=n_steps,
            section_counts=section_counts,
        )

    # --- forward process ------------------------------------------------------
    def draw_timesteps(self, rng: jax.Array, batch_size: int) -> jax.Array:
        return jax.random.randint(rng, (batch_size,), 0, self.steps, dtype=jnp.int32)

    def add_noise(
        self, x: jax.Array, timesteps: jax.Array, noise: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        sab = extract_into_tensor(self.sqrt_alphas_bar, timesteps, x.ndim).astype(x.dtype)
        ab = extract_into_tensor(self.alphas_bar, timesteps, x.ndim).astype(x.dtype)
        x_t = sab * x + jnp.sqrt(1.0 - ab) * noise
        return x_t, noise

    def _map_timesteps(self, timesteps: jax.Array) -> jax.Array:
        """Map respaced step indices to original training timesteps for the model."""
        if self.timestep_map is not None:
            return jnp.asarray(self.timestep_map)[timesteps]
        return timesteps

    # --- training loss ----------------------------------------------------------
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
        vlb_weight: float = 1e-3,
        distill_fn: ModelFn | None = None,
        distill_guidance: float = 0.0,
    ) -> dict[str, jax.Array]:
        """Epsilon-prediction MSE (reference :268-311) plus, when the sampler
        uses a learned variance, the Improved-DDPM hybrid VLB term (the
        reference leaves this as a TODO at :267): KL(q(x_{t-1}|x_t,x_0) ||
        p_theta) with the predicted mean stop-gradiented so only the variance
        head trains through it; discretized Gaussian NLL at t=0.
        """
        xt, noise = self.add_noise(x0, timesteps, noise)
        if drop is None:
            drop = jnp.zeros((x0.shape[0],), dtype=bool)
        model_timesteps = self._map_timesteps(timesteps)
        prediction = model_fn(x=xt, timesteps=model_timesteps, cond=cond, drop=drop)
        out = prediction["x"].astype(jnp.float32)

        learned_var = self.sampler.var_type in ("learned", "learned_range")
        if learned_var:
            head, _ = jnp.split(out, 2, axis=-1)
        else:
            head = out
        if distill_fn is not None:
            # guidance distillation (arXiv:2210.03142; see flow.py): target =
            # the frozen teacher's guided raw head. Fixed-variance only — the
            # hybrid VLB term trains the variance against the data posterior,
            # which a guided-mean target does not define.
            assert not learned_var, (
                "guidance distillation requires a fixed-variance gaussian student"
            )
            # fused 2x teacher forward with the SAME interval/rescale shaping
            # the teacher's own sampling applies (one_step_denoise above) —
            # the interval is in ORIGINAL-schedule fractions, so the flow
            # _cfg_model_call (flow-time units) cannot be reused here
            b = xt.shape[0]
            x2 = jnp.concatenate([xt, xt], axis=0)
            t2 = jnp.concatenate([model_timesteps, model_timesteps], axis=0)
            cond2 = jax.tree.map(lambda c: jnp.concatenate([c, c], axis=0), cond)
            drop2 = jnp.concatenate([jnp.zeros((b,), bool), jnp.ones((b,), bool)])
            t_out = distill_fn(x=x2, timesteps=t2, cond=cond2, drop=drop2)["x"]
            t_cond, t_uncond = jnp.split(t_out, 2, axis=0)
            frac = timesteps.astype(jnp.float32) / max(self.training_steps - 1, 1)
            scale = effective_scale(distill_guidance, frac, self.guidance_interval)
            guided = combine_cfg(t_cond, t_uncond, scale, self.guidance_rescale)
            target = jax.lax.stop_gradient(guided.astype(jnp.float32))
        else:
            target = self._training_target(x0, noise, timesteps, xt)
        if self.loss_weighting == "min_snr":
            # per-sample MSE reweighted so each timestep contributes at most
            # an x0-equivalent weight of gamma; the factor depends on what the
            # head predicts (table 1 of the min-SNR paper):
            #   epsilon: min(SNR, gamma)/SNR   x0: min(SNR, gamma)
            #   v:       min(SNR, gamma)/(SNR + 1)
            ab = jnp.asarray(self.alphas_bar, jnp.float32)[timesteps]
            snr = ab / (1.0 - ab)
            w = {
                "epsilon": jnp.minimum(snr, self.min_snr_gamma) / snr,
                "xstart": jnp.minimum(snr, self.min_snr_gamma),
                "v": jnp.minimum(snr, self.min_snr_gamma) / (snr + 1.0),
            }[self.prediction_type]
            mse = jnp.mean((head - target) ** 2, axis=tuple(range(1, head.ndim)))
            loss = jnp.mean(w * mse)
        else:
            loss = jnp.mean((head - target) ** 2)
        loss_dict = {"loss": loss}

        if learned_var:
            # freeze the mean for the VLB term (Improved DDPM eq. 16); the
            # posterior machinery expects an epsilon head
            eps_pred = self._head_to_eps(head, xt, timesteps)
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(eps_pred), out[..., eps_pred.shape[-1]:]], axis=-1
            )
            mean, _, log_var, _ = self.sampler._get_p_mean_var(frozen, xt, timesteps)
            q_mean = self.sampler._get_mean_from_x_start(xt, x0, timesteps)
            q_log_var = extract_into_tensor(
                self.sampler.posterior_log_variance_clipped, timesteps, xt.ndim
            )
            kl = normal_kl(q_mean, q_log_var, mean, log_var) / jnp.log(2.0)
            nll = -discretized_gaussian_log_likelihood(x0, mean, 0.5 * log_var) / jnp.log(2.0)
            t_mask = (timesteps == 0).reshape(-1, *([1] * (xt.ndim - 1)))
            vlb = jnp.where(t_mask, nll, kl)
            loss_dict["vlb"] = vlb_weight * vlb.reshape(vlb.shape[0], -1).mean(axis=-1).mean()
        for extra_loss in extra_losses:
            # x0 rides along as a default so pixel-space runs get live-encoder
            # REPA for free; batch-provided extras (dst_features) override it
            loss_dict[extra_loss.name] = extra_loss(
                model_output=prediction, **{"x0": x0, **(extra_args or {})}
            )
        return loss_dict

    # --- prediction-parametrization conversions -------------------------------
    def _alpha_sigma(self, timesteps: jax.Array, ndim: int):
        ab = extract_into_tensor(self.alphas_bar, timesteps, ndim)
        return jnp.sqrt(ab), jnp.sqrt(1.0 - ab)

    def _training_target(self, x0, noise, timesteps, xt):
        if self.prediction_type == "epsilon":
            return noise
        if self.prediction_type == "xstart":
            return x0.astype(jnp.float32)
        alpha, sigma = self._alpha_sigma(timesteps, xt.ndim)
        return alpha * noise.astype(jnp.float32) - sigma * x0.astype(jnp.float32)

    def _head_to_eps(self, head, xt, timesteps):
        """Convert the model's first-C-channels head to epsilon (affine in the
        head for fixed (xt, t), so it commutes with CFG combination)."""
        if self.prediction_type == "epsilon":
            return head
        alpha, sigma = self._alpha_sigma(timesteps, xt.ndim)
        alpha = alpha.astype(head.dtype)
        sigma = sigma.astype(head.dtype)
        xt = xt.astype(head.dtype)
        if self.prediction_type == "xstart":
            return (xt - alpha * head) / jnp.maximum(sigma, 1e-12)
        # v-parametrization: x0 = alpha*xt - sigma*v ; eps = sigma*xt + alpha*v
        return sigma * xt + alpha * head

    def _prediction_to_eps(self, prediction, xt, timesteps):
        """Full model output -> epsilon form (variance channels untouched)."""
        if self.prediction_type == "epsilon":
            return prediction
        if self.sampler.var_type in ("learned", "learned_range"):
            head, var = jnp.split(prediction, 2, axis=-1)
            return jnp.concatenate([self._head_to_eps(head, xt, timesteps), var], axis=-1)
        return self._head_to_eps(prediction, xt, timesteps)

    # --- one reverse step ---------------------------------------------------------
    def one_step_denoise(
        self,
        model_fn: ModelFn,
        x: jax.Array,
        cond: dict[str, Any],
        t: jax.Array,
        clamp_x: bool = False,
        guidance_scale: float | jax.Array = 0.0,
        use_cfg: bool = False,
        rng: jax.Array | None = None,
        sampler_args: dict[str, Any] | None = None,
        guide_fn: ModelFn | None = None,
    ) -> StepResult:
        batch = x.shape[0]
        timesteps = jnp.full((batch,), t, dtype=jnp.int32)
        model_timesteps = self._map_timesteps(timesteps)

        if use_cfg and guide_fn is not None:
            # autoguidance (arXiv:2406.02507): the negative branch is a
            # conditional forward of a degraded model (flow.py::_cfg_model_call)
            drop = jnp.zeros((batch,), dtype=bool)
            pred_cond = model_fn(x=x, timesteps=model_timesteps, cond=cond, drop=drop)["x"]
            pred_bad = guide_fn(x=x, timesteps=model_timesteps, cond=cond, drop=drop)["x"]
            frac = model_timesteps.astype(jnp.float32) / max(self.training_steps - 1, 1)
            scale = effective_scale(guidance_scale, frac, self.guidance_interval)
            if self.sampler.var_type in ("learned", "learned_range"):
                head_c, var_c = jnp.split(pred_cond, 2, axis=-1)
                head_b, _ = jnp.split(pred_bad, 2, axis=-1)
                head = combine_cfg(head_c, head_b, scale, self.guidance_rescale)
                prediction = jnp.concatenate([head, var_c], axis=-1)
            else:
                prediction = combine_cfg(pred_cond, pred_bad, scale, self.guidance_rescale)
        elif use_cfg:
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([model_timesteps, model_timesteps], axis=0)
            cond2 = jax.tree.map(lambda c: jnp.concatenate([c, c], axis=0), cond)
            drop = jnp.concatenate([jnp.zeros((batch,), bool), jnp.ones((batch,), bool)])
            out = model_fn(x=x2, timesteps=t2, cond=cond2, drop=drop)["x"]
            pred_cond, pred_uncond = jnp.split(out, 2, axis=0)
            # interval/rescale shaping on the guided head (diffuse/guidance.py);
            # the window is a fraction of the ORIGINAL training schedule so it
            # is invariant under respacing
            frac = model_timesteps.astype(jnp.float32) / max(self.training_steps - 1, 1)
            scale = effective_scale(guidance_scale, frac, self.guidance_interval)
            if self.sampler.var_type in ("learned", "learned_range"):
                # guide the mean head only; extrapolating the log-variance
                # interpolant past the conditional value inflates per-step
                # noise (guided-diffusion CFG guides eps and keeps the
                # conditional variance)
                head_c, var_c = jnp.split(pred_cond, 2, axis=-1)
                head_u, _ = jnp.split(pred_uncond, 2, axis=-1)
                head = combine_cfg(head_c, head_u, scale, self.guidance_rescale)
                prediction = jnp.concatenate([head, var_c], axis=-1)
            else:
                prediction = combine_cfg(pred_cond, pred_uncond, scale, self.guidance_rescale)
        else:
            drop = jnp.zeros((batch,), dtype=bool)
            prediction = model_fn(x=x, timesteps=model_timesteps, cond=cond, drop=drop)["x"]

        # samplers consume epsilon (their default mean_type); convert
        # x0-/v-parametrized heads here so every sampler works unchanged
        prediction = self._prediction_to_eps(prediction, x, timesteps)
        return self.sampler.step(
            model_prediction=prediction,
            timesteps=timesteps,
            xt=x,
            rng=rng,
            clamp_x=clamp_x,
            **(sampler_args or {}),
        )

    # --- full reverse process (scan-fused) -------------------------------------------
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
        """Full ancestral/DDIM reverse process as one `lax.scan`
        (reference Python loop: gaussian_diffusion.py:409-434).

        ``inpaint`` = ``{"known": x0-like, "mask": 1 = keep}`` blends the
        q-sampled known region after every step (RePaint-lite; see
        flow.py::denoise for the convention) using the respaced tables.
        ``img2img_init`` + ``img2img_strength`` q-sample the init at the
        respaced index ``ceil(strength * steps) - 1`` and run only that tail
        (SDEdit; see flow.py::denoise).
        """
        start = self.steps - 1
        if img2img_init is not None:
            k = min(max(int(round(img2img_strength * self.steps)), 1), self.steps)
            start = k - 1
            rng, init_rng = jax.random.split(rng)
            noise = jax.random.normal(init_rng, img2img_init.shape, dtype=dtype)
            x, _ = self.add_noise(
                img2img_init.astype(dtype), jnp.full((len(img2img_init),), start), noise)
        if x is None:
            assert data_shape is not None, "'data_shape' must be provided if 'x' is not given"
            rng, init_rng = jax.random.split(rng)
            x = jax.random.normal(init_rng, data_shape, dtype=dtype)

        t_indices = jnp.arange(start, -1, -1, dtype=jnp.int32)
        multistep = getattr(self.sampler, "is_multistep", False)
        s_state0 = self.sampler.init_state(x) if multistep else {}
        sqrt_ab = jnp.asarray(self.sqrt_alphas_bar, jnp.float32)
        ab = jnp.asarray(self.alphas_bar, jnp.float32)

        mcache0 = block_cache0 if block_cache0 is not None else ()

        def body(carry, xs):
            x_t, step_rng, s_state, mcache = carry
            t, step_idx = xs
            step_rng, use_rng = jax.random.split(step_rng)
            # sampling-time block caching (diffuse/caching.py)
            step_model_fn, step_guide_fn, cell = wrap_block_cache(
                model_fn, guide_fn, mcache, step_idx, cache_interval,
                enabled=block_cache0 is not None,
            )

            step = self.one_step_denoise(
                step_model_fn, x_t, cond, t,
                clamp_x=clamp_x, guidance_scale=guidance_scale, use_cfg=use_cfg,
                rng=use_rng,
                sampler_args={"state": s_state} if multistep else None,
                guide_fn=step_guide_fn,
            )
            s_state = step.pop("state", s_state)
            x_next = step["x_prev"]
            if inpaint is not None:
                # the step's result sits at index t-1 (clean x0 when t == 0)
                step_rng, ip_rng = jax.random.split(step_rng)
                known = inpaint["known"].astype(jnp.float32)
                noise = jax.random.normal(ip_rng, known.shape, dtype=jnp.float32)
                tp = jnp.maximum(t - 1, 0)
                known_t = jnp.where(
                    t > 0, sqrt_ab[tp] * known + jnp.sqrt(1.0 - ab[tp]) * noise, known
                )
                mask = inpaint["mask"].astype(jnp.float32)
                x_next = (mask * known_t + (1.0 - mask) * x_next.astype(jnp.float32)).astype(
                    x_next.dtype)
                step["x_prev"] = x_next
            ys = {k: step[k] for k in step} if return_intermediates else None
            # keep the carry dtype stable (fp32 table scalars promote bf16 x)
            return (x_next.astype(x_t.dtype), step_rng, s_state, cell["c"]), ys

        (x_final, _, _, _), ys = jax.lax.scan(
            body, (x, rng, s_state0, mcache0),
            (t_indices, jnp.arange(t_indices.shape[0])),
        )
        if inpaint is not None:
            mask = inpaint["mask"].astype(x_final.dtype)
            x_final = mask * inpaint["known"].astype(x_final.dtype) + (1.0 - mask) * x_final

        out: dict[str, jax.Array] = {"x": x_final}
        if return_intermediates and ys is not None:
            def to_batch_major(y):
                return jnp.moveaxis(y, 0, 1)

            out["xt"] = jnp.concatenate([x[:, None], to_batch_major(ys["x_prev"])], axis=1)
            out["estimated_x0"] = to_batch_major(ys["estimated_x0"])
            if "x_prev_mean" in ys:
                out["xt_mean"] = to_batch_major(ys["x_prev_mean"])
            if "x_prev_std" in ys:
                out["xt_std"] = to_batch_major(ys["x_prev_std"])
            if "logprob" in ys:
                out["logprob"] = to_batch_major(ys["logprob"])
        return out
