"""Rectified-flow / flow-matching formalization.

Behavioral parity with reference src/diffulab/diffuse/modelizations/flow.py
(16-524), redesigned as pure functions:

- the forward process is ``x_t = (1-t) x0 + t eps`` (``at``/``bt``,
  reference flow.py:137-166);
- the training loss is MSE between the model velocity and ``eps - x0``
  (reference flow.py:262-315), with optional x-prediction conversion
  ``v = (x_t - x0_hat) / t`` (reference flow.py:199-221);
- timesteps are drawn uniform or logit-normal, optionally time-shifted by
  ``s(alpha,t) = alpha t / (1+(alpha-1)t)`` (reference flow.py:168-197);
- the reverse process is one fused `jax.lax.scan` over the timestep grid with
  classifier-free guidance as a single batched 2x forward per step (the
  reference runs a Python loop with two sequential model calls,
  flow.py:223-260 and 410-524);
- the GRPO loss re-evaluates Euler–Maruyama transition log-probs on a random
  subset of stored trajectory steps (reference flow.py:317-380), with
  `jax.random.choice` replacing `random.sample`.

The model is an opaque callable ``model_fn(x, timesteps, cond, drop)`` where
``cond`` is a pytree of conditioning inputs and ``drop`` is a per-sample
boolean mask selecting the null condition (the JAX analog of the reference's
scalar drop probability ``p``).
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
from diffulab_tpu.diffuse.samplers.flow import DPMSolverPP2M, Euler, EulerMaruyama, Heun, UniPC
from diffulab_tpu.diffuse.schedules import flow_linear_timesteps, shift_timestep
from diffulab_tpu.utils import batch_broadcast, flatten_nonbatch_mean

ModelFn = Callable[..., dict[str, jax.Array]]

SAMPLER_REGISTRY = {
    "euler": Euler,
    "euler_maruyama": EulerMaruyama,
    "heun": Heun,
    "dpmpp_2m": DPMSolverPP2M,
    "unipc": UniPC,
}


def _cfg_model_call(
    model_fn: ModelFn,
    x: jax.Array,
    t_vec: jax.Array,
    cond: dict[str, Any],
    guidance_scale: float | jax.Array,
    use_cfg: bool,
    guidance_interval: Sequence[float] | None = None,
    guidance_rescale: float = 0.0,
    guide_fn: ModelFn | None = None,
) -> jax.Array:
    """Model forward with classifier-free guidance as ONE batched 2x call.

    The reference issues two sequential forwards (cond then uncond,
    flow.py:256-259); on TPU a single concatenated batch keeps the MXU busy and
    halves the number of kernel launches. ``use_cfg`` is static;
    interval/rescale shaping per diffuse/guidance.py (interval in flow time t).

    With ``guide_fn`` (autoguidance, Karras et al. arXiv:2406.02507) the
    negative branch is a *conditional* forward of a degraded model — e.g. an
    early-training or short-EMA snapshot — instead of the condition-dropped
    forward: ``guided = bad + s * (good - bad)``. Two sequential calls (the
    weights differ, so the batched fusion cannot apply); same shaping knobs.
    """
    batch = x.shape[0]
    if not use_cfg:
        drop = jnp.zeros((batch,), dtype=bool)
        return model_fn(x=x, timesteps=t_vec, cond=cond, drop=drop)["x"]

    if guide_fn is not None:
        drop = jnp.zeros((batch,), dtype=bool)
        out_cond = model_fn(x=x, timesteps=t_vec, cond=cond, drop=drop)["x"]
        out_bad = guide_fn(x=x, timesteps=t_vec, cond=cond, drop=drop)["x"]
        scale = effective_scale(guidance_scale, t_vec, guidance_interval)
        return combine_cfg(out_cond, out_bad, scale, guidance_rescale)

    x2 = jnp.concatenate([x, x], axis=0)
    t2 = jnp.concatenate([t_vec, t_vec], axis=0)
    cond2 = jax.tree.map(lambda c: jnp.concatenate([c, c], axis=0), cond)
    drop = jnp.concatenate([jnp.zeros((batch,), bool), jnp.ones((batch,), bool)])
    out = model_fn(x=x2, timesteps=t2, cond=cond2, drop=drop)["x"]
    out_cond, out_uncond = jnp.split(out, 2, axis=0)
    scale = effective_scale(guidance_scale, t_vec, guidance_interval)
    return combine_cfg(out_cond, out_uncond, scale, guidance_rescale)


@dataclasses.dataclass(frozen=True)
class Flow:
    """Continuous-time flow matching (Lipman et al. 2022)."""

    n_steps: int = 50
    sampling_method: str = "euler"
    schedule: str = "linear"
    latent_diffusion: bool = False
    logits_normal: bool = False
    shift: float | None = None
    prediction_type: str = "v"
    sampler_parameters: dict[str, Any] = dataclasses.field(default_factory=dict)
    # CFG shaping (diffuse/guidance.py): [lo, hi] window in flow time t
    # (t=1 is pure noise) outside which the effective scale is 1, and the
    # arXiv:2305.08891 std-rescale blend in [0, 1]
    guidance_interval: Sequence[float] | None = None
    guidance_rescale: float = 0.0

    def __post_init__(self):
        assert self.prediction_type in ("v", "x"), (
            "prediction_type must be 'v' or 'x'; noise prediction is not supported for flow models"
        )
        if self.schedule != "linear":
            raise NotImplementedError("Only the linear schedule is supported for flow models")
        if self.sampling_method not in SAMPLER_REGISTRY:
            raise ValueError(f"sampling method must be one of {list(SAMPLER_REGISTRY)}")

    @property
    def x_prediction(self) -> bool:
        return self.prediction_type == "x"

    @property
    def steps(self) -> int:
        return self.n_steps

    @cached_property
    def timesteps(self) -> np.ndarray:
        """Descending grid 1 -> 0 with ``n_steps + 1`` points (fp32)."""
        return flow_linear_timesteps(self.n_steps, self.shift)

    @cached_property
    def sampler(self):
        s = SAMPLER_REGISTRY[self.sampling_method](**self.sampler_parameters)
        return s.with_timesteps(self.timesteps)

    def set_steps(self, n_steps: int, schedule: str = "linear", shift: float | None = None) -> "Flow":
        """Functional analog of the reference's mutable set_steps (flow.py:101-135):
        returns a new Flow whose jitted sample fn has a different static grid."""
        return dataclasses.replace(
            self, n_steps=n_steps, schedule=schedule, shift=shift,
            sampling_method=self.sampling_method, sampler_parameters=self.sampler_parameters,
        )

    # --- forward process ----------------------------------------------------
    def at(self, timesteps: jax.Array) -> jax.Array:
        return 1.0 - timesteps

    def bt(self, timesteps: jax.Array) -> jax.Array:
        return timesteps

    def draw_timesteps(self, rng: jax.Array, batch_size: int) -> jax.Array:
        if self.logits_normal:
            t = jax.nn.sigmoid(jax.random.normal(rng, (batch_size,), dtype=jnp.float32))
        else:
            t = jax.random.uniform(rng, (batch_size,), dtype=jnp.float32)
        if self.shift is not None:
            t = shift_timestep(t, self.shift)
        if self.x_prediction:
            t = jnp.clip(t, min=0.05)
        return t

    def add_noise(
        self, x: jax.Array, timesteps: jax.Array, noise: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        at = batch_broadcast(self.at(timesteps), x.ndim).astype(x.dtype)
        bt = batch_broadcast(self.bt(timesteps), x.ndim).astype(x.dtype)
        return at * x + bt * noise, noise

    # --- training loss --------------------------------------------------------
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
        """Flow-matching MSE plus any auxiliary losses (reference flow.py:262-315).

        ``drop`` is the per-sample CFG condition-drop mask drawn by the trainer.

        ``distill_fn`` switches to guidance distillation (arXiv:2210.03142;
        no reference counterpart): the regression target becomes the FROZEN
        teacher's CFG-guided raw prediction at ``distill_guidance`` instead
        of the data velocity, so the student reproduces guided sampling in a
        single forward (guidance_scale=0 at generation — half the sampling
        FLOPs of the fused 2x CFG batch). Targets live in raw model-output
        space, so v- and x-prediction students distill identically.
        """
        xt, noise = self.add_noise(x0, timesteps, noise)
        if drop is None:
            drop = jnp.zeros((x0.shape[0],), dtype=bool)
        prediction = model_fn(x=xt, timesteps=timesteps, cond=cond, drop=drop)
        if distill_fn is not None:
            target = jax.lax.stop_gradient(
                _cfg_model_call(
                    distill_fn, xt, timesteps, cond, distill_guidance,
                    use_cfg=True, guidance_interval=self.guidance_interval,
                    guidance_rescale=self.guidance_rescale,
                )
            ).astype(jnp.float32)
            losses = (target - prediction["x"].astype(jnp.float32)) ** 2
            loss_dict = {"loss": flatten_nonbatch_mean(losses).mean()}
            for extra_loss in extra_losses:
                loss_dict[extra_loss.name] = extra_loss(
                    model_output=prediction, **{"x0": x0, **(extra_args or {})}
                )
            return loss_dict
        v_pred = prediction["x"]
        if self.x_prediction:
            v_pred = (xt - v_pred) / batch_broadcast(timesteps, xt.ndim)

        losses = ((noise - x0) - v_pred.astype(jnp.float32)) ** 2
        loss = flatten_nonbatch_mean(losses).mean()
        loss_dict = {"loss": loss}
        for extra_loss in extra_losses:
            # x0 rides along as a default so pixel-space runs get live-encoder
            # REPA for free; batch-provided extras (dst_features) override it
            loss_dict[extra_loss.name] = extra_loss(
                model_output=prediction, **{"x0": x0, **(extra_args or {})}
            )
        return loss_dict

    # --- one reverse step -----------------------------------------------------
    def get_v(
        self,
        model_fn: ModelFn,
        x: jax.Array,
        cond: dict[str, Any],
        t_curr: jax.Array,
        guidance_scale: float | jax.Array = 0.0,
        use_cfg: bool = False,
        guide_fn: ModelFn | None = None,
    ) -> jax.Array:
        t_vec = jnp.full((x.shape[0],), t_curr, dtype=jnp.float32)
        pred = _cfg_model_call(model_fn, x, t_vec, cond, guidance_scale, use_cfg,
                               self.guidance_interval, self.guidance_rescale,
                               guide_fn=guide_fn)
        if self.x_prediction:
            return (x - pred) / jnp.maximum(t_curr, 0.05)
        return pred

    def one_step_denoise(
        self,
        model_fn: ModelFn,
        x: jax.Array,
        cond: dict[str, Any],
        t_prev: jax.Array,
        t_curr: jax.Array,
        guidance_scale: float | jax.Array = 0.0,
        use_cfg: bool = False,
        rng: jax.Array | None = None,
        sampler_args: dict[str, Any] | None = None,
        guide_fn: ModelFn | None = None,
    ) -> StepResult:
        v = self.get_v(model_fn, x, cond, t_curr, guidance_scale, use_cfg, guide_fn)
        if getattr(self.sampler, "needs_second_eval", False):
            # Heun corrector: second velocity eval at the Euler-predicted point
            x_pred = self.sampler.predict(x, v, t_curr, t_prev)
            v2 = self.get_v(model_fn, x_pred, cond, t_prev, guidance_scale, use_cfg, guide_fn)
            return self.sampler.step(x, v, t_curr, t_prev, v2=v2, rng=rng, **(sampler_args or {}))
        return self.sampler.step(x, v, t_curr, t_prev, rng=rng, **(sampler_args or {}))

    # --- full reverse process (scan-fused) -------------------------------------
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
        """Full reverse flow as one `lax.scan` (reference loop: flow.py:484-508).

        Returns a SamplingOutput dict: always ``x``; with
        ``return_intermediates`` also ``xt`` [B, steps+1, ...], ``estimated_x0``
        [B, steps, ...], and (for stochastic samplers) ``xt_mean``/``xt_std``/
        ``logprob``.

        ``inpaint`` = ``{"known": x0-like, "mask": broadcastable, 1 = keep}``
        enables sampling-time inpainting (RePaint-style known-region blending,
        arXiv:2201.09865 without the resampling loop; no reference
        counterpart): after every step the known region is replaced by the
        forward-noised known image at the step's result time, and the final
        output blends the clean known exactly. Works with any trained
        checkpoint and any sampler (the deterministic ones restart the known
        region's trajectory each step, which is the standard RePaint-lite
        approximation).

        ``img2img_init`` + ``img2img_strength`` enable SDEdit-style editing
        (arXiv:2108.01073; no reference counterpart): the init image is
        forward-noised to the schedule entry at ``1 - strength`` of the grid
        and only that tail of the reverse process runs — ``strength`` must be
        a static Python float (it slices the scanned schedule).
        """
        ts_np = self.timesteps  # host schedule: slicing below is static
        n_total = len(ts_np) - 1
        start_idx = 0
        if img2img_init is not None:
            k = min(max(int(round(img2img_strength * n_total)), 1), n_total)
            start_idx = n_total - k
            rng, init_rng = jax.random.split(rng)
            t0 = float(ts_np[start_idx])
            noise = jax.random.normal(init_rng, img2img_init.shape, dtype=dtype)
            x = (1.0 - t0) * img2img_init.astype(dtype) + t0 * noise
        if x is None:
            assert data_shape is not None, "'data_shape' must be provided if 'x' is not given"
            rng, init_rng = jax.random.split(rng)
            x = jax.random.normal(init_rng, data_shape, dtype=dtype)

        ts = jnp.asarray(ts_np)
        t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=1)[start_idx:]  # [steps, 2]
        stochastic = isinstance(self.sampler, EulerMaruyama)
        multistep = getattr(self.sampler, "is_multistep", False)
        s_state0 = self.sampler.init_state(x) if multistep else {}

        mcache0 = block_cache0 if block_cache0 is not None else ()

        def body(carry, xs):
            x_t, step_rng, s_state, mcache = carry
            t_pair, step_idx = xs
            step_rng, use_rng = jax.random.split(step_rng)
            t_curr, t_prev = t_pair[0], t_pair[1]
            # sampling-time block caching: thread the (main, guide) cache
            # pair through the scan carry (diffuse/caching.py)
            step_model_fn, step_guide_fn, cell = wrap_block_cache(
                model_fn, guide_fn, mcache, step_idx, cache_interval,
                enabled=block_cache0 is not None,
            )

            step = self.one_step_denoise(
                step_model_fn, x_t, cond, t_prev, t_curr,
                guidance_scale=guidance_scale, use_cfg=use_cfg,
                rng=use_rng if stochastic else None,
                sampler_args={"state": s_state} if multistep else None,
                guide_fn=step_guide_fn,
            )
            s_state = step.pop("state", s_state)
            x_next = step["x_prev"]
            if inpaint is not None:
                step_rng, ip_rng = jax.random.split(step_rng)
                known = inpaint["known"].astype(x_next.dtype)
                noise = jax.random.normal(ip_rng, known.shape, dtype=x_next.dtype)
                known_t = (1.0 - t_prev) * known + t_prev * noise
                mask = inpaint["mask"].astype(x_next.dtype)
                x_next = mask * known_t + (1.0 - mask) * x_next
                step["x_prev"] = x_next
            ys = None
            if return_intermediates:
                ys = {k: step[k] for k in step}
            # keep the carry dtype stable (fp32 schedule scalars promote bf16 x)
            return (x_next.astype(x_t.dtype), step_rng, s_state, cell["c"]), ys

        (x_final, _, _, _), ys = jax.lax.scan(
            body, (x, rng, s_state0, mcache0),
            (t_pairs, jnp.arange(t_pairs.shape[0])),
        )
        if inpaint is not None:
            mask = inpaint["mask"].astype(x_final.dtype)
            x_final = mask * inpaint["known"].astype(x_final.dtype) + (1.0 - mask) * x_final
        if clamp_x:
            x_final = jnp.clip(x_final, -1.0, 1.0)

        out: dict[str, jax.Array] = {"x": x_final}
        if return_intermediates and ys is not None:
            # scan stacks along axis 0 (steps); move to axis 1 => [B, steps, ...]
            def to_batch_major(y):
                return jnp.moveaxis(y, 0, 1)

            out["xt"] = jnp.concatenate([x[:, None], to_batch_major(ys["x_prev"])], axis=1)
            out["estimated_x0"] = to_batch_major(ys["estimated_x0"])
            if "x_prev_mean" in ys:
                out["xt_mean"] = to_batch_major(ys["x_prev_mean"])
            if "x_prev_std" in ys:
                out["xt_std"] = ys["x_prev_std"].reshape(-1)  # [steps]
            if "logprob" in ys:
                out["logprob"] = to_batch_major(ys["logprob"])
        return out

    # --- GRPO loss -------------------------------------------------------------
    def compute_loss_grpo(
        self,
        model_fn: ModelFn,
        cond: dict[str, Any],
        sampling: dict[str, jax.Array],
        advantages: jax.Array,
        rng: jax.Array,
        kl_beta: float = 0.0,
        eps: float = 1e-4,
        timestep_fraction: float = 0.6,
        guidance_scale: float | jax.Array = 4.0,
    ) -> dict[str, jax.Array]:
        """Clipped-ratio GRPO objective over stored EM trajectories
        (reference flow.py:317-380; https://arxiv.org/abs/2508.20751).

        ``sampling`` must contain ``xt`` [B, steps+1, ...], ``logprob`` and
        ``xt_mean`` [B, steps, ...] from :meth:`denoise` with intermediates.
        """
        assert isinstance(self.sampler, EulerMaruyama), "GRPO only works with the Euler-Maruyama sampler"
        k = round(self.steps * timestep_fraction)
        indices = jax.random.choice(rng, self.steps, shape=(k,), replace=False)
        ts = jnp.asarray(self.timesteps)
        adv = batch_broadcast(advantages, sampling["logprob"].ndim - 1)

        def body(carry, idx):
            x_t = jnp.take(sampling["xt"], idx, axis=1)
            x_prev_stored = jnp.take(sampling["xt"], idx + 1, axis=1)
            step = self.one_step_denoise(
                model_fn, x_t, cond,
                t_prev=ts[idx + 1], t_curr=ts[idx],
                guidance_scale=guidance_scale, use_cfg=True,
                sampler_args={"x_prev": x_prev_stored},
            )
            old_logprob = jnp.take(sampling["logprob"], idx, axis=1)
            prob_ratios = jnp.exp(step["logprob"] - old_logprob)
            unclipped = adv * prob_ratios
            clipped = adv * jnp.clip(prob_ratios, 1.0 - eps, 1.0 + eps)
            policy_loss = -jnp.minimum(unclipped, clipped).mean()

            old_mean = jnp.take(sampling["xt_mean"], idx, axis=1)
            diff = (step["x_prev_mean"] - old_mean) ** 2
            kl_loss = (flatten_nonbatch_mean(diff) / (2.0 * step["x_prev_std"].reshape(()) ** 2)).mean()

            # stiffness diagnostics (logged, not differentiated): how much of
            # the policy-gradient signal the clip range removes. clip_frac is
            # the fraction of per-step ratios outside [1-eps, 1+eps];
            # ratio_dev is mean |ratio - 1| — together they say whether a
            # flat reward curve means "no signal" or "signal clipped away"
            clip_frac = (jnp.abs(prob_ratios - 1.0) > eps).mean()
            ratio_dev = jnp.abs(prob_ratios - 1.0).mean()

            carry = (carry[0] + policy_loss + kl_beta * kl_loss,
                     carry[1] + clip_frac, carry[2] + ratio_dev)
            return carry, None

        (total, clip_frac, ratio_dev), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32),) * 3, indices
        )
        return {
            "loss": total / k,
            "clip_frac": jax.lax.stop_gradient(clip_frac / k),
            "ratio_dev": jax.lax.stop_gradient(ratio_dev / k),
        }
