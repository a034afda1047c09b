"""Diffuser facade binding denoiser + formalization + optional VAE + extra losses.

JAX redesign of reference src/diffulab/diffuse/diffuser.py:14-239. The facade is
a thin Python-level orchestrator: the heavy paths (`compute_loss`, `generate`)
are pure functions of (params, batch, rng) that the trainer jits; `generate`
fuses the whole reverse scan — and the VAE decode in latent mode — under one
jit per (steps, shape, guidance) configuration.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from diffulab_tpu.diffuse.edm import EDM
from diffulab_tpu.diffuse.flow import Flow
from diffulab_tpu.diffuse.gaussian_diffusion import GaussianDiffusion


class Diffuser:
    """Unified interface over the diffusion formalizations.

    Args mirror the reference (diffuser.py:55-82): ``model_type`` selects the
    formalization ("rectified_flow" -> Flow, "gaussian_diffusion" ->
    GaussianDiffusion); ``vision_tower`` switches on latent diffusion with
    scale/bias handling; ``extra_losses`` are auxiliary named losses (e.g. REPA).
    """

    model_registry: dict[str, type] = {
        "rectified_flow": Flow,
        "gaussian_diffusion": GaussianDiffusion,
        "edm": EDM,
    }

    def __init__(
        self,
        denoiser: Any,
        sampling_method: str,
        model_type: str = "rectified_flow",
        n_steps: int = 1000,
        vision_tower: Any | None = None,
        extra_args: dict[str, Any] | None = None,
        extra_losses: list[Any] | None = None,
    ):
        if model_type not in self.model_registry:
            raise NotImplementedError(f"Model type {model_type} is not implemented")
        self.model_type = model_type
        self.denoiser = denoiser
        self.n_steps = n_steps
        self.vision_tower = vision_tower
        self.extra_losses = list(extra_losses or [])
        if self.vision_tower is not None:
            self.latent_scale = self.vision_tower.latent_scale
            self.latent_bias = self.vision_tower.latent_bias
        self.diffusion = self.model_registry[model_type](
            n_steps=n_steps,
            sampling_method=sampling_method,
            latent_diffusion=vision_tower is not None,
            **(extra_args or {}),
        )
        self._generate_cache: dict[Any, Callable[..., Any]] = {}
        self._block_cache: dict[str, int] | None = None

    # --- model adapter -----------------------------------------------------
    def model_fn(self, train: bool = False, rngs: Any | None = None):
        """The (x, timesteps, cond, drop) callable the formalizations consume.

        At trace time inside a jitted step this closes over the live NNX
        module; the trainer is responsible for split/merge at jit boundaries.
        """
        def fn(x, timesteps, cond, drop):
            return self.denoiser(
                x=x, timesteps=timesteps, cond=cond, drop=drop, train=train, rngs=rngs
            )
        return fn

    def draw_timesteps(self, rng: jax.Array, batch_size: int) -> jax.Array:
        return self.diffusion.draw_timesteps(rng, batch_size)

    def set_steps(self, n_steps: int, **kwargs: Any) -> None:
        """Swap the sampling schedule (reference diffuser.py:142-160). Purely a
        Python-level config change: the next `generate` call compiles (or reuses
        a cached) sampling fn for the new static grid."""
        self.diffusion = self.diffusion.set_steps(n_steps, **kwargs)
        self._generate_cache.clear()

    def set_block_cache(self, interval: int | None, span: tuple[int, int] | None = None) -> None:
        """Training-free sampling acceleration via block caching
        (Delta-DiT-style, arXiv:2406.01125; see MMDiT.set_block_cache_span).

        Every ``interval``-th denoise step the denoiser blocks in
        ``span = (lo, hi)`` run normally and cache their combined residual
        delta; the steps in between reuse the cached delta and skip those
        blocks — cutting sampling FLOPs by ~(hi-lo)/depth * (1 - 1/interval)
        at a small quality cost. ``interval=None`` or ``1`` disables.
        Sampling-time only: don't use while collecting GRPO trajectories
        (the stored logprobs would disagree with the uncached ratio re-eval).
        """
        if interval is None or int(interval) <= 1:
            self._block_cache = None
            if hasattr(self.denoiser, "set_block_cache_span"):
                self.denoiser.set_block_cache_span(None)
            self._generate_cache.clear()
            return
        assert hasattr(self.denoiser, "init_block_cache"), (
            f"{type(self.denoiser).__name__} does not support block caching"
        )
        assert span is not None, "block caching needs a (lo, hi) block span"
        self.denoiser.set_block_cache_span((int(span[0]), int(span[1])))
        self._block_cache = {"interval": int(interval),
                             "span": (int(span[0]), int(span[1]))}
        self._generate_cache.clear()

    # --- training loss -------------------------------------------------------
    def compute_loss(
        self,
        x0: jax.Array | None,
        cond: dict[str, Any],
        timesteps: jax.Array | None = None,
        noise: jax.Array | None = None,
        rng: jax.Array | None = None,
        drop: jax.Array | None = None,
        extra_args: dict[str, Any] | None = None,
        train: bool = True,
        rngs: Any | None = None,
        grpo: bool = False,
        grpo_args: dict[str, Any] | None = None,
    ) -> dict[str, jax.Array]:
        model_fn = self.model_fn(train=train, rngs=rngs)
        if grpo:
            assert isinstance(self.diffusion, Flow), "GRPO loss is only available for Flow-based models"
            return self.diffusion.compute_loss_grpo(model_fn, cond, **(grpo_args or {}))
        assert timesteps is not None, "timesteps must be provided for loss computation"
        assert x0 is not None
        if noise is None:
            assert rng is not None, "either noise or rng must be provided"
            noise = jax.random.normal(rng, x0.shape, dtype=x0.dtype)
        return self.diffusion.compute_loss(
            model_fn, x0, cond, timesteps, noise,
            drop=drop, extra_losses=self.extra_losses, extra_args=extra_args,
        )

    # --- sampling ---------------------------------------------------------------
    def _build_sample_fn(
        self,
        data_shape: tuple[int, ...] | None,
        clamp_x: bool,
        use_cfg: bool,
        return_intermediates: bool,
        decode: bool,
        dtype: jnp.dtype,
        img2img_strength: float = 1.0,
        guide_graphdef: Any = None,
    ) -> Callable[..., Any]:
        """One jitted reverse-process fn for a static sampling configuration.

        The NNX graphdefs ride as static args (hash-equal across calls while
        the module structure is unchanged), the param states as traced args —
        so updated / EMA-swapped params reuse the same executable. The whole
        scan, CFG-fused forwards, and (in latent mode) the VAE decode compile
        into one program (reference denoise loop: flow.py:410-524).
        """
        from flax import nnx

        diffusion = self.diffusion
        latent_scale = self.latent_scale if decode else None
        latent_bias = self.latent_bias if decode else None
        block_cache = self._block_cache

        def sample(graphdef, tower_graphdef, state, tower_state, rng, cond, x,
                   guidance_scale, inpaint=None, img2img_init=None, guide_state=None):
            m = nnx.merge(graphdef, state)

            def model_fn(**kw):
                return m(**kw, train=False)

            guide_fn = None
            bad = None
            if guide_state is not None:
                bad = nnx.merge(guide_graphdef, guide_state)

                def guide_fn(**kw):
                    return bad(**kw, train=False)

            block_cache0 = None
            if block_cache is not None:
                sample_shape = data_shape if x is None else x.shape
                # under autoguidance the CFG negative branch is the guide
                # model's own (unconcatenated, batch-B) forward, so the main
                # model never sees the fused 2x batch — each model carries
                # its own cache in the (main, guide) pair (diffuse/caching.py)
                main0 = m.init_block_cache(
                    sample_shape, cond, use_cfg and guide_state is None
                )
                guide0: Any = ()
                if bad is not None:
                    guide0 = bad.init_block_cache(sample_shape, cond, False)
                block_cache0 = (main0, guide0)

            out = diffusion.denoise(
                model_fn, cond, rng,
                # clamp_x means PIXEL range [-1, 1]: in latent mode the
                # reverse process integrates over tower-normalized latents
                # (unit std per channel — clipping those at +-1 would cut
                # ~1/3 of the Gaussian mass and scramble the decode), so the
                # clamp moves to the decoded image below
                data_shape=data_shape, x=x, clamp_x=clamp_x and not decode,
                guidance_scale=guidance_scale, use_cfg=use_cfg,
                return_intermediates=return_intermediates, dtype=dtype,
                inpaint=inpaint,
                img2img_init=img2img_init, img2img_strength=img2img_strength,
                guide_fn=guide_fn,
                block_cache0=block_cache0,
                cache_interval=block_cache["interval"] if block_cache else 1,
            )
            if decode:
                tower = nnx.merge(tower_graphdef, tower_state)
                out["x"] = tower.decode(out["x"] / latent_scale + latent_bias)
                if clamp_x:
                    out["x"] = jnp.clip(out["x"], -1.0, 1.0)
            return out

        return jax.jit(sample, static_argnums=(0, 1))

    def generate(
        self,
        rng: jax.Array,
        cond: dict[str, Any],
        data_shape: tuple[int, ...] | None = None,
        x: jax.Array | None = None,
        clamp_x: bool = False,
        guidance_scale: float = 0.0,
        return_intermediates: bool = False,
        return_latents: bool = False,
        dtype: jnp.dtype = jnp.float32,
        inpaint: dict[str, Any] | None = None,
        img2img: dict[str, Any] | None = None,
        guide_denoiser: Any = None,
    ) -> dict[str, jax.Array]:
        """Generate samples through a cached jitted sampler; in latent mode the
        vision-tower decode (x / latent_scale + latent_bias, reference
        diffuser.py:209-228) is fused into the same program.

        One compile per (steps, shape, cfg-on/off, clamp, intermediates,
        decode, dtype) configuration; subsequent calls — including with
        updated or EMA-swapped parameters and different guidance strengths —
        reuse the executable.

        ``inpaint`` = ``{"known": array, "mask": array (1 = keep known)}``
        enables sampling-time inpainting; both live in the space the reverse
        process integrates over (latent space when a vision tower is
        configured — encode pixels through ``vision_tower.encode`` first).
        ``img2img`` = ``{"init": array, "strength": float in (0, 1]}`` starts
        from the forward-noised init and runs only the schedule's last
        ``strength`` fraction (SDEdit; one compile per strength value).
        ``guide_denoiser`` (autoguidance, arXiv:2406.02507): a degraded
        sibling of the denoiser (early-training / short-EMA snapshot) that
        replaces the unconditional branch — ``guided = bad + s*(good - bad)``
        with the same interval/rescale shaping; requires guidance_scale > 0.
        """
        from flax import nnx

        use_cfg = guidance_scale > 0
        decode = self.vision_tower is not None and not return_latents
        shape = tuple(data_shape) if (x is None and data_shape is not None) else None
        strength = float(img2img.get("strength", 0.8)) if img2img is not None else 1.0
        guide_graphdef = guide_state = None
        if guide_denoiser is not None:
            assert use_cfg, "guide_denoiser requires guidance_scale > 0"
            if self._block_cache is not None:
                # the guide model is cached too (its own cache in the
                # (main, guide) pair) — mirror the denoiser's span on it
                assert hasattr(guide_denoiser, "set_block_cache_span"), (
                    f"{type(guide_denoiser).__name__} does not support block "
                    "caching; disable set_block_cache before autoguidance"
                )
                guide_denoiser.set_block_cache_span(self._block_cache["span"])
            guide_graphdef, guide_state = nnx.split(guide_denoiser)
        key = (
            shape, x is None, clamp_x, use_cfg, return_intermediates, decode,
            jnp.dtype(dtype).name, inpaint is not None,
            img2img is not None, strength, guide_graphdef,
            self._block_cache["interval"] if self._block_cache else None,
        )
        sample = self._generate_cache.get(key)
        if sample is None:
            sample = self._build_sample_fn(
                shape, clamp_x, use_cfg, return_intermediates, decode, dtype,
                img2img_strength=strength, guide_graphdef=guide_graphdef,
            )
            self._generate_cache[key] = sample

        graphdef, state = nnx.split(self.denoiser)
        tower_graphdef = tower_state = None
        if decode:
            tower_graphdef, tower_state = nnx.split(self.vision_tower)
        if inpaint is not None:
            inpaint = {"known": jnp.asarray(inpaint["known"]),
                       "mask": jnp.asarray(inpaint["mask"])}
        init = jnp.asarray(img2img["init"]) if img2img is not None else None
        return sample(
            graphdef, tower_graphdef, state, tower_state, rng, cond, x,
            jnp.asarray(guidance_scale, jnp.float32), inpaint, init, guide_state,
        )
