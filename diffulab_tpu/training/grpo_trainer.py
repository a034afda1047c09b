"""GRPO post-training trainer (reference trainers/grpo_trainer.py:25-623).

RL alignment loop, TPU-structured:

- SAMPLE (jitted): per prompt, draw ONE shared noise; for each of the
  ``n_image_per_prompt`` groups run the full Euler–Maruyama reverse scan with
  intermediates (xt / means / stds / logprobs carried out of the scan) under
  one jit — different trajectories come from the SDE noise stream, not the
  init (reference sample_model, :169-251);
- REWARD (host): the VLM pairwise-preference judge is autoregressive
  generation and stays OUT of the jitted graph (SURVEY.md §7.3) — decoded
  samples go host-side as numpy, advantages come back per image;
- LEARN (jitted): per group, the clipped-ratio GRPO objective re-evaluates
  transition log-probs on a random timestep subset with forced ``x_prev``
  (Flow.compute_loss_grpo), grads, optimizer + EMA update.

Trainer features (EMA, checkpointing, metrics, validation-with-EMA-swap,
best-val save) mirror BaseTrainer.
"""

from __future__ import annotations

import logging as pylog
from functools import partial
from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from diffulab_tpu.diffuse.diffuser import Diffuser
from diffulab_tpu.diffuse.flow import Flow
from diffulab_tpu.networks.rewards.common import RewardModel
from diffulab_tpu.parallel.sharding import batch_sharding, get_param_shardings, replicated
from diffulab_tpu.training.checkpoint import restore_checkpoint, trainable_filter
from diffulab_tpu.training.ema import ema_update
from diffulab_tpu.training.meters import AverageMeter
from diffulab_tpu.training.trainer import Trainer, _TrainModules

logger = pylog.getLogger(__name__)


class GRPOTrainer(Trainer):
    """GRPO trainer.

    ``mini_batch_size`` bounds how many prompts one jitted sampling call
    processes (reference grpo_trainer.py:237-242: full EM trajectories for 16
    images/prompt explode memory); ``offload_trajectories`` moves each
    group's trajectory pytree to host after sampling so at most ONE group's
    trajectories are device-resident at a time (they return to the mesh per
    learn step). Params/batches/trajectories are sharded over the trainer's
    (data, fsdp, tensor) mesh exactly like BaseTrainer — the reference's
    accelerate-DDP GRPO (grpo_trainer.py:481-512) maps to jit + shardings.
    """

    def __init__(self, *args: Any, timestep_fraction: float = 0.6, kl_beta: float = 0.0,
                 eps: float = 0.1, mini_batch_size: int | None = None,
                 offload_trajectories: bool = True, trust_region: float | None = 0.3,
                 trust_region_backoff: float = 0.5, **kwargs: Any):
        # eps: PPO clip range. The reference defaults 1e-4 (flow.py:330) —
        # measured (BASELINE.md round 3) to clip away essentially the whole
        # policy-gradient signal: judge_score stayed flat over 40 on-chip
        # epochs at 1e-4 but rose 0.50 -> 0.97 at 0.1 on the same task.
        #
        # trust_region: the PPO-collapse guard the round-4 stiffness campaign
        # prescribed (BASELINE.md "Grad clipping does NOT guard the PPO
        # collapse"). When an update's mean |ratio - 1| (``ratio_dev``, the
        # logged runaway diagnostic) exceeds this threshold, the policy has
        # overshot the behavior policy past recovery (measured dead state:
        # ratio_dev ~0.8, fully-clipped objective, exactly-zero gradients
        # forever). The guard then (a) REJECTS the update, (b) rolls params
        # back to the batch-start sampling policy (ratio re-centers at 1, so
        # the gradient signal is restored instead of dead), and (c) multiplies
        # a persistent lr scale by ``trust_region_backoff`` so the retried
        # steps shrink until they fit the region — grad clipping cannot do
        # this under adamw (second-moment preconditioning renormalizes the
        # clipped gradient; measured negative result, training/optim.py).
        # Healthy runs measure ratio_dev <= ~0.02 at eps=0.1, so 0.3 is far
        # from the signal and strictly below the 0.8 collapse. None disables.
        super().__init__(*args, **kwargs)
        self.timestep_fraction = timestep_fraction
        self.kl_beta = kl_beta
        self.eps = eps
        self.mini_batch_size = mini_batch_size
        self.offload_trajectories = offload_trajectories
        self.trust_region = trust_region
        self.trust_region_backoff = trust_region_backoff

    # ------------------------------------------------------------------ #
    def _build_fns(self, diffuser: Diffuser, graphdef, optimizer, guidance_scale: float):
        diffusion = diffuser.diffusion
        assert isinstance(diffusion, Flow), "GRPO requires the rectified_flow formalization"
        vision_tower = diffuser.vision_tower
        use_ema = self.use_ema
        ema_config = self.ema_config
        kl_beta, eps, tf = self.kl_beta, self.eps, self.timestep_fraction

        @jax.jit
        def sample_group(params, rng_state, rest, x_init, cond, rng):
            modules = nnx.merge(graphdef, params, rng_state, rest)

            def model_fn(**kw):
                return modules.denoiser(**kw, train=False)

            out = diffusion.denoise(
                model_fn, cond, rng, x=x_init, guidance_scale=guidance_scale,
                use_cfg=guidance_scale > 0, return_intermediates=True,
            )
            decoded = out["x"]
            if vision_tower is not None:
                decoded = vision_tower.decode(
                    decoded / diffuser.latent_scale + diffuser.latent_bias
                )
            return out, decoded

        trust_region = self.trust_region
        tr_backoff = self.trust_region_backoff

        @partial(jax.jit, donate_argnums=(0, 3, 4))
        def grpo_step(params, rng_state, rest, opt_state, ema_params, params_ref,
                      lr_scale, cond, sampling, advantages, rng, step):
            def loss_fn(params):
                modules = nnx.merge(graphdef, params, rng_state, rest)

                def model_fn(**kw):
                    return modules.denoiser(**kw, train=True)

                losses = diffusion.compute_loss_grpo(
                    model_fn, cond, sampling, advantages, rng,
                    kl_beta=kl_beta, eps=eps, timestep_fraction=tf,
                    guidance_scale=guidance_scale,
                )
                return losses["loss"], losses

            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            # stiffness diagnostic (BASELINE.md round-4 GRPO campaign): the
            # raw gradient scale, before any optimizer.grad_clip_norm clip
            losses = dict(losses, grad_norm=optax.global_norm(grads))
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            if trust_region is None:
                params = optax.apply_updates(params, updates)
                opt_state = new_opt_state
                if use_ema:
                    ema_params = ema_update(ema_config, ema_params, params, step)
                return params, opt_state, ema_params, lr_scale, losses

            # trust-region guard (see ctor docstring): reject + rollback +
            # lr backoff when this update's policy already drifted past the
            # region. ``jnp.where`` keeps the step a single traced program.
            reject = losses["ratio_dev"] > trust_region
            new_params = optax.apply_updates(
                params, jax.tree.map(lambda u: u * lr_scale, updates)
            )
            params = jax.tree.map(
                lambda ref, new: jnp.where(reject, ref, new), params_ref, new_params
            )
            opt_state = jax.tree.map(
                lambda old, new: jnp.where(reject, old, new) if old is not None else old,
                opt_state, new_opt_state,
                is_leaf=lambda x: x is None,
            )
            lr_scale = jnp.where(reject, lr_scale * tr_backoff, lr_scale)
            if use_ema:
                new_ema = ema_update(ema_config, ema_params, params, step)
                ema_params = jax.tree.map(
                    lambda old, new: jnp.where(reject, old, new), ema_params, new_ema
                )
            losses = dict(losses, tr_reject=reject.astype(jnp.float32), lr_scale=lr_scale)
            return params, opt_state, ema_params, lr_scale, losses

        @jax.jit
        def grpo_eval(params, rng_state, rest, cond, sampling, advantages, rng):
            modules = nnx.merge(graphdef, params, rng_state, rest)

            def model_fn(**kw):
                return modules.denoiser(**kw, train=False)

            return diffusion.compute_loss_grpo(
                model_fn, cond, sampling, advantages, rng,
                kl_beta=kl_beta, eps=eps, timestep_fraction=tf,
                guidance_scale=guidance_scale,
            )

        return sample_group, grpo_step, grpo_eval

    # ------------------------------------------------------------------ #
    @staticmethod
    def _data_shape(diffuser: Diffuser, batch_size: int,
                    image_resolution: tuple[int, int]) -> tuple[int, ...]:
        """NHWC sampling shape (reference sample_model, :203-216)."""
        if diffuser.vision_tower is not None:
            f = diffuser.vision_tower.compression_factor
            return (batch_size, image_resolution[0] // f, image_resolution[1] // f,
                    diffuser.vision_tower.latent_channels)
        return (batch_size, image_resolution[0], image_resolution[1], 3)

    def _batch_shards(self) -> int:
        return self.mesh.shape.get("data", 1) * self.mesh.shape.get("fsdp", 1)

    def _put_batch(self, tree: Any, batch_size: int) -> Any:
        """Shard arrays whose leading dim is the prompt batch over
        (data, fsdp); everything else — and prompt counts that don't tile the
        shard count — replicates (GRPO prompt batches are small; the
        reference runs 1-4 prompts/process)."""
        batch_sh = batch_sharding(self.mesh)
        repl = replicated(self.mesh)
        shards = self._batch_shards()

        def put(x):
            x = jnp.asarray(x)
            is_batch = x.ndim > 0 and x.shape[0] == batch_size and batch_size % shards == 0
            return jax.device_put(x, batch_sh if is_batch else repl)

        return jax.tree.map(put, tree)

    def _run_batch(self, batch, sample_fns, reward_model, params, rng_state, rest,
                   opt_state, ema_params, rng, step, n_image_per_prompt, tracker,
                   train: bool):
        sample_group, grpo_step, grpo_eval = sample_fns
        model_inputs = dict(batch["model_inputs"])
        captions = batch.get("extra", {}).get("captions")
        assert captions is not None, "GRPO batches need extra['captions']"
        cond = {k: v for k, v in model_inputs.items() if k != "x"}
        p = len(captions)
        cond_arrays = self._put_batch(cond, p)

        x_init = model_inputs.get("x")
        if x_init is None:
            x_init = jax.random.normal(jax.random.fold_in(rng, 0), self._grpo_shape)
        x_init = self._put_batch(x_init, p)
        assert x_init.shape[0] == p, (x_init.shape, p)
        mini = self.mini_batch_size or p
        if p % mini != 0:
            mini = p

        # the same params sample and learn in train mode; validation samples
        # and evaluates with the EMA weights when available (one expression —
        # reference base_trainer.py:336-359 EMA-swap semantics)
        sample_params = params if train else (ema_params if ema_params is not None else params)

        # --- SAMPLE: one trajectory set per image-per-prompt group ----------
        # each group optionally leaves the device right away so only one
        # group's full EM trajectories ([P, steps+1, H, W, C]) is resident
        samplings, decoded_all = [], []
        for g in range(n_image_per_prompt):
            chunks, dec_chunks = [], []
            for c0 in range(0, p, mini):
                sl = slice(c0, c0 + mini)
                x_c = self._put_batch(x_init[sl], mini)
                cond_c = self._put_batch(jax.tree.map(lambda v: v[sl], cond_arrays), mini)
                out, decoded = sample_group(
                    sample_params, rng_state, rest, x_c, cond_c,
                    jax.random.fold_in(rng, 100 + g * 4096 + c0),
                )
                chunks.append(jax.device_get(out) if self.offload_trajectories else out)
                dec_chunks.append(np.asarray(decoded, np.float32))
            if len(chunks) > 1:
                concat = np.concatenate if self.offload_trajectories else jnp.concatenate
                out = jax.tree.map(lambda *xs: concat(xs, axis=0), *chunks)
            else:
                out = chunks[0]
            samplings.append(out)
            decoded_all.append(np.concatenate(dec_chunks, axis=0))

        # --- REWARD (host side) ---------------------------------------------
        # groups interleave per prompt: reward model expects [P*N] ordered
        # prompt-major; our groups are N x [P] -> transpose ordering
        images = np.stack(decoded_all, axis=1).reshape(p * n_image_per_prompt,
                                                       *decoded_all[0].shape[1:])
        advantages = np.asarray(reward_model(images=images, context=list(captions)), np.float32)
        advantages = advantages.reshape(p, n_image_per_prompt)

        # --- LEARN per group -------------------------------------------------
        prefix = "train" if train else "val"
        # trust-region rollback target: the batch-start sampling policy (a
        # copy — params buffers are donated into grpo_step). Re-centers the
        # PPO ratio at exactly 1, restoring gradient signal after a runaway.
        # (a scalar placeholder when the guard is off — the donated params
        # must not alias a second argument)
        params_ref = jax.tree.map(jnp.copy, params) if (
            train and self.trust_region is not None
        ) else jnp.zeros(())
        for g, sampling in enumerate(samplings):
            if self.offload_trajectories:
                sampling = self._put_batch(sampling, p)
            adv_g = self._put_batch(advantages[:, g], p)
            if train:
                step += 1
                params, opt_state, ema_params, self._lr_scale, losses = grpo_step(
                    params, rng_state, rest, opt_state, ema_params, params_ref,
                    self._lr_scale, cond_arrays, sampling, adv_g,
                    jax.random.fold_in(rng, 200 + g), step,
                )
            else:
                losses = grpo_eval(sample_params, rng_state, rest, cond_arrays,
                                   sampling, adv_g, jax.random.fold_in(rng, 200 + g))
            for key, loss in losses.items():
                tracker.update(float(loss), key=f"{prefix}/{key}")
        tracker.update(float(advantages.mean()), key=f"{prefix}/advantage_mean")
        # absolute reward curves (z-scored advantages are 0-mean by design)
        raw_metrics = getattr(reward_model, "raw_metrics", None)
        if raw_metrics is not None:
            for key, value in raw_metrics(images, list(captions)).items():
                tracker.update(float(value), key=f"{prefix}/{key}")
        return params, opt_state, ema_params, step

    # ------------------------------------------------------------------ #
    def train(
        self,
        diffuser: Diffuser,
        reward_model: RewardModel,
        optimizer: optax.GradientTransformation,
        train_dataloader: Iterable[dict[str, Any]],
        val_dataloader: Iterable[dict[str, Any]] | None = None,
        log_validation_images: bool = True,
        val_steps: int = 25,
        optimizer_ckpt: str | None = None,
        denoiser_ckpt: str | None = None,
        ema_ckpt: str | None = None,
        epoch_start: int = 0,
        n_image_per_prompt: int = 16,
        guidance_scale: float = 4.0,
        image_resolution: tuple[int, int] = (512, 512),
        batch_size: int | None = None,
        seed: int = 0,
    ) -> None:
        assert getattr(diffuser.denoiser, "context_embedder", None) is not None, (
            "Alignment training requires a context embedder in the denoiser model."
        )
        reward_model.set_n_image_per_prompt(n_image_per_prompt)

        if self.gradient_accumulation_step > 1:
            optimizer = optax.MultiSteps(optimizer, every_k_schedule=self.gradient_accumulation_step)

        if hasattr(diffuser.denoiser, "set_parallel_mesh"):
            diffuser.denoiser.set_parallel_mesh(self.mesh)

        modules = _TrainModules(diffuser.denoiser, diffuser.extra_losses)
        # context embedder hard-frozen during GRPO (reference :514-515); the
        # SHARED filter (checkpoint.py::trainable_filter, the checkpoint
        # layout's single source of truth) also keeps any live REPA encoder
        # out of the optimizer
        trainable = trainable_filter(diffuser.denoiser, train_embedder=False)
        graphdef, params, rng_state, rest = nnx.split(modules, trainable, nnx.RngState, ...)

        if denoiser_ckpt:
            restored = restore_checkpoint(denoiser_ckpt, {"params": params, "rest": rest})
            params, rest = restored["params"], restored["rest"]

        # --- shard onto the mesh (same treatment as BaseTrainer) ------------
        param_sh = get_param_shardings(params, self.mesh)
        params = jax.tree.map(jax.device_put, params, param_sh)
        rest = jax.tree.map(jax.device_put, rest, get_param_shardings(rest, self.mesh))

        opt_state = optimizer.init(params)
        if optimizer_ckpt:
            opt_state = restore_checkpoint(optimizer_ckpt, {"opt_state": opt_state})["opt_state"]
        opt_state = jax.device_put(opt_state, replicated(self.mesh))
        ema_params = None
        if self.use_ema:
            if ema_ckpt:
                ema_params = restore_checkpoint(ema_ckpt, {"params": params})["params"]
            else:
                ema_params = jax.tree.map(jnp.copy, params)
            ema_params = jax.tree.map(jax.device_put, ema_params, param_sh)

        # data_shape requires a known prompt batch size; peek the first batch
        first_batch = next(iter(train_dataloader))
        p = batch_size or len(first_batch["extra"]["captions"])
        self._grpo_shape = self._data_shape(diffuser, p, image_resolution)

        sample_fns = self._build_fns(diffuser, graphdef, optimizer, guidance_scale)

        tracker = AverageMeter()
        best_val_loss = float("inf")
        rng = jax.random.key(seed)
        # persistent trust-region lr scale (shrinks on each rejected update;
        # multiplies the optimizer's updates, which is lr-equivalent for the
        # adam family where the update is linear in lr)
        self._lr_scale = jnp.float32(1.0)
        # resume continues the raw step counter (it drives the EMA decay
        # ramp — restarting at 0 silently resets the restored EMA to a
        # near-copy of the live weights, the measured EMA-horizon artifact).
        # GRPO advances step once per GROUP per train batch.
        step = 0
        if epoch_start:
            try:
                step = epoch_start * len(train_dataloader) * n_image_per_prompt
            except TypeError as e:
                raise ValueError(
                    "epoch_start > 0 requires a train_dataloader with len()"
                ) from e
        logger.info("Begin GRPO training")

        for epoch in range(epoch_start, self.n_epoch):
            if hasattr(train_dataloader, "set_epoch"):
                train_dataloader.set_epoch(epoch)
            for bi, batch in enumerate(train_dataloader):
                params, opt_state, ema_params, step = self._run_batch(
                    batch, sample_fns, reward_model, params, rng_state, rest,
                    opt_state, ema_params, jax.random.fold_in(rng, epoch * 100_000 + bi),
                    step, n_image_per_prompt, tracker, train=True,
                )
            for key, value in tracker.avg.items():
                if key.startswith("train/"):
                    self.tracker.log({key: value}, step=epoch + 1)
            tracker.reset()

            if val_dataloader is not None:
                for bi, batch in enumerate(val_dataloader):
                    params, opt_state, ema_params, step = self._run_batch(
                        batch, sample_fns, reward_model, params, rng_state, rest,
                        opt_state, ema_params, jax.random.fold_in(rng, 999_000 + bi),
                        step, n_image_per_prompt, tracker, train=False,
                    )
                total_loss = 0.0
                for key, value in tracker.avg.items():
                    if key.startswith("val/"):
                        self.tracker.log({key: value}, step=epoch + 1)
                        if key == "val/loss":
                            total_loss += value
                # generation is collective — run on all processes; the
                # tracker is host-0-gated internally
                if log_validation_images:
                    nnx.update(modules, ema_params if ema_params is not None else params)
                    # one quick grid from the first val batch's conditioning
                    try:
                        vb = next(iter(val_dataloader))
                        cond = {k: v for k, v in vb["model_inputs"].items()
                                if k != "x" and not isinstance(v, (list, tuple, str))}
                        cond = jax.tree.map(jnp.asarray, cond)  # dict leaves too
                        n = min(4, self._grpo_shape[0])
                        cond = jax.tree.map(lambda v: v[:n], cond)
                        out = diffuser.generate(
                            jax.random.fold_in(rng, 555 + epoch), cond,
                            data_shape=(n, *self._grpo_shape[1:]),
                            guidance_scale=guidance_scale,
                        )
                        imgs = np.clip(np.asarray(out["x"], np.float32) * 0.5 + 0.5, 0, 1)
                        self.tracker.log_images(imgs, step=epoch + 1)
                    except Exception as e:  # logging must not kill training
                        logger.warning("validation image logging failed: %s", e)
                    nnx.update(modules, params)

                if total_loss < best_val_loss:
                    best_val_loss = total_loss
                    self.save_model(diffuser, params, rest, opt_state, ema_params, step)
                tracker.reset()

        nnx.update(modules, params)
        self.wait_for_checkpoints()
        self.tracker.finish()
        logger.info("GRPO training complete")
