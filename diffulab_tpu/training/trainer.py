"""Supervised trainer (reference trainers/common.py:28-271 + base_trainer.py:22-399).

TPU redesign: HF Accelerate is replaced by one jitted, sharded train step over
a (data, fsdp, tensor) mesh. Parameters live as an nnx State pytree sharded
per their logical-axis annotations; the batch is sharded over (data, fsdp);
XLA inserts every collective (DDP gradient all-reduce parity comes from jit +
shardings, not explicit psum). Features mirrored from the reference:

- EMA with ema-pytorch semantics, updated inside the jitted step;
- gradient accumulation via ``optax.MultiSteps`` (accelerator.accumulate);
- bf16 mixed precision: construct the model with ``dtype=jnp.bfloat16``
  (fp32 master params; no loss scaler needed on TPU);
- classifier-free guidance drop probability per train step;
- per-epoch metric means logged host-0-only (tracker = wandb or JSONL);
- validation loop (with EMA param swap), best-val checkpointing, resume;
- validation image grids generated with a temporarily re-stepped sampler
  (set_steps(val_steps, shift) then restore — reference common.py:178-242).
"""

from __future__ import annotations

import logging as pylog
from datetime import datetime
from functools import partial
from pathlib import Path
from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from diffulab_tpu.diffuse.diffuser import Diffuser
from diffulab_tpu.networks.nn import make_drop_mask
from diffulab_tpu.parallel.mesh import MeshConfig, is_main_process, make_mesh
from diffulab_tpu.parallel.sharding import (
    batch_sharding,
    get_param_shardings,
    global_batch_array,
    replicated,
)
from diffulab_tpu.training.checkpoint import (
    AsyncCheckpointer,
    restore_checkpoint,
    save_checkpoint,
    trainable_filter,
)
from diffulab_tpu.training.ema import EMAConfig, ema_update
from diffulab_tpu.training.posthoc_ema import (
    DEFAULT_GAMMAS,
    cast_tree_f16,
    list_snapshots,
    power_ema_update,
    snapshot_dir,
)
from diffulab_tpu.training.logging import Tracker
from diffulab_tpu.training.meters import AverageMeter

logger = pylog.getLogger(__name__)


class _TrainModules(nnx.Module):
    """Bundles the denoiser with extra-loss modules so one split covers all
    trainable parameters (the reference optimizes denoiser + RepaLoss
    projection jointly, examples/train_repa.py:73-78)."""

    def __init__(self, denoiser: Any, extra_losses: list[Any]):
        self.denoiser = denoiser
        self.extra_losses = nnx.List(extra_losses)


class Trainer:
    """Run setup: mesh, tracker, save paths (reference trainers/common.py:72-114)."""

    def __init__(
        self,
        n_epoch: int,
        gradient_accumulation_step: int = 1,
        precision_type: str = "no",
        save_path: str | Path | None = None,
        project_name: str = "my_project",
        run_config: dict[str, Any] | None = None,
        init_kwargs: dict[str, Any] | None = None,
        use_ema: bool = False,
        ema_rate: float = 0.999,
        ema_update_after_step: int = 0,
        ema_update_every: int = 10,
        ema_inv_gamma: float = 1.0,
        ema_power: float = 2.0 / 3.0,
        mesh: MeshConfig | dict[str, int] | None = None,
        compile: bool = True,  # noqa: A002 - parity with the reference flag; jit is always on
        log_every_n_steps: int | None = None,
        async_checkpointing: bool = True,
        posthoc_ema: bool = False,
        posthoc_ema_gammas: tuple[float, ...] = DEFAULT_GAMMAS,
        save_every_n_epochs: int | None = None,
        save_optimizer: bool = True,
        augment_p: float = 0.0,
        distill_guidance: float = 0.0,
    ):
        del compile  # everything is jit-compiled; flag kept for config parity
        self.n_epoch = n_epoch
        self.log_every_n_steps = log_every_n_steps
        self.gradient_accumulation_step = gradient_accumulation_step
        self.precision_type = precision_type
        self.use_ema = use_ema
        # beta/ramp are MEASURED first-order quality levers at short budgets:
        # the default ema-pytorch ramp makes the EMA horizon span an entire
        # ~1k-step recipe, costing ~6-7x FID vs a fresh short-horizon average
        # (BASELINE.md round 3, "EMA-horizon artifact"). Tune ema_rate to the
        # run length.
        self.ema_config = EMAConfig(
            beta=ema_rate,
            update_after_step=ema_update_after_step * gradient_accumulation_step,
            update_every=ema_update_every * gradient_accumulation_step,
            inv_gamma=ema_inv_gamma,
            power=ema_power,
        )
        # post-hoc EMA (training/posthoc_ema.py): two extra power-function
        # averages updated in-step and snapshotted (fp16) every epoch, so the
        # EMA horizon — the measured 6-7x quality lever — is selected OFFLINE
        # by examples/reconstruct_ema.py instead of baked into the run.
        self.posthoc_ema = posthoc_ema
        self.posthoc_ema_gammas = tuple(posthoc_ema_gammas)
        # preemption recovery: every N epochs write a "latest" artifact set
        # (checkpoints_latest/) regardless of val improvement; train(...,
        # auto_resume=True) restores it and continues. Best-val checkpoints
        # (checkpoints/) are unaffected. On preemptible TPU pods this is the
        # production story — the reference has only manual resume flags
        # (base_trainer.py:264-286).
        self.save_every_n_epochs = save_every_n_epochs
        # best-val saves include the optimizer moments (2x the param bytes)
        # only when a resume is intended; sweep/ablation arms turn this off
        # because d2h transfers dominate epoch wall-clock on a relayed chip
        self.save_optimizer = save_optimizer
        # EDM-style non-leaky augmentation (diffuse/augment.py): applied in
        # the train loss only, with the transform labels fed to the model via
        # cond["augment_labels"]; requires the model's augment_dim > 0
        self.augment_p = augment_p
        # guidance distillation (arXiv:2210.03142): CFG weight the frozen
        # teacher is evaluated at; > 0 required when train(distill_teacher=...)
        self.distill_guidance = distill_guidance
        if save_path is None:
            save_path = Path.home() / "experiments" / datetime.now().strftime("%Y%m%d_%H%M%S")
        self.save_path = Path(save_path) / project_name
        if isinstance(mesh, dict):
            mesh = MeshConfig(**mesh)
        self.mesh = make_mesh(mesh)
        self.tracker = Tracker(
            self.save_path, project_name=project_name, run_config=run_config,
            init_kwargs=init_kwargs, enabled=is_main_process(),
        )
        # async: the loop pays one on-device snapshot; d2h + write ride a
        # background thread (training/checkpoint.py::AsyncCheckpointer).
        # wait_for_checkpoints() at the end of train() makes them durable.
        self._async_ckptr = AsyncCheckpointer() if async_checkpointing else None

    # ------------------------------------------------------------------ #
    def save_model(self, diffuser: Diffuser, params, rest, opt_state, ema_params, step: int) -> None:
        """Best-val checkpoint (reference trainers/common.py:130-176 artifact set)."""
        base = self.save_path / "checkpoints"
        entries: dict[Any, dict[str, Any]] = {
            base / "denoiser": {"params": params, "rest": rest},
        }
        # ablation/sweep runs that will never resume can skip the optimizer
        # moments — 2x the param bytes, and device->host transfers dominate
        # epoch wall-clock on a relayed chip (BASELINE.md round 2)
        if self.save_optimizer:
            entries[base / "optimizer"] = {"opt_state": opt_state}
        if ema_params is not None:
            entries[base / "ema"] = {"params": ema_params}
        entries[base / "scheduler"] = {"step": step}
        if self._async_ckptr is not None:
            self._async_ckptr.save(entries)
        else:
            for path, payload in entries.items():
                save_checkpoint(path, payload)

    def save_latest(self, params, rest, opt_state, ema_params, step: int, epoch: int,
                    best_val_loss: float = float("inf")) -> None:
        """Preemption checkpoint: full artifact set + resume metadata.

        Each save goes to its own ``checkpoints_latest/ep<N>/`` directory so
        the SET is effectively atomic: orbax finalizes each entry dir
        atomically, and resume only accepts an epoch dir whose whole set is
        present — a write torn by the preemption itself leaves an incomplete
        newest dir that is skipped, never a mixed-epoch restore. The previous
        complete dir is removed before writing the next one (the in-flight
        async save is joined first, so at most two generations ever coexist)."""
        root = self.save_path / "checkpoints_latest"
        self.wait_for_checkpoints()
        keep = f"ep{epoch:06d}"
        if root.exists():
            import shutil

            for old in root.iterdir():
                if old.name != keep:
                    shutil.rmtree(old, ignore_errors=True)
        base = root / keep
        entries: dict[Any, dict[str, Any]] = {
            base / "denoiser": {"params": params, "rest": rest},
            base / "optimizer": {"opt_state": opt_state},
        }
        if ema_params is not None:
            entries[base / "ema"] = {"params": ema_params}
        # scheduler goes LAST: its presence marks the set complete
        entries[base / "scheduler"] = {
            "step": step, "epoch": epoch,
            "best_val_loss": best_val_loss if np.isfinite(best_val_loss) else 1e30,
        }
        if self._async_ckptr is not None:
            self._async_ckptr.save(entries)
        else:
            for path, payload in entries.items():
                save_checkpoint(path, payload)

    @staticmethod
    def find_latest_checkpoint(root: Path) -> Path | None:
        """Newest COMPLETE ``checkpoints_latest/ep*`` set (scheduler written
        last marks completion; orbax tmp dirs don't count as present)."""
        if not root.exists():
            return None
        for cand in sorted(root.glob("ep*"), reverse=True):
            if all((cand / part).is_dir() for part in ("scheduler", "denoiser", "optimizer")):
                return cand
        return None

    def wait_for_checkpoints(self) -> None:
        """Join the in-flight background save (re-raising write errors)."""
        if self._async_ckptr is not None:
            self._async_ckptr.wait()

    def _init_phema(self, params, param_sh, phema_base: Path, resume_step: int):
        """Fresh power-EMA tracks (fp32 copies of the online params), or —
        when resuming — the stored fp16 snapshots at (or before) the resume
        step. Snapshots PAST the resume point are never used: the re-trained
        steps would be double-counted in the average. The fp16 roundtrip
        costs <1e-3 relative, far under the width of any profile being
        reconstructed."""
        tracks = []
        snaps = list_snapshots(phema_base) if resume_step else []
        f16_template = {
            "params": jax.tree.map(
                lambda p: jax.ShapeDtypeStruct(p.shape, jnp.float16), params
            )
        }
        for gamma in self.posthoc_ema_gammas:
            candidates = [(s, p) for s, g, p in snaps
                          if abs(g - gamma) < 1e-6 * max(abs(gamma), 1.0) and s <= resume_step]
            if candidates:
                snap_step, path = max(candidates)
                if snap_step != resume_step:
                    logger.warning(
                        f"phema track gamma={gamma}: resuming from snapshot at step "
                        f"{snap_step} != resume step {resume_step}; the gap's steps "
                        "are missing from this track's average"
                    )
                tree = restore_checkpoint(path, f16_template)["params"]
                tree = jax.tree.map(lambda saved: jnp.asarray(saved, jnp.float32), tree)
                tracks.append(jax.tree.map(jax.device_put, tree, param_sh))
            else:
                tracks.append(jax.tree.map(jnp.copy, params))
        return tuple(tracks)


class BaseTrainer(Trainer):
    """Supervised diffusion training loop (reference base_trainer.py:22-399)."""

    # ------------------------------------------------------------------ #
    def _build_step_fns(
        self,
        diffuser: Diffuser,
        graphdef,
        rest_template,
        optimizer: optax.GradientTransformation,
        p_cfg: float,
        distill_teacher: Any = None,
    ):
        diffusion = diffuser.diffusion
        use_ema = self.use_ema
        ema_config = self.ema_config
        capture = len(diffuser.extra_losses) > 0
        distill_guidance = self.distill_guidance

        # frozen guidance-distillation teacher: NOT part of _TrainModules —
        # it rides as an explicit (non-donated) step argument so checkpoints
        # keep the teacher-free layout restore_train_modules expects and
        # best-val saves never d2h a second full model copy
        teacher_graphdef = None
        if distill_teacher is not None:
            teacher_graphdef, _ = nnx.split(distill_teacher)

        def _distill_kwargs(teacher_state, w):
            if teacher_graphdef is None:
                return {}
            teacher = nnx.merge(teacher_graphdef, teacher_state)

            def teacher_fn(**kw):
                return teacher(**kw, train=False)

            return {"distill_fn": teacher_fn, "distill_guidance": w}

        def _fold_rng_state(rng_state, step):
            # advance module-held PRNG streams (dropout etc.) once per step
            return jax.tree.map(
                lambda k: jax.random.fold_in(k, step)
                if jnp.issubdtype(k.dtype, jax.dtypes.prng_key) else k,
                rng_state,
            )

        augment_pipe = None
        if self.augment_p > 0:
            from diffulab_tpu.diffuse.augment import AugmentPipe

            augment_pipe = AugmentPipe(p=self.augment_p)
            assert getattr(diffuser.denoiser, "augment_embed", None) is not None, (
                "trainer.augment_p > 0 requires the model's augment_dim > 0 "
                "(the non-leaky conditioning path, diffuse/augment.py)"
            )

        def loss_fn(params, rng_state, rest, batch, rng, teacher_state):
            modules = nnx.merge(graphdef, params, rng_state, rest)
            model_inputs = dict(batch["model_inputs"])
            x0 = jnp.asarray(model_inputs.pop("x"))
            # coupled noise (ReFlow pairs datasets ship the z their x was
            # generated from); independent Gaussian otherwise. Scoped key so
            # a conditioning input named "noise" is never swallowed.
            coupled_noise = model_inputs.pop("coupled_noise", None)
            cond = model_inputs
            bsz = x0.shape[0]
            if augment_pipe is not None:
                assert coupled_noise is None, (
                    "trainer.augment_p > 0 would scramble a reflow dataset's "
                    "deterministic (noise, data) coupling: the flip/rotate/"
                    "translate of x0 cannot be applied to its paired z. "
                    "Disable augmentation for straightening runs."
                )
                rng, a_rng = jax.random.split(rng)
                x0, aug_labels = augment_pipe(a_rng, x0)
                cond = {**cond, "augment_labels": aug_labels}
            t_rng, n_rng, d_rng, m_rng = jax.random.split(rng, 4)
            timesteps = diffusion.draw_timesteps(t_rng, bsz)
            noise = (
                jnp.asarray(coupled_noise, x0.dtype)
                if coupled_noise is not None
                else jax.random.normal(n_rng, x0.shape, dtype=x0.dtype)
            )
            drop = None
            if p_cfg > 0:
                drop = make_drop_mask(d_rng, p_cfg, bsz)
            # call-time rng streams for model stochastics (dropout, sprint
            # token drop) — created inside the trace, so mutation is jit-pure
            call_rngs = nnx.Rngs(m_rng)

            def model_fn(**kw):
                return modules.denoiser(**kw, train=True, rngs=call_rngs,
                                        capture_features=capture)

            losses = diffusion.compute_loss(
                model_fn, x0, cond, timesteps, noise, drop=drop,
                extra_losses=list(modules.extra_losses),
                extra_args=batch.get("extra") or {},
                **_distill_kwargs(teacher_state, distill_guidance),
            )
            total = sum(losses.values())
            return total, losses

        phema_gammas = self.posthoc_ema_gammas if self.posthoc_ema else ()

        @partial(jax.jit, donate_argnums=(0, 3, 4, 5))
        def train_step(params, rng_state, rest, opt_state, ema_params, phema_params, batch, rng, step,
                       teacher_state=None):
            rng_state = _fold_rng_state(rng_state, step)
            grads_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (_, losses), grads = grads_fn(params, rng_state, rest, batch, rng, teacher_state)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if use_ema:
                ema_params = ema_update(ema_config, ema_params, params, step)
            if phema_gammas:
                phema_params = tuple(
                    power_ema_update(tree, params, step, gamma)
                    for tree, gamma in zip(phema_params, phema_gammas)
                )
            return params, opt_state, ema_params, phema_params, losses

        def eval_loss_fn(params, rng_state, rest, batch, rng, teacher_state=None):
            modules = nnx.merge(graphdef, params, rng_state, rest)
            model_inputs = dict(batch["model_inputs"])
            x0 = jnp.asarray(model_inputs.pop("x"))
            coupled_noise = model_inputs.pop("coupled_noise", None)
            cond = model_inputs
            t_rng, n_rng = jax.random.split(rng)
            timesteps = diffusion.draw_timesteps(t_rng, x0.shape[0])
            noise = (
                jnp.asarray(coupled_noise, x0.dtype)
                if coupled_noise is not None
                else jax.random.normal(n_rng, x0.shape, dtype=x0.dtype)
            )

            def model_fn(**kw):
                return modules.denoiser(**kw, train=False, capture_features=capture)

            return diffusion.compute_loss(
                model_fn, x0, cond, timesteps, noise,
                extra_losses=list(modules.extra_losses),
                extra_args=batch.get("extra") or {},
                **_distill_kwargs(teacher_state, distill_guidance),
            )

        eval_step = jax.jit(eval_loss_fn)
        return train_step, eval_step

    # ------------------------------------------------------------------ #
    @staticmethod
    def _host_embed(batch: dict[str, Any], diffuser: Diffuser) -> dict[str, Any]:
        """Embed raw caption strings host-side (HF embedders) before the jit
        boundary; precomputed 'context' passes through untouched."""
        mi = batch.get("model_inputs", {})
        texts = mi.get("initial_context")
        embedder = getattr(diffuser.denoiser, "context_embedder", None)
        if texts is None:
            return batch
        if hasattr(embedder, "tokenize"):
            # In-graph trainable embedder: strings -> token-id arrays
            # host-side; the encoder itself runs (and trains) under jit.
            # Takes precedence over any precomputed 'context' the shards
            # carry — otherwise embedder=trainable would silently train on
            # the frozen precomputed embeddings instead of its own.
            out = embedder.tokenize(list(texts))
        elif hasattr(embedder, "embed_host") and "context" not in mi:
            out = embedder.embed_host(list(texts))
        else:
            return batch
        mi = dict(mi)
        mi["context"] = dict(out)
        return {**batch, "model_inputs": mi}

    def _prepare_batch(self, batch: dict[str, Any]) -> dict[str, Any]:
        """Shard array leaves onto the mesh; drop host-only leaves (caption
        strings etc.) — they cannot cross the jit boundary. Conditioning for
        jitted steps must be arrays (precomputed embeddings or labels).
        On multi-host pods each process holds only its rows of the global
        batch (DataLoader process sharding); ``global_batch_array`` stitches
        them into global arrays."""
        sh = batch_sharding(self.mesh)

        def clean(node):
            if isinstance(node, dict):
                out = {}
                for k, v in node.items():
                    v = clean(v)
                    if v is not None:
                        out[k] = v
                return out
            if isinstance(node, (np.ndarray, jax.Array)):
                return global_batch_array(node, self.mesh, sh)
            if isinstance(node, (int, float, np.integer, np.floating)):
                return jax.device_put(np.asarray(node), sh)
            return None  # strings / lists of strings: host-only

        return clean(batch)

    def log_images(
        self,
        diffuser: Diffuser,
        val_batch: dict[str, Any],
        epoch: int,
        val_steps: int,
        step_shift: float | None = None,
        guidance_scale: float = 4.0,
        rng: jax.Array | None = None,
    ) -> None:
        """Generate a validation grid with a temporarily re-stepped sampler
        (reference trainers/common.py:178-242)."""
        original = diffuser.diffusion
        set_kwargs: dict[str, Any] = {}
        if step_shift is not None:
            set_kwargs["shift"] = step_shift
        diffuser.set_steps(val_steps, **set_kwargs)
        try:
            val_batch = self._host_embed(val_batch, diffuser)
            model_inputs = dict(val_batch["model_inputs"])
            x_ref = np.asarray(model_inputs.pop("x"))
            n = min(8, x_ref.shape[0])
            captions_raw = model_inputs.pop("initial_context", None)
            # only array conditioning crosses into the jitted sampler
            model_inputs = {
                k: v for k, v in model_inputs.items()
                if not isinstance(v, (list, tuple, str))
            }
            cond = jax.tree.map(lambda v: v[:n], model_inputs)
            data_shape = x_ref.shape[1:]  # latent-space shape when a tower is set
            out = diffuser.generate(
                rng if rng is not None else jax.random.key(epoch),
                cond, data_shape=(n, *data_shape),
                guidance_scale=guidance_scale,
            )
            images = np.asarray(out["x"], dtype=np.float32) * 0.5 + 0.5
            images = np.clip(images, 0, 1)
            captions = list(captions_raw[:n]) if isinstance(captions_raw, (list, tuple)) else None
            self.tracker.log_images(images, step=epoch + 1, captions=captions)
        finally:
            diffuser.diffusion = original
            diffuser._generate_cache.clear()

    # ------------------------------------------------------------------ #
    def train(
        self,
        diffuser: Diffuser,
        optimizer: optax.GradientTransformation,
        train_dataloader: Iterable[dict[str, Any]],
        val_dataloader: Iterable[dict[str, Any]] | None = None,
        scheduler: Any | None = None,
        per_batch_scheduler: bool = False,
        log_validation_images: bool = True,
        train_embedder: bool = False,
        p_classifier_free_guidance: float = 0.2,
        val_steps: int = 50,
        val_step_shift: float | None = None,
        optimizer_ckpt: str | None = None,
        denoiser_ckpt: str | None = None,
        ema_ckpt: str | None = None,
        epoch_start: int = 0,
        seed: int = 0,
        steps_per_epoch: int | None = None,
        lora_only: bool = False,
        auto_resume: bool = False,
        distill_teacher: Any = None,
    ) -> None:
        resume_best_val = float("inf")
        if auto_resume:
            # preemption recovery: pick up the newest COMPLETE periodic
            # artifact set if one exists (written by save_every_n_epochs);
            # explicit ckpt args are overridden — auto_resume means
            # "continue THIS run"
            latest = self.find_latest_checkpoint(self.save_path / "checkpoints_latest")
            if latest is not None:
                meta = restore_checkpoint(latest / "scheduler")
                epoch_start = int(meta["epoch"])
                resume_best_val = float(meta.get("best_val_loss", float("inf")))
                denoiser_ckpt = str(latest / "denoiser")
                optimizer_ckpt = str(latest / "optimizer")
                ema_ckpt = str(latest / "ema") if (latest / "ema").exists() else None
                logger.info(f"auto-resume from {latest} at epoch {epoch_start}")

        if val_step_shift is not None:
            assert diffuser.model_type == "rectified_flow", (
                "Time-shifting during validation is only supported for flow-based models."
            )
        if not getattr(diffuser.denoiser, "classifier_free", False):
            p_classifier_free_guidance = 0.0
        if distill_teacher is not None:
            assert self.distill_guidance > 0, (
                "distill_teacher needs trainer.distill_guidance > 0 (the CFG "
                "weight being distilled into the student)"
            )
            # the student regresses onto guided targets and samples at
            # guidance 0 — training its own uncond branch is meaningless
            p_classifier_free_guidance = 0.0
            logger.info(
                f"guidance distillation: teacher CFG w={self.distill_guidance}, "
                "p_cfg forced to 0"
            )

        # attach extra losses (e.g. REPA feature-capture registration) BEFORE
        # splitting, so static attrs like feature_layers are final
        for loss in diffuser.extra_losses:
            loss.set_model(diffuser.denoiser)

        # inject the mesh into blocks that shard at call time (ring attention
        # over 'sp', MoE experts over 'expert') — static attrs, set pre-split
        if hasattr(diffuser.denoiser, "set_parallel_mesh"):
            diffuser.denoiser.set_parallel_mesh(self.mesh)

        # HF text embedders need their null ("" prompt) embedding cached
        # host-side before the jitted step traces the CFG drop path
        embedder = getattr(diffuser.denoiser, "context_embedder", None)
        if hasattr(embedder, "embed_host"):
            embedder.embed_host([""])

        # --- optimizer wrapping: schedule + gradient accumulation ---------
        if scheduler is not None:
            if steps_per_epoch is None and not per_batch_scheduler:
                try:
                    steps_per_epoch = len(train_dataloader)  # type: ignore[arg-type]
                except TypeError as e:
                    raise ValueError("steps_per_epoch required for per-epoch scheduler") from e
            if per_batch_scheduler:
                idx = lambda c: c  # noqa: E731
            else:
                # scale_by_schedule sits inside MultiSteps, so its count
                # advances once per REAL update (micro_steps / accum), while
                # steps_per_epoch is measured in micro-batches
                updates_per_epoch = max(steps_per_epoch // self.gradient_accumulation_step, 1)
                idx = lambda c: c // updates_per_epoch  # noqa: E731
            optimizer = optax.chain(optimizer, optax.scale_by_schedule(lambda c: scheduler(idx(c))))
        if self.gradient_accumulation_step > 1:
            optimizer = optax.MultiSteps(optimizer, every_k_schedule=self.gradient_accumulation_step)

        # --- split modules into trainable params / the rest ---------------
        modules = _TrainModules(diffuser.denoiser, diffuser.extra_losses)
        # adapter-only runs: base weights ride frozen in `rest`; otherwise
        # Params minus frozen submodules (context_embedder / repa_encoder) —
        # see checkpoint.py::trainable_filter (the checkpoint layout)
        trainable = trainable_filter(diffuser.denoiser, lora=lora_only,
                                     train_embedder=train_embedder)
        graphdef, params, rng_state, rest = nnx.split(modules, trainable, nnx.RngState, ...)

        # --- resume (rng streams are runtime-only, never checkpointed) -----
        if denoiser_ckpt:
            restored = restore_checkpoint(denoiser_ckpt, {"params": params, "rest": rest})
            params, rest = restored["params"], restored["rest"]

        # --- shard onto the mesh -------------------------------------------
        param_sh = get_param_shardings(params, self.mesh)
        rest_sh = get_param_shardings(rest, self.mesh)
        params = jax.tree.map(jax.device_put, params, param_sh)
        rest = jax.tree.map(jax.device_put, rest, rest_sh)

        opt_state = optimizer.init(params)
        if optimizer_ckpt:
            opt_state = restore_checkpoint(optimizer_ckpt, {"opt_state": opt_state})["opt_state"]
        opt_state = jax.device_put(opt_state, replicated(self.mesh))

        ema_params = None
        if self.use_ema:
            if ema_ckpt:
                ema_params = restore_checkpoint(ema_ckpt, {"params": params})["params"]
                ema_params = jax.tree.map(jax.device_put, ema_params, param_sh)
            else:
                ema_params = jax.tree.map(jnp.copy, params)  # distinct buffers (donation-safe)

        if epoch_start and steps_per_epoch is None:
            # resume must continue the raw step counter: it drives the EMA
            # decay ramp and the per-step rng folding. Leaving it at 0 resets
            # the EMA warmup, silently turning the restored EMA into a
            # near-copy of the live weights (measured: a resumed EDM run
            # scored FID 4.24 vs 15.2 for the same recipe uninterrupted —
            # an accidental EMA-horizon experiment, BASELINE.md round 3).
            try:
                steps_per_epoch = len(train_dataloader)  # type: ignore[arg-type]
            except TypeError as e:
                raise ValueError(
                    "epoch_start > 0 requires steps_per_epoch when the "
                    "dataloader has no len()"
                ) from e
        # steps_per_epoch counts MICRO-batches (len(train_dataloader)), the
        # same unit the loop's `step += 1` advances in — no accumulation
        # factor (a stray *accum here made resumed counters overshoot, which
        # shifts the EMA ramp and the per-step rng folds)
        step = epoch_start * (steps_per_epoch or 0)

        phema_params = None
        phema_base = self.save_path / "checkpoints" / "phema"
        if self.posthoc_ema:
            phema_params = self._init_phema(params, param_sh, phema_base, step)

        teacher_state = None
        if distill_teacher is not None:
            # frozen teacher weights ride as a replicated, NON-donated step
            # argument (never in _TrainModules: the checkpoint layout stays
            # teacher-free and best-val saves skip the second model copy)
            _, teacher_state = nnx.split(distill_teacher)
            teacher_state = jax.device_put(teacher_state, replicated(self.mesh))

        train_step, eval_step = self._build_step_fns(
            diffuser, graphdef, rest, optimizer, p_classifier_free_guidance,
            distill_teacher=distill_teacher,
        )

        best_val_loss = resume_best_val
        tracker_meter = AverageMeter()
        rng = jax.random.key(seed)

        logger.info("Begin training")
        for epoch in range(epoch_start, self.n_epoch):
            if hasattr(train_dataloader, "set_epoch"):
                train_dataloader.set_epoch(epoch)
            # --- train epoch ---------------------------------------------
            # losses accumulate ON DEVICE (async); one host transfer per epoch
            # (a per-step float() would round-trip the host every step)
            loss_sums: dict[str, jax.Array] = {}
            n_steps_epoch = 0
            for batch in train_dataloader:
                batch = self._prepare_batch(self._host_embed(batch, diffuser))
                step += 1
                step_rng = jax.random.fold_in(rng, step)
                params, opt_state, ema_params, phema_params, losses = train_step(
                    params, rng_state, rest, opt_state, ema_params, phema_params, batch, step_rng, step,
                    teacher_state,
                )
                n_steps_epoch += 1
                for key, loss in losses.items():
                    prev = loss_sums.get(key)
                    loss_sums[key] = loss if prev is None else prev + loss
                # step-level curves (opt-in: each log forces a device sync)
                if self.log_every_n_steps and step % self.log_every_n_steps == 0:
                    self.tracker.log(
                        {f"train_step/{k}": float(v) for k, v in losses.items()},
                        step=step,
                    )

            for key, total in loss_sums.items():
                tracker_meter.update(float(total) / max(n_steps_epoch, 1), key=f"train/{key}")
            for key, value in tracker_meter.avg.items():
                if key.startswith("train/"):
                    self.tracker.log({key: value, "epoch": epoch + 1}, step=step)
            tracker_meter.reset()

            # post-hoc EMA snapshots go out EVERY epoch (the reconstruction
            # basis must cover the whole trajectory, unlike best-val ckpts)
            if phema_params is not None:
                entries = {
                    snapshot_dir(phema_base, step, gamma): {"params": cast_tree_f16(tree)}
                    for gamma, tree in zip(self.posthoc_ema_gammas, phema_params)
                }
                if self._async_ckptr is not None:
                    self._async_ckptr.save(entries)
                else:
                    for path, payload in entries.items():
                        save_checkpoint(path, payload)

            # --- validation ------------------------------------------------
            if val_dataloader is not None:
                eval_params = ema_params if ema_params is not None else params
                val_sums: dict[str, jax.Array] = {}
                n_val = 0
                for vi, val_batch in enumerate(val_dataloader):
                    val_batch = self._prepare_batch(self._host_embed(val_batch, diffuser))
                    val_losses = eval_step(eval_params, rng_state, rest, val_batch, jax.random.fold_in(rng, 1_000_000 + vi), teacher_state)
                    n_val += 1
                    for key, val_loss in val_losses.items():
                        prev = val_sums.get(key)
                        val_sums[key] = val_loss if prev is None else prev + val_loss
                for key, total in val_sums.items():
                    tracker_meter.update(float(total) / max(n_val, 1), key=f"val/{key}")

                total_loss = 0.0
                for key, value in tracker_meter.avg.items():
                    if key.startswith("val/"):
                        self.tracker.log({key: value, "epoch": epoch + 1}, step=step)
                        total_loss += value

                # write current eval params back into the live module for generation
                nnx.update(modules, eval_params)
                # generation runs on ALL processes (it is a collective
                # computation over the mesh — gating it on host 0 would
                # deadlock a multi-host pod); only the tracker side is
                # host-0-only (Tracker is constructed with
                # enabled=is_main_process())
                if log_validation_images:
                    logger.info("creating validation images")
                    first_val = next(iter(val_dataloader))
                    self.log_images(
                        diffuser, first_val, epoch, val_steps, step_shift=val_step_shift,
                        guidance_scale=4.0 if getattr(diffuser.denoiser, "classifier_free", False) else 0.0,
                        rng=jax.random.fold_in(rng, 10_000 + epoch),
                    )
                nnx.update(modules, params)

                if total_loss < best_val_loss:
                    best_val_loss = total_loss
                    self.save_model(diffuser, params, rest, opt_state, ema_params, step)
                tracker_meter.reset()

            if self.save_every_n_epochs and (epoch + 1) % self.save_every_n_epochs == 0:
                self.save_latest(params, rest, opt_state, ema_params, step, epoch + 1,
                                 best_val_loss=best_val_loss)

        # leave the live module holding the final trained params
        nnx.update(modules, params)
        self.wait_for_checkpoints()
        self.tracker.finish()
        logger.info("Training complete")
