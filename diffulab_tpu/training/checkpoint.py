"""Checkpoint save/resume via Orbax.

Mirrors the reference's artifact set (trainers/common.py:130-176): per-run
directory holding ``denoiser`` / ``optimizer`` / ``ema`` / ``scheduler`` (step
counters) plus one entry per named extra loss — saved when epoch validation
loss improves (base_trainer.py:391-393), restored from explicit paths
(base_trainer.py:264-286).
"""

from __future__ import annotations

import threading
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree)


def save_checkpoint(path: str | Path, payload: dict[str, Any]) -> None:
    """Save a dict of pytrees (e.g. {"denoiser": ..., "optimizer": ...,
    "ema": ..., "step": ...}) to ``path`` atomically."""
    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _to_host(payload), force=True)


@jax.jit
def _device_snapshot_list(arrays: tuple) -> tuple:
    # one dispatch for all leaves (per-leaf copies would pay the per-call
    # relay overhead hundreds of times on the tunneled dev chip)
    import jax.numpy as jnp

    return tuple(jnp.copy(a) for a in arrays)


def _snapshot_tree(payload: Any) -> Any:
    """Copy every jax.Array leaf on-device in a single dispatch; pass all
    other leaves (ints, numpy arrays) through untouched."""
    leaves, treedef = jax.tree.flatten(payload)
    idx = [i for i, leaf in enumerate(leaves) if isinstance(leaf, jax.Array)]
    if idx:
        copies = _device_snapshot_list(tuple(leaves[i] for i in idx))
        for i, c in zip(idx, copies):
            leaves[i] = c
    return jax.tree.unflatten(treedef, leaves)


class AsyncCheckpointer:
    """Non-blocking checkpoint saves: the train loop pays only for an
    on-device snapshot (HBM-bandwidth copy, one dispatch), while the
    device-to-host transfer and the orbax write run on a background thread.

    Donation safety: the jitted train step donates params/opt_state buffers,
    so a background thread must never read the live training arrays — the
    snapshot is a fresh set of buffers no jit call donates. Memory cost is
    one extra copy of the saved state in HBM for the duration of the write.

    Saves are serialized: a new ``save`` waits for the in-flight one first
    (epoch-level best-val saves never queue more than one). ``wait()`` joins
    the background thread and re-raises any write error; trainers call it at
    the end of ``train`` so checkpoints are durable when training returns.
    The reference's save path is synchronous torch.save
    (trainers/common.py:130-176); async-with-snapshot is the production-
    correct TPU design (a pod stalling on synchronous d2h wastes all chips).
    """

    def __init__(self) -> None:
        self._thread: threading.Thread | None = None
        self._error: BaseException | None = None

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            error, self._error = self._error, None
            raise error

    def save(self, entries: dict[str | Path, dict[str, Any]]) -> None:
        """Snapshot and asynchronously write ``{path: payload}`` entries."""
        self.wait()
        snapshots = {path: _snapshot_tree(payload) for path, payload in entries.items()}

        def work() -> None:
            try:
                for path, payload in snapshots.items():
                    save_checkpoint(path, payload)
            except BaseException as e:  # surfaced on next wait()/save()
                self._error = e

        self._thread = threading.Thread(target=work, daemon=True, name="ckpt-writer")
        self._thread.start()


def restore_checkpoint(path: str | Path, target: dict[str, Any] | None = None) -> dict[str, Any]:
    """Restore a checkpoint. ``target`` (matching pytree of abstract/concrete
    arrays) restores with correct dtypes/shardings; None restores as saved."""
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
            return ckptr.restore(path, abstract)
        return ckptr.restore(path)


def trainable_filter(denoiser, *, lora: bool = False, train_embedder: bool = False,
                     freeze_repa_encoder: bool = True):
    """The trainer's trainable-params filter (single source of truth for
    BaseTrainer / GRPOTrainer / restore_train_modules — the checkpoint layout
    IS this filter): ``nnx.LoRAParam`` for adapter-only runs; otherwise
    ``nnx.Param`` minus frozen submodules — the ``context_embedder`` on
    frozen-embedder (txt2img) runs and the live REPA ``repa_encoder`` (its
    features are a fixed alignment target behind stop_gradient; keeping it
    out of the optimizer stops weight decay from drifting it and saves
    adamw/EMA state for params that never receive gradients)."""
    from flax import nnx

    if lora:
        return nnx.LoRAParam
    # (the guidance-distillation teacher never enters _TrainModules — it
    # rides as an explicit step argument — so no exclusion is needed here)
    exclude = []
    if freeze_repa_encoder:
        exclude.append(nnx.Not(nnx.PathContains("repa_encoder")))
    if not train_embedder and getattr(denoiser, "context_embedder", None) is not None:
        exclude.append(nnx.Not(nnx.PathContains("context_embedder")))
    return nnx.All(nnx.Param, *exclude)


def restore_train_modules(
    path: str | Path, modules, lora: bool = False, train_embedder: bool = False
) -> None:
    """Restore a trainer checkpoint (``denoiser`` or ``ema`` dir) into a live
    ``_TrainModules``-shaped module bundle, mirroring the trainer's
    trainable split exactly (:func:`trainable_filter`) — pass the same
    ``lora``/``train_embedder`` the run used or the orbax structure won't
    match. The single shared implementation for evaluate_fid / sample /
    reflow / LoRA-base restores.

    ``ema`` checkpoints — and post-hoc EMA reconstructions written by
    ``examples/reconstruct_ema.py`` (``phema_sr*`` dirs) — store only
    ``{"params": ...}``; others store ``{"params": ..., "rest": ...}``.
    Checkpoints written before the live REPA encoder was excluded from the
    trainable split (it used to ride in ``params``) restore through a
    legacy-layout fallback.
    """
    from flax import nnx

    filters = [trainable_filter(modules.denoiser, lora=lora, train_embedder=train_embedder)]
    if not lora and any(getattr(l, "repa_encoder", None) is not None
                        for l in getattr(modules, "extra_losses", [])):
        filters.append(trainable_filter(modules.denoiser, train_embedder=train_embedder,
                                        freeze_repa_encoder=False))
    path = Path(path)
    params_only = path.name == "ema" or path.name.startswith("phema")
    for i, trainable in enumerate(filters):
        _, params, _, rest = nnx.split(modules, trainable, nnx.RngState, ...)
        try:
            if params_only:
                params = restore_checkpoint(path, {"params": params})["params"]
                nnx.update(modules, params)
            else:
                restored = restore_checkpoint(path, {"params": params, "rest": rest})
                nnx.update(modules, restored["params"], restored["rest"])
            return
        except Exception as e:
            if i == len(filters) - 1:
                raise
            # surface the first attempt's error before trying the legacy
            # (repa-encoder-in-params) layout — otherwise a corrupt or
            # mismatched checkpoint is misreported as a legacy-layout failure
            import logging

            logging.getLogger(__name__).warning(
                f"restore with the current trainable split failed ({e!r}); "
                f"retrying with the legacy repa-encoder-in-params layout"
            )


def restore_sampling_model(
    ckpt_path: str | Path,
    denoiser,
    extra_losses: list,
    trainer_cfg: dict,
    *,
    seed: int = 0,
) -> None:
    """Restore a run checkpoint into a freshly built denoiser for the
    sampling/eval CLIs, replicating the exact wrap order the training CLI
    used for LoRA runs: restore ``trainer.lora_from`` base weights, wrap
    with :func:`~diffulab_tpu.training.lora.apply_lora`, THEN restore the
    adapter checkpoint. Used for both the main model and autoguidance
    ``--guide-ckpt`` models (a guide checkpoint from a LoRA run is itself
    adapter-layout, so it needs the same base + wrap treatment — restoring
    it into an unwrapped model would fail, or worse, score random weights).
    """
    from flax import nnx

    from diffulab_tpu.training.trainer import _TrainModules

    lora_rank = trainer_cfg.get("lora_rank")
    if lora_rank:
        from diffulab_tpu.training.lora import apply_lora

        base_ckpt = trainer_cfg.get("lora_from")
        if base_ckpt:
            restore_train_modules(base_ckpt, _TrainModules(denoiser, []))
        elif Path(ckpt_path).name == "ema" or Path(ckpt_path).name.startswith("phema"):
            raise SystemExit(
                f"{ckpt_path} points at a LoRA run's params-only dir "
                "(ema / phema_sr*), which stores only adapter params; set "
                "trainer.lora_from so the base weights can be restored "
                "(evaluating without them would score a random model)."
            )
        apply_lora(denoiser, int(lora_rank), rngs=nnx.Rngs(seed + 1),
                   variant=trainer_cfg.get("lora_variant", "lora"))
    restore_train_modules(
        ckpt_path, _TrainModules(denoiser, extra_losses), lora=bool(lora_rank)
    )
