"""Checkpoint save/resume via Orbax.

Mirrors the reference's artifact set (trainers/common.py:130-176): per-run
directory holding ``denoiser`` / ``optimizer`` / ``ema`` / ``scheduler`` (step
counters) plus one entry per named extra loss — saved when epoch validation
loss improves (base_trainer.py:391-393), restored from explicit paths
(base_trainer.py:264-286).
"""

from __future__ import annotations

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


def restore_checkpoint(path: str | Path, target: dict[str, Any] | None = None) -> dict[str, Any]:
    """Restore a checkpoint. ``target`` (matching pytree of abstract/concrete
    arrays) restores with correct dtypes/shardings; None restores as saved."""
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
            return ckptr.restore(path, abstract)
        return ckptr.restore(path)


def restore_train_modules(
    path: str | Path, modules, lora: bool = False, train_embedder: bool = False
) -> None:
    """Restore a trainer checkpoint (``denoiser`` or ``ema`` dir) into a live
    ``_TrainModules``-shaped module bundle, mirroring the trainer's three-way
    trainable split exactly (``BaseTrainer.train``): ``nnx.LoRAParam`` for
    ``lora_only`` runs (base weights ride in ``rest``); all ``nnx.Param`` when
    the embedder is trained or absent; ``Param`` minus ``context_embedder``
    for frozen-embedder (txt2img) runs — pass the same ``train_embedder`` the
    run used or the orbax structure won't match. The single shared
    implementation for evaluate_fid / reflow / LoRA-base restores.

    ``ema`` checkpoints store only ``{"params": ...}``; others store
    ``{"params": ..., "rest": ...}``.
    """
    from flax import nnx

    if lora:
        trainable = nnx.LoRAParam
    elif train_embedder or getattr(modules.denoiser, "context_embedder", None) is None:
        trainable = nnx.Param
    else:
        trainable = nnx.All(nnx.Param, nnx.Not(nnx.PathContains("context_embedder")))
    _, params, _, rest = nnx.split(modules, trainable, nnx.RngState, ...)
    path = Path(path)
    if path.name == "ema":
        params = restore_checkpoint(path, {"params": params})["params"]
        nnx.update(modules, params)
    else:
        restored = restore_checkpoint(path, {"params": params, "rest": rest})
        nnx.update(modules, restored["params"], restored["rest"])
