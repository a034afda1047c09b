"""Optimizer factories with torch-style argument names.

The reference configs target torch optimizers
(configs/optimizer/adamw.yaml `_target_: torch.optim.AdamW` with
lr/weight_decay/betas/eps); these factories keep those YAML keys and return
optax transformations, so the same config files drive training here.

All factories accept ``grad_clip_norm``: when set, gradients are clipped by
global norm before the update (``optax.clip_by_global_norm``).

Measured caveat (BASELINE.md round-4 "Grad clipping does NOT guard the PPO
collapse"): for the adaptive optimizers (adam/adamw) the second-moment
preconditioner renormalizes the gradient, so global-norm clipping cannot
bound the update size — the CPU probe reproduced the on-chip GRPO epoch-22
collapse identically at clip 1.0 AND clip 0.05. Clipping is the right guard
for the SGD family; against the PPO collapse the lever is the lr (or a
trust-region early-stop on the logged ``train/ratio_dev``).
"""

from __future__ import annotations

from typing import Sequence

import optax


def _maybe_clip(tx: optax.GradientTransformation,
                grad_clip_norm: float | None) -> optax.GradientTransformation:
    if grad_clip_norm:
        return optax.chain(optax.clip_by_global_norm(float(grad_clip_norm)), tx)
    return tx


def adamw(
    lr: float = 1e-4,
    weight_decay: float = 0.01,
    betas: Sequence[float] = (0.9, 0.999),
    eps: float = 1e-8,
    grad_clip_norm: float | None = None,
    params: object = None,  # accepted for torch API parity; unused
) -> optax.GradientTransformation:
    del params
    tx = optax.adamw(
        learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay
    )
    return _maybe_clip(tx, grad_clip_norm)


def adam(
    lr: float = 1e-4,
    betas: Sequence[float] = (0.9, 0.999),
    eps: float = 1e-8,
    grad_clip_norm: float | None = None,
    params: object = None,
) -> optax.GradientTransformation:
    del params
    tx = optax.adam(learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps)
    return _maybe_clip(tx, grad_clip_norm)


def sgd(
    lr: float = 1e-2,
    momentum: float = 0.0,
    weight_decay: float = 0.0,
    nesterov: bool = False,
    grad_clip_norm: float | None = None,
    params: object = None,
) -> optax.GradientTransformation:
    del params
    tx = optax.sgd(learning_rate=lr, momentum=momentum or None, nesterov=nesterov)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return _maybe_clip(tx, grad_clip_norm)
