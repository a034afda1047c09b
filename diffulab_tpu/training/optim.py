"""Optimizer factories with torch-style argument names.

The reference configs target torch optimizers
(configs/optimizer/adamw.yaml `_target_: torch.optim.AdamW` with
lr/weight_decay/betas/eps); these factories keep those YAML keys and return
optax transformations, so the same config files drive training here.
"""

from __future__ import annotations

from typing import Sequence

import optax


def adamw(
    lr: float = 1e-4,
    weight_decay: float = 0.01,
    betas: Sequence[float] = (0.9, 0.999),
    eps: float = 1e-8,
    params: object = None,  # accepted for torch API parity; unused
) -> optax.GradientTransformation:
    del params
    return optax.adamw(
        learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay
    )


def adam(
    lr: float = 1e-4,
    betas: Sequence[float] = (0.9, 0.999),
    eps: float = 1e-8,
    params: object = None,
) -> optax.GradientTransformation:
    del params
    return optax.adam(learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps)


def sgd(
    lr: float = 1e-2,
    momentum: float = 0.0,
    weight_decay: float = 0.0,
    nesterov: bool = False,
    params: object = None,
) -> optax.GradientTransformation:
    del params
    tx = optax.sgd(learning_rate=lr, momentum=momentum or None, nesterov=nesterov)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx
