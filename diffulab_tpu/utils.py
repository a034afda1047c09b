"""Small shared utilities (mirrors reference src/diffulab/networks/utils/utils.py:7-21)."""

from __future__ import annotations

from typing import Any, TypeVar

import jax
import jax.numpy as jnp

T = TypeVar("T")


def exists(x: Any) -> bool:
    return x is not None


def default(x: T | None, fallback: T) -> T:
    return x if x is not None else fallback


def batch_broadcast(values: jax.Array, target_ndim: int) -> jax.Array:
    """Reshape a per-sample vector ``[B]`` to ``[B, 1, 1, ...]`` for broadcasting.

    JAX equivalent of the reference's recurring ``t.view(-1, *([1] * (x.dim()-1)))``
    idiom (e.g. reference flow.py:405-406).
    """
    return values.reshape(values.shape[0], *([1] * (target_ndim - 1)))


def flatten_nonbatch_mean(x: jax.Array) -> jax.Array:
    """Per-sample mean over all non-batch dims: ``[B, ...] -> [B]``."""
    return x.reshape(x.shape[0], -1).mean(axis=-1)


def tree_bf16(tree: Any) -> Any:
    """Cast all floating-point leaves of a pytree to bfloat16."""
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )
