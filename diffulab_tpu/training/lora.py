"""LoRA finetuning (reference README roadmap item "Add possibility to
train LORA/DORA", unimplemented there; Hu et al. 2021, arXiv:2106.09685).

``apply_lora`` wraps the denoiser's projection Linears in ``nnx.LoRA``
adapters (``y = base(x) + x @ a @ b``, ``b`` zero-init so the wrapped model
is exactly the base model at step 0). Adapter weights are ``nnx.LoRAParam``
(a Param subclass), so:

- ``BaseTrainer.train(..., lora_only=True)`` filters the trainable split to
  adapters only — the optimizer/EMA state shrinks to the adapter tree and
  base weights ride in the frozen ``rest`` partition;
- checkpoints of a LoRA run store only adapters + frozen base (normal
  save path, nothing special).

``merge_lora`` folds ``a @ b`` back into each base kernel and restores the
plain Linears for deployment (zero inference overhead).
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
from flax import nnx

# attribute names of the projection Linears in this framework's blocks
# (DiT/MMDiT attention + SwiGLU MLPs, UNet qkv/proj, DDT/Sprint reuse these)
DEFAULT_TARGETS = (
    "qkv", "proj_out", "fc_in", "fc_out",
    "qkv_input", "qkv_context", "input_proj_out", "context_proj_out",
    "to_q", "to_k", "to_v", "to_out",
)


def _iter_children(module):
    """(parent, key, child) triples over direct submodule attributes,
    descending into nnx.List containers."""
    for key, value in vars(module).items():
        if isinstance(value, nnx.Module):
            yield module, key, value
        elif isinstance(value, (list, tuple, nnx.List)):
            for i, item in enumerate(value):
                if isinstance(item, nnx.Module):
                    yield value, i, item


def _set(parent, key, value):
    if isinstance(key, int):
        parent[key] = value
    else:
        setattr(parent, key, value)


def apply_lora(
    module: nnx.Module,
    rank: int,
    *,
    rngs: nnx.Rngs,
    targets: Iterable[str] = DEFAULT_TARGETS,
    variant: str = "lora",
) -> int:
    """Wrap matching ``nnx.Linear`` attributes in-place; returns the number
    of adapters inserted. ``variant``: "lora" (additive nnx.LoRA) or "dora"
    (weight-decomposed, :class:`DoRALinear`). Already-wrapped layers are
    skipped."""
    assert variant in ("lora", "dora"), variant
    targets = set(targets)
    n = 0
    stack = [module]
    seen: set[int] = set()
    while stack:
        mod = stack.pop()
        if id(mod) in seen:
            continue
        seen.add(id(mod))
        for parent, key, child in _iter_children(mod):
            if (
                isinstance(child, nnx.Linear)
                and not isinstance(child, (nnx.LoRA, DoRALinear))
                and isinstance(key, str)
                and key in targets
            ):
                if variant == "dora":
                    wrapper: nnx.Module = DoRALinear(child, rank, rngs=rngs)
                else:
                    wrapper = nnx.LoRA(
                        child.in_features, rank, child.out_features,
                        base_module=child, dtype=child.dtype,
                        param_dtype=child.param_dtype, rngs=rngs,
                    )
                _set(parent, key, wrapper)
                n += 1
            else:
                stack.append(child)
    return n


def merge_lora(module: nnx.Module) -> int:
    """Fold every adapter into its base kernel and put the plain Linear
    back; returns the number of adapters merged."""
    n = 0
    stack = [module]
    seen: set[int] = set()
    while stack:
        mod = stack.pop()
        if id(mod) in seen:
            continue
        seen.add(id(mod))
        for parent, key, child in _iter_children(mod):
            if isinstance(child, nnx.LoRA) and child.base_module is not None:
                base = child.base_module
                delta = child.lora_a[...] @ child.lora_b[...]
                base.kernel[...] = (
                    base.kernel[...] + delta.astype(base.kernel[...].dtype)
                )
                _set(parent, key, base)
                n += 1
            elif isinstance(child, DoRALinear):
                base = child.base
                base.kernel[...] = child._directional_kernel().astype(
                    base.kernel[...].dtype
                )
                _set(parent, key, base)
                n += 1
            else:
                stack.append(child)
    return n


def count_lora_params(module: nnx.Module) -> int:
    state = nnx.state(module, nnx.LoRAParam)
    return sum(int(jnp.size(leaf)) for leaf in jax.tree.leaves(state))


class DoRALinear(nnx.Module):
    """Weight-Decomposed Low-Rank Adaptation (Liu et al. 2024,
    arXiv:2402.09353): ``W' = m * (W + B A) / ||W + B A||_col`` with a
    trainable per-output-column magnitude ``m``.

    All adapter state (``lora_a``, ``lora_b``, ``magnitude``) is
    ``nnx.LoRAParam`` so the trainer's ``lora_only`` split trains exactly
    the DoRA parameters; the base kernel/bias stay frozen. At init
    ``B = 0`` and ``m = ||W||_col``, so the wrapped layer equals the base.
    """

    def __init__(self, base: nnx.Linear, rank: int, *, rngs: nnx.Rngs):
        self.base = base
        din, dout = base.in_features, base.out_features
        init_a = nnx.initializers.he_uniform()
        self.lora_a = nnx.LoRAParam(
            init_a(rngs.params(), (din, rank), base.param_dtype)
        )
        self.lora_b = nnx.LoRAParam(jnp.zeros((rank, dout), base.param_dtype))
        self.magnitude = nnx.LoRAParam(
            jnp.linalg.norm(base.kernel[...].astype(jnp.float32), axis=0).astype(
                base.param_dtype
            )
        )

    def _directional_kernel(self) -> jax.Array:
        w = self.base.kernel[...] + self.lora_a[...] @ self.lora_b[...]
        col_norm = jnp.linalg.norm(w.astype(jnp.float32), axis=0)
        # magnitude is trained; the column direction is normalized with the
        # norm detached (the DoRA paper's gradient simplification, eq. 5)
        col_norm = jax.lax.stop_gradient(jnp.maximum(col_norm, 1e-12))
        return w * (self.magnitude[...].astype(jnp.float32) / col_norm).astype(w.dtype)

    def __call__(self, x: jax.Array) -> jax.Array:
        y = x @ self._directional_kernel().astype(x.dtype)
        if self.base.use_bias:
            y = y + self.base.bias[...].astype(y.dtype)
        return y

