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
) -> int:
    """Wrap matching ``nnx.Linear`` attributes in-place; returns the number
    of adapters inserted. Idempotent targets only (already-wrapped layers
    are skipped)."""
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
                and not isinstance(child, nnx.LoRA)
                and isinstance(key, str)
                and key in targets
            ):
                wrapper = nnx.LoRA(
                    child.in_features, rank, child.out_features,
                    base_module=child, param_dtype=child.param_dtype, rngs=rngs,
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
            else:
                stack.append(child)
    return n


def count_lora_params(module: nnx.Module) -> int:
    import jax

    state = nnx.state(module, nnx.LoRAParam)
    return sum(int(jnp.size(leaf)) for leaf in jax.tree.leaves(state))
