"""``_target_``-based object instantiation (hydra.utils.instantiate subset).

The reference instantiates models/datasets/optimizers from YAML class paths
(e.g. configs/model/dit.yaml `_target_: diffulab.networks.MMDiT`,
SURVEY.md §5.6). Supported keys: ``_target_`` (dotted import path),
``_partial_`` (return functools.partial instead of calling), ``_args_``
(positional args). Nested dicts/lists are instantiated recursively.
"""

from __future__ import annotations

import functools
import importlib
from typing import Any


def _locate(path: str) -> Any:
    parts = path.split(".")
    for split in range(len(parts) - 1, 0, -1):
        try:
            module = importlib.import_module(".".join(parts[:split]))
        except ImportError:
            continue
        obj = module
        try:
            for attr in parts[split:]:
                obj = getattr(obj, attr)
        except AttributeError:
            continue
        return obj
    raise ImportError(f"cannot locate {path!r}")


def instantiate(cfg: Any, /, **kwargs: Any) -> Any:
    if isinstance(cfg, list):
        return [instantiate(v) for v in cfg]
    if not isinstance(cfg, dict):
        return cfg
    if "_target_" not in cfg:
        return {k: instantiate(v) for k, v in cfg.items()}

    cfg = dict(cfg)
    target = _locate(cfg.pop("_target_"))
    partial = cfg.pop("_partial_", False)
    args = [instantiate(a) for a in cfg.pop("_args_", [])]
    call_kwargs = {k: instantiate(v) for k, v in cfg.items()}
    call_kwargs.update(kwargs)
    if partial:
        return functools.partial(target, *args, **call_kwargs)
    return target(*args, **call_kwargs)

def model_dtype_kwargs(trainer_cfg) -> dict:
    """bf16 mixed precision = construct the model with compute dtype bf16
    (fp32 master params are the param_dtype default). The trainer's
    ``precision_type`` knob selects it; anything else runs full fp32."""
    import jax.numpy as jnp

    if trainer_cfg.get("precision_type") == "bf16":
        return {"dtype": jnp.bfloat16}
    return {}
