"""Sampling-time block caching: the shared denoise-scan wrapper.

Delta-DiT-style residual block caching (arXiv:2406.01125) threads a cache
pytree through the denoise ``lax.scan`` carry; every ``cache_interval``-th
step refreshes it (bit-exact with the uncached model), the steps in between
reuse the cached span delta and skip those blocks. All three formalizations
(flow / gaussian / EDM) share this wrapper so the caching protocol has one
source of truth.

The carried cache is a ``(main, guide)`` pair: ``main`` feeds the denoiser,
``guide`` feeds the autoguidance degraded model (arXiv:2406.02507) when one
is configured — each model owns its cache because their weights (and, under
autoguidance, their call batch sizes) differ. Without autoguidance ``guide``
is ``()``.

No reference counterpart (LouisRouss/DiffuLab has no sampling acceleration);
see ``Diffuser.set_block_cache`` for the config surface.
"""

from __future__ import annotations

from typing import Any, Callable

ModelFn = Callable[..., dict[str, Any]]


def wrap_block_cache(
    model_fn: ModelFn,
    guide_fn: ModelFn | None,
    mcache: Any,
    step_idx: Any,
    cache_interval: int,
    *,
    enabled: bool,
) -> tuple[ModelFn, ModelFn | None, dict[str, Any]]:
    """Wrap ``model_fn`` (and ``guide_fn``) so the block cache threads through
    the scan carry.

    Returns ``(step_model_fn, step_guide_fn, cell)`` where ``cell["c"]`` is
    the updated carry value after the step's model evaluations (the
    trace-time cell survives multi-eval samplers like Heun — each eval within
    a step reuses the refresh decision and updates the same cell).
    """
    if not enabled:
        return model_fn, guide_fn, {"c": mcache}

    refresh = (step_idx % cache_interval) == 0
    cell = {"c": mcache}

    def step_model_fn(**kw: Any) -> dict[str, Any]:
        out = model_fn(**kw, block_cache=cell["c"][0], cache_refresh=refresh)
        cell["c"] = (out["block_cache"], cell["c"][1])
        return out

    step_guide_fn = guide_fn
    if guide_fn is not None:

        def step_guide_fn(**kw: Any) -> dict[str, Any]:
            out = guide_fn(**kw, block_cache=cell["c"][1], cache_refresh=refresh)
            cell["c"] = (cell["c"][0], out["block_cache"])
            return out

    return step_model_fn, step_guide_fn, cell
