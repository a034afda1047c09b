"""Auxiliary loss interface (reference src/diffulab/training/losses/common.py:10-24).

A LossFunction is a named nnx.Module whose parameters train jointly with the
denoiser (the trainer bundles them into one split). ``set_model`` is the
attachment point; unlike the reference's forward hooks (losses/repa.py:119-135)
it configures the denoiser's declarative feature capture, and the loss later
reads those features from the model output.
"""

from __future__ import annotations

from typing import Any

import jax
from flax import nnx


class LossFunction(nnx.Module):
    name: str = "extra_loss"

    def set_model(self, model: Any) -> None:
        """Attach to a denoiser (default: no-op)."""

    def __call__(self, model_output: dict[str, Any], **kwargs: Any) -> jax.Array:
        raise NotImplementedError
