"""Denoiser interface (reference src/diffulab/networks/denoisers/common.py:8-46).

Call convention for every denoiser (the ``model_fn`` the formalizations drive):

    model(x, timesteps, cond=None, drop=None, train=False, rngs=None,
          capture_features=False) -> ModelOutput

- ``x``: NHWC image/latent batch ``[B, H, W, C]``.
- ``timesteps``: ``[B]`` (floats in [0,1] for flow, int steps for DDPM).
- ``cond``: conditioning pytree; recognised keys:
    - ``y``: int class labels ``[B]`` (simple-DiT / UNet class conditioning),
    - ``context``: raw context for the bound ContextEmbedder (for the default
      PrecomputedEmbedder this is a dict with "embeddings"/"attn_mask"),
    - ``x_context``: extra image channels concatenated to x
      (reference common.py:12, mmdit.py:918-919).
- ``drop``: per-sample bool mask selecting the null condition (the JAX analog
  of the reference's scalar drop probability ``p``; see
  diffulab_tpu.networks.nn.make_drop_mask).
- ``capture_features``: when True, ModelOutput carries ``features`` — the
  post-block token streams at the constructor-selected ``feature_layers``
  (replaces the reference's REPA forward hooks, losses/repa.py:119-135,
  which are not jit-expressible; the reference's own ``intermediate_features``
  path is dead code due to the ``if features:`` falsy-empty-list bug at
  mmdit.py:842-850).

ModelOutput: dict with "x" ([B, H, W, C_out]) and optionally "features"
(list of [B, S, D] token tensors).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from flax import nnx

ModelInput = Dict[str, Any]
ModelOutput = Dict[str, Any]


class Denoiser(nnx.Module):
    """Base class for denoiser architectures."""

    classifier_free: bool = False

    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        cond: ModelInput | None = None,
        drop: jax.Array | None = None,
        train: bool = False,
        rngs: nnx.Rngs | None = None,
        capture_features: bool = False,
    ) -> ModelOutput:
        raise NotImplementedError
