"""REPA: representation-alignment auxiliary loss
(reference src/diffulab/training/losses/repa.py:24-186).

Aligns denoiser tokens at ``alignment_layer`` to frozen vision-encoder
features (live DINO or precomputed ``dst_features``) through a 3-layer SiLU
projection MLP and an optional Perceiver resampler; loss is
``coeff * (1 - mean cosine similarity)``.

Hook-free jit-safe design (SURVEY.md §7.1): ``set_model`` registers the
alignment layer in the denoiser's declarative ``feature_layers``; the trainer
runs the denoiser with ``capture_features=True`` and this loss reads the
captured token stream from ``model_output["features"]`` — replacing the
reference's torch forward hooks (losses/repa.py:119-135), which cannot cross a
jit boundary.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import nnx

from diffulab_tpu.networks.repa.dinov2 import DinoV2
from diffulab_tpu.networks.repa.dinov3 import DinoV3
from diffulab_tpu.networks.repa.fixed import FixedViT
from diffulab_tpu.networks.repa.perceiver_resampler import PerceiverResampler
from diffulab_tpu.training.losses.common import LossFunction


class RepaLoss(LossFunction):
    encoder_registry = {"dinov2": DinoV2, "dinov3": DinoV3, "fixed_vit": FixedViT}
    name: str = "RepaLoss"

    def __init__(
        self,
        repa_encoder: str = "dinov2",
        encoder_args: dict[str, Any] | None = None,
        alignment_layer: int = 8,  # 1-based layer index to align
        denoiser_dimension: int = 256,
        hidden_dim: int = 1024,
        load_dino: bool = True,
        embedding_dim: int = 768,
        use_resampler: bool = False,
        resampler_params: dict[str, Any] | None = None,
        coeff: float = 1.0,
        *,
        rngs: nnx.Rngs | None = None,
        dtype=None,
        param_dtype=jnp.float32,
    ) -> None:
        assert repa_encoder in self.encoder_registry, (
            f"Encoder {repa_encoder} is not supported. Available: {list(self.encoder_registry)}"
        )
        rngs = rngs or nnx.Rngs(0)
        encoder = None
        if load_dino:
            encoder = self.encoder_registry[repa_encoder](**(encoder_args or {}), rngs=rngs)
        self.repa_encoder = nnx.data(encoder)
        target_dim = encoder.embedding_dim if encoder is not None else embedding_dim

        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.proj_fc1 = nnx.Linear(denoiser_dimension, hidden_dim, **kw)
        self.proj_fc2 = nnx.Linear(hidden_dim, hidden_dim, **kw)
        self.proj_fc3 = nnx.Linear(hidden_dim, target_dim, **kw)

        resampler = None
        if use_resampler:
            assert resampler_params is not None, (
                "Resampler parameters must be provided when using the perceiver resampler."
            )
            resampler = PerceiverResampler(**resampler_params, rngs=rngs,
                                           dtype=dtype, param_dtype=param_dtype)
        self.resampler = nnx.data(resampler)
        self.alignment_layer = alignment_layer
        self.coeff = coeff
        self._feature_index: int | None = None

    def set_model(self, model: Any) -> None:
        """Register the alignment layer in the denoiser's feature capture list
        (replaces the reference's forward-hook attachment, repa.py:137-150)."""
        layer_idx = self.alignment_layer - 1
        assert 0 <= layer_idx < len(model.layers), (
            f"alignment_layer {self.alignment_layer} out of range for {len(model.layers)} layers"
        )
        layers = tuple(sorted(set(getattr(model, "feature_layers", ())) | {layer_idx}))
        model.feature_layers = layers
        self._feature_index = layers.index(layer_idx)

    def proj(self, x: jax.Array) -> jax.Array:
        h = jax.nn.silu(self.proj_fc1(x))
        h = jax.nn.silu(self.proj_fc2(h))
        return self.proj_fc3(h)

    def __call__(
        self,
        model_output: dict[str, Any],
        x0: jax.Array | None = None,
        dst_features: jax.Array | None = None,
        **_: Any,
    ) -> jax.Array:
        features = model_output.get("features")
        if not features or self._feature_index is None:
            raise RuntimeError(
                "REPA: no captured features. Did you call set_model(...) and run the "
                "denoiser with capture_features=True?"
            )
        assert x0 is not None or dst_features is not None, (
            "Either x0 or dst_features must be provided."
        )
        if dst_features is None:
            assert self.repa_encoder is not None, "REPA encoder must be initialized to compute features."
            dst_features = self.repa_encoder(x0)

        src = features[self._feature_index]
        projected = self.proj(src)
        if self.resampler is not None:
            projected = self.resampler(projected)

        p = projected.astype(jnp.float32)
        d = dst_features.astype(jnp.float32)
        cos_sim = jnp.sum(p * d, axis=-1) / (
            jnp.linalg.norm(p, axis=-1) * jnp.linalg.norm(d, axis=-1) + 1e-8
        )
        return self.coeff * (1.0 - cos_sim.mean())
