"""DINOv3 REPA encoder (reference src/diffulab/networks/repa/dinov3.py:22-116).

The HF DINOv3 ViT architecture (RoPE over patch-center coordinates, separate
q/k/v projections, LayerScale, optional gated MLP) is implemented natively in
``vit.Dinov3ViTEncoder``; ``cancel_affine`` removes the final norm's affine
parameters (reference :37-41). Weights come from a locally available HF
checkpoint directory via ``weights_path`` (config.json + safetensors shards,
read without torch or network access — the reference's
``AutoModel.from_pretrained(facebook/dinov3-vitb16)`` needs egress).
CLS + register tokens are stripped from the output (reference :115).
"""

from __future__ import annotations

from pathlib import Path

import jax
from flax import nnx

from diffulab_tpu.networks.repa.common import REPA, bicubic_resize, normalize_imagenet
from diffulab_tpu.networks.repa.vit import (
    Dinov3ViTEncoder,
    build_dinov3_from_config,
    load_dinov3_state_dict,
    load_hf_checkpoint_dir,
)

DINOV3_CONFIGS = {
    "facebook/dinov3-vits16-pretrain-lvd1689m": dict(
        embed_dim=384, depth=12, num_heads=6, intermediate_size=1536, use_gated_mlp=False),
    "facebook/dinov3-vitb16-pretrain-lvd1689m": dict(
        embed_dim=768, depth=12, num_heads=12, intermediate_size=3072, use_gated_mlp=False),
    "facebook/dinov3-vitl16-pretrain-lvd1689m": dict(
        embed_dim=1024, depth=24, num_heads=16, intermediate_size=4096, use_gated_mlp=True),
}


class DinoV3(REPA):
    base_patch_pixel_size: int = 16

    def __init__(
        self,
        dino_model: str = "facebook/dinov3-vitb16-pretrain-lvd1689m",
        cancel_affine: bool = False,
        resolution: int = 224,
        weights_path: str | Path | None = None,
        *,
        rngs: nnx.Rngs | None = None,
    ) -> None:
        self.inference_resolution = resolution
        rngs = rngs or nnx.Rngs(0)
        if weights_path is not None:
            # exact architecture comes from the checkpoint's own config.json,
            # so any DINOv3 ViT size ports without a registry entry
            cfg, state = load_hf_checkpoint_dir(weights_path)
            self._encoder = build_dinov3_from_config(
                cfg, final_norm_affine=not cancel_affine, rngs=rngs
            )
            load_dinov3_state_dict(self._encoder, state)
            self._embedding_dim = int(cfg.get("hidden_size", 768))
        else:
            assert dino_model in DINOV3_CONFIGS, f"unknown dinov3 model {dino_model}"
            cfg = DINOV3_CONFIGS[dino_model]
            self._encoder = Dinov3ViTEncoder(
                patch_size=self.base_patch_pixel_size,
                num_register_tokens=4,
                final_norm_affine=not cancel_affine,
                **cfg,
                rngs=rngs,
            )
            self._embedding_dim = cfg["embed_dim"]

    @property
    def encoder(self) -> Dinov3ViTEncoder:
        return self._encoder

    @property
    def embedding_dim(self) -> int:
        return self._embedding_dim

    def preprocess(self, x: jax.Array) -> jax.Array:
        x = normalize_imagenet(x)
        return bicubic_resize(x, self.inference_resolution)

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.preprocess(x)
        return jax.lax.stop_gradient(self._encoder(x)["patch_tokens"])
