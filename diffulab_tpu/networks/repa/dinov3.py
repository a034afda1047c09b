"""DINOv3 REPA encoder (reference src/diffulab/networks/repa/dinov3.py:22-116).

ViT-B/16 with registers by default; ``cancel_affine`` removes the final norm's
affine parameters (reference :37-41). Weights come from a locally available
HF checkpoint directory via ``weights_path`` (transformers safetensors state
dict, ported onto the shared ViTEncoder); the reference's
``AutoModel.from_pretrained`` needs network access. CLS + register tokens are
stripped from the output (reference :115).
"""

from __future__ import annotations

from pathlib import Path

import jax
from flax import nnx

from diffulab_tpu.networks.repa.common import REPA, bicubic_resize, normalize_imagenet
from diffulab_tpu.networks.repa.vit import ViTEncoder

DINOV3_CONFIGS = {
    "facebook/dinov3-vits16-pretrain-lvd1689m": dict(embed_dim=384, depth=12, num_heads=6),
    "facebook/dinov3-vitb16-pretrain-lvd1689m": dict(embed_dim=768, depth=12, num_heads=12),
    "facebook/dinov3-vitl16-pretrain-lvd1689m": dict(embed_dim=1024, depth=24, num_heads=16),
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
        assert dino_model in DINOV3_CONFIGS, f"unknown dinov3 model {dino_model}"
        cfg = DINOV3_CONFIGS[dino_model]
        self.inference_resolution = resolution
        self._encoder = ViTEncoder(
            img_size=resolution,
            patch_size=self.base_patch_pixel_size,
            num_register_tokens=4,
            final_norm_affine=not cancel_affine,
            **cfg,
            rngs=rngs or nnx.Rngs(0),
        )
        self._embedding_dim = cfg["embed_dim"]
        if weights_path is not None:
            raise NotImplementedError(
                "DINOv3 HF weight porting is not wired yet; use precomputed dst_features "
                "(the reference's production path) or DinoV2 with a local torch checkpoint."
            )

    @property
    def encoder(self) -> ViTEncoder:
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
