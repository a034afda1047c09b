"""DINOv2 REPA encoder (reference src/diffulab/networks/repa/dinov2.py:14-104).

A frozen DINOv2 ViT (default: ViT-L/14 with registers) as a Flax module. The
reference pulls weights via torch.hub; in a zero-egress TPU environment the
weights come from a local torch checkpoint (``weights_path``), ported with
:func:`diffulab_tpu.networks.repa.vit.load_dinov2_state_dict`. Without
weights the encoder is random-init (useful only for tests) — the production
path precomputes ``dst_features`` offline (SURVEY.md §7.1).
"""

from __future__ import annotations

from pathlib import Path

import jax
from flax import nnx

from diffulab_tpu.networks.repa.common import REPA, bicubic_resize, normalize_imagenet
from diffulab_tpu.networks.repa.vit import ViTEncoder, load_dinov2_state_dict

DINOV2_CONFIGS = {
    "dinov2_vits14_reg": dict(embed_dim=384, depth=12, num_heads=6, num_register_tokens=4),
    "dinov2_vitb14_reg": dict(embed_dim=768, depth=12, num_heads=12, num_register_tokens=4),
    "dinov2_vitl14_reg": dict(embed_dim=1024, depth=24, num_heads=16, num_register_tokens=4),
    "dinov2_vits14": dict(embed_dim=384, depth=12, num_heads=6, num_register_tokens=0),
    "dinov2_vitb14": dict(embed_dim=768, depth=12, num_heads=12, num_register_tokens=0),
    "dinov2_vitl14": dict(embed_dim=1024, depth=24, num_heads=16, num_register_tokens=0),
}


class DinoV2(REPA):
    native_resolution: int = 224
    base_patch_pixel_size: int = 14

    def __init__(
        self,
        dino_model: str = "dinov2_vitl14_reg",
        resolution: int = 256,
        target_seq_len: int | None = None,
        weights_path: str | Path | None = None,
        *,
        rngs: nnx.Rngs | None = None,
    ) -> None:
        assert dino_model in DINOV2_CONFIGS, f"unknown dinov2 model {dino_model}"
        cfg = DINOV2_CONFIGS[dino_model]

        if not target_seq_len:
            self.inference_resolution = self.native_resolution * (resolution // 256)
            grid_size = self.inference_resolution // self.base_patch_pixel_size
        else:
            sqrt_val = target_seq_len**0.5
            if not sqrt_val.is_integer():
                raise ValueError(f"target_seq_len ({target_seq_len}) must be a square")
            grid_size = int(sqrt_val)
            self.inference_resolution = grid_size * self.base_patch_pixel_size

        self._encoder = ViTEncoder(
            img_size=grid_size * self.base_patch_pixel_size,
            patch_size=self.base_patch_pixel_size,
            **cfg,
            rngs=rngs or nnx.Rngs(0),
        )
        self._embedding_dim = cfg["embed_dim"]
        if weights_path is not None:
            import torch  # noqa: PLC0415 - weight porting only

            sd = torch.load(weights_path, map_location="cpu", weights_only=True)
            sd = {k: v.float().numpy() for k, v in sd.items()}
            load_dinov2_state_dict(self._encoder, sd, target_grid=(grid_size, grid_size))

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
        """NHWC image -> normalized patch tokens [B, N, D] (frozen)."""
        x = self.preprocess(x)
        out = jax.lax.stop_gradient(self._encoder(x)["patch_tokens"])
        return out
