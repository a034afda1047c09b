"""DC-AE tower (reference src/diffulab/networks/vision_towers/dc_ae.py:8-84).

Deep-compression autoencoder: f32 spatial compression, 32 latent channels,
deterministic latent (no KL sampling), inputs normalized to [-1, 1], latents
multiplied by ``latent_scale`` (the diffusers config scaling_factor).

Round-1 note: this uses the shared conv-VAE backbone with 5 downsample stages
(f32) rather than a line-for-line clone of the EfficientViT-based diffusers
``AutoencoderDC`` internals, so the mit-han-lab checkpoints do not port yet;
the API (compression 32, c32, encode/decode/compute_on_dataset, scaling)
matches, and precomputed-latent datasets are byte-compatible either way.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from diffulab_tpu.networks.vision_towers.common import VisionTower, normalize_to_pm1
from diffulab_tpu.networks.vision_towers.vae import VAEDecoder, VAEEncoder


class DCAE(VisionTower):
    def __init__(
        self,
        base_channels: int = 64,
        ch_mult: tuple[int, ...] = (1, 2, 4, 4, 8, 8),
        num_res_blocks: int = 2,
        latent_channels: int = 32,
        scaling_factor: float = 0.41407,  # dc-ae-f32c32-in-1.0 config
        *,
        rngs: nnx.Rngs | None = None,
        dtype=None,
        param_dtype=jnp.float32,
    ) -> None:
        super().__init__(latent_scale=scaling_factor)
        rngs = rngs or nnx.Rngs(0)
        kw = dict(rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        # 6 stages -> 5 downsamples -> f32
        self.encoder = VAEEncoder(3, base_channels, ch_mult, num_res_blocks,
                                  latent_channels, double_z=False, mid_attention=True, **kw)
        self.decoder = VAEDecoder(3, base_channels, ch_mult, num_res_blocks,
                                  latent_channels, mid_attention=True, **kw)
        self._compression_factor = 2 ** (len(ch_mult) - 1)
        self._latent_channels = latent_channels

    @property
    def compression_factor(self) -> int:
        return self._compression_factor

    @property
    def latent_channels(self) -> int:
        return self._latent_channels

    def encode(self, x: jax.Array, rng: jax.Array | None = None) -> jax.Array:
        del rng  # deterministic latent (reference dc_ae.py:62: .latent)
        x = normalize_to_pm1(x)
        return self.encoder(x)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(z)
