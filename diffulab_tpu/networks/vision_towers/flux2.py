"""Flux2 VAE tower (reference src/diffulab/networks/vision_towers/flux2.py:12-99).

KL conv VAE (f8 conv stages) whose latents are packed with a 2x2 pixel shuffle
(-> 4x latent channels, one extra 2x spatial compression, reference
flux2.py:62-70/82-86). Latent scale/bias come from the checkpoint's
batch-norm running stats (flux2.py:17-20). Weights port from a locally
available diffusers checkpoint via ``weights_path`` (a .npz of the numpy
state dict, or a torch .bin/.pt when torch is present).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from diffulab_tpu.networks.vision_towers.common import VisionTower, normalize_to_pm1
from diffulab_tpu.networks.vision_towers.vae import (
    VAEDecoder,
    VAEEncoder,
    diagonal_gaussian_sample,
    load_autoencoder_kl_state_dict,
)


def _load_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    path = Path(path)
    if path.suffix == ".npz":
        with np.load(path) as data:
            return {k: data[k] for k in data.files}
    import torch  # noqa: PLC0415 - weight porting only

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in sd.items()}


class Flux2VAE(VisionTower):
    def __init__(
        self,
        base_channels: int = 128,
        ch_mult: tuple[int, ...] = (1, 2, 4, 4),
        num_res_blocks: int = 2,
        latent_channels: int = 16,
        batch_norm_eps: float = 1e-4,
        weights_path: str | Path | None = None,
        flax_ckpt: str | Path | None = None,
        bn_running_mean: np.ndarray | None = None,
        bn_running_var: np.ndarray | None = None,
        *,
        rngs: nnx.Rngs | None = None,
        dtype=None,
        param_dtype=jnp.float32,
    ) -> None:
        rngs = rngs or nnx.Rngs(0)
        kw = dict(rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        self.encoder = VAEEncoder(3, base_channels, ch_mult, num_res_blocks,
                                  latent_channels, double_z=True, **kw)
        self.decoder = VAEDecoder(3, base_channels, ch_mult, num_res_blocks,
                                  latent_channels, **kw)
        self._conv_latent_channels = latent_channels
        self._latent_channels = latent_channels * 4  # 2x2 packing
        # reference flux2.py:25: compression_factor = 2**len(down_blocks)
        # (= conv f(2^(blocks-1)) times the 2x packing)
        self._compression_factor = 2 ** len(ch_mult)

        packed = latent_channels * 4
        if weights_path is not None:
            sd = _load_state_dict(weights_path)
            load_autoencoder_kl_state_dict(self.encoder, self.decoder, sd)
            if "bn.running_mean" in sd:
                bn_running_mean = sd["bn.running_mean"]
                bn_running_var = sd["bn.running_var"]
        if flax_ckpt is not None:
            # a tower trained in-framework (scripts/build_hard_txt2img.py):
            # orbax dir holding the encoder/decoder nnx states + the measured
            # per-channel latent stats of the training distribution
            from diffulab_tpu.training.checkpoint import restore_checkpoint

            restored = restore_checkpoint(
                flax_ckpt,
                {
                    "encoder": nnx.state(self.encoder),
                    "decoder": nnx.state(self.decoder),
                    "latent_scale": np.zeros((1, 1, 1, packed), np.float32),
                    "latent_bias": np.zeros((1, 1, 1, packed), np.float32),
                },
            )
            nnx.update(self.encoder, restored["encoder"])
            nnx.update(self.decoder, restored["decoder"])
            super().__init__(
                latent_scale=jnp.asarray(restored["latent_scale"], jnp.float32),
                latent_bias=jnp.asarray(restored["latent_bias"], jnp.float32),
            )
            return
        if bn_running_mean is not None:
            scale = 1.0 / np.sqrt(np.asarray(bn_running_var) + batch_norm_eps)
            # NHWC: per-channel stats broadcast over [B, H', W', C]
            super().__init__(
                latent_scale=jnp.asarray(scale, jnp.float32).reshape(1, 1, 1, packed),
                latent_bias=jnp.asarray(bn_running_mean, jnp.float32).reshape(1, 1, 1, packed),
            )
        else:
            super().__init__(latent_scale=1.0, latent_bias=0.0)

    @property
    def compression_factor(self) -> int:
        return self._compression_factor

    @property
    def latent_channels(self) -> int:
        return self._latent_channels

    def encode(self, x: jax.Array, rng: jax.Array | None = None) -> jax.Array:
        """NHWC image -> packed latents [B, H/2f, W/2f, 4*z]."""
        x = normalize_to_pm1(x)
        moments = self.encoder(x)
        z = diagonal_gaussian_sample(moments, rng)  # [B, h, w, z]
        b, h, w, c = z.shape
        # 2x2 pixel-shuffle packing (reference flux2.py:64-69, NHWC layout)
        z = z.reshape(b, h // 2, 2, w // 2, 2, c)
        z = jnp.einsum("bhpwqc->bhwcpq", z)
        return z.reshape(b, h // 2, w // 2, c * 4)

    def decode(self, z: jax.Array) -> jax.Array:
        b, h, w, c = z.shape
        zc = c // 4
        z = z.reshape(b, h, w, zc, 2, 2)
        z = jnp.einsum("bhwcpq->bhpwqc", z)
        z = z.reshape(b, h * 2, w * 2, zc)
        return self.decoder(z)
