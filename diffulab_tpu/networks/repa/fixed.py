"""Frozen fixed-seed ViT REPA encoder for zero-egress environments.

The reference's REPA targets are pretrained DINOv2/v3 features
(losses/repa.py:24-186), which need downloaded checkpoints. In a zero-egress
image the only reproducible frozen feature space is a fixed-seed
randomly-initialized ViT — the same device used for the FID measurement
(examples/evaluate_fid.py): random projections through a deep ViT still
define a stable, input-discriminative target space, and alignment against
it exercises the full REPA machinery (capture -> projection -> cosine loss)
with a measurable objective. Use a DIFFERENT seed/patching than the FID
feature space so the ablation metric is not the alignment target itself.
"""

from __future__ import annotations

import jax
from flax import nnx

from diffulab_tpu.networks.repa.common import REPA
from diffulab_tpu.networks.repa.vit import ViTEncoder


class FixedViT(REPA):
    """Frozen fixed-seed ViT patch-token encoder (REPA interface)."""

    def __init__(
        self,
        img_size: int = 32,
        patch_size: int = 2,
        embed_dim: int = 384,
        depth: int = 6,
        num_heads: int = 6,
        seed: int = 4321,
        *,
        rngs: nnx.Rngs | None = None,
    ) -> None:
        del rngs  # the whole point is the fixed seed
        self._encoder = ViTEncoder(
            img_size=img_size, patch_size=patch_size, embed_dim=embed_dim,
            depth=depth, num_heads=num_heads, num_register_tokens=0,
            layerscale=False, rngs=nnx.Rngs(seed),
        )
        self._embedding_dim = embed_dim

    @property
    def encoder(self) -> ViTEncoder:
        return self._encoder

    @property
    def embedding_dim(self) -> int:
        return self._embedding_dim

    def preprocess(self, x: jax.Array) -> jax.Array:
        return x  # synthetic pixel batches are already [-1, 1] at native size

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.preprocess(x)
        return jax.lax.stop_gradient(self._encoder(x)["patch_tokens"])
