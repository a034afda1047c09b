"""REPA encoder interface + offline feature precompute
(reference src/diffulab/networks/repa/common.py:17-139).

A REPA encoder maps NHWC images to patch-token features ``[B, N, D]``.
``compute_on_dataset`` streams an existing sharded dataset, encodes the image
column, and writes a new sharded dataset with an added ``dst_features`` column
(the reference's MDS pipeline, repa/common.py:62-139, re-homed onto
diffulab_tpu.data.streaming).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from diffulab_tpu.data.streaming import ShardedDataset, ShardedDatasetWriter

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class REPA(nnx.Module):
    """Abstract frozen feature encoder."""

    @property
    def encoder(self) -> Any:
        raise NotImplementedError

    @property
    def embedding_dim(self) -> int:
        raise NotImplementedError

    def preprocess(self, x: jax.Array) -> jax.Array:
        raise NotImplementedError

    def __call__(self, x: jax.Array) -> jax.Array:
        raise NotImplementedError

    def compute_on_dataset(
        self,
        dataset_path: str,
        dst_path: str,
        target_type: str = "float32",
        batch_size: int = 64,
        image_key: str | None = None,
        shard_size: int = 1024,
    ) -> None:
        """Stream ``dataset_path``, add a ``dst_features`` column, write ``dst_path``."""
        dataset = ShardedDataset(dataset_path)
        if image_key is None:
            image_cols = [c for c in dataset.columns if c.startswith("image")]
            if len(image_cols) != 1:
                raise ValueError(
                    f"Dataset must contain exactly one 'image*' column, found {image_cols}"
                )
            image_key = image_cols[0]
        if target_type not in ("float32", "float16"):
            raise ValueError(f"Unsupported target type: {target_type}")
        out_dtype = np.float32 if target_type == "float32" else np.float16

        encode = jax.jit(lambda imgs: self(imgs))
        with ShardedDatasetWriter(dst_path, shard_size=shard_size) as writer:
            n = len(dataset)
            for start in range(0, n, batch_size):
                idx = range(start, min(start + batch_size, n))
                samples = [dataset[i] for i in idx]
                images = jnp.asarray(
                    np.stack([np.asarray(s[image_key], np.float32) for s in samples])
                )
                feats = np.asarray(encode(images), dtype=out_dtype)
                for i, s in enumerate(samples):
                    writer.write({**s, "dst_features": feats[i]})


def normalize_imagenet(x: jax.Array) -> jax.Array:
    """0-1/0-255 range detection, ImageNet mean/std normalize (NHWC)
    (reference dinov2.py:68-90)."""
    x = x.astype(jnp.float32)
    x = jnp.where(jnp.max(jnp.abs(x)) > 1.5, x / 255.0, x)
    x = jnp.clip(x, 0.0, 1.0)
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def bicubic_resize(x: jax.Array, size: int) -> jax.Array:
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size, size, c), method="bicubic")
