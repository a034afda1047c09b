"""Precomputed-embedding passthrough embedder
(reference src/diffulab/networks/embedders/precomputed.py:9-43).

The TPU-idiomatic default conditioning path: token embeddings are computed
offline (by any frozen LM) and stored with the dataset; at train time this
embedder only swaps in a stored null embedding (+ its mask) for CFG-dropped
samples. Keeps the frozen LM out of the jitted graph entirely.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from diffulab_tpu.networks.embedders.common import ContextEmbedder, ContextEmbedderOutput


def _load_null_embedding(path: str | Path) -> np.ndarray:
    """Load a stored null embedding: .npy, or a torch .pt if torch is present."""
    path = Path(path)
    if path.suffix == ".npy":
        return np.load(path)
    try:
        import torch  # noqa: PLC0415

        return torch.load(path, map_location="cpu", weights_only=True).float().numpy()
    except ImportError as e:  # pragma: no cover
        raise ValueError(f"cannot load null embedding {path}: install torch or provide .npy") from e


class PrecomputedEmbedder(ContextEmbedder):
    def __init__(
        self,
        path_null_embedding: str | Path | None = None,
        null_embedding_seq_len: int = 0,
        null_embedding: np.ndarray | None = None,
        *,
        rngs: nnx.Rngs | None = None,
    ) -> None:
        del rngs
        if null_embedding is None:
            assert path_null_embedding is not None
            null_embedding = _load_null_embedding(path_null_embedding)
        null_embedding = np.squeeze(np.asarray(null_embedding))
        assert null_embedding.ndim == 2, "null embedding must be [L, D]"
        # Stored as non-trainable graph constants
        self.null_embedding = nnx.Variable(jnp.asarray(null_embedding, dtype=jnp.float32))
        mask = np.zeros((null_embedding.shape[0],), dtype=bool)
        mask[:null_embedding_seq_len] = True
        self.null_embedding_mask = nnx.Variable(jnp.asarray(mask))
        self._output_size = (null_embedding.shape[-1],)
        self._n_output = 1

    def drop_conditions(self, context: ContextEmbedderOutput, drop: jax.Array) -> ContextEmbedderOutput:
        emb = context["embeddings"]
        batch = emb.shape[0]
        null_emb = self.null_embedding[...].astype(emb.dtype)
        null_mask = self.null_embedding_mask[...]
        embeddings = jnp.where(
            drop[:, None, None], jnp.broadcast_to(null_emb[None], emb.shape), emb
        )
        attn_mask = context.get("attn_mask")
        if attn_mask is None:
            attn_mask = jnp.ones(emb.shape[:2], dtype=bool)
        attn_mask = jnp.where(
            drop[:, None], jnp.broadcast_to(null_mask[None], attn_mask.shape), attn_mask
        )
        return {"embeddings": embeddings, "attn_mask": attn_mask}

    def __call__(self, context: ContextEmbedderOutput, drop: jax.Array | None = None) -> ContextEmbedderOutput:
        if drop is None:
            drop = jnp.zeros((context["embeddings"].shape[0],), dtype=bool)
        return self.drop_conditions(context, drop)
