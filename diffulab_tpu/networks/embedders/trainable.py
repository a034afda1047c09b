"""In-graph trainable text embedder.

Closes the one reference capability the host-side HF embedders structurally
cannot provide: joint fine-tuning of the text encoder with the denoiser
(``train_embedder=True``, reference
src/diffulab/training/trainers/base_trainer.py:291-293 — the reference merely
skips the ``requires_grad=False`` freeze on its live Qwen/SD3/SmolVLM
encoders). The frozen HF embedders here run host-side in torch, outside the
jitted graph (networks/embedders/hf_text.py), so gradients can never reach
them; this module is the in-graph alternative: a small byte-level transformer
encoder whose params live in the denoiser's ``context_embedder`` submodule,
so ``trainable_filter(train_embedder=True)`` (training/checkpoint.py) puts
them in the optimizer and gradients flow through the MMDiT context path into
the encoder under one jit.

TPU notes: token sequences are short and static-length (``max_len``), the
encoder is pure MXU work (embedding gather + attention + SwiGLU MLPs), and
the CFG drop is an in-graph ``jnp.where`` on token ids — dropped samples
encode the BOS-only "empty prompt" (the in-graph analog of the reference's
drop-to-empty-string, qwen.py:36-46), so the null conditioning is *learned*
jointly, which a swapped-in frozen null constant cannot do.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from diffulab_tpu.networks.embedders.common import ContextEmbedder, ContextEmbedderOutput
from diffulab_tpu.networks.nn import RMSNorm, apply_rope_1d, packed_swiglu, rope_1d_cos_sin
from diffulab_tpu.ops.attention import dot_product_attention

PAD_ID = 0
BOS_ID = 1
BYTE_OFFSET = 2  # token id of byte b is b + 2
VOCAB_SIZE = 256 + BYTE_OFFSET


def byte_tokenize(texts: Sequence[str], max_len: int = 64) -> dict[str, np.ndarray]:
    """Host-side byte-level tokenizer: [BOS, utf8 bytes..., PAD...].

    Deterministic, vocabulary-free (ids = byte + 2), zero-egress-friendly.
    Returns ``{"token_ids": [B, max_len] int32, "attn_mask": [B, max_len]}``
    — the context dict :class:`TrainableTextEmbedder` consumes.
    """
    ids = np.full((len(texts), max_len), PAD_ID, np.int32)
    mask = np.zeros((len(texts), max_len), bool)
    for i, text in enumerate(texts):
        toks = [BOS_ID] + [b + BYTE_OFFSET for b in text.encode("utf-8")[: max_len - 1]]
        ids[i, : len(toks)] = toks
        mask[i, : len(toks)] = True
    return {"token_ids": ids, "attn_mask": mask}


class _EncoderBlock(nnx.Module):
    def __init__(self, dim: int, num_heads: int, mlp_ratio: float, *,
                 rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.norm1 = RMSNorm(dim, rngs=rngs, param_dtype=param_dtype)
        self.qkv = nnx.Linear(dim, 3 * dim, use_bias=False, **kw)
        self.proj = nnx.Linear(dim, dim, use_bias=False, **kw)
        self.norm2 = RMSNorm(dim, rngs=rngs, param_dtype=param_dtype)
        hidden = int(dim * mlp_ratio)
        self.mlp_in = nnx.Linear(dim, 2 * hidden, use_bias=False, **kw)
        self.mlp_out = nnx.Linear(hidden, dim, use_bias=False, **kw)

    def __call__(self, x: jax.Array, cos: jax.Array, sin: jax.Array,
                 mask: jax.Array) -> jax.Array:
        b, n, d = x.shape
        q, k, v = jnp.split(self.qkv(self.norm1(x).astype(x.dtype)), 3, axis=-1)
        q, k = apply_rope_1d(
            q.reshape(b, n, self.num_heads, self.head_dim),
            k.reshape(b, n, self.num_heads, self.head_dim),
            cos, sin, self.head_dim,
        )
        v = v.reshape(b, n, self.num_heads, self.head_dim)
        out = dot_product_attention(q, k, v, kv_mask=mask)
        x = x + self.proj(out.reshape(b, n, d))
        return x + self.mlp_out(packed_swiglu(self.mlp_in(self.norm2(x).astype(x.dtype))))


class TrainableTextEmbedder(ContextEmbedder):
    """Byte-level transformer text encoder that trains inside the jit graph.

    Context format: ``{"token_ids": [B, L] int32, "attn_mask": [B, L] bool}``
    from :func:`byte_tokenize` (run host-side by the dataset/loader).
    Output: token ``embeddings`` [B, L, dim] (+ masked-mean
    ``pooled_embeddings`` [B, dim] when ``pooled=True``) and the attention
    mask, exactly the :class:`PrecomputedEmbedder` surface — so it drops into
    any MMDiT/DDT/Sprint config via ``embedder: trainable``.
    """

    def __init__(self, dim: int = 256, depth: int = 4, num_heads: int = 4,
                 mlp_ratio: float = 4.0, max_len: int = 64, pooled: bool = False,
                 vocab_size: int = VOCAB_SIZE, *, rngs: nnx.Rngs,
                 dtype=None, param_dtype=jnp.float32):
        self.max_len = max_len
        self.tok_embed = nnx.Embed(vocab_size, dim, param_dtype=param_dtype, rngs=rngs)
        self.blocks = nnx.List([
            _EncoderBlock(dim, num_heads, mlp_ratio, rngs=rngs, dtype=dtype,
                          param_dtype=param_dtype)
            for _ in range(depth)
        ])
        self.final_norm = RMSNorm(dim, rngs=rngs, param_dtype=param_dtype)
        self._head_dim = dim // num_heads
        self.pooled = pooled
        self._n_output = 2 if pooled else 1
        self._output_size = (dim, dim) if pooled else (dim,)

    def tokenize(self, texts: Sequence[str]) -> dict[str, np.ndarray]:
        return byte_tokenize(texts, self.max_len)

    def drop_conditions(self, context: dict[str, jax.Array], drop: jax.Array) -> dict[str, jax.Array]:
        """In-graph CFG drop: dropped rows become the BOS-only empty prompt
        BEFORE encoding, so the null conditioning is learned jointly."""
        ids = context["token_ids"]
        mask = context.get("attn_mask")
        if mask is None:
            mask = ids != PAD_ID
        pos = jnp.arange(ids.shape[1])[None, :]
        null_ids = jnp.where(pos == 0, BOS_ID, PAD_ID).astype(ids.dtype)
        ids = jnp.where(drop[:, None], null_ids, ids)
        mask = jnp.where(drop[:, None], pos == 0, mask)
        return {"token_ids": ids, "attn_mask": mask}

    def __call__(self, context: dict[str, jax.Array], drop: jax.Array | None = None) -> ContextEmbedderOutput:
        if drop is not None:
            context = self.drop_conditions(context, drop)
        ids = context["token_ids"]
        mask = context.get("attn_mask")
        if mask is None:
            mask = ids != PAD_ID
        assert ids.shape[1] == self.max_len, (
            f"token sequence length {ids.shape[1]} != embedder max_len {self.max_len}"
        )
        x = self.tok_embed(ids)
        # trace-time constant tables (XLA folds them; not traced state)
        cos, sin = rope_1d_cos_sin(self.max_len, self._head_dim)
        for block in self.blocks:
            x = block(x, cos, sin, mask)
        x = self.final_norm(x).astype(x.dtype)
        out: ContextEmbedderOutput = {"embeddings": x, "attn_mask": mask}
        if self.pooled:
            w = mask.astype(x.dtype)[..., None]
            out["pooled_embeddings"] = (x * w).sum(axis=1) / jnp.maximum(w.sum(axis=1), 1.0)
        return out
