"""Generic DINO-style ViT encoder in Flax NNX, with torch weight porting.

Backbone for the frozen REPA feature encoders (DinoV2/DinoV3): patch embed,
cls + register tokens, learnable absolute position embedding (bicubic
resampled to the target grid), pre-norm blocks with LayerScale, GELU MLP,
final LayerNorm. ``load_dinov2_state_dict`` maps the facebookresearch/dinov2
checkpoint naming onto this module so locally available torch weights can be
ported without network access (torch.hub is unavailable in zero-egress
environments; the precomputed-features path is the default anyway).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


class ViTAttention(nnx.Module):
    def __init__(self, dim: int, num_heads: int, *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32):
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.qkv = nnx.Linear(dim, 3 * dim, **kw)
        self.proj = nnx.Linear(dim, dim, **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, d = x.shape
        q, k, v = jnp.split(self.qkv(x), 3, axis=-1)
        q = q.reshape(b, n, self.num_heads, self.head_dim)
        k = k.reshape(b, n, self.num_heads, self.head_dim)
        v = v.reshape(b, n, self.num_heads, self.head_dim)
        out = jax.nn.dot_product_attention(q, k, v)
        return self.proj(out.reshape(b, n, d))


class ViTBlock(nnx.Module):
    def __init__(self, dim: int, num_heads: int, mlp_ratio: float = 4.0, layerscale: bool = True,
                 *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        hidden = int(dim * mlp_ratio)
        self.norm1 = nnx.LayerNorm(dim, epsilon=1e-6, **kw)
        self.attn = ViTAttention(dim, num_heads, **kw)
        self.norm2 = nnx.LayerNorm(dim, epsilon=1e-6, **kw)
        self.fc1 = nnx.Linear(dim, hidden, **kw)
        self.fc2 = nnx.Linear(hidden, dim, **kw)
        self.ls1 = nnx.Param(jnp.ones((dim,), param_dtype)) if layerscale else None
        self.ls2 = nnx.Param(jnp.ones((dim,), param_dtype)) if layerscale else None

    def __call__(self, x: jax.Array) -> jax.Array:
        h = self.attn(self.norm1(x))
        if self.ls1 is not None:
            h = h * self.ls1[...].astype(h.dtype)
        x = x + h
        h = self.fc2(jax.nn.gelu(self.fc1(self.norm2(x)), approximate=False))
        if self.ls2 is not None:
            h = h * self.ls2[...].astype(h.dtype)
        return x + h


def resample_abs_pos_embed(pos_embed: np.ndarray, new_grid: tuple[int, int],
                           num_prefix_tokens: int = 1) -> np.ndarray:
    """Bicubic resample of a [1, P+N, D] position table to a new token grid
    (timm.layers.pos_embed.resample_abs_pos_embed semantics)."""
    prefix = pos_embed[:, :num_prefix_tokens]
    grid = pos_embed[:, num_prefix_tokens:]
    n = grid.shape[1]
    old_side = int(round(n**0.5))
    d = grid.shape[-1]
    if (old_side, old_side) == new_grid:
        return pos_embed
    grid = grid.reshape(1, old_side, old_side, d)
    grid = jax.image.resize(jnp.asarray(grid), (1, new_grid[0], new_grid[1], d), method="bicubic")
    grid = np.asarray(grid).reshape(1, new_grid[0] * new_grid[1], d)
    return np.concatenate([prefix, grid], axis=1)


class ViTEncoder(nnx.Module):
    """DINO-style ViT returning normalized patch tokens."""

    def __init__(
        self,
        img_size: int = 224,
        patch_size: int = 14,
        embed_dim: int = 1024,
        depth: int = 24,
        num_heads: int = 16,
        mlp_ratio: float = 4.0,
        num_register_tokens: int = 4,
        layerscale: bool = True,
        final_norm_affine: bool = True,
        *,
        rngs: nnx.Rngs,
        dtype=None,
        param_dtype=jnp.float32,
    ):
        self.patch_size = patch_size
        self.embed_dim = embed_dim
        self.num_register_tokens = num_register_tokens
        grid = img_size // patch_size
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.patch_embed = nnx.Conv(
            3, embed_dim, (patch_size, patch_size), strides=(patch_size, patch_size),
            padding="VALID", **kw,
        )
        self.cls_token = nnx.Param(jnp.zeros((1, 1, embed_dim), param_dtype))
        self.register_tokens = (
            nnx.Param(jnp.zeros((1, num_register_tokens, embed_dim), param_dtype))
            if num_register_tokens > 0 else None
        )
        self.pos_embed = nnx.Param(
            0.02 * jax.random.normal(rngs.params(), (1, grid * grid + 1, embed_dim), param_dtype)
        )
        self.blocks = nnx.List([
            ViTBlock(embed_dim, num_heads, mlp_ratio, layerscale, **kw) for _ in range(depth)
        ])
        self.norm = nnx.LayerNorm(
            embed_dim, epsilon=1e-6, use_bias=final_norm_affine, use_scale=final_norm_affine, **kw
        )

    def __call__(self, x: jax.Array) -> dict[str, jax.Array]:
        """x: NHWC image -> {"patch_tokens": [B, N, D], "cls": [B, D]}."""
        b = x.shape[0]
        tokens = self.patch_embed(x)
        tokens = tokens.reshape(b, -1, self.embed_dim)
        cls = jnp.broadcast_to(self.cls_token[...].astype(tokens.dtype), (b, 1, self.embed_dim))
        tokens = jnp.concatenate([cls, tokens], axis=1)
        tokens = tokens + self.pos_embed[...].astype(tokens.dtype)
        if self.register_tokens is not None:
            regs = jnp.broadcast_to(
                self.register_tokens[...].astype(tokens.dtype),
                (b, self.num_register_tokens, self.embed_dim),
            )
            tokens = jnp.concatenate([tokens[:, :1], regs, tokens[:, 1:]], axis=1)
        for block in self.blocks:
            tokens = block(tokens)
        tokens = self.norm(tokens)
        n_prefix = 1 + self.num_register_tokens
        return {"patch_tokens": tokens[:, n_prefix:], "cls": tokens[:, 0]}


def load_dinov2_state_dict(model: ViTEncoder, state_dict: dict[str, np.ndarray],
                           target_grid: tuple[int, int] | None = None) -> None:
    """Port a facebookresearch/dinov2 torch state dict into a ViTEncoder.

    Expects numpy arrays (call ``{k: v.numpy() for k, v in sd.items()}`` on the
    torch side). Resamples pos_embed to ``target_grid`` when given.
    """
    def put(param, value):
        value = np.asarray(value)
        assert param.shape == value.shape, f"{param.shape} vs {value.shape}"
        param[...] = jnp.asarray(value, dtype=param[...].dtype)

    # conv: torch [D, 3, P, P] -> flax [P, P, 3, D]
    put(model.patch_embed.kernel, np.transpose(state_dict["patch_embed.proj.weight"], (2, 3, 1, 0)))
    put(model.patch_embed.bias, state_dict["patch_embed.proj.bias"])
    put(model.cls_token, state_dict["cls_token"])
    if model.register_tokens is not None and "register_tokens" in state_dict:
        put(model.register_tokens, state_dict["register_tokens"])
    pos = state_dict["pos_embed"]
    if target_grid is not None:
        pos = resample_abs_pos_embed(pos, target_grid)
    put(model.pos_embed, pos)
    for i, block in enumerate(model.blocks):
        pre = f"blocks.{i}."
        put(block.norm1.scale, state_dict[pre + "norm1.weight"])
        put(block.norm1.bias, state_dict[pre + "norm1.bias"])
        put(block.attn.qkv.kernel, state_dict[pre + "attn.qkv.weight"].T)
        put(block.attn.qkv.bias, state_dict[pre + "attn.qkv.bias"])
        put(block.attn.proj.kernel, state_dict[pre + "attn.proj.weight"].T)
        put(block.attn.proj.bias, state_dict[pre + "attn.proj.bias"])
        put(block.norm2.scale, state_dict[pre + "norm2.weight"])
        put(block.norm2.bias, state_dict[pre + "norm2.bias"])
        put(block.fc1.kernel, state_dict[pre + "mlp.fc1.weight"].T)
        put(block.fc1.bias, state_dict[pre + "mlp.fc1.bias"])
        put(block.fc2.kernel, state_dict[pre + "mlp.fc2.weight"].T)
        put(block.fc2.bias, state_dict[pre + "mlp.fc2.bias"])
        if block.ls1 is not None and pre + "ls1.gamma" in state_dict:
            put(block.ls1, state_dict[pre + "ls1.gamma"])
            put(block.ls2, state_dict[pre + "ls2.gamma"])
    if "norm.weight" in state_dict and model.norm.use_scale:
        put(model.norm.scale, state_dict["norm.weight"])
        put(model.norm.bias, state_dict["norm.bias"])
