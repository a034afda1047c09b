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


# --------------------------------------------------------------------------- #
# DINOv3 (HF transformers DINOv3ViTModel architecture)
# --------------------------------------------------------------------------- #


def dinov3_rope_cos_sin(num_patches_h: int, num_patches_w: int, head_dim: int,
                        theta: float = 100.0) -> tuple[jax.Array, jax.Array]:
    """RoPE tables over normalized patch-center coordinates
    (transformers modeling_dinov3_vit.DINOv3ViTRopePositionEmbedding +
    get_patches_center_coordinates, eval-mode: no coordinate augmentation).

    Returns (cos, sin) of shape [num_patches_h * num_patches_w, head_dim].
    """
    inv_freq = 1.0 / theta ** np.arange(0, 1, 4 / head_dim, dtype=np.float64)  # (hd/4,)
    ch = (np.arange(0.5, num_patches_h, dtype=np.float64) / num_patches_h) * 2.0 - 1.0
    cw = (np.arange(0.5, num_patches_w, dtype=np.float64) / num_patches_w) * 2.0 - 1.0
    hh, ww = np.meshgrid(ch, cw, indexing="ij")
    coords = np.stack([hh.reshape(-1), ww.reshape(-1)], axis=-1)  # (N, 2): (y, x)
    angles = 2.0 * np.pi * coords[:, :, None] * inv_freq[None, None, :]  # (N, 2, hd/4)
    angles = angles.reshape(angles.shape[0], -1)  # (N, hd/2)
    angles = np.tile(angles, (1, 2))  # (N, hd)
    return jnp.asarray(np.cos(angles), jnp.float32), jnp.asarray(np.sin(angles), jnp.float32)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


class Dinov3Attention(nnx.Module):
    """Separate q/k/v projections with per-projection bias flags; RoPE applied
    to patch tokens only (prefix cls+register tokens pass through unrotated)."""

    def __init__(self, dim: int, num_heads: int, *, query_bias=True, key_bias=False,
                 value_bias=True, proj_bias=True, rngs: nnx.Rngs, param_dtype=jnp.float32):
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.q_proj = nnx.Linear(dim, dim, use_bias=query_bias, **kw)
        self.k_proj = nnx.Linear(dim, dim, use_bias=key_bias, **kw)
        self.v_proj = nnx.Linear(dim, dim, use_bias=value_bias, **kw)
        self.o_proj = nnx.Linear(dim, dim, use_bias=proj_bias, **kw)

    def __call__(self, x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
        b, n, d = x.shape
        num_patches = cos.shape[0]
        n_prefix = n - num_patches
        q = self.q_proj(x).reshape(b, n, self.num_heads, self.head_dim)
        k = self.k_proj(x).reshape(b, n, self.num_heads, self.head_dim)
        v = self.v_proj(x).reshape(b, n, self.num_heads, self.head_dim)
        c = cos[None, :, None, :].astype(q.dtype)
        s = sin[None, :, None, :].astype(q.dtype)

        def rope(t):
            prefix, patches = t[:, :n_prefix], t[:, n_prefix:]
            patches = patches * c + _rotate_half(patches) * s
            return jnp.concatenate([prefix, patches], axis=1)

        out = jax.nn.dot_product_attention(rope(q), rope(k), v)
        return self.o_proj(out.reshape(b, n, d))


class Dinov3Block(nnx.Module):
    def __init__(self, dim: int, num_heads: int, intermediate: int, use_gated_mlp: bool,
                 eps: float = 1e-5, *, mlp_bias=True, query_bias=True, key_bias=False,
                 value_bias=True, proj_bias=True, rngs: nnx.Rngs, param_dtype=jnp.float32):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.use_gated_mlp = use_gated_mlp
        self.norm1 = nnx.LayerNorm(dim, epsilon=eps, **kw)
        self.attn = Dinov3Attention(dim, num_heads, query_bias=query_bias, key_bias=key_bias,
                                    value_bias=value_bias, proj_bias=proj_bias, **kw)
        self.norm2 = nnx.LayerNorm(dim, epsilon=eps, **kw)
        self.up_proj = nnx.Linear(dim, intermediate, use_bias=mlp_bias, **kw)
        self.down_proj = nnx.Linear(intermediate, dim, use_bias=mlp_bias, **kw)
        self.gate_proj = (
            nnx.Linear(dim, intermediate, use_bias=mlp_bias, **kw) if use_gated_mlp else None
        )
        self.ls1 = nnx.Param(jnp.ones((dim,), param_dtype))
        self.ls2 = nnx.Param(jnp.ones((dim,), param_dtype))

    def __call__(self, x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
        x = x + self.attn(self.norm1(x), cos, sin) * self.ls1[...].astype(x.dtype)
        h = self.norm2(x)
        if self.gate_proj is not None:
            h = self.down_proj(jax.nn.gelu(self.gate_proj(h), approximate=False) * self.up_proj(h))
        else:
            h = self.down_proj(jax.nn.gelu(self.up_proj(h), approximate=False))
        return x + h * self.ls2[...].astype(x.dtype)


class Dinov3ViTEncoder(nnx.Module):
    """HF-architecture DINOv3 ViT (transformers DINOv3ViTModel, eval mode):
    [cls; registers; patches] token order, RoPE position encoding over patch
    centers (no learned pos table — any input resolution works), LayerScale,
    plain-or-gated MLP. Returns normalized patch tokens (reference
    src/diffulab/networks/repa/dinov3.py:102-116 strips cls+registers)."""

    def __init__(
        self,
        patch_size: int = 16,
        embed_dim: int = 768,
        depth: int = 12,
        num_heads: int = 12,
        intermediate_size: int | None = None,
        num_register_tokens: int = 4,
        use_gated_mlp: bool = False,
        rope_theta: float = 100.0,
        layer_norm_eps: float = 1e-5,
        final_norm_affine: bool = True,
        query_bias: bool = True,
        key_bias: bool = False,
        value_bias: bool = True,
        proj_bias: bool = True,
        mlp_bias: bool = True,
        *,
        rngs: nnx.Rngs,
        param_dtype=jnp.float32,
    ):
        self.patch_size = patch_size
        self.embed_dim = embed_dim
        self.num_register_tokens = num_register_tokens
        self.head_dim = embed_dim // num_heads
        self.rope_theta = rope_theta
        intermediate_size = intermediate_size or 4 * embed_dim
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.patch_embed = nnx.Conv(
            3, embed_dim, (patch_size, patch_size), strides=(patch_size, patch_size),
            padding="VALID", **kw,
        )
        self.cls_token = nnx.Param(jnp.zeros((1, 1, embed_dim), param_dtype))
        self.register_tokens = (
            nnx.Param(jnp.zeros((1, num_register_tokens, embed_dim), param_dtype))
            if num_register_tokens > 0 else None
        )
        self.blocks = nnx.List([
            Dinov3Block(embed_dim, num_heads, intermediate_size, use_gated_mlp,
                        eps=layer_norm_eps, mlp_bias=mlp_bias, query_bias=query_bias,
                        key_bias=key_bias, value_bias=value_bias, proj_bias=proj_bias, **kw)
            for _ in range(depth)
        ])
        self.norm = nnx.LayerNorm(
            embed_dim, epsilon=layer_norm_eps, use_bias=final_norm_affine,
            use_scale=final_norm_affine, **kw,
        )

    def __call__(self, x: jax.Array) -> dict[str, jax.Array]:
        """x: NHWC image -> {"patch_tokens": [B, N, D], "cls": [B, D]}."""
        b, h, w, _ = x.shape
        tokens = self.patch_embed(x).reshape(b, -1, self.embed_dim)
        prefix = [jnp.broadcast_to(self.cls_token[...].astype(tokens.dtype), (b, 1, self.embed_dim))]
        if self.register_tokens is not None:
            prefix.append(jnp.broadcast_to(
                self.register_tokens[...].astype(tokens.dtype),
                (b, self.num_register_tokens, self.embed_dim),
            ))
        tokens = jnp.concatenate(prefix + [tokens], axis=1)
        cos, sin = dinov3_rope_cos_sin(
            h // self.patch_size, w // self.patch_size, self.head_dim, self.rope_theta
        )
        for block in self.blocks:
            tokens = block(tokens, cos, sin)
        tokens = self.norm(tokens)
        n_prefix = 1 + self.num_register_tokens
        return {"patch_tokens": tokens[:, n_prefix:], "cls": tokens[:, 0]}


def build_dinov3_from_config(cfg: dict, *, final_norm_affine: bool = True,
                             rngs: nnx.Rngs) -> Dinov3ViTEncoder:
    """Construct a Dinov3ViTEncoder from an HF checkpoint dir's config.json."""
    return Dinov3ViTEncoder(
        patch_size=cfg.get("patch_size", 16),
        embed_dim=cfg.get("hidden_size", 768),
        depth=cfg.get("num_hidden_layers", 12),
        num_heads=cfg.get("num_attention_heads", 12),
        intermediate_size=cfg.get("intermediate_size"),
        num_register_tokens=cfg.get("num_register_tokens", 0),
        use_gated_mlp=cfg.get("use_gated_mlp", False),
        rope_theta=cfg.get("rope_theta", 100.0),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
        final_norm_affine=final_norm_affine,
        query_bias=cfg.get("query_bias", True),
        key_bias=cfg.get("key_bias", False),
        value_bias=cfg.get("value_bias", True),
        proj_bias=cfg.get("proj_bias", True),
        mlp_bias=cfg.get("mlp_bias", True),
        rngs=rngs,
    )


def load_dinov3_state_dict(model: Dinov3ViTEncoder, state_dict: dict[str, np.ndarray]) -> None:
    """Port an HF DINOv3ViTModel state dict (numpy arrays) into a
    Dinov3ViTEncoder. Key layout per transformers modeling_dinov3_vit:
    embeddings.{cls_token,register_tokens,patch_embeddings.*}, layer.{i}.*,
    norm.* (the `mask_token` is pre-training-only and ignored)."""

    def put(param, value):
        value = np.asarray(value)
        assert param.shape == value.shape, f"{param.shape} vs {value.shape}"
        param[...] = jnp.asarray(value, dtype=param[...].dtype)

    def put_linear(lin, prefix):
        put(lin.kernel, state_dict[prefix + ".weight"].T)
        if lin.bias is not None and prefix + ".bias" in state_dict:
            put(lin.bias, state_dict[prefix + ".bias"])

    put(model.patch_embed.kernel,
        np.transpose(state_dict["embeddings.patch_embeddings.weight"], (2, 3, 1, 0)))
    put(model.patch_embed.bias, state_dict["embeddings.patch_embeddings.bias"])
    put(model.cls_token, state_dict["embeddings.cls_token"])
    if model.register_tokens is not None:
        put(model.register_tokens, state_dict["embeddings.register_tokens"])
    for i, block in enumerate(model.blocks):
        pre = f"layer.{i}."
        put(block.norm1.scale, state_dict[pre + "norm1.weight"])
        put(block.norm1.bias, state_dict[pre + "norm1.bias"])
        put_linear(block.attn.q_proj, pre + "attention.q_proj")
        put_linear(block.attn.k_proj, pre + "attention.k_proj")
        put_linear(block.attn.v_proj, pre + "attention.v_proj")
        put_linear(block.attn.o_proj, pre + "attention.o_proj")
        put(block.ls1, state_dict[pre + "layer_scale1.lambda1"])
        put(block.ls2, state_dict[pre + "layer_scale2.lambda1"])
        put(block.norm2.scale, state_dict[pre + "norm2.weight"])
        put(block.norm2.bias, state_dict[pre + "norm2.bias"])
        put_linear(block.up_proj, pre + "mlp.up_proj")
        put_linear(block.down_proj, pre + "mlp.down_proj")
        if block.gate_proj is not None:
            put_linear(block.gate_proj, pre + "mlp.gate_proj")
    if model.norm.use_scale:
        put(model.norm.scale, state_dict["norm.weight"])
        put(model.norm.bias, state_dict["norm.bias"])


def load_hf_checkpoint_dir(path) -> tuple[dict, dict[str, np.ndarray]]:
    """Read (config.json, merged numpy state dict) from an HF checkpoint
    directory holding safetensors shards — no torch required."""
    import json
    from pathlib import Path

    path = Path(path)
    cfg = json.loads((path / "config.json").read_text())
    state: dict[str, np.ndarray] = {}
    shards = sorted(path.glob("*.safetensors"))
    assert shards, f"no .safetensors files under {path}"
    for shard in shards:
        try:
            from safetensors.numpy import load_file

            state.update(load_file(str(shard)))
        except Exception:
            # bf16 shards have no numpy dtype; round-trip through torch
            from safetensors.torch import load_file as load_torch

            state.update({k: v.float().numpy() for k, v in load_torch(str(shard)).items()})
    return cfg, state
