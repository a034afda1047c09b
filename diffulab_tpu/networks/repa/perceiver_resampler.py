"""Perceiver resampler (Flamingo lineage).

TPU redesign of reference src/diffulab/networks/repa/perceiver_resampler.py:14-252:
learned latent tokens cross-attend the input sequence (keys get 2-axis N-D
RoPE; queries/latent-keys do not), augmented with latent self-attention keys,
followed by a GELU feed-forward — ``depth`` times, then a final LayerNorm.
Attention uses explicit fp32 softmax matching the reference's manual path
(:163-167); sequences here are tiny (num_latents x N), so no flash kernel.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from diffulab_tpu.networks.nn import get_cos_sin_ndim_grid


def _apply_rope_keys(k: jax.Array, cos: jax.Array, sin: jax.Array, rotary_dim: int) -> jax.Array:
    """Interleaved N-D RoPE on keys only, [B, N, H, D]."""
    k_rope, k_pass = k[..., :rotary_dim], k[..., rotary_dim:]
    c = cos[None, :, None, :].astype(k.dtype)
    s = sin[None, :, None, :].astype(k.dtype)
    k_even = k_rope[..., 0::2]
    k_odd = k_rope[..., 1::2]
    rot_even = k_even * c - k_odd * s
    rot_odd = k_even * s + k_odd * c
    k_rot = jnp.stack([rot_even, rot_odd], axis=-1).reshape(k_rope.shape)
    return jnp.concatenate([k_rot, k_pass], axis=-1)


class PerceiverAttention(nnx.Module):
    """Latents query [inputs(+RoPE'd keys); latents] (reference :107-177)."""

    def __init__(self, dim: int, axes_dim: Sequence[int], head_dim: int = 64, num_heads: int = 8,
                 *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32):
        self.scale = head_dim**-0.5
        self.num_heads = num_heads
        self.head_dim = head_dim
        self.rotary_dim = int(sum(axes_dim))
        inner = head_dim * num_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm_x = nnx.LayerNorm(dim, **kw)
        self.norm_latents = nnx.LayerNorm(dim, **kw)
        self.to_q = nnx.Linear(dim, inner, use_bias=False, **kw)
        self.to_kv = nnx.Linear(dim, inner * 2, use_bias=False, **kw)
        self.to_out = nnx.Linear(inner, dim, use_bias=False, **kw)

    def __call__(self, x: jax.Array, latents: jax.Array, cos_sin) -> jax.Array:
        b, n, _ = x.shape
        m = latents.shape[1]
        x = self.norm_x(x)
        latents = self.norm_latents(latents)

        q = self.to_q(latents).reshape(b, m, self.num_heads, self.head_dim)
        k_x, v_x = jnp.split(self.to_kv(x), 2, axis=-1)
        k_l, v_l = jnp.split(self.to_kv(latents), 2, axis=-1)
        k_x = k_x.reshape(b, n, self.num_heads, self.head_dim)
        v_x = v_x.reshape(b, n, self.num_heads, self.head_dim)
        k_l = k_l.reshape(b, m, self.num_heads, self.head_dim)
        v_l = v_l.reshape(b, m, self.num_heads, self.head_dim)

        cos, sin = cos_sin
        k_x = _apply_rope_keys(k_x, cos, sin, self.rotary_dim)

        k = jnp.concatenate([k_x, k_l], axis=1)  # [B, N+M, H, D]
        v = jnp.concatenate([v_x, v_l], axis=1)

        # explicit fp32 softmax (tiny sequences)
        sim = jnp.einsum("bmhd,bnhd->bhmn", q * self.scale, k).astype(jnp.float32)
        sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhmn,bnhd->bmhd", attn, v)
        return self.to_out(out.reshape(b, m, -1))


class PerceiverFeedForward(nnx.Module):
    """LayerNorm -> Linear -> GELU -> Linear (reference :72-89)."""

    def __init__(self, dim: int, mult: float = 4, *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32):
        inner = int(dim * mult)
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm = nnx.LayerNorm(dim, **kw)
        self.fc1 = nnx.Linear(dim, inner, use_bias=False, **kw)
        self.fc2 = nnx.Linear(inner, dim, use_bias=False, **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.fc2(jax.nn.gelu(self.fc1(self.norm(x))))


class PerceiverResampler(nnx.Module):
    """Fixed-size latent summary of a token sequence (reference :180-252)."""

    def __init__(
        self,
        dim: int,
        depth: int,
        rope_axes_dim: Sequence[int] | None = None,
        head_dim: int = 64,
        num_heads: int = 8,
        ff_mult: int = 4,
        num_latents: int = 16,
        rope_base: int = 10_000,
        *,
        rngs: nnx.Rngs,
        dtype=None,
        param_dtype=jnp.float32,
    ):
        self.rope_base = rope_base
        if rope_axes_dim is None:
            d2 = head_dim // 2
            d2 -= d2 % 2
            rope_axes_dim = [d2, d2]  # (H, W)
        self.rope_axes_dim = list(rope_axes_dim)
        self.latents = nnx.Param(
            jax.random.normal(rngs.params(), (num_latents, dim), dtype=param_dtype)
        )
        kw = dict(rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        self.attn_layers = nnx.List(
            [PerceiverAttention(dim, self.rope_axes_dim, head_dim, num_heads, **kw) for _ in range(depth)]
        )
        self.ff_layers = nnx.List(
            [PerceiverFeedForward(dim, ff_mult, **kw) for _ in range(depth)]
        )
        self.norm = nnx.LayerNorm(dim, **kw)

    def __call__(self, x: jax.Array, cos_sin=None) -> jax.Array:
        if cos_sin is None:
            side = int(x.shape[1] ** 0.5)
            hh, ww = jnp.meshgrid(jnp.arange(side), jnp.arange(side), indexing="ij")
            pos = jnp.stack([hh.reshape(-1), ww.reshape(-1)], axis=-1)  # [N, 2]
            cos_sin = get_cos_sin_ndim_grid(pos, self.rope_base, self.rope_axes_dim)
        latents = jnp.broadcast_to(
            self.latents[...].astype(x.dtype)[None], (x.shape[0], *self.latents.shape)
        )
        for attn, ff in zip(self.attn_layers, self.ff_layers):
            latents = attn(x, latents, cos_sin) + latents
            latents = ff(latents) + latents
        return self.norm(latents)
