"""DiT / MMDiT denoiser family (SD3-style, https://arxiv.org/pdf/2403.03206).

TPU-first redesign of reference src/diffulab/networks/denoisers/mmdit.py:29-928:

- NHWC patchify (stride-P conv) -> token stream [B, S, C]; unpatchify back;
- adaLN(-zero) modulated blocks: ``DiTBlock`` (single stream),
  ``MMDiTBlock`` (dual stream with concat attention over [context; image]),
  ``MMDiTSingleStreamBlock`` (Flux-style fused single-stream, 3-param
  modulation);
- attention runs through diffulab_tpu.ops.dot_product_attention (Pallas flash
  on TPU, XLA fallback), with the context attn-mask extended by ones over
  image tokens (reference mmdit.py:192-200);
- N-D RoPE position ids: text (l, 0, 0) / image (0, h, w) in multimodal mode,
  (h, w) in simple-DiT mode (reference mmdit.py:813-836, 870-886);
- pooled context fused into the timestep embedding via an MLP when the
  embedder returns 2 outputs (reference mmdit.py:800-806);
- ``use_checkpoint`` maps to ``nnx.remat`` over each block;
- xavier-uniform linears/convs, zero-init modulations (adaLN-zero,
  reference mmdit.py:737-745);
- weight matrices carry logical-axis sharding metadata ("embed"/"hidden") so
  a tensor-parallel mesh axis can shard qkv/mlp columns and proj rows without
  touching model code (see diffulab_tpu.parallel.sharding).

Feature capture for REPA returns post-block token streams at selected layer
indices instead of the reference's forward hooks (losses/repa.py:119-135).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from diffulab_tpu.networks.denoisers.common import Denoiser, ModelOutput
from diffulab_tpu.networks.embedders.common import ContextEmbedder
from diffulab_tpu.networks.nn import (
    LabelEmbed,
    Modulation,
    QKNorm,
    accum_dtype_kwargs,
    apply_rope_ndim_planar,
    get_cos_sin_ndim_grid,
    modulate,
    packed_swiglu,
    stable_conditioning_scope,
    stable_dtype,
    timestep_embedding,
)
from diffulab_tpu.ops import dot_product_attention
from diffulab_tpu.ops.ring_attention import sequence_parallel_attention
from diffulab_tpu.parallel.moe import ExpertMlp, expert_parallel_mlp, moe_mlp_local

Initializer = nnx.initializers.Initializer


def _xavier(sharding: tuple[str | None, ...] | None = None) -> Initializer:
    init = nnx.initializers.xavier_uniform()
    if sharding is not None:
        init = nnx.with_partitioning(init, sharding)
    return init


def _linear(
    din: int, dout: int, *, rngs: nnx.Rngs, use_bias: bool = True,
    sharding: tuple[str | None, ...] | None = None, dtype=None, param_dtype=jnp.float32,
) -> nnx.Linear:
    return nnx.Linear(
        din, dout, use_bias=use_bias,
        kernel_init=_xavier(sharding), bias_init=nnx.initializers.zeros_init(),
        dtype=dtype, param_dtype=param_dtype, rngs=rngs,
        **accum_dtype_kwargs(dtype),
    )


class LayerNormFP32(nnx.Module):
    """LayerNorm computed in fp32 (torch autocast promotes LN to fp32)."""

    def __init__(self, dim: int, use_affine: bool = True, eps: float = 1e-5, *,
                 rngs: nnx.Rngs, param_dtype=jnp.float32):
        self.norm = nnx.LayerNorm(
            dim, epsilon=eps, use_bias=use_affine, use_scale=use_affine,
            dtype=jnp.float32, param_dtype=param_dtype, rngs=rngs,
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.norm(x.astype(jnp.float32)).astype(x.dtype)


class SwiGLUMlp(nnx.Module):
    """Packed SwiGLU MLP: Linear(d, 2*r*d) -> SwiGLU -> Linear(r*d, d), no bias
    (reference mmdit.py:260-264)."""

    def __init__(self, dim: int, mlp_ratio: int, *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32):
        self.fc_in = _linear(dim, mlp_ratio * dim * 2, use_bias=False,
                             sharding=("embed", "hidden"), rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        self.fc_out = _linear(mlp_ratio * dim, dim, use_bias=False,
                              sharding=("hidden", "embed"), rngs=rngs, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.fc_out(packed_swiglu(self.fc_in(x)))


class MoEMlp(nnx.Module):
    """Switch-routed mixture-of-experts MLP block variant (beyond reference
    scope; parallel/moe.py). Runs expert-parallel over the mesh's 'expert'
    axis once a mesh is injected (``MMDiT.set_parallel_mesh``), dense
    otherwise. The router's switch load-balance loss is sown as an
    nnx.Intermediate ('moe_load_balance') for callers that want to add it to
    the objective."""

    def __init__(self, dim: int, mlp_ratio: int, n_experts: int, capacity_factor: float,
                 *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32):
        self.experts = ExpertMlp(n_experts, dim, mlp_ratio * dim,
                                 rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        self.capacity_factor = capacity_factor
        self.mesh = None  # static; injected by set_parallel_mesh

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.mesh is not None and self.mesh.shape.get("expert", 1) > 1:
            y, aux = expert_parallel_mlp(
                self.experts, x, mesh=self.mesh, axis="expert",
                capacity_factor=self.capacity_factor, batch_axes=("data", "fsdp"),
            )
        else:
            y, aux = moe_mlp_local(self.experts, x, self.capacity_factor)
        self.sow(nnx.Intermediate, "moe_load_balance", aux["load_balance_loss"])
        return y


class DiTAttention(nnx.Module):
    """Self-attention with QKNorm + N-D RoPE (reference mmdit.py:29-104)."""

    def __init__(self, inner_dim: int, num_heads: int, rope_axes_dim: Sequence[int],
                 *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32,
                 attention_impl: str = "auto"):
        self.num_heads = num_heads
        self.head_dim = inner_dim // num_heads
        self.scale = self.head_dim**-0.5
        self.rotary_dim = int(sum(rope_axes_dim))
        self.attention_impl = attention_impl
        self.mesh = None  # static; injected by set_parallel_mesh for 'ring'
        # the Pallas kernels want half inputs (fp32 would leave the MXU fast
        # path and double VMEM); they accumulate fp32 internally
        self.kernel_dtype = dtype
        self.qkv = _linear(inner_dim, 3 * inner_dim, use_bias=False,
                           sharding=("embed", "hidden"), rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        self.qk_norm = QKNorm(inner_dim, rngs=rngs, param_dtype=param_dtype)
        self.proj_out = _linear(inner_dim, inner_dim, use_bias=False,
                                sharding=("hidden", "embed"), rngs=rngs, dtype=dtype, param_dtype=param_dtype)

    def _attend(self, q, k, v, attn_mask):
        if self.attention_impl == "ring" and self.mesh is not None:
            ring = sequence_parallel_attention(self.mesh, axis="sp",
                                               batch_axis=("data", "fsdp"))
            return ring(q, k, v, kv_mask=attn_mask, scale=self.scale)
        impl = "auto" if self.attention_impl == "ring" else self.attention_impl
        return dot_product_attention(q, k, v, kv_mask=attn_mask, scale=self.scale, impl=impl)

    def __call__(self, x: jax.Array, cos_sin_rope, attn_mask: jax.Array | None = None) -> jax.Array:
        b, s, _ = x.shape
        q, k, v = jnp.split(self.qkv(x), 3, axis=-1)
        q, k = self.qk_norm(q, k, v)
        q = q.reshape(b, s, self.num_heads, self.head_dim)
        k = k.reshape(b, s, self.num_heads, self.head_dim)
        v = v.reshape(b, s, self.num_heads, self.head_dim)
        cos, sin = cos_sin_rope
        # planar (rotate-half) pairing: copy-free on TPU and score-equivalent
        # to the reference's interleaved convention under a fixed q/k channel
        # permutation (nn.rope_planar_perm); for a from-scratch model the two
        # are the same distribution (see docs/rope_layout.md)
        q, k = apply_rope_ndim_planar(q, k, cos, sin, self.rotary_dim)
        if self.kernel_dtype is not None:
            q, k, v = (t.astype(self.kernel_dtype) for t in (q, k, v))
        out = self._attend(q, k, v, attn_mask)
        return self.proj_out(out.reshape(b, s, -1))


class MMDiTAttention(nnx.Module):
    """Dual-stream concat attention (reference mmdit.py:107-210).

    Context and image streams have separate qkv/qknorm/out projections; q/k/v
    are concatenated [context; input] along the sequence, RoPE'd with the
    3-axis grid, attended jointly, then split back.
    """

    def __init__(self, inner_dim: int, num_heads: int, rope_axes_dim: Sequence[int],
                 *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32,
                 attention_impl: str = "auto"):
        self.num_heads = num_heads
        self.head_dim = inner_dim // num_heads
        self.scale = self.head_dim**-0.5
        self.rotary_dim = int(sum(rope_axes_dim))
        self.attention_impl = attention_impl
        self.mesh = None
        self.kernel_dtype = dtype
        kw = dict(rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        self.qkv_input = _linear(inner_dim, 3 * inner_dim, use_bias=False, sharding=("embed", "hidden"), **kw)
        self.qkv_context = _linear(inner_dim, 3 * inner_dim, use_bias=False, sharding=("embed", "hidden"), **kw)
        self.qk_norm_input = QKNorm(inner_dim, rngs=rngs, param_dtype=param_dtype)
        self.qk_norm_context = QKNorm(inner_dim, rngs=rngs, param_dtype=param_dtype)
        self.input_proj_out = _linear(inner_dim, inner_dim, use_bias=False, sharding=("hidden", "embed"), **kw)
        self.context_proj_out = _linear(inner_dim, inner_dim, use_bias=False, sharding=("hidden", "embed"), **kw)

    def __call__(
        self, x: jax.Array, context: jax.Array, cos_sin_rope,
        attn_mask: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        b, s_img, _ = x.shape
        s_ctx = context.shape[1]
        iq, ik, iv = jnp.split(self.qkv_input(x), 3, axis=-1)
        cq, ck, cv = jnp.split(self.qkv_context(context), 3, axis=-1)
        iq, ik = self.qk_norm_input(iq, ik, iv)
        cq, ck = self.qk_norm_context(cq, ck, cv)

        def heads(t):
            return t.reshape(b, t.shape[1], self.num_heads, self.head_dim)

        q = heads(jnp.concatenate([cq, iq], axis=1))
        k = heads(jnp.concatenate([ck, ik], axis=1))
        v = heads(jnp.concatenate([cv, iv], axis=1))
        cos, sin = cos_sin_rope
        q, k = apply_rope_ndim_planar(q, k, cos, sin, self.rotary_dim)
        if self.kernel_dtype is not None:
            q, k, v = (t.astype(self.kernel_dtype) for t in (q, k, v))

        kv_mask = None
        if attn_mask is not None:
            kv_mask = jnp.concatenate(
                [attn_mask.astype(bool), jnp.ones((b, s_img), dtype=bool)], axis=1
            )
        if self.attention_impl == "ring" and self.mesh is not None:
            ring = sequence_parallel_attention(self.mesh, axis="sp",
                                               batch_axis=("data", "fsdp"))
            out = ring(q, k, v, kv_mask=kv_mask, scale=self.scale)
        else:
            impl = "auto" if self.attention_impl == "ring" else self.attention_impl
            out = dot_product_attention(q, k, v, kv_mask=kv_mask, scale=self.scale, impl=impl)
        out = out.reshape(b, s_ctx + s_img, -1)
        return self.input_proj_out(out[:, s_ctx:]), self.context_proj_out(out[:, :s_ctx])


class DiTBlock(nnx.Module):
    """adaLN-zero DiT block: 6-param modulation around attention + SwiGLU MLP
    (reference mmdit.py:213-309)."""

    def __init__(self, inner_dim: int, embedding_dim: int, num_heads: int, mlp_ratio: int,
                 rope_axes_dim: Sequence[int], *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32,
                 attention_impl: str = "auto", mlp_type: str = "swiglu",
                 n_experts: int = 8, capacity_factor: float = 2.0,
                 attention_dtype=None, mlp_dtype=None):
        # per-component precision overrides (mixed-precision bisection /
        # tuning): default to the block's compute dtype
        attention_dtype = attention_dtype if attention_dtype is not None else dtype
        mlp_dtype = mlp_dtype if mlp_dtype is not None else dtype
        self.modulation = Modulation(embedding_dim, inner_dim, rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        self.norm_1 = LayerNormFP32(inner_dim, rngs=rngs, param_dtype=param_dtype)
        self.attention = DiTAttention(inner_dim, num_heads, rope_axes_dim, rngs=rngs, dtype=attention_dtype,
                                      param_dtype=param_dtype, attention_impl=attention_impl)
        self.norm_2 = LayerNormFP32(inner_dim, rngs=rngs, param_dtype=param_dtype)
        if mlp_type == "moe":
            self.mlp_input = MoEMlp(inner_dim, mlp_ratio, n_experts, capacity_factor,
                                    rngs=rngs, dtype=mlp_dtype, param_dtype=param_dtype)
        else:
            assert mlp_type == "swiglu", f"unknown mlp_type {mlp_type!r}"
            self.mlp_input = SwiGLUMlp(inner_dim, mlp_ratio, rngs=rngs, dtype=mlp_dtype, param_dtype=param_dtype)

    def __call__(self, x: jax.Array, y: jax.Array, cos_sin_rope, attn_mask=None) -> jax.Array:
        mod = self.modulation(y)
        x = x + self.attention(
            modulate(self.norm_1(x), scale=mod.alpha, shift=mod.beta),
            cos_sin_rope=cos_sin_rope, attn_mask=attn_mask,
        ) * mod.gamma
        x = x + self.mlp_input(modulate(self.norm_2(x), scale=mod.delta, shift=mod.epsilon)) * mod.zeta
        return x


class MMDiTBlock(nnx.Module):
    """Dual-stream MMDiT block with per-stream modulation/norm/MLP
    (reference mmdit.py:312-459)."""

    def __init__(self, inner_dim: int, embedding_dim: int, num_heads: int, mlp_ratio: int,
                 rope_axes_dim: Sequence[int], *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32,
                 attention_impl: str = "auto", attention_dtype=None, mlp_dtype=None, **_unused):
        kw = dict(rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        # per-component precision overrides (BASELINE.md bf16 bisection knobs)
        attention_dtype = attention_dtype if attention_dtype is not None else dtype
        mlp_dtype = mlp_dtype if mlp_dtype is not None else dtype
        self.modulation_context = Modulation(embedding_dim, inner_dim, **kw)
        self.modulation_input = Modulation(embedding_dim, inner_dim, **kw)
        self.context_norm_1 = LayerNormFP32(inner_dim, rngs=rngs, param_dtype=param_dtype)
        self.input_norm_1 = LayerNormFP32(inner_dim, rngs=rngs, param_dtype=param_dtype)
        self.attention = MMDiTAttention(inner_dim, num_heads, rope_axes_dim,
                                        attention_impl=attention_impl, rngs=rngs,
                                        dtype=attention_dtype, param_dtype=param_dtype)
        self.context_norm_2 = LayerNormFP32(inner_dim, rngs=rngs, param_dtype=param_dtype)
        self.input_norm_2 = LayerNormFP32(inner_dim, rngs=rngs, param_dtype=param_dtype)
        self.mlp_context = SwiGLUMlp(inner_dim, mlp_ratio, rngs=rngs, dtype=mlp_dtype, param_dtype=param_dtype)
        self.mlp_input = SwiGLUMlp(inner_dim, mlp_ratio, rngs=rngs, dtype=mlp_dtype, param_dtype=param_dtype)

    def __call__(self, x, y, context, cos_sin_rope, attn_mask=None):
        mod_i = self.modulation_input(y)
        mod_c = self.modulation_context(y)

        mi = modulate(self.input_norm_1(x), scale=mod_i.alpha, shift=mod_i.beta)
        mc = modulate(self.context_norm_1(context), scale=mod_c.alpha, shift=mod_c.beta)
        mi, mc = self.attention(mi, mc, cos_sin_rope=cos_sin_rope, attn_mask=attn_mask)
        x = x + mi * mod_i.gamma
        context = context + mc * mod_c.gamma

        x = x + self.mlp_input(modulate(self.input_norm_2(x), scale=mod_i.delta, shift=mod_i.epsilon)) * mod_i.zeta
        context = context + self.mlp_context(
            modulate(self.context_norm_2(context), scale=mod_c.delta, shift=mod_c.epsilon)
        ) * mod_c.zeta
        return x, context


class MMDiTSingleStreamBlock(nnx.Module):
    """Flux-style fused single-stream block: 3-param modulation, parallel
    attention + MLP on the concatenated [context; input] stream
    (reference mmdit.py:462-532)."""

    def __init__(self, inner_dim: int, embedding_dim: int, num_heads: int, mlp_ratio: int,
                 rope_axes_dim: Sequence[int], *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32,
                 attention_impl: str = "auto", attention_dtype=None, mlp_dtype=None, **_unused):
        kw = dict(rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        # per-component precision overrides (BASELINE.md bf16 bisection knobs)
        attention_dtype = attention_dtype if attention_dtype is not None else dtype
        mlp_dtype = mlp_dtype if mlp_dtype is not None else dtype
        self.mlp = SwiGLUMlp(inner_dim, mlp_ratio, rngs=rngs, dtype=mlp_dtype, param_dtype=param_dtype)
        self.attention = DiTAttention(inner_dim, num_heads, rope_axes_dim,
                                      attention_impl=attention_impl, rngs=rngs,
                                      dtype=attention_dtype, param_dtype=param_dtype)
        self.modulation = Modulation(embedding_dim, inner_dim, n_chunks=3, **kw)
        self.norm = LayerNormFP32(inner_dim, rngs=rngs, param_dtype=param_dtype)

    def __call__(self, x, y, context, cos_sin_rope, attn_mask=None):
        b = x.shape[0]
        s_ctx = context.shape[1]
        latents = jnp.concatenate([context, x], axis=1)
        kv_mask = None
        if attn_mask is not None:
            kv_mask = jnp.concatenate(
                [attn_mask.astype(bool), jnp.ones((b, x.shape[1]), dtype=bool)], axis=1
            )
        alpha, beta, gamma = self.modulation(y)
        modulated = modulate(self.norm(latents), scale=alpha, shift=beta)
        latents = latents + (
            self.attention(modulated, cos_sin_rope=cos_sin_rope, attn_mask=kv_mask)
            + self.mlp(modulated)
        ) * gamma
        return latents[:, s_ctx:], latents[:, :s_ctx]


class ModulatedLastLayer(nnx.Module):
    """adaLN-zero final projection to patch*patch*C_out (reference mmdit.py:535-549)."""

    def __init__(self, embedding_dim: int, hidden_size: int, patch_size: int, out_channels: int,
                 *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32):
        # final projection + its modulation stay fp32 under mixed precision
        # (tiny matmul; the output feeds the fp32 loss/sampler math directly)
        dtype = stable_dtype(dtype)
        self.norm_final = LayerNormFP32(hidden_size, use_affine=False, eps=1e-6, rngs=rngs, param_dtype=param_dtype)
        self.linear = _linear(hidden_size, patch_size * patch_size * out_channels,
                              rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        self.adaLN_modulation = Modulation(embedding_dim, hidden_size, n_chunks=2,
                                           rngs=rngs, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, x: jax.Array, vec: jax.Array) -> jax.Array:
        alpha, beta = self.adaLN_modulation(vec)
        x = modulate(self.norm_final(x), scale=alpha, shift=beta)
        return self.linear(x)


class TimeEmbedMlp(nnx.Module):
    """Linear -> SiLU -> Linear time-embedding MLP (reference mmdit.py:691-695)."""

    def __init__(self, in_dim: int, dim: int, *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32):
        dtype = stable_dtype(dtype)  # per-sample conditioning path stays fp32
        self.fc1 = _linear(in_dim, dim, rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        self.fc2 = _linear(dim, dim, rngs=rngs, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.fc2(jax.nn.silu(self.fc1(x)))


class PooledContextMlp(nnx.Module):
    """Linear -> SiLU -> Linear pooled-context MLP (reference mmdit.py:653-657)."""

    def __init__(self, in_dim: int, dim: int, *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32):
        dtype = stable_dtype(dtype)  # per-sample conditioning path stays fp32
        self.fc1 = _linear(in_dim, dim * 2, rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        self.fc2 = _linear(dim * 2, dim, rngs=rngs, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.fc2(jax.nn.silu(self.fc1(x)))


def _block_remat(layer, *args):
    return layer(*args)


_block_remat_ckpt = nnx.remat(_block_remat)


class MMDiT(Denoiser):
    """DiT/MMDiT top-level model (reference mmdit.py:552-928).

    simple_dit=True  -> class-conditional single-stream DiT (2-axis RoPE).
    simple_dit=False -> multimodal MMDiT over [context; image] (3-axis RoPE),
    with ``n_single_stream_blocks`` trailing Flux-style fused blocks.
    """

    def __init__(
        self,
        simple_dit: bool = False,
        input_channels: int = 3,
        output_channels: int | None = None,
        inner_dim: int = 4096,
        embedding_dim: int = 4096,
        num_heads: int = 16,
        mlp_ratio: int = 4,
        patch_size: int = 16,
        depth: int = 38,
        n_single_stream_blocks: int = 0,
        rope_base: int = 10_000,
        partial_rotary_factor: float = 1.0,
        rope_axes_dim: Sequence[int] | None = None,
        frequency_embedding: int = 256,
        n_classes: int | None = None,
        classifier_free: bool = False,
        context_embedder: ContextEmbedder | None = None,
        use_checkpoint: bool = False,
        feature_layers: Sequence[int] = (),
        attention_impl: str = "auto",
        mlp_type: str = "swiglu",
        n_experts: int = 8,
        capacity_factor: float = 2.0,
        pipeline_microbatches: int | None = None,
        augment_dim: int = 0,
        stable_conditioning: bool = True,
        attention_dtype: Any = None,
        mlp_dtype: Any = None,
        stream_dtype: Any = None,
        *,
        rngs: nnx.Rngs,
        dtype=None,
        param_dtype=jnp.float32,
    ):
        # per-component precision overrides for mixed-precision tuning /
        # bisection ("float32" string accepted from YAML configs)
        attention_dtype = jnp.dtype(attention_dtype) if isinstance(attention_dtype, str) else attention_dtype
        mlp_dtype = jnp.dtype(mlp_dtype) if isinstance(mlp_dtype, str) else mlp_dtype
        stream_dtype = jnp.dtype(stream_dtype) if isinstance(stream_dtype, str) else stream_dtype
        assert not (n_classes is not None and context_embedder is not None), (
            "n_classes and context_embedder cannot both be specified"
        )
        self.simple_dit = simple_dit
        self.patch_size = patch_size
        self.input_channels = input_channels
        self.output_channels = output_channels or input_channels
        self.context_embedder = context_embedder
        self.frequency_embedding = frequency_embedding
        self.rope_base = rope_base
        self.n_classes = n_classes
        self.classifier_free = classifier_free
        self.use_checkpoint = use_checkpoint
        self.feature_layers = tuple(feature_layers)
        self.inner_dim = inner_dim
        self.attention_impl = attention_impl
        # GPipe-over-ppermute staging of the homogeneous DiT block stack over
        # the mesh's 'pipe' axis (parallel/pipeline.py); None = sequential.
        assert pipeline_microbatches is None or simple_dit, (
            "pipeline_microbatches requires simple_dit=True (the dual/"
            "single-stream MMDiT stack is heterogeneous and runs sequentially)"
        )
        self.pipeline_microbatches = pipeline_microbatches
        self.mesh = None  # static; injected by set_parallel_mesh
        # sampling-time block caching (Delta-DiT-style, arXiv:2406.01125):
        # static (lo, hi) span of blocks whose combined residual delta is
        # cached across denoise steps; None = off. Set via
        # Diffuser.set_block_cache -> set_block_cache_span.
        self.cache_span: tuple[int, int] | None = None
        # Every stable_dtype call below (stream default, patchify conv,
        # time/label embed, modulation, final proj) resolves under this
        # scope; stable_conditioning=False is the measured round-2-style
        # whole-model cast (BASELINE.md round 4: +6.5% step throughput).
        with stable_conditioning_scope(stable_conditioning):
            # mixed precision: the residual token stream is carried at fp32 (None
            # when dtype is already full precision); each block's matmuls cast
            # their inputs down to `dtype`, and the branch output promotes back at
            # the residual add — bf16 MXU throughput with fp32 accumulation, the
            # torch-autocast semantics the reference trains under. Overridable
            # (stream_dtype="bfloat16") to carry the stream at the compute dtype —
            # the fp32 stream's HBM cost vs its quality contribution is measured
            # separately from the conditioning path (BASELINE.md round 3).
            self.stream_dtype = stream_dtype if stream_dtype is not None else stable_dtype(dtype)

            kw = dict(rngs=rngs, dtype=dtype, param_dtype=param_dtype)
            heads_dim = inner_dim // num_heads
            # (nnx pytree attributes are data/static-typed at first assignment, so
            # each optional submodule is assigned exactly once)
            pooled = False
            mlp_pooled: PooledContextMlp | None = None
            label_embed: LabelEmbed | None = None
            context_embed: nnx.Linear | None = None
            if not simple_dit:
                assert context_embedder is not None, "for MMDiT a context embedder must be provided"
                if context_embedder.n_output == 2:
                    pooled = True
                    mlp_pooled = PooledContextMlp(context_embedder.output_size[0], embedding_dim, **kw)
                    context_embed = _linear(context_embedder.output_size[1], inner_dim, use_bias=False, **kw)
                else:
                    assert context_embedder.n_output == 1
                    context_embed = _linear(context_embedder.output_size[0], inner_dim, use_bias=False, **kw)
                if rope_axes_dim is None:
                    d3 = int((partial_rotary_factor * heads_dim) // 3)
                    d3 -= d3 % 2  # each axis dim must be even
                    rope_axes_dim = [d3, d3, d3]  # (L text, H, W)
            else:
                if n_classes is not None:
                    label_embed = LabelEmbed(n_classes, embedding_dim, classifier_free,
                                             rngs=rngs, dtype=dtype, param_dtype=param_dtype)
                if rope_axes_dim is None:
                    d2 = int((partial_rotary_factor * heads_dim) // 2)
                    d2 -= d2 % 2
                    rope_axes_dim = [d2, d2]  # (H, W)
                # In simple mode every block is already a single-stream DiT block
                # (the reference instead swaps in context-taking MMDiTSingleStreamBlocks
                # whose signature its own simple forward cannot call — dead path,
                # mmdit.py:678-682 vs :891)
                n_single_stream_blocks = 0
            self.pooled_embedding = pooled
            self.mlp_pooled_context = nnx.data(mlp_pooled)
            self.label_embed = nnx.data(label_embed)
            self.context_embed = nnx.data(context_embed)
            # non-leaky augmentation conditioning (diffuse/augment.py): zero-init
            # and bias-free, so training starts unperturbed and an absent label
            # vector at sampling time is exactly the zero-label path
            self.augment_embed = nnx.data(
                nnx.Linear(augment_dim, embedding_dim, use_bias=False,
                           kernel_init=nnx.initializers.zeros_init(),
                           dtype=dtype, param_dtype=param_dtype, rngs=rngs)
                if augment_dim > 0 else None
            )

            self.rope_axes_dim = list(rope_axes_dim)
            self.last_layer = ModulatedLastLayer(embedding_dim, inner_dim, patch_size,
                                                 self.output_channels, **kw)
            self.time_embed = TimeEmbedMlp(frequency_embedding, embedding_dim, **kw)
            # patchify stays fp32 under mixed precision: it is the model's input
            # interface (a tiny 4->inner_dim conv, negligible time), its VJP
            # cannot keep an fp32 accumulator (conv VJPs require matching operand
            # dtypes), and its weights' gradient noise feeds everything downstream
            self.conv_proj = nnx.Conv(
                self.input_channels, inner_dim, (patch_size, patch_size),
                strides=(patch_size, patch_size), use_bias=False, padding="VALID",
                kernel_init=_xavier(), dtype=stable_dtype(dtype), param_dtype=param_dtype, rngs=rngs,
            )

            n_dual = depth - n_single_stream_blocks
            block_cls = DiTBlock if simple_dit else MMDiTBlock
            block_kw = dict(attention_impl=attention_impl, mlp_type=mlp_type,
                            n_experts=n_experts, capacity_factor=capacity_factor,
                            attention_dtype=attention_dtype, mlp_dtype=mlp_dtype, **kw)
            self.layers = nnx.List(
                [
                    block_cls(inner_dim, embedding_dim, num_heads, mlp_ratio, self.rope_axes_dim, **block_kw)
                    for _ in range(n_dual)
                ]
                + [
                    MMDiTSingleStreamBlock(inner_dim, embedding_dim, num_heads, mlp_ratio,
                                           self.rope_axes_dim, attention_impl=attention_impl, **kw)
                    for _ in range(n_single_stream_blocks)
                ]
            )

    def set_parallel_mesh(self, mesh) -> None:
        """Inject the device mesh into blocks that need it at call time:
        ring attention (sequence shards over the 'sp' axis), MoE MLPs
        (experts over the 'expert' axis), and GPipe pipelining (DiT block
        stages over the 'pipe' axis). Trainers call this before
        splitting the module; single-chip / no-op meshes are harmless."""
        self.mesh = mesh
        for block in self.layers:
            attn = getattr(block, "attention", None)
            if attn is not None and hasattr(attn, "mesh"):
                attn.mesh = mesh
            for attr in ("mlp_input", "mlp_context", "mlp"):
                mlp = getattr(block, attr, None)
                if isinstance(mlp, MoEMlp):
                    mlp.mesh = mesh

    # --- patch ops ---------------------------------------------------------
    def patchify(self, x: jax.Array) -> tuple[jax.Array, tuple[int, int]]:
        """NHWC image -> [B, Hp*Wp, inner_dim]; returns the token grid size."""
        x = self.conv_proj(x)
        if self.stream_dtype is not None:
            x = x.astype(self.stream_dtype)
        b, hp, wp, c = x.shape
        return x.reshape(b, hp * wp, c), (hp, wp)

    def unpatchify(self, x: jax.Array, grid_size: tuple[int, int]) -> jax.Array:
        hp, wp = grid_size
        p = self.patch_size
        b = x.shape[0]
        x = x.reshape(b, hp, wp, p, p, self.output_channels)
        x = jnp.einsum("bhwpqc->bhpwqc", x)
        return x.reshape(b, hp * p, wp * p, self.output_channels)

    # --- position ids -------------------------------------------------------
    def _image_pos_ids(self, batch: int, grid_size: tuple[int, int], n_axes: int) -> jax.Array:
        hp, wp = grid_size
        hh, ww = jnp.meshgrid(jnp.arange(hp), jnp.arange(wp), indexing="ij")
        axes = [hh.reshape(-1), ww.reshape(-1)]
        if n_axes == 3:
            axes = [jnp.zeros((hp * wp,), jnp.int32)] + axes  # text axis = 0 for image
        pos = jnp.stack(axes, axis=-1)
        return jnp.broadcast_to(pos[None], (batch, hp * wp, n_axes))

    def _text_pos_ids(self, batch: int, seq_len: int) -> jax.Array:
        zeros = jnp.zeros((seq_len,), jnp.int32)
        pos = jnp.stack([jnp.arange(1, seq_len + 1), zeros, zeros], axis=-1)  # (l, 0, 0)
        return jnp.broadcast_to(pos[None], (batch, seq_len, 3))

    def _run_block(self, layer, *args):
        if self.use_checkpoint:
            return _block_remat_ckpt(layer, *args)
        return _block_remat(layer, *args)

    # --- sampling-time block caching (Delta-DiT-style) -----------------------
    # Training-free acceleration (arXiv:2406.01125, arXiv:2312.09608; no
    # reference counterpart): on "refresh" denoise steps the blocks in
    # ``cache_span = [lo, hi)`` run normally and their combined residual
    # delta (stack output - stack input, per token stream) is cached; on
    # the steps in between the span is skipped and the cached delta is
    # re-applied to the current stream. The schedule (every K-th step
    # refreshes) is driven by the formalizations' denoise scan, which
    # threads the cache pytree through the scan carry.
    def set_block_cache_span(self, span: tuple[int, int] | None) -> None:
        if span is None:
            self.cache_span = None
            return
        lo, hi = int(span[0]), int(span[1])
        assert 0 <= lo < hi <= len(self.layers), (
            f"cache span [{lo}, {hi}) out of range for depth {len(self.layers)}"
        )
        self.cache_span = (lo, hi)

    def _cache_dtype(self):
        return self.stream_dtype if self.stream_dtype is not None else jnp.float32

    def init_block_cache(self, data_shape, cond, use_cfg: bool):
        """Zero-filled block-cache pytree shaped for the denoise scan carry.

        The first denoise step always refreshes (step_idx % interval == 0 at
        0), so only the structure matters — zeros are never consumed.
        ``data_shape`` is the NHWC sample shape; under CFG the model sees a
        2x-batched fused call, so the cache is 2x-batched too.
        """
        assert self.cache_span is not None, "call set_block_cache_span first"
        b = data_shape[0] * (2 if use_cfg else 1)
        t = (data_shape[1] // self.patch_size) * (data_shape[2] // self.patch_size)
        dt = self._cache_dtype()
        x_delta = jnp.zeros((b, t, self.inner_dim), dt)
        if self.simple_dit:
            return (x_delta,)
        # dual/single-stream MMDiT: the loop state is (x, context); the
        # context length comes from the embedder's output shape (trace-free)
        ctx = cond["context"]
        ctx_shape = jax.eval_shape(
            lambda c, d: self.context_embedder(c, d)["embeddings"],
            ctx, jax.ShapeDtypeStruct((data_shape[0],), jnp.bool_),
        ).shape
        return (x_delta, jnp.zeros((b, ctx_shape[1], self.inner_dim), dt))

    def _cached_block_stack(self, streams, run, block_cache, cache_refresh):
        """Run the block stack with the ``cache_span`` segment under
        ``lax.cond(refresh, compute-and-cache, reuse-cached-delta)``.

        ``streams`` is the tuple of token streams ((x,) for simple DiT,
        (x, context) for MMDiT); ``run(i, streams) -> streams`` applies block
        i. Returns (streams, new_cache). Refresh steps are bit-exact with the
        uncached stack (the computed streams pass through unchanged; the
        delta is stored separately)."""
        lo, hi = self.cache_span
        dt = self._cache_dtype()
        for i in range(lo):
            streams = run(i, streams)

        def compute(s_in):
            s = s_in
            for i in range(lo, hi):
                s = run(i, s)
            deltas = tuple(
                a.astype(dt) - b.astype(dt) for a, b in zip(s, s_in)
            )
            return s, deltas

        def reuse(s_in):
            deltas = tuple(c.astype(dt) for c in block_cache)
            s = tuple(a + d.astype(a.dtype) for a, d in zip(s_in, deltas))
            return s, deltas

        streams, new_cache = jax.lax.cond(cache_refresh, compute, reuse, streams)
        for i in range(hi, len(self.layers)):
            streams = run(i, streams)
        return streams, new_cache

    # --- forward paths -------------------------------------------------------
    def _mmdit_forward(self, x, grid_size, timesteps, context_raw, drop, capture_features,
                       aug=None, block_cache=None, cache_refresh=None):
        assert self.context_embedder is not None
        b = x.shape[0]
        emb = self.time_embed(timestep_embedding(timesteps, self.frequency_embedding).astype(x.dtype))
        if aug is not None:
            assert self.augment_embed is not None, "augment labels need augment_dim > 0"
            emb = emb + self.augment_embed(aug.astype(emb.dtype))
        context_output = self.context_embedder(context_raw, drop)
        if self.pooled_embedding:
            assert "pooled_embeddings" in context_output, "pooled embeddings required"
            emb = self.mlp_pooled_context(context_output["pooled_embeddings"].astype(x.dtype)) + emb

        context = self.context_embed(context_output["embeddings"].astype(x.dtype))
        if self.stream_dtype is not None:
            context = context.astype(self.stream_dtype)
        attn_mask = context_output.get("attn_mask")

        pos_ids = jnp.concatenate(
            [self._text_pos_ids(b, context.shape[1]), self._image_pos_ids(b, grid_size, 3)],
            axis=1,
        )
        cos_sin = get_cos_sin_ndim_grid(pos_ids, self.rope_base, self.rope_axes_dim)

        use_cache = (
            self.cache_span is not None
            and block_cache is not None
            and cache_refresh is not None
        )
        assert not (use_cache and capture_features), (
            "block caching is a sampling-time feature; feature capture "
            "(REPA) is a training-time one — they don't compose"
        )
        features: list[jax.Array] = []
        new_cache = None
        if use_cache:
            def run(i, s):
                return self._run_block(self.layers[i], s[0], emb, s[1], cos_sin, attn_mask)

            (x, context), new_cache = self._cached_block_stack(
                (x, context), run, block_cache, cache_refresh
            )
        else:
            for i, layer in enumerate(self.layers):
                x, context = self._run_block(layer, x, emb, context, cos_sin, attn_mask)
                if capture_features and i in self.feature_layers:
                    features.append(x)
        x = self.last_layer(x, emb)
        out: ModelOutput = {"x": x}
        if capture_features:
            out["features"] = features
        if new_cache is not None:
            out["block_cache"] = new_cache
        return out

    def _simple_dit_forward(self, x, grid_size, timesteps, y, drop, capture_features,
                            aug=None, block_cache=None, cache_refresh=None):
        b = x.shape[0]
        emb = self.time_embed(timestep_embedding(timesteps, self.frequency_embedding).astype(x.dtype))
        if self.label_embed is not None:
            assert y is not None, "class labels y required for label-conditional DiT"
            emb = emb + self.label_embed(y, drop if self.classifier_free else None)
        if aug is not None:
            assert self.augment_embed is not None, "augment labels need augment_dim > 0"
            emb = emb + self.augment_embed(aug.astype(emb.dtype))

        pos_ids = self._image_pos_ids(b, grid_size, 2)
        cos_sin = get_cos_sin_ndim_grid(pos_ids, self.rope_base, self.rope_axes_dim)

        use_cache = (
            self.cache_span is not None
            and block_cache is not None
            and cache_refresh is not None
        )
        assert not (use_cache and capture_features), (
            "block caching is a sampling-time feature; feature capture "
            "(REPA) is a training-time one — they don't compose"
        )
        features: list[jax.Array] = []
        new_cache = None
        pipe_n = self.mesh.shape.get("pipe", 1) if self.mesh is not None else 1
        if (
            self.pipeline_microbatches
            and pipe_n > 1
            and not capture_features
            and not self.use_checkpoint  # remat composes with the sequential path only
            and not use_cache  # the cached span needs the sequential stack
        ):
            x = self._pipelined_blocks(x, emb, cos_sin, pipe_n)
        elif use_cache:
            def run(i, s):
                return (self._run_block(self.layers[i], s[0], emb, cos_sin, None),)

            (x,), new_cache = self._cached_block_stack(
                (x,), run, block_cache, cache_refresh
            )
        else:
            for i, layer in enumerate(self.layers):
                x = self._run_block(layer, x, emb, cos_sin, None)
                if capture_features and i in self.feature_layers:
                    features.append(x)
        x = self.last_layer(x, emb)
        out: ModelOutput = {"x": x}
        if capture_features:
            out["features"] = features
        if new_cache is not None:
            out["block_cache"] = new_cache
        return out

    def _pipelined_blocks(self, x, emb, cos_sin, pipe_n: int):
        """Run the homogeneous DiT block stack through the GPipe engine over
        the mesh's 'pipe' axis (parallel/pipeline.py). Per-layer states are
        stacked at trace time; gradients flow back through the stack to each
        block's own params. ``capture_features`` and ``use_checkpoint`` fall
        back to the sequential path (feature taps cross stage boundaries)."""
        from diffulab_tpu.parallel.pipeline import pipeline_apply

        assert len(self.layers) % pipe_n == 0, (
            f"depth {len(self.layers)} not divisible by pipe={pipe_n}"
        )
        graphdef, _ = nnx.split(self.layers[0])
        stacked = jax.tree.map(
            lambda *leaves: jnp.stack(leaves),
            *[nnx.split(layer)[1] for layer in self.layers],
        )
        cos, sin = cos_sin

        def stage(layer_state, state):
            block = nnx.merge(graphdef, layer_state)
            out = dict(state)
            out["x"] = block(state["x"], state["y"], (state["cos"], state["sin"]))
            return out

        batch_axes = tuple(
            a for a in ("data", "fsdp") if self.mesh.shape.get(a, 1) > 1
        )
        out = pipeline_apply(
            stage,
            stacked,
            {"x": x},
            mesh=self.mesh,
            axis="pipe",
            n_microbatches=self.pipeline_microbatches,
            batch_axes=batch_axes,
            # conditioning + RoPE tables are read-only per microbatch: they
            # ride the resident stream, not the ppermute ring
            stream={"y": emb, "cos": cos, "sin": sin},
        )
        return out["x"]

    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        cond: dict[str, Any] | None = None,
        drop: jax.Array | None = None,
        train: bool = False,
        rngs: nnx.Rngs | None = None,
        capture_features: bool = False,
        block_cache: Any = None,
        cache_refresh: jax.Array | bool | None = None,
    ) -> ModelOutput:
        del train, rngs
        cond = cond or {}
        y = cond.get("y")
        context_raw = cond.get("context")
        x_context = cond.get("x_context")
        assert not (context_raw is not None and y is not None), (
            "context and y cannot both be specified"
        )
        if x_context is not None:
            x = jnp.concatenate([x, x_context], axis=-1)  # NHWC channel concat

        aug = cond.get("augment_labels")
        tokens, grid_size = self.patchify(x)
        if self.simple_dit:
            out = self._simple_dit_forward(tokens, grid_size, timesteps, y, drop,
                                           capture_features, aug=aug,
                                           block_cache=block_cache,
                                           cache_refresh=cache_refresh)
        else:
            out = self._mmdit_forward(tokens, grid_size, timesteps, context_raw, drop,
                                      capture_features, aug=aug,
                                      block_cache=block_cache,
                                      cache_refresh=cache_refresh)
        out["x"] = self.unpatchify(out["x"], grid_size)
        return out
