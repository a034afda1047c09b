"""ADM-style UNet denoiser (guided-diffusion lineage).

TPU/NHWC redesign of reference src/diffulab/networks/denoisers/unet.py:23-853:

- ``ResBlock``: GroupNorm32 + SiLU + 3x3 conv, FiLM scale-shift (or additive)
  timestep conditioning, learned in-block up/down sampling, zero-init out conv,
  1x1/3x3 skip projection (reference unet.py:80-237);
- ``AttentionBlock``: GroupNorm'd token self/cross attention with residual,
  routed through diffulab_tpu.ops.dot_product_attention (the reference's SDPA
  call sites, unet.py:313-319);
- ``FeedForward`` (GEGLU) + ``TransformerAttentionBlock`` (self + cross + ff)
  + ``TransformerBlock`` (proj_in/out + depth) for text conditioning
  (reference unet.py:325-464);
- encoder / middle / decoder with skip concatenation, attention inserted at the
  configured downsample factors; class-label or context-embedder conditioning
  with CFG drop masks (reference unet.py:467-853).

Channel projections that the reference expresses as 1x1 Conv1d over [B, C, N]
are plain Linears over [B, N, C] tokens here — identical math, MXU-friendly
layout.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from diffulab_tpu.networks.denoisers.common import Denoiser, ModelOutput
from diffulab_tpu.networks.embedders.common import ContextEmbedder
from diffulab_tpu.networks.nn import (
    Downsample,
    GroupNorm32,
    LabelEmbed,
    Upsample,
    accum_dtype_kwargs,
    geglu,
    stable_dtype,
    timestep_embedding,
    zero_conv,
)
from diffulab_tpu.ops import dot_product_attention


def _conv3(cin: int, cout: int, *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32) -> nnx.Conv:
    return nnx.Conv(cin, cout, (3, 3), padding=1, dtype=dtype, param_dtype=param_dtype, rngs=rngs)


class ResBlock(nnx.Module):
    """Residual block with FiLM timestep conditioning (reference unet.py:80-237)."""

    def __init__(
        self,
        channels: int,
        emb_channels: int,
        dropout: float = 0.0,
        out_channels: int | None = None,
        use_conv: bool = False,
        use_scale_shift_norm: bool = False,
        up: bool = False,
        down: bool = False,
        *,
        rngs: nnx.Rngs,
        dtype=None,
        param_dtype=jnp.float32,
    ):
        assert not (up and down)
        self.channels = channels
        self.out_channels = out_channels or channels
        self.use_scale_shift_norm = use_scale_shift_norm
        self.updown = up or down
        kw = dict(rngs=rngs, dtype=dtype, param_dtype=param_dtype)

        self.in_norm = GroupNorm32(32, channels, rngs=rngs, param_dtype=param_dtype)
        self.in_conv = _conv3(channels, self.out_channels, **kw)
        if up:
            self.h_upd = Upsample(channels, False, rngs=rngs)
            self.x_upd = Upsample(channels, False, rngs=rngs)
        elif down:
            self.h_upd = Downsample(channels, False, rngs=rngs)
            self.x_upd = Downsample(channels, False, rngs=rngs)
        else:
            self.h_upd = self.x_upd = None

        emb_out_dim = 2 * self.out_channels if use_scale_shift_norm else self.out_channels
        # FiLM conditioning stays fp32 under mixed precision (see nn.stable_dtype)
        self.emb_layer = nnx.Linear(emb_channels, emb_out_dim, dtype=stable_dtype(dtype),
                                    param_dtype=param_dtype, rngs=rngs)
        self.stream_dtype = stable_dtype(dtype)
        self.out_norm = GroupNorm32(32, self.out_channels, rngs=rngs, param_dtype=param_dtype)
        self.dropout = nnx.Dropout(dropout)
        self.out_conv = zero_conv(self.out_channels, self.out_channels, (3, 3), **kw)

        if self.out_channels == channels:
            self.skip = None
        elif use_conv:
            self.skip = _conv3(channels, self.out_channels, **kw)
        else:
            self.skip = nnx.Conv(channels, self.out_channels, (1, 1), dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: jax.Array, emb: jax.Array, train: bool = False, rngs=None) -> jax.Array:
        if self.updown:
            h = jax.nn.silu(self.in_norm(x))
            h = self.h_upd(h)
            x = self.x_upd(x)
            h = self.in_conv(h)
        else:
            h = self.in_conv(jax.nn.silu(self.in_norm(x)))

        # FiLM in fp32 under mixed precision: emb_out keeps its stable dtype
        # and promotes h at the add/modulate; out_conv casts back down
        emb_out = self.emb_layer(jax.nn.silu(emb))[:, None, None, :]  # broadcast over H, W (NHWC)
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = self.out_norm(h) * (1 + scale) + shift
        else:
            h = h + emb_out
            h = self.out_norm(h)
        h = self.out_conv(self.dropout(jax.nn.silu(h), deterministic=not train, rngs=rngs))
        skip = self.skip(x) if self.skip is not None else x
        out = skip + h
        # residual accumulation at fp32 so small late contributions survive
        if self.stream_dtype is not None:
            out = out.astype(self.stream_dtype)
        return out


class AttentionBlock(nnx.Module):
    """Token self/cross attention with residual (reference unet.py:240-322)."""

    def __init__(
        self,
        channels: int,
        context_channels: int | None = None,
        num_heads: int = 8,
        inner_channels: int = -1,
        dropout: float = 0.0,
        q_bias: bool = True,
        kv_bias: bool = True,
        *,
        rngs: nnx.Rngs,
        dtype=None,
        param_dtype=jnp.float32,
    ):
        self.channels = channels
        self.context_channels = context_channels or channels
        self.inner_channels = channels if inner_channels == -1 else inner_channels
        self.num_heads = num_heads
        assert self.inner_channels % num_heads == 0
        self.dim_head = self.inner_channels // num_heads
        self.scale = self.dim_head**-0.5
        self.is_cross = context_channels is not None
        self.kernel_dtype = dtype  # attention kernels want half inputs
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs, **accum_dtype_kwargs(dtype))

        self.norm_x = GroupNorm32(32, channels, rngs=rngs, param_dtype=param_dtype)
        self.norm_context = GroupNorm32(32, self.context_channels, rngs=rngs, param_dtype=param_dtype)
        self.to_q = nnx.Linear(channels, self.inner_channels, use_bias=q_bias, **kw)
        self.to_kv = nnx.Linear(self.context_channels, self.inner_channels * 2, use_bias=kv_bias, **kw)
        self.to_out = nnx.Linear(self.inner_channels, channels, **kw)
        self.dropout = nnx.Dropout(dropout)

    def __call__(
        self,
        x: jax.Array,
        context: jax.Array | None = None,
        attn_mask: jax.Array | None = None,
        train: bool = False,
        rngs=None,
    ) -> jax.Array:
        b, h_, w_, c = x.shape
        tokens = x.reshape(b, h_ * w_, c)
        ctx = context if context is not None else tokens

        q = self.to_q(self.norm_x(tokens))
        kv_in = self.norm_context(ctx)
        k, v = jnp.split(self.to_kv(kv_in), 2, axis=-1)

        q = q.reshape(b, -1, self.num_heads, self.dim_head)
        k = k.reshape(b, -1, self.num_heads, self.dim_head)
        v = v.reshape(b, -1, self.num_heads, self.dim_head)
        if self.kernel_dtype is not None:
            q, k, v = (t.astype(self.kernel_dtype) for t in (q, k, v))
        out = dot_product_attention(q, k, v, kv_mask=attn_mask, scale=self.scale)
        out = self.to_out(out.reshape(b, -1, self.inner_channels))
        out = self.dropout(out, deterministic=not train, rngs=rngs)
        return (tokens + out).reshape(b, h_, w_, c)


class FeedForward(nnx.Module):
    """GEGLU feed-forward with GroupNorm + residual (reference unet.py:338-355)."""

    def __init__(self, channels: int, inner_channels: int, dropout: float = 0.0,
                 *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs, **accum_dtype_kwargs(dtype))
        self.norm = GroupNorm32(32, channels, rngs=rngs, param_dtype=param_dtype)
        self.proj_in = nnx.Linear(channels, inner_channels * 2, **kw)
        self.proj_out = nnx.Linear(inner_channels, channels, **kw)
        self.dropout = nnx.Dropout(dropout)

    def __call__(self, x: jax.Array, train: bool = False, rngs=None) -> jax.Array:
        b, h_, w_, c = x.shape
        tokens = x.reshape(b, h_ * w_, c)
        h = geglu(self.proj_in(self.norm(tokens)))
        h = self.proj_out(self.dropout(h, deterministic=not train, rngs=rngs))
        return (tokens + h).reshape(b, h_, w_, c)


class TransformerAttentionBlock(nnx.Module):
    """self-attn -> cross-attn -> ff (reference unet.py:358-406)."""

    def __init__(self, channels: int, context_channels: int | None = None, num_heads: int = 8,
                 inner_channels: int = -1, dropout: float = 0.0, q_bias: bool = True,
                 kv_bias: bool = True, mlp_ratio: int = 4,
                 *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32):
        kw = dict(rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        self.self_attn = AttentionBlock(channels, None, num_heads, inner_channels, dropout,
                                        q_bias, kv_bias, **kw)
        self.cross_attn = AttentionBlock(channels, context_channels, num_heads, inner_channels,
                                         dropout, q_bias, kv_bias, **kw)
        self.ff = FeedForward(channels, channels * mlp_ratio, dropout, **kw)

    def __call__(self, x, context=None, attn_mask=None, train: bool = False, rngs=None):
        h = self.self_attn(x, train=train, rngs=rngs)
        h = self.cross_attn(h, context=context, attn_mask=attn_mask, train=train, rngs=rngs)
        return self.ff(h, train=train, rngs=rngs)


class TransformerBlock(nnx.Module):
    """norm + proj_in + depth x (attn blocks) + proj_out, residual
    (reference unet.py:409-464)."""

    def __init__(self, channels: int, context_channels: int | None = None, num_heads: int = 8,
                 inner_channels: int = -1, dropout: float = 0.0, mlp_ratio: int = 4, depth: int = 1,
                 *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32):
        self.inner_channels = channels if inner_channels == -1 else inner_channels
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs, **accum_dtype_kwargs(dtype))
        self.norm_x = GroupNorm32(32, channels, rngs=rngs, param_dtype=param_dtype)
        self.proj_in = nnx.Linear(channels, self.inner_channels, **kw)
        self.attn_blocks = nnx.List([
            TransformerAttentionBlock(
                self.inner_channels, context_channels, num_heads, -1, dropout,
                mlp_ratio=mlp_ratio, rngs=rngs, dtype=dtype, param_dtype=param_dtype,
            )
            for _ in range(depth)
        ])
        self.proj_out = nnx.Linear(self.inner_channels, channels, **kw)

    def __call__(self, x, context=None, attn_mask=None, train: bool = False, rngs=None):
        assert context is not None, "TransformerBlock requires context input"
        h = self.proj_in(self.norm_x(x))
        for block in self.attn_blocks:
            h = block(h, context=context, attn_mask=attn_mask, train=train, rngs=rngs)
        return x + self.proj_out(h)


def _parse_channel_mult(channel_mult: str | Sequence[int]) -> list[int]:
    if isinstance(channel_mult, str):
        return [int(v.strip()) for v in channel_mult.split(",")]
    return list(channel_mult)


def _apply_block(block, h, emb, context, attn_mask, train, rngs=None):
    """Dispatch like the reference's EmbedSequential (unet.py:55-77)."""
    if isinstance(block, ResBlock):
        return block(h, emb, train=train, rngs=rngs)
    if isinstance(block, (AttentionBlock, TransformerBlock)):
        return block(h, context=context, attn_mask=attn_mask, train=train, rngs=rngs)
    return block(h)


class UNetModel(Denoiser):
    """Configurable UNet (reference unet.py:467-853). NHWC."""

    def __init__(
        self,
        image_size: Sequence[int],
        in_channels: int,
        model_channels: int,
        out_channels: int,
        num_res_blocks: int,
        attention_resolutions: Sequence[int],
        dropout: float = 0.0,
        channel_mult: str | Sequence[int] = "1, 2, 4, 8",
        conv_resample: bool = True,
        use_checkpoint: bool = False,
        num_heads: int = 1,
        use_scale_shift_norm: bool = False,
        resblock_updown: bool = False,
        n_classes: int | None = None,
        classifier_free: bool = False,
        context_embedder: ContextEmbedder | None = None,
        transformer_depth: int = 1,
        augment_dim: int = 0,
        *,
        rngs: nnx.Rngs,
        dtype=None,
        param_dtype=jnp.float32,
    ):
        assert not (n_classes is not None and context_embedder is not None), (
            "n_classes and context_embedder cannot both be specified"
        )
        if context_embedder is not None:
            assert context_embedder.n_output == 1, (
                "For UNet please provide a context embedder with n_output=1"
            )
        self.context_embedder = nnx.data(context_embedder)
        self.context_channels = None if context_embedder is None else context_embedder.output_size[0]
        self.use_context = self.context_channels is not None
        self.image_size = list(image_size)
        self.in_channels = in_channels
        self.model_channels = model_channels
        self.out_channels = out_channels
        self.n_classes = n_classes
        self.classifier_free = classifier_free
        self.use_checkpoint = use_checkpoint
        channel_mult = _parse_channel_mult(channel_mult)
        kw = dict(rngs=rngs, dtype=dtype, param_dtype=param_dtype)

        self.time_embed_dim = model_channels * 4
        # per-sample time-embedding MLP stays fp32 under mixed precision
        self.time_fc1 = nnx.Linear(model_channels, self.time_embed_dim, dtype=stable_dtype(dtype),
                                   param_dtype=param_dtype, rngs=rngs)
        self.time_fc2 = nnx.Linear(self.time_embed_dim, self.time_embed_dim, dtype=stable_dtype(dtype),
                                   param_dtype=param_dtype, rngs=rngs)
        self.label_embed = nnx.data(
            LabelEmbed(n_classes, self.time_embed_dim, classifier_free, **kw)
            if n_classes is not None else None
        )
        # non-leaky augmentation conditioning (diffuse/augment.py): zero-init
        # bias-free, so absent labels at sampling == the zero-label path
        self.augment_embed = nnx.data(
            nnx.Linear(augment_dim, self.time_embed_dim, use_bias=False,
                       kernel_init=nnx.initializers.zeros_init(),
                       dtype=stable_dtype(dtype), param_dtype=param_dtype, rngs=rngs)
            if augment_dim > 0 else None
        )

        def make_attention(ch: int) -> nnx.Module:
            if self.use_context:
                return TransformerBlock(ch, self.context_channels, num_heads, dropout=dropout,
                                        depth=transformer_depth, **kw)
            return AttentionBlock(ch, None, num_heads, dropout=dropout, **kw)

        ch = input_ch = int(channel_mult[0] * model_channels)
        input_blocks: list[list[nnx.Module]] = [[_conv3(in_channels, ch, **kw)]]
        input_block_chans = [ch]
        ds = 1
        for level, mult in enumerate(channel_mult):
            for _ in range(num_res_blocks):
                layers: list[nnx.Module] = [
                    ResBlock(ch, self.time_embed_dim, dropout, int(mult * model_channels),
                             use_scale_shift_norm=use_scale_shift_norm, **kw)
                ]
                ch = int(mult * model_channels)
                if ds in attention_resolutions:
                    layers.append(make_attention(ch))
                input_blocks.append(layers)
                input_block_chans.append(ch)
            if level != len(channel_mult) - 1:
                if resblock_updown:
                    down_block: nnx.Module = ResBlock(
                        ch, self.time_embed_dim, dropout, ch,
                        use_scale_shift_norm=use_scale_shift_norm, down=True, **kw)
                else:
                    down_block = Downsample(ch, conv_resample, ch, **kw)
                input_blocks.append([down_block])
                input_block_chans.append(ch)
                ds *= 2
        self.input_blocks = nnx.List([nnx.List(b) for b in input_blocks])

        self.middle_block = nnx.List([
            ResBlock(ch, self.time_embed_dim, dropout, use_scale_shift_norm=use_scale_shift_norm, **kw),
            make_attention(ch),
            ResBlock(ch, self.time_embed_dim, dropout, use_scale_shift_norm=use_scale_shift_norm, **kw),
        ])

        output_blocks: list[list[nnx.Module]] = []
        out_group_meta: list[tuple[int, int]] = []  # (channels, ds) after each group
        for level, mult in list(enumerate(channel_mult))[::-1]:
            for i in range(num_res_blocks + 1):
                ich = input_block_chans.pop()
                layers = [
                    ResBlock(ch + ich, self.time_embed_dim, dropout, int(model_channels * mult),
                             use_scale_shift_norm=use_scale_shift_norm, **kw)
                ]
                ch = int(model_channels * mult)
                if ds in attention_resolutions:
                    layers.append(make_attention(ch))
                if level and i == num_res_blocks:
                    if resblock_updown:
                        layers.append(ResBlock(ch, self.time_embed_dim, dropout, ch,
                                               use_scale_shift_norm=use_scale_shift_norm, up=True, **kw))
                    else:
                        layers.append(Upsample(ch, conv_resample, ch, **kw))
                    ds //= 2
                output_blocks.append(layers)
                out_group_meta.append((ch, ds))
        self.output_blocks = nnx.List([nnx.List(b) for b in output_blocks])
        # DeepCache bookkeeping (set_block_cache_span): shape of the decoder
        # feature after each output group, for init_block_cache
        self._out_group_meta = out_group_meta
        self._compute_dtype = dtype
        self.cache_split: int | None = None  # static; set via set_block_cache_span
        # U-REPA feature capture (arXiv:2503.18414; RepaLoss.set_model writes
        # this): flat capture-point indices over input groups (0..N-1), the
        # middle block (N), and output groups (N+1..2N) — see `layers`
        self.feature_layers: tuple[int, ...] = ()

        self.out_norm = GroupNorm32(32, ch, rngs=rngs, param_dtype=param_dtype)
        self.out_conv = zero_conv(input_ch, out_channels, (3, 3), **kw)

    @property
    def layers(self):
        """Flat capture-point list for REPA's ``set_model`` range check:
        encoder groups, then the middle block (one point), then decoder
        groups — matching the capture order in ``__call__``."""
        return list(self.input_blocks) + [self.middle_block] + list(self.output_blocks)

    # --- sampling-time deep-feature caching (DeepCache-style) ----------------
    # Training-free sampling acceleration (DeepCache, arXiv:2312.00858;
    # encoder-reuse analysis, arXiv:2312.09608; no reference counterpart).
    # The UNet analogue of MMDiT's Delta-DiT span: on refresh steps the full
    # net runs and the decoder feature where the deep U re-enters the shallow
    # levels is cached; on reuse steps only the shallow encoder prefix and
    # decoder suffix run, splicing in the cached deep feature (deep features
    # change slowly along the sampling trajectory).
    def set_block_cache_span(self, span: tuple[int, int] | None) -> None:
        """``span = (k, N)`` with ``N = len(input_blocks)``: keep running
        encoder groups ``[0, k)`` (and the matching decoder suffix); cache
        everything deeper. The hi bound must be N — the deep segment always
        reaches the U's bottom (skip tensors inside it cannot be cached
        independently)."""
        if span is None:
            self.cache_split = None
            return
        k, hi = int(span[0]), int(span[1])
        n = len(self.input_blocks)
        assert hi == n, (
            f"UNet deep-caching spans reach the U bottom: span must be (k, {n}), got ({k}, {hi})"
        )
        assert 1 <= k <= n - 1, f"cache split k={k} out of range [1, {n - 1}]"
        self.cache_split = k

    def _cache_dtype(self):
        return stable_dtype(self._compute_dtype) or jnp.float32

    def init_block_cache(self, data_shape, cond, use_cfg: bool):
        """Zero-filled cache shaped like the decoder feature after output
        group ``N - k - 1`` (never consumed: the first denoise step always
        refreshes)."""
        assert self.cache_split is not None, "call set_block_cache_span first"
        del cond
        n = len(self.input_blocks)
        ch, ds = self._out_group_meta[n - self.cache_split - 1]
        b = data_shape[0] * (2 if use_cfg else 1)
        h, w = data_shape[1] // ds, data_shape[2] // ds
        return (jnp.zeros((b, h, w, ch), self._cache_dtype()),)

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
        cond = cond or {}
        y = cond.get("y")
        context_raw = cond.get("context")
        x_context = cond.get("x_context")
        assert list(x.shape[1:3]) == self.image_size, (
            f"Input shape {x.shape[1:3]} does not match model image size {self.image_size}"
        )
        assert (y is not None) == (self.n_classes is not None), (
            "must specify y if and only if the model is class-conditional"
        )
        assert (context_raw is not None) == (self.context_embedder is not None), (
            "must specify context if and only if the model is context-conditional"
        )

        emb = self.time_fc2(jax.nn.silu(self.time_fc1(
            timestep_embedding(timesteps, self.model_channels).astype(x.dtype)
        )))
        if self.label_embed is not None:
            emb = emb + self.label_embed(y, drop if self.classifier_free else None)
        aug = cond.get("augment_labels")
        if aug is not None:
            assert self.augment_embed is not None, "augment labels need augment_dim > 0"
            emb = emb + self.augment_embed(aug.astype(emb.dtype))

        context = attn_mask = None
        if self.context_embedder is not None:
            context_output = self.context_embedder(context_raw, drop)
            context = context_output["embeddings"]
            attn_mask = context_output.get("attn_mask")

        if x_context is not None:
            x = jnp.concatenate([x, x_context], axis=-1)

        use_cache = (
            self.cache_split is not None
            and block_cache is not None
            and cache_refresh is not None
        )
        assert not (use_cache and capture_features), (
            "block caching is a sampling-time feature; feature capture "
            "(REPA) is a training-time one — they don't compose"
        )
        if use_cache:
            return self._cached_forward(x, emb, context, attn_mask, train, rngs,
                                        block_cache, cache_refresh)

        # U-REPA capture points (arXiv:2503.18414): one per encoder group,
        # one after the middle block, one per decoder group — flattened to
        # [B, H*W, C] token streams like the DiT capture
        features: list[jax.Array] = []
        fl = self.feature_layers if capture_features else ()
        bi = 0

        def _capture(t):
            nonlocal bi
            if bi in fl:
                features.append(t.reshape(t.shape[0], -1, t.shape[-1]))
            bi += 1

        hs: list[jax.Array] = []
        h = x
        for block_group in self.input_blocks:
            for block in block_group:
                h = _apply_block(block, h, emb, context, attn_mask, train, rngs)
            hs.append(h)
            _capture(h)
        for block in self.middle_block:
            h = _apply_block(block, h, emb, context, attn_mask, train, rngs)
        _capture(h)
        for block_group in self.output_blocks:
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            for block in block_group:
                h = _apply_block(block, h, emb, context, attn_mask, train, rngs)
            _capture(h)
        out: ModelOutput = {"x": self.out_conv(jax.nn.silu(self.out_norm(h)))}
        if capture_features:
            out["features"] = features
        return out

    def _cached_forward(self, x, emb, context, attn_mask, train, rngs,
                        block_cache, cache_refresh) -> ModelOutput:
        """DeepCache forward: the deep segment (encoder groups [k:], middle,
        decoder groups [: N-k]) runs under ``lax.cond(refresh, ...)``; reuse
        steps splice in the cached deep decoder feature instead."""
        k = self.cache_split
        n = len(self.input_blocks)
        dt = self._cache_dtype()
        hs: list[jax.Array] = []
        h = x
        for block_group in list(self.input_blocks)[:k]:
            for block in block_group:
                h = _apply_block(block, h, emb, context, attn_mask, train, rngs)
            hs.append(h)

        def deep(h_in):
            hh = h_in
            deep_hs: list[jax.Array] = []
            for block_group in list(self.input_blocks)[k:]:
                for block in block_group:
                    hh = _apply_block(block, hh, emb, context, attn_mask, train, rngs)
                deep_hs.append(hh)
            for block in self.middle_block:
                hh = _apply_block(block, hh, emb, context, attn_mask, train, rngs)
            for block_group in list(self.output_blocks)[: n - k]:
                hh = jnp.concatenate([hh, deep_hs.pop()], axis=-1)
                for block in block_group:
                    hh = _apply_block(block, hh, emb, context, attn_mask, train, rngs)
            return hh.astype(dt)

        def reuse(h_in):
            del h_in
            return block_cache[0].astype(dt)

        h = jax.lax.cond(cache_refresh, deep, reuse, h)
        new_cache = (h,)
        for block_group in list(self.output_blocks)[n - k:]:
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            for block in block_group:
                h = _apply_block(block, h, emb, context, attn_mask, train, rngs)
        return {"x": self.out_conv(jax.nn.silu(self.out_norm(h))),
                "block_cache": new_cache}
