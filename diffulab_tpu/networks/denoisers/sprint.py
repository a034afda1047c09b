"""SprintDiT: token-dropping DiT (SPRINT, https://arxiv.org/pdf/2510.21986).

TPU redesign of reference src/diffulab/networks/denoisers/sprint.py:68-624:

- shallow encoder -> drop ``drop_rate`` (default 75%) of image tokens
  (training only) -> deep layers on kept tokens -> scatter-restore with a
  learned mask token -> fuse [restored, encoder-skip] with a linear ->
  shallow decoder (reference :317-387, :452-479);
- path-drop guidance: the same per-sample ``drop`` mask that drops the
  label/context condition also replaces the entire deep-path output with mask
  tokens (the reference's ``p==1`` branch, :474-475/:565-566). Under the fused
  CFG batch the deep layers always run; dropped samples just ignore their
  output — identical math, static control flow;
- token-drop scores come from the call-time ``rngs`` (created inside the
  jitted train step), keeping the module state-free and jit-pure;
- top-k kept indices are sorted and gathered with static ``k`` — jit-friendly
  (the reference's torch.topk/gather, :342-354).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from diffulab_tpu.networks.denoisers.common import Denoiser, ModelOutput
from diffulab_tpu.networks.denoisers.mmdit import (
    DiTBlock,
    MMDiTBlock,
    MMDiTSingleStreamBlock,
    ModulatedLastLayer,
    PooledContextMlp,
    TimeEmbedMlp,
    _block_remat,
    _block_remat_ckpt,
    _linear,
    _xavier,
)
from diffulab_tpu.networks.embedders.common import ContextEmbedder
from diffulab_tpu.networks.nn import LabelEmbed, get_cos_sin_ndim_grid, stable_dtype, timestep_embedding


class SprintDiT(Denoiser):
    """SPRINT encoder / deep(token-dropped) / decoder DiT (reference sprint.py:68-624)."""

    def __init__(
        self,
        simple_dit: bool = False,
        input_channels: int = 3,
        output_channels: int | None = None,
        inner_dim: int = 768,
        embedding_dim: int = 768,
        num_heads: int = 12,
        mlp_ratio: int = 4,
        patch_size: int = 16,
        encoder_depth: int = 2,
        deep_layers_depth: int = 8,
        n_single_stream_blocks: int = 0,
        decoder_depth: int = 2,
        rope_base: int = 10_000,
        partial_rotary_factor: float = 1.0,
        rope_axes_dim: Sequence[int] | None = None,
        frequency_embedding: int = 256,
        n_classes: int | None = None,
        classifier_free: bool = False,
        context_embedder: ContextEmbedder | None = None,
        use_checkpoint: bool = False,
        drop_rate: float = 0.75,
        feature_layers: Sequence[int] = (),
        *,
        rngs: nnx.Rngs,
        dtype=None,
        param_dtype=jnp.float32,
    ):
        assert not (n_classes is not None and context_embedder is not None), (
            "n_classes and context_embedder cannot both be specified"
        )
        self.simple_dit = simple_dit
        self.patch_size = patch_size
        self.input_channels = input_channels
        self.output_channels = output_channels or input_channels
        self.context_embedder = nnx.data(context_embedder)
        self.frequency_embedding = frequency_embedding
        self.rope_base = rope_base
        self.n_classes = n_classes
        self.classifier_free = classifier_free
        self.use_checkpoint = use_checkpoint
        self.drop_rate = drop_rate
        self.feature_layers = tuple(feature_layers)
        self.mask_token = nnx.Param(jnp.zeros((1, 1, inner_dim), dtype=param_dtype))
        kw = dict(rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        # fp32 residual token stream under mixed precision (see mmdit.MMDiT)
        self.stream_dtype = stable_dtype(dtype)

        heads_dim = inner_dim // num_heads
        pooled = False
        mlp_pooled: PooledContextMlp | None = None
        label_embed: LabelEmbed | None = None
        context_embed: nnx.Linear | None = None
        fuse_context: nnx.Linear | None = None
        if not simple_dit:
            assert context_embedder is not None, "for mm sprint a context embedder must be provided"
            if context_embedder.n_output == 2:
                pooled = True
                mlp_pooled = PooledContextMlp(context_embedder.output_size[0], embedding_dim, **kw)
                context_embed = _linear(context_embedder.output_size[1], inner_dim, use_bias=False, **kw)
            else:
                assert context_embedder.n_output == 1
                context_embed = _linear(context_embedder.output_size[0], inner_dim, use_bias=False, **kw)
            fuse_context = _linear(2 * inner_dim, inner_dim, use_bias=False, **kw)
            if rope_axes_dim is None:
                d3 = int((partial_rotary_factor * heads_dim) // 3)
                d3 -= d3 % 2
                rope_axes_dim = [d3, d3, d3]
        else:
            if n_classes is not None:
                label_embed = LabelEmbed(n_classes, embedding_dim, classifier_free,
                                         rngs=rngs, dtype=dtype, param_dtype=param_dtype)
            if rope_axes_dim is None:
                d2 = int((partial_rotary_factor * heads_dim) // 2)
                d2 -= d2 % 2
                rope_axes_dim = [d2, d2]
            n_single_stream_blocks = 0  # single-stream swap unreachable in simple mode (see mmdit.py)
        self.pooled_embedding = pooled
        self.mlp_pooled_context = nnx.data(mlp_pooled)
        self.label_embed = nnx.data(label_embed)
        self.context_embed = nnx.data(context_embed)
        self.fuse_context = nnx.data(fuse_context)

        self.rope_axes_dim = list(rope_axes_dim)
        self.fuse = _linear(inner_dim * 2, inner_dim, use_bias=False, **kw)
        self.last_layer = ModulatedLastLayer(embedding_dim, inner_dim, patch_size, self.output_channels, **kw)
        self.time_embed = TimeEmbedMlp(frequency_embedding, embedding_dim, **kw)
        self.conv_proj = nnx.Conv(  # patchify fp32 under mixed precision (see mmdit.MMDiT)
            input_channels, inner_dim, (patch_size, patch_size),
            strides=(patch_size, patch_size), use_bias=False, padding="VALID",
            kernel_init=_xavier(), dtype=stable_dtype(dtype), param_dtype=param_dtype, rngs=rngs,
        )

        block_cls = DiTBlock if simple_dit else MMDiTBlock
        self.layers = nnx.List(  # name kept for REPA alignment-layer parity
            [block_cls(inner_dim, embedding_dim, num_heads, mlp_ratio, self.rope_axes_dim, **kw)
             for _ in range(encoder_depth)]
        )
        n_dual_deep = deep_layers_depth - n_single_stream_blocks
        self.deep_layers = nnx.List(
            [block_cls(inner_dim, embedding_dim, num_heads, mlp_ratio, self.rope_axes_dim, **kw)
             for _ in range(n_dual_deep)]
            + [MMDiTSingleStreamBlock(inner_dim, embedding_dim, num_heads, mlp_ratio, self.rope_axes_dim, **kw)
               for _ in range(n_single_stream_blocks)]
        )
        self.decoder_layers = nnx.List(
            [block_cls(inner_dim, embedding_dim, num_heads, mlp_ratio, self.rope_axes_dim, **kw)
             for _ in range(decoder_depth)]
        )

    # --- patch ops -----------------------------------------------------------
    def patchify(self, x: jax.Array) -> tuple[jax.Array, tuple[int, int]]:
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

    def _image_pos_ids(self, batch, grid_size, n_axes):
        hp, wp = grid_size
        hh, ww = jnp.meshgrid(jnp.arange(hp), jnp.arange(wp), indexing="ij")
        axes = [hh.reshape(-1), ww.reshape(-1)]
        if n_axes == 3:
            axes = [jnp.zeros((hp * wp,), jnp.int32)] + axes
        pos = jnp.stack(axes, axis=-1)
        return jnp.broadcast_to(pos[None], (batch, hp * wp, n_axes))

    def _text_pos_ids(self, batch, seq_len):
        zeros = jnp.zeros((seq_len,), jnp.int32)
        pos = jnp.stack([jnp.arange(1, seq_len + 1), zeros, zeros], axis=-1)
        return jnp.broadcast_to(pos[None], (batch, seq_len, 3))

    def _run_block(self, layer, *args):
        if self.use_checkpoint:
            return _block_remat_ckpt(layer, *args)
        return _block_remat(layer, *args)

    # --- token drop / restore (reference sprint.py:317-387) -------------------
    def drop_tokens(
        self, x: jax.Array, cos_sin_img: tuple[jax.Array, jax.Array], train: bool,
        rngs: nnx.Rngs | None = None,
    ) -> tuple[jax.Array, jax.Array, tuple[jax.Array, jax.Array]]:
        b, s, d = x.shape
        if not train:
            kept = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
            return x, kept, cos_sin_img
        assert rngs is not None, "SprintDiT needs call-time rngs for token dropping in train mode"
        k = max(1, int(s * (1.0 - float(self.drop_rate))))
        scores = jax.random.uniform(rngs.token_drop(), (b, s))
        _, kept = jax.lax.top_k(scores, k)  # static k
        kept = jnp.sort(kept, axis=1)
        x_dropped = jnp.take_along_axis(x, kept[..., None], axis=1)
        cs = tuple(jnp.take_along_axis(r, kept[..., None], axis=1) for r in cos_sin_img)
        return x_dropped, kept, cs

    def restore_tokens(
        self, x_dropped: jax.Array, kept: jax.Array, seq_len: int, path_drop: jax.Array | None,
    ) -> jax.Array:
        b, _, d = x_dropped.shape
        mask_token = self.mask_token[...].astype(x_dropped.dtype)
        x_full = jnp.broadcast_to(mask_token, (b, seq_len, d))
        x_full = jax.vmap(lambda full, idx, src: full.at[idx].set(src))(x_full, kept, x_dropped)
        if path_drop is not None:
            x_full = jnp.where(path_drop[:, None, None], jnp.broadcast_to(mask_token, x_full.shape), x_full)
        return x_full

    # --- forward paths ---------------------------------------------------------
    def _forward_mmdit(self, x, grid_size, timesteps, context_raw, drop, train, rngs, capture_features):
        b = x.shape[0]
        s_img = x.shape[1]
        emb = self.time_embed(timestep_embedding(timesteps, self.frequency_embedding).astype(x.dtype))
        context_output = self.context_embedder(context_raw, drop)
        if self.pooled_embedding:
            emb = self.mlp_pooled_context(context_output["pooled_embeddings"].astype(x.dtype)) + emb
        context = self.context_embed(context_output["embeddings"].astype(x.dtype))
        if self.stream_dtype is not None:
            context = context.astype(self.stream_dtype)
        attn_mask = context_output.get("attn_mask")
        s_txt = context.shape[1]

        pos_ids = jnp.concatenate(
            [self._text_pos_ids(b, s_txt), self._image_pos_ids(b, grid_size, 3)], axis=1
        )
        cos_sin = get_cos_sin_ndim_grid(pos_ids, self.rope_base, self.rope_axes_dim)

        features: list[jax.Array] = []
        for i, layer in enumerate(self.layers):
            x, context = self._run_block(layer, x, emb, context, cos_sin, attn_mask)
            if capture_features and i in self.feature_layers:
                features.append(x)
        encoder_context = context

        cos_sin_img = tuple(r[:, s_txt:] for r in cos_sin)
        x_dropped, kept, cs_img_dropped = self.drop_tokens(x, cos_sin_img, train, rngs)
        cos_sin_dropped = tuple(
            jnp.concatenate([r[:, :s_txt], cs_img_dropped[i]], axis=1) for i, r in enumerate(cos_sin)
        )
        for layer in self.deep_layers:
            x_dropped, context = self._run_block(layer, x_dropped, emb, context, cos_sin_dropped, attn_mask)
        x_restored = self.restore_tokens(x_dropped, kept, s_img, drop)

        x_fused = self.fuse(jnp.concatenate([x_restored, x], axis=-1))
        context_fused = self.fuse_context(jnp.concatenate([context, encoder_context], axis=-1))
        if self.stream_dtype is not None:  # fuse linears emit the matmul dtype
            x_fused = x_fused.astype(self.stream_dtype)
            context_fused = context_fused.astype(self.stream_dtype)

        for layer in self.decoder_layers:
            x_fused, context_fused = self._run_block(layer, x_fused, emb, context_fused, cos_sin, attn_mask)
        x_fused = self.last_layer(x_fused, emb)
        out: ModelOutput = {"x": x_fused}
        if capture_features:
            out["features"] = features
        return out

    def _forward_dit(self, x, grid_size, timesteps, y, drop, train, rngs, capture_features):
        b, s_img = x.shape[:2]
        emb = self.time_embed(timestep_embedding(timesteps, self.frequency_embedding).astype(x.dtype))
        if self.label_embed is not None:
            assert y is not None
            emb = emb + self.label_embed(y, drop if self.classifier_free else None)

        pos_ids = self._image_pos_ids(b, grid_size, 2)
        cos_sin = get_cos_sin_ndim_grid(pos_ids, self.rope_base, self.rope_axes_dim)

        features: list[jax.Array] = []
        for i, layer in enumerate(self.layers):
            x = self._run_block(layer, x, emb, cos_sin, None)
            if capture_features and i in self.feature_layers:
                features.append(x)

        x_dropped, kept, cos_sin_dropped = self.drop_tokens(x, cos_sin, train, rngs)
        for layer in self.deep_layers:
            x_dropped = self._run_block(layer, x_dropped, emb, cos_sin_dropped, None)
        x_restored = self.restore_tokens(x_dropped, kept, s_img, drop)

        x_fused = self.fuse(jnp.concatenate([x_restored, x], axis=-1))
        if self.stream_dtype is not None:
            x_fused = x_fused.astype(self.stream_dtype)
        for layer in self.decoder_layers:
            x_fused = self._run_block(layer, x_fused, emb, cos_sin, None)
        x_fused = self.last_layer(x_fused, emb)
        out: ModelOutput = {"x": x_fused}
        if capture_features:
            out["features"] = features
        return out

    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        cond: dict[str, Any] | None = None,
        drop: jax.Array | None = None,
        train: bool = False,
        rngs: nnx.Rngs | None = None,
        capture_features: bool = False,
    ) -> ModelOutput:
        cond = cond or {}
        y = cond.get("y")
        context_raw = cond.get("context")
        x_context = cond.get("x_context")
        assert not (context_raw is not None and y is not None), "context and y cannot both be specified"
        if x_context is not None:
            x = jnp.concatenate([x, x_context], axis=-1)

        tokens, grid_size = self.patchify(x)
        if self.simple_dit:
            out = self._forward_dit(tokens, grid_size, timesteps, y, drop, train, rngs, capture_features)
        else:
            out = self._forward_mmdit(tokens, grid_size, timesteps, context_raw, drop, train, rngs, capture_features)
        out["x"] = self.unpatchify(out["x"], grid_size)
        return out
