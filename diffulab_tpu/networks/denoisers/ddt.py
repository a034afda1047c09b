"""DDT: encoder-decoder diffusion transformer (https://arxiv.org/pdf/2504.05741).

TPU redesign of reference src/diffulab/networks/denoisers/ddt.py:26-512,
reusing the DiT/MMDiT blocks:

- two separate stride-P conv patchifiers feed encoder and decoder streams
  (reference ddt.py:159-164, 232-250);
- the encoder is a DiT (simple) or MMDiT stack conditioned on time (+ labels /
  context) with embedding_dim == inner_dim;
- the decoder is a DiT stack whose adaLN conditioning vector is the PER-TOKEN
  ``silu(encoder_output + time_emb)`` (reference ddt.py:404-464) — Modulation
  accepts [B, S, D] conditioning natively;
- the modulated last layer is conditioned on the encoder output tokens too.

In simple mode every encoder block is a DiT block (the reference's
single-stream swap is unreachable from its own simple forward, ddt.py:140-144
vs encode_ddt:394; see the same note in mmdit.py).
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


class DDT(Denoiser):
    """Encoder-decoder DDT (reference ddt.py:26-512)."""

    def __init__(
        self,
        simple_ddt: bool = False,
        input_channels: int = 3,
        output_channels: int | None = None,
        inner_dim: int = 768,
        num_heads: int = 12,
        mlp_ratio: int = 4,
        patch_size: int = 16,
        encoder_depth: int = 8,
        n_single_stream_blocks: int = 0,
        decoder_depth: int = 4,
        rope_base: int = 10_000,
        partial_rotary_factor: float = 1.0,
        rope_axes_dim: Sequence[int] | None = None,
        frequency_embedding: int = 256,
        n_classes: int | None = None,
        classifier_free: bool = False,
        context_embedder: ContextEmbedder | None = None,
        use_checkpoint: bool = False,
        feature_layers: Sequence[int] = (),
        *,
        rngs: nnx.Rngs,
        dtype=None,
        param_dtype=jnp.float32,
    ):
        assert not (n_classes is not None and context_embedder is not None), (
            "n_classes and context_embedder cannot both be specified"
        )
        assert n_single_stream_blocks < encoder_depth, (
            "n_single_stream_blocks must be less than encoder_depth"
        )
        self.simple_ddt = simple_ddt
        self.patch_size = patch_size
        self.input_channels = input_channels
        self.output_channels = output_channels or input_channels
        self.context_embedder = nnx.data(context_embedder)
        self.frequency_embedding = frequency_embedding
        self.rope_base = rope_base
        self.n_classes = n_classes
        self.classifier_free = classifier_free
        self.use_checkpoint = use_checkpoint
        self.feature_layers = tuple(feature_layers)
        kw = dict(rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        # fp32 residual token stream under mixed precision (see mmdit.MMDiT)
        self.stream_dtype = stable_dtype(dtype)

        heads_dim = inner_dim // num_heads
        pooled = False
        mlp_pooled: PooledContextMlp | None = None
        label_embed: LabelEmbed | None = None
        context_embed: nnx.Linear | None = None
        if not simple_ddt:
            assert context_embedder is not None, "for ddt with text a context embedder must be provided"
            if context_embedder.n_output == 2:
                pooled = True
                mlp_pooled = PooledContextMlp(context_embedder.output_size[0], inner_dim, **kw)
                context_embed = _linear(context_embedder.output_size[1], inner_dim, use_bias=False, **kw)
            else:
                assert context_embedder.n_output == 1
                context_embed = _linear(context_embedder.output_size[0], inner_dim, use_bias=False, **kw)
            if rope_axes_dim is None:
                d3 = int((partial_rotary_factor * heads_dim) // 3)
                d3 -= d3 % 2
                rope_axes_dim = [d3, d3, d3]
        else:
            if n_classes is not None:
                label_embed = LabelEmbed(n_classes, inner_dim, classifier_free,
                                         rngs=rngs, dtype=dtype, param_dtype=param_dtype)
            if rope_axes_dim is None:
                d2 = int((partial_rotary_factor * heads_dim) // 2)
                d2 -= d2 % 2
                rope_axes_dim = [d2, d2]
            n_single_stream_blocks = 0  # see module docstring
        self.pooled_embedding = pooled
        self.mlp_pooled_context = nnx.data(mlp_pooled)
        self.label_embed = nnx.data(label_embed)
        self.context_embed = nnx.data(context_embed)

        self.rope_axes_dim = list(rope_axes_dim)
        self.last_layer = ModulatedLastLayer(inner_dim, inner_dim, patch_size, self.output_channels, **kw)
        self.time_embed = TimeEmbedMlp(frequency_embedding, inner_dim, **kw)

        conv_kw = dict(  # patchify fp32 under mixed precision (see mmdit.MMDiT)
            strides=(patch_size, patch_size), use_bias=False, padding="VALID",
            kernel_init=_xavier(), dtype=stable_dtype(dtype), param_dtype=param_dtype, rngs=rngs,
        )
        self.conv_proj_encoder = nnx.Conv(input_channels, inner_dim, (patch_size, patch_size), **conv_kw)
        self.conv_proj_decoder = nnx.Conv(input_channels, inner_dim, (patch_size, patch_size), **conv_kw)

        block_cls = DiTBlock if simple_ddt else MMDiTBlock
        n_dual = encoder_depth - n_single_stream_blocks
        self.layers = nnx.List(
            [block_cls(inner_dim, inner_dim, num_heads, mlp_ratio, self.rope_axes_dim, **kw)
             for _ in range(n_dual)]
            + [MMDiTSingleStreamBlock(inner_dim, inner_dim, num_heads, mlp_ratio, self.rope_axes_dim, **kw)
               for _ in range(n_single_stream_blocks)]
        )
        self.decoder_layers = nnx.List(
            [DiTBlock(inner_dim, inner_dim, num_heads, mlp_ratio, self.rope_axes_dim, **kw)
             for _ in range(decoder_depth)]
        )

    # --- patch ops ---------------------------------------------------------
    def patchify(self, x: jax.Array, encoder: bool = True) -> tuple[jax.Array, tuple[int, int]]:
        conv = self.conv_proj_encoder if encoder else self.conv_proj_decoder
        x = conv(x)
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

    def _image_pos_ids(self, batch: int, grid_size: tuple[int, int], n_axes: int) -> jax.Array:
        hp, wp = grid_size
        hh, ww = jnp.meshgrid(jnp.arange(hp), jnp.arange(wp), indexing="ij")
        axes = [hh.reshape(-1), ww.reshape(-1)]
        if n_axes == 3:
            axes = [jnp.zeros((hp * wp,), jnp.int32)] + axes
        pos = jnp.stack(axes, axis=-1)
        return jnp.broadcast_to(pos[None], (batch, hp * wp, n_axes))

    def _text_pos_ids(self, batch: int, seq_len: int) -> jax.Array:
        zeros = jnp.zeros((seq_len,), jnp.int32)
        pos = jnp.stack([jnp.arange(1, seq_len + 1), zeros, zeros], axis=-1)
        return jnp.broadcast_to(pos[None], (batch, seq_len, 3))

    def _run_block(self, layer, *args):
        if self.use_checkpoint:
            return _block_remat_ckpt(layer, *args)
        return _block_remat(layer, *args)

    # --- encoder/decoder ----------------------------------------------------
    def encode_mmddt(self, x, grid_size, timesteps, context_raw, drop, capture_features):
        """MMDiT encoder over [context; image] (reference ddt.py:274-344)."""
        b = x.shape[0]
        emb = self.time_embed(timestep_embedding(timesteps, self.frequency_embedding).astype(x.dtype))
        context_output = self.context_embedder(context_raw, drop)
        if self.pooled_embedding:
            emb = self.mlp_pooled_context(context_output["pooled_embeddings"].astype(x.dtype)) + emb
        context = self.context_embed(context_output["embeddings"].astype(x.dtype))
        if self.stream_dtype is not None:
            context = context.astype(self.stream_dtype)
        attn_mask = context_output.get("attn_mask")

        pos_ids = jnp.concatenate(
            [self._text_pos_ids(b, context.shape[1]), self._image_pos_ids(b, grid_size, 3)], axis=1
        )
        cos_sin = get_cos_sin_ndim_grid(pos_ids, self.rope_base, self.rope_axes_dim)

        features: list[jax.Array] = []
        for i, layer in enumerate(self.layers):
            x, context = self._run_block(layer, x, emb, context, cos_sin, attn_mask)
            if capture_features and i in self.feature_layers:
                features.append(x)
        return {"x": x, "features": features}

    def encode_ddt(self, x, grid_size, timesteps, y, drop, capture_features):
        """DiT encoder with label conditioning (reference ddt.py:346-402)."""
        b = x.shape[0]
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
        return {"x": x, "features": features}

    def decode(self, x, encoder_output, grid_size, timesteps):
        """DiT decoder conditioned per-token on silu(enc + t_emb)
        (reference ddt.py:404-464)."""
        b = x.shape[0]
        emb = self.time_embed(timestep_embedding(timesteps, self.frequency_embedding).astype(x.dtype))
        cond_tokens = jax.nn.silu(encoder_output + emb[:, None, :])

        n_axes = 2 if self.simple_ddt else 3
        pos_ids = self._image_pos_ids(b, grid_size, n_axes)
        cos_sin = get_cos_sin_ndim_grid(pos_ids, self.rope_base, self.rope_axes_dim)

        for layer in self.decoder_layers:
            x = self._run_block(layer, x, cond_tokens, cos_sin, None)
        return self.last_layer(x, cond_tokens)

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
        del train, rngs
        cond = cond or {}
        y = cond.get("y")
        context_raw = cond.get("context")
        x_context = cond.get("x_context")
        assert not (context_raw is not None and y is not None), "context and y cannot both be specified"
        if x_context is not None:
            x = jnp.concatenate([x, x_context], axis=-1)

        enc_tokens, grid_size = self.patchify(x, encoder=True)
        if self.simple_ddt:
            enc = self.encode_ddt(enc_tokens, grid_size, timesteps, y, drop, capture_features)
        else:
            enc = self.encode_mmddt(enc_tokens, grid_size, timesteps, context_raw, drop, capture_features)

        dec_tokens, _ = self.patchify(x, encoder=False)
        out_tokens = self.decode(dec_tokens, enc["x"], grid_size, timesteps)

        out: ModelOutput = {"x": self.unpatchify(out_tokens, grid_size)}
        if capture_features:
            out["features"] = enc["features"]
        return out
