"""DC-AE tower (reference src/diffulab/networks/vision_towers/dc_ae.py:8-84).

Deep-compression autoencoder (DC-AE, arXiv:2410.10733). The reference wraps
diffusers ``AutoencoderDC`` ("mit-han-lab/dc-ae-f32c32-in-1.0-diffusers",
dc_ae.py:9-18); this is a native NHWC JAX implementation of that
architecture:

* **Residual autoencoding** — the paper's core trick: every down/upsample
  and the latent projection carries a parameter-free space-to-channel
  shortcut (pixel-unshuffle + channel-group averaging on the way down,
  channel duplication + pixel-shuffle on the way up) so the learned convs
  only model residuals.
* **EfficientViT stages** — the low-resolution stages use LiteMLA (ReLU
  linear attention with multi-scale depthwise-conv token aggregation,
  O(S·d²) instead of O(S²·d)) + GLUMBConv (gated inverted-bottleneck
  depthwise conv), both RMS-normalized with residuals; the high-resolution
  stages use plain conv ResBlocks.
* Deterministic latent (no KL sampling; reference dc_ae.py:59 ``.latent``),
  inputs normalized to [-1, 1], latents scaled by ``scaling_factor``.

Defaults give f32c32 (6 stages, 5 downsamples, 32 latent channels,
scaling_factor 0.41407 from the dc-ae-f32c32-in-1.0 config).

``load_dc_ae_state_dict`` ports diffusers ``AutoencoderDC`` checkpoints;
the key naming follows the diffusers module tree to the best of available
knowledge (no diffusers source in this environment) and any mismatch
raises with the full unmatched-key diff rather than silently skipping.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from diffulab_tpu.networks.nn import nearest_upsample_2x
from diffulab_tpu.networks.vision_towers.common import VisionTower, normalize_to_pm1

_F32C32_CHANNELS = (128, 256, 512, 512, 1024, 1024)
_F32C32_TYPES = ("res", "res", "res", "vit", "vit", "vit")
_F32C32_ENC_LAYERS = (2, 2, 2, 3, 3, 3)
_F32C32_DEC_LAYERS = (3, 3, 3, 3, 3, 3)
_F32C32_MULTISCALES: tuple[tuple[int, ...], ...] = ((), (), (), (5,), (5,), (5,))


def _conv(cin, cout, k, *, stride=1, use_bias=True, groups=1, rngs, dtype, param_dtype):
    return nnx.Conv(
        cin, cout, (k, k), strides=(stride, stride), padding="SAME",
        feature_group_count=groups, use_bias=use_bias,
        rngs=rngs, dtype=dtype, param_dtype=param_dtype,
    )


class ChannelRMSNorm(nnx.Module):
    """Channel-last RMSNorm in fp32 (diffusers RMSNorm with bias)."""

    def __init__(self, dim: int, *, rngs: nnx.Rngs, param_dtype=jnp.float32, eps: float = 1e-5):
        del rngs
        self.scale = nnx.Param(jnp.ones((dim,), param_dtype))
        self.bias = nnx.Param(jnp.zeros((dim,), param_dtype))
        self.eps = eps

    def __call__(self, x: jax.Array) -> jax.Array:
        h = x.astype(jnp.float32)
        h = h * jax.lax.rsqrt(jnp.mean(h * h, axis=-1, keepdims=True) + self.eps)
        return (h * self.scale[...] + self.bias[...]).astype(x.dtype)


class DCResBlock(nnx.Module):
    """conv3x3 -> act -> conv3x3(no bias) -> RMSNorm, residual
    (diffusers autoencoder_dc ResBlock)."""

    def __init__(self, channels: int, *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32):
        kw = dict(rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        self.conv1 = _conv(channels, channels, 3, **kw)
        self.conv2 = _conv(channels, channels, 3, use_bias=False, **kw)
        self.norm = ChannelRMSNorm(channels, rngs=rngs, param_dtype=param_dtype)

    def __call__(self, x: jax.Array) -> jax.Array:
        h = self.conv2(jax.nn.silu(self.conv1(x)))
        return self.norm(h) + x


class GLUMBConv(nnx.Module):
    """Gated inverted-bottleneck depthwise conv (diffusers GLUMBConv):
    1x1 expand to 2*mult*C -> silu -> 3x3 depthwise -> GLU gate ->
    1x1 project (no bias) -> RMSNorm, residual."""

    def __init__(self, channels: int, mult: int = 4, *, rngs: nnx.Rngs, dtype=None,
                 param_dtype=jnp.float32):
        hidden = channels * mult
        kw = dict(rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        self.conv_inverted = _conv(channels, hidden * 2, 1, **kw)
        self.conv_depth = _conv(hidden * 2, hidden * 2, 3, groups=hidden * 2, **kw)
        self.conv_point = _conv(hidden, channels, 1, use_bias=False, **kw)
        self.norm = ChannelRMSNorm(channels, rngs=rngs, param_dtype=param_dtype)

    def __call__(self, x: jax.Array) -> jax.Array:
        h = jax.nn.silu(self.conv_inverted(x))
        h = self.conv_depth(h)
        h, gate = jnp.split(h, 2, axis=-1)
        h = self.conv_point(h * jax.nn.silu(gate))
        return self.norm(h) + x


class LiteMLA(nnx.Module):
    """Multi-scale ReLU linear attention (EfficientViT LiteMLA / diffusers
    SanaMultiscaleLinearAttention): qkv via bias-free linears, extra scales
    via depthwise convs over the packed qkv map, per-head linear attention
    out = relu(q) (relu(k)^T v) / (relu(q) relu(k)^T 1 + eps)."""

    def __init__(self, channels: int, head_dim: int = 8,
                 multiscales: Sequence[int] = (5,), *, rngs: nnx.Rngs,
                 dtype=None, param_dtype=jnp.float32):
        assert channels % head_dim == 0
        kw = dict(rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        lin = dict(use_bias=False, rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        self.to_q = nnx.Linear(channels, channels, **lin)
        self.to_k = nnx.Linear(channels, channels, **lin)
        self.to_v = nnx.Linear(channels, channels, **lin)
        self.to_qkv_multiscale = nnx.List([
            _conv(3 * channels, 3 * channels, k, groups=3 * channels, **kw)
            for k in multiscales
        ])
        n_scales = 1 + len(multiscales)
        self.to_out = nnx.Linear(channels * n_scales, channels, **lin)
        self.norm_out = ChannelRMSNorm(channels, rngs=rngs, param_dtype=param_dtype)
        self.head_dim = head_dim
        self.eps = 1e-15

    def _attend(self, qkv: jax.Array) -> jax.Array:
        """qkv: [B, H, W, 3C] -> linear attention output [B, H, W, C]."""
        b, h, w, _ = qkv.shape
        q, k, v = jnp.split(qkv.reshape(b, h * w, -1), 3, axis=-1)
        d = self.head_dim
        q = jax.nn.relu(q).reshape(b, h * w, -1, d)
        k = jax.nn.relu(k).reshape(b, h * w, -1, d)
        v = v.reshape(b, h * w, -1, d)
        # fp32 accumulation: relu-kernel normalizers underflow in bf16
        q, k, v = (t.astype(jnp.float32) for t in (q, k, v))
        kv = jnp.einsum("bshd,bshe->bhde", k, v)
        k1 = jnp.sum(k, axis=1)  # [B, heads, d]
        num = jnp.einsum("bshd,bhde->bshe", q, kv)
        den = jnp.einsum("bshd,bhd->bsh", q, k1)[..., None] + self.eps
        out = (num / den).reshape(b, h, w, -1)
        return out

    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        qkv = jnp.concatenate([self.to_q(x), self.to_k(x), self.to_v(x)], axis=-1)
        outs = [self._attend(qkv)]
        for conv in self.to_qkv_multiscale:
            outs.append(self._attend(conv(qkv)))
        out = self.to_out(jnp.concatenate(outs, axis=-1).astype(x.dtype))
        return self.norm_out(out) + x


class EfficientViTBlock(nnx.Module):
    """LiteMLA + GLUMBConv, both residual (diffusers EfficientViTBlock)."""

    def __init__(self, channels: int, head_dim: int = 8,
                 multiscales: Sequence[int] = (5,), *, rngs: nnx.Rngs,
                 dtype=None, param_dtype=jnp.float32):
        kw = dict(rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        self.attn = LiteMLA(channels, head_dim, multiscales, **kw)
        self.conv_out = GLUMBConv(channels, 4, **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.conv_out(self.attn(x))


def _space_to_depth(x: jax.Array) -> jax.Array:
    """NHWC pixel-unshuffle(2) with torch channel order ch = c*4 + subpixel."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [B, H/2, W/2, C, 2, 2]
    return x.reshape(b, h // 2, w // 2, c * 4)


def _depth_to_space(x: jax.Array) -> jax.Array:
    """NHWC pixel-shuffle(2), inverse channel order of ``_space_to_depth``."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, c // 4, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # [B, H, 2, W, 2, C/4]
    return x.reshape(b, h * 2, w * 2, c // 4)


def _channel_group_mean(x: jax.Array, cout: int) -> jax.Array:
    """Average consecutive channel groups down to ``cout`` channels."""
    cin = x.shape[-1]
    assert cin % cout == 0, f"cannot group {cin} channels into {cout}"
    return x.reshape(*x.shape[:-1], cout, cin // cout).mean(axis=-1)


class DCDownBlock(nnx.Module):
    """Strided conv downsample + parameter-free space-to-channel shortcut
    (DC-AE residual downsampling; diffusers DCDownBlock2d)."""

    def __init__(self, cin: int, cout: int, *, rngs: nnx.Rngs, dtype=None,
                 param_dtype=jnp.float32):
        self.conv = _conv(cin, cout, 3, stride=2, rngs=rngs, dtype=dtype,
                          param_dtype=param_dtype)
        self.cout = cout
        # the parameter-free shortcut needs 4*cin to group-average into cout;
        # incompatible (tiny test) geometries just drop it
        self.shortcut = (4 * cin) % cout == 0

    def __call__(self, x: jax.Array) -> jax.Array:
        h = self.conv(x)
        if not self.shortcut:
            return h
        return h + _channel_group_mean(_space_to_depth(x), self.cout)


class DCUpBlock(nnx.Module):
    """Upsample + channel-duplication shortcut (diffusers DCUpBlock2d).

    ``pixel_shuffle``: conv to 4*cout then depth-to-space, shortcut =
    repeat channels to 4*cout then depth-to-space. ``interpolate``:
    nearest x2 then conv, no shortcut.
    """

    def __init__(self, cin: int, cout: int, mode: str = "pixel_shuffle", *,
                 rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32):
        assert mode in ("pixel_shuffle", "interpolate")
        self.mode = mode
        self.cin, self.cout = cin, cout
        out = cout * 4 if mode == "pixel_shuffle" else cout
        self.conv = _conv(cin, out, 3, rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        # channel-duplication shortcut needs cin to repeat evenly into 4*cout
        self.shortcut = mode == "pixel_shuffle" and (4 * cout) % cin == 0 and 4 * cout >= cin

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.mode == "interpolate":
            return self.conv(nearest_upsample_2x(x))
        h = _depth_to_space(self.conv(x))
        if not self.shortcut:
            return h
        rep = (4 * self.cout) // self.cin
        return h + _depth_to_space(jnp.repeat(x, rep, axis=-1))


class DCAEEncoder(nnx.Module):
    """conv_in -> [down, blocks...] per stage -> conv_out + group-mean
    latent shortcut (diffusers autoencoder_dc Encoder)."""

    def __init__(self, in_channels, channels, block_types, layers_per_block,
                 latent_channels, multiscales, head_dim, *, rngs: nnx.Rngs,
                 dtype=None, param_dtype=jnp.float32):
        kw = dict(rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        self.conv_in = _conv(in_channels, channels[0], 3, **kw)
        stages = []
        for i, ch in enumerate(channels):
            stage: list[Any] = []
            if i > 0:
                stage.append(DCDownBlock(channels[i - 1], ch, **kw))
            for _ in range(layers_per_block[i]):
                if block_types[i] == "res":
                    stage.append(DCResBlock(ch, **kw))
                else:
                    stage.append(EfficientViTBlock(ch, head_dim, multiscales[i], **kw))
            stages.append(nnx.List(stage))
        self.down_blocks = nnx.List(stages)
        self.conv_out = _conv(channels[-1], latent_channels, 3, **kw)
        self.latent_channels = latent_channels
        self.out_shortcut = channels[-1] % latent_channels == 0

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.conv_in(x)
        for stage in self.down_blocks:
            for block in stage:
                x = block(x)
        h = self.conv_out(x)
        if not self.out_shortcut:
            return h
        return h + _channel_group_mean(x, self.latent_channels)


class DCAEDecoder(nnx.Module):
    """conv_in + channel-repeat latent shortcut -> [up, blocks...] reversed
    stages -> RMSNorm -> relu -> conv_out (diffusers autoencoder_dc Decoder)."""

    def __init__(self, out_channels, channels, block_types, layers_per_block,
                 latent_channels, multiscales, head_dim,
                 upsample_mode="pixel_shuffle", *, rngs: nnx.Rngs,
                 dtype=None, param_dtype=jnp.float32):
        kw = dict(rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        self.conv_in = _conv(latent_channels, channels[-1], 3, **kw)
        # latent-repeat shortcut only when the latent repeats evenly
        self.in_repeats = (channels[-1] // latent_channels
                           if channels[-1] % latent_channels == 0 else 0)
        stages = []
        n = len(channels)
        for i in reversed(range(n)):
            stage: list[Any] = []
            if i < n - 1:
                stage.append(DCUpBlock(channels[i + 1], channels[i], upsample_mode, **kw))
            for _ in range(layers_per_block[i]):
                if block_types[i] == "res":
                    stage.append(DCResBlock(channels[i], **kw))
                else:
                    stage.append(EfficientViTBlock(channels[i], head_dim, multiscales[i], **kw))
            stages.append(nnx.List(stage))
        self.up_blocks = nnx.List(stages)
        self.norm_out = ChannelRMSNorm(channels[0], rngs=rngs, param_dtype=param_dtype)
        self.conv_out = _conv(channels[0], out_channels, 3, **kw)

    def __call__(self, z: jax.Array) -> jax.Array:
        x = self.conv_in(z)
        if self.in_repeats:
            x = x + jnp.repeat(z, self.in_repeats, axis=-1)
        for stage in self.up_blocks:
            for block in stage:
                x = block(x)
        return self.conv_out(jax.nn.relu(self.norm_out(x)))


class DCAE(VisionTower):
    """DC-AE f32c32 vision tower (reference dc_ae.py:8-84, native JAX)."""

    def __init__(
        self,
        block_out_channels: Sequence[int] = _F32C32_CHANNELS,
        block_types: Sequence[str] = _F32C32_TYPES,
        encoder_layers_per_block: Sequence[int] = _F32C32_ENC_LAYERS,
        decoder_layers_per_block: Sequence[int] = _F32C32_DEC_LAYERS,
        latent_channels: int = 32,
        qkv_multiscales: Sequence[Sequence[int]] = _F32C32_MULTISCALES,
        attention_head_dim: int = 8,
        upsample_mode: str = "pixel_shuffle",
        scaling_factor: float = 0.41407,  # dc-ae-f32c32-in-1.0 config
        *,
        rngs: nnx.Rngs | None = None,
        dtype=None,
        param_dtype=jnp.float32,
    ) -> None:
        super().__init__(latent_scale=scaling_factor)
        rngs = rngs or nnx.Rngs(0)
        kw = dict(rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        self.encoder = DCAEEncoder(3, tuple(block_out_channels), tuple(block_types),
                                   tuple(encoder_layers_per_block), latent_channels,
                                   tuple(tuple(m) for m in qkv_multiscales),
                                   attention_head_dim, **kw)
        self.decoder = DCAEDecoder(3, tuple(block_out_channels), tuple(block_types),
                                   tuple(decoder_layers_per_block), latent_channels,
                                   tuple(tuple(m) for m in qkv_multiscales),
                                   attention_head_dim, upsample_mode, **kw)
        self._compression_factor = 2 ** (len(block_out_channels) - 1)
        self._latent_channels = latent_channels

    @property
    def compression_factor(self) -> int:
        return self._compression_factor

    @property
    def latent_channels(self) -> int:
        return self._latent_channels

    def encode(self, x: jax.Array, rng: jax.Array | None = None) -> jax.Array:
        del rng  # deterministic latent (reference dc_ae.py:59: .latent)
        x = normalize_to_pm1(x)
        return self.encoder(x)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(z)


# --------------------------------------------------------------------------- #
# diffusers AutoencoderDC checkpoint porting
# --------------------------------------------------------------------------- #
def _t_conv(w: np.ndarray) -> np.ndarray:
    """torch conv [O, I/g, H, W] -> flax [H, W, I/g, O]."""
    return np.transpose(w, (2, 3, 1, 0))


def load_dc_ae_state_dict(model: DCAE, sd: dict[str, np.ndarray]) -> None:
    """Port a diffusers ``AutoencoderDC`` state dict into :class:`DCAE`.

    Expected key scheme (best-effort diffusers naming; unmatched keys raise):
    ``{enc,dec}oder.conv_in/conv_out.{weight,bias}``,
    ``encoder.down_blocks.{s}.{j}.…`` / ``decoder.up_blocks.{s}.{j}.…`` where
    ``j`` indexes [down/up-sampler if present] + blocks; block fields:
    ResBlock ``conv1/conv2/norm``, EfficientViTBlock
    ``attn.{to_q,to_k,to_v,to_qkv_multiscale.{m}.proj,to_out,norm_out}`` and
    ``conv_out.{conv_inverted,conv_depth,conv_point,norm}``.
    """
    used: set[str] = set()

    def take(key: str) -> np.ndarray:
        used.add(key)
        assert key in sd, f"missing checkpoint key: {key}"
        return np.asarray(sd[key])

    def set_conv(mod: nnx.Conv, prefix: str) -> None:
        w = _t_conv(take(prefix + ".weight"))
        assert mod.kernel.shape == w.shape, f"{prefix}: {mod.kernel.shape} vs {w.shape}"
        mod.kernel[...] = jnp.asarray(w)
        if mod.bias is not None:
            mod.bias[...] = jnp.asarray(take(prefix + ".bias"))

    def set_linear(mod: nnx.Linear, prefix: str) -> None:
        w = np.transpose(take(prefix + ".weight"))  # [out,in] -> [in,out]
        assert mod.kernel.shape == w.shape, f"{prefix}: {mod.kernel.shape} vs {w.shape}"
        mod.kernel[...] = jnp.asarray(w)
        if mod.bias is not None:
            mod.bias[...] = jnp.asarray(take(prefix + ".bias"))

    def set_norm(mod: ChannelRMSNorm, prefix: str) -> None:
        mod.scale[...] = jnp.asarray(take(prefix + ".weight"))
        if prefix + ".bias" in sd:
            mod.bias[...] = jnp.asarray(take(prefix + ".bias"))

    def set_block(block: Any, prefix: str) -> None:
        if isinstance(block, DCResBlock):
            set_conv(block.conv1, prefix + ".conv1")
            set_conv(block.conv2, prefix + ".conv2")
            set_norm(block.norm, prefix + ".norm")
        elif isinstance(block, EfficientViTBlock):
            attn, conv = block.attn, block.conv_out
            set_linear(attn.to_q, prefix + ".attn.to_q")
            set_linear(attn.to_k, prefix + ".attn.to_k")
            set_linear(attn.to_v, prefix + ".attn.to_v")
            for m, ms_conv in enumerate(attn.to_qkv_multiscale):
                set_conv(ms_conv, f"{prefix}.attn.to_qkv_multiscale.{m}.proj")
            set_linear(attn.to_out, prefix + ".attn.to_out")
            set_norm(attn.norm_out, prefix + ".attn.norm_out")
            set_conv(conv.conv_inverted, prefix + ".conv_out.conv_inverted")
            set_conv(conv.conv_depth, prefix + ".conv_out.conv_depth")
            set_conv(conv.conv_point, prefix + ".conv_out.conv_point")
            set_norm(conv.norm, prefix + ".conv_out.norm")
        elif isinstance(block, (DCDownBlock, DCUpBlock)):
            set_conv(block.conv, prefix + ".conv")
        else:  # pragma: no cover
            raise TypeError(f"unknown block {type(block)} at {prefix}")

    set_conv(model.encoder.conv_in, "encoder.conv_in")
    for s, stage in enumerate(model.encoder.down_blocks):
        for j, block in enumerate(stage):
            set_block(block, f"encoder.down_blocks.{s}.{j}")
    set_conv(model.encoder.conv_out, "encoder.conv_out")

    set_conv(model.decoder.conv_in, "decoder.conv_in")
    for s, stage in enumerate(model.decoder.up_blocks):
        for j, block in enumerate(stage):
            set_block(block, f"decoder.up_blocks.{s}.{j}")
    set_norm(model.decoder.norm_out, "decoder.norm_out")
    set_conv(model.decoder.conv_out, "decoder.conv_out")

    unused = sorted(set(sd) - used)
    assert not unused, f"unmatched checkpoint keys: {unused}"
