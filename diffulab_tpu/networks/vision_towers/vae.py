"""SD/Flux-family convolutional KL-VAE building blocks in Flax NNX (NHWC).

The CompVis/StableDiffusion autoencoder architecture (GroupNorm-SiLU-conv
residual blocks, single-head mid attention, strided-conv downsampling,
nearest-upsample + conv decoding) that diffusers' ``AutoencoderKL`` family —
including the Flux VAEs — instantiates. ``load_autoencoder_kl_state_dict``
ports a diffusers checkpoint (numpy-converted) onto these modules so locally
available VAE weights run on TPU without diffusers/torch at inference.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from diffulab_tpu.networks.nn import nearest_upsample_2x


class VAEResnetBlock(nnx.Module):
    def __init__(self, cin: int, cout: int, *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm1 = nnx.GroupNorm(cin, num_groups=min(32, cin), epsilon=1e-6, **kw)
        self.conv1 = nnx.Conv(cin, cout, (3, 3), padding=1, **kw)
        self.norm2 = nnx.GroupNorm(cout, num_groups=min(32, cout), epsilon=1e-6, **kw)
        self.conv2 = nnx.Conv(cout, cout, (3, 3), padding=1, **kw)
        self.shortcut = (
            nnx.Conv(cin, cout, (1, 1), **kw) if cin != cout else None
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        h = self.conv1(jax.nn.silu(self.norm1(x)))
        h = self.conv2(jax.nn.silu(self.norm2(h)))
        skip = self.shortcut(x) if self.shortcut is not None else x
        return skip + h


class VAEAttnBlock(nnx.Module):
    """Single-head full attention over spatial tokens (VAE mid block)."""

    def __init__(self, channels: int, *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm = nnx.GroupNorm(channels, num_groups=min(32, channels), epsilon=1e-6, **kw)
        self.to_q = nnx.Linear(channels, channels, **kw)
        self.to_k = nnx.Linear(channels, channels, **kw)
        self.to_v = nnx.Linear(channels, channels, **kw)
        self.to_out = nnx.Linear(channels, channels, **kw)
        self.scale = channels**-0.5

    def __call__(self, x: jax.Array) -> jax.Array:
        b, h_, w_, c = x.shape
        tokens = self.norm(x).reshape(b, h_ * w_, c)
        q, k, v = self.to_q(tokens), self.to_k(tokens), self.to_v(tokens)
        attn = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", q, k).astype(jnp.float32) * self.scale, axis=-1
        ).astype(v.dtype)
        out = self.to_out(jnp.einsum("bnm,bmc->bnc", attn, v))
        return x + out.reshape(b, h_, w_, c)


class VAEEncoder(nnx.Module):
    def __init__(self, in_channels: int = 3, base_channels: int = 128,
                 ch_mult: Sequence[int] = (1, 2, 4, 4), num_res_blocks: int = 2,
                 z_channels: int = 16, double_z: bool = True, mid_attention: bool = True,
                 *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32):
        kw = dict(rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        self.conv_in = nnx.Conv(in_channels, base_channels, (3, 3), padding=1,
                                dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        down_blocks = []
        downsamplers = []
        ch = base_channels
        for level, mult in enumerate(ch_mult):
            cout = base_channels * mult
            blocks = []
            for _ in range(num_res_blocks):
                blocks.append(VAEResnetBlock(ch, cout, **kw))
                ch = cout
            down_blocks.append(nnx.List(blocks))
            if level != len(ch_mult) - 1:
                downsamplers.append(nnx.Conv(ch, ch, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)),
                                             dtype=dtype, param_dtype=param_dtype, rngs=rngs))
            else:
                downsamplers.append(None)
        self.down_blocks = nnx.List(down_blocks)
        self.downsamplers = nnx.data(downsamplers)
        self.mid_res1 = VAEResnetBlock(ch, ch, **kw)
        self.mid_attn = VAEAttnBlock(ch, **kw) if mid_attention else None
        self.mid_res2 = VAEResnetBlock(ch, ch, **kw)
        self.norm_out = nnx.GroupNorm(ch, num_groups=min(32, ch), epsilon=1e-6,
                                      dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.conv_out = nnx.Conv(ch, 2 * z_channels if double_z else z_channels, (3, 3), padding=1,
                                 dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        h = self.conv_in(x)
        for blocks, down in zip(self.down_blocks, self.downsamplers):
            for block in blocks:
                h = block(h)
            if down is not None:
                h = down(h)
        h = self.mid_res1(h)
        if self.mid_attn is not None:
            h = self.mid_attn(h)
        h = self.mid_res2(h)
        return self.conv_out(jax.nn.silu(self.norm_out(h)))


class VAEDecoder(nnx.Module):
    def __init__(self, out_channels: int = 3, base_channels: int = 128,
                 ch_mult: Sequence[int] = (1, 2, 4, 4), num_res_blocks: int = 2,
                 z_channels: int = 16, mid_attention: bool = True,
                 *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32):
        kw = dict(rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        ch = base_channels * ch_mult[-1]
        self.conv_in = nnx.Conv(z_channels, ch, (3, 3), padding=1,
                                dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.mid_res1 = VAEResnetBlock(ch, ch, **kw)
        self.mid_attn = VAEAttnBlock(ch, **kw) if mid_attention else None
        self.mid_res2 = VAEResnetBlock(ch, ch, **kw)
        up_blocks = []
        upsamplers = []
        for level, mult in enumerate(reversed(ch_mult)):
            cout = base_channels * mult
            blocks = []
            for _ in range(num_res_blocks + 1):
                blocks.append(VAEResnetBlock(ch, cout, **kw))
                ch = cout
            up_blocks.append(nnx.List(blocks))
            if level != len(ch_mult) - 1:
                upsamplers.append(nnx.Conv(ch, ch, (3, 3), padding=1,
                                           dtype=dtype, param_dtype=param_dtype, rngs=rngs))
            else:
                upsamplers.append(None)
        self.up_blocks = nnx.List(up_blocks)
        self.upsamplers = nnx.data(upsamplers)
        self.norm_out = nnx.GroupNorm(ch, num_groups=min(32, ch), epsilon=1e-6,
                                      dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.conv_out = nnx.Conv(ch, out_channels, (3, 3), padding=1,
                                 dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, z: jax.Array) -> jax.Array:
        h = self.conv_in(z)
        h = self.mid_res1(h)
        if self.mid_attn is not None:
            h = self.mid_attn(h)
        h = self.mid_res2(h)
        for blocks, up in zip(self.up_blocks, self.upsamplers):
            for block in blocks:
                h = block(h)
            if up is not None:
                h = nearest_upsample_2x(h)
                h = up(h)
        return self.conv_out(jax.nn.silu(self.norm_out(h)))


def diagonal_gaussian_sample(moments: jax.Array, rng: jax.Array | None) -> jax.Array:
    """Sample (or take the mean when rng is None) from encoder moments
    [..., 2*z]: first half mean, second half logvar (diffusers convention)."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if rng is None:
        return mean
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)


# --------------------------------------------------------------------------- #
# diffusers AutoencoderKL weight porting
# --------------------------------------------------------------------------- #


def _put(param, value):
    value = np.asarray(value)
    assert param.shape == value.shape, f"{param.shape} vs {value.shape}"
    param[...] = jnp.asarray(value, dtype=param[...].dtype)


def _port_conv(conv: nnx.Conv, sd: dict, prefix: str) -> None:
    _put(conv.kernel, np.transpose(sd[prefix + ".weight"], (2, 3, 1, 0)))
    _put(conv.bias, sd[prefix + ".bias"])


def _port_gn(norm: nnx.GroupNorm, sd: dict, prefix: str) -> None:
    _put(norm.scale, sd[prefix + ".weight"])
    _put(norm.bias, sd[prefix + ".bias"])


def _port_resnet(block: VAEResnetBlock, sd: dict, prefix: str) -> None:
    _port_gn(block.norm1, sd, prefix + ".norm1")
    _port_conv(block.conv1, sd, prefix + ".conv1")
    _port_gn(block.norm2, sd, prefix + ".norm2")
    _port_conv(block.conv2, sd, prefix + ".conv2")
    if block.shortcut is not None:
        _port_conv(block.shortcut, sd, prefix + ".conv_shortcut")


def _port_attn(attn: VAEAttnBlock, sd: dict, prefix: str) -> None:
    _port_gn(attn.norm, sd, prefix + ".group_norm")
    for name, lin in (("to_q", attn.to_q), ("to_k", attn.to_k), ("to_v", attn.to_v)):
        _put(lin.kernel, sd[f"{prefix}.{name}.weight"].T)
        _put(lin.bias, sd[f"{prefix}.{name}.bias"])
    _put(attn.to_out.kernel, sd[prefix + ".to_out.0.weight"].T)
    _put(attn.to_out.bias, sd[prefix + ".to_out.0.bias"])


def load_autoencoder_kl_state_dict(encoder: VAEEncoder, decoder: VAEDecoder,
                                   sd: dict[str, np.ndarray]) -> None:
    """Port a diffusers AutoencoderKL state dict (numpy arrays) onto
    VAEEncoder/VAEDecoder. quant/post_quant convs, when present, must be
    identity (Flux-family VAEs have none)."""
    _port_conv(encoder.conv_in, sd, "encoder.conv_in")
    for i, (blocks, down) in enumerate(zip(encoder.down_blocks, encoder.downsamplers)):
        for j, block in enumerate(blocks):
            _port_resnet(block, sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if down is not None:
            _port_conv(down, sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
    _port_resnet(encoder.mid_res1, sd, "encoder.mid_block.resnets.0")
    if encoder.mid_attn is not None:
        _port_attn(encoder.mid_attn, sd, "encoder.mid_block.attentions.0")
    _port_resnet(encoder.mid_res2, sd, "encoder.mid_block.resnets.1")
    _port_gn(encoder.norm_out, sd, "encoder.conv_norm_out")
    _port_conv(encoder.conv_out, sd, "encoder.conv_out")

    _port_conv(decoder.conv_in, sd, "decoder.conv_in")
    _port_resnet(decoder.mid_res1, sd, "decoder.mid_block.resnets.0")
    if decoder.mid_attn is not None:
        _port_attn(decoder.mid_attn, sd, "decoder.mid_block.attentions.0")
    _port_resnet(decoder.mid_res2, sd, "decoder.mid_block.resnets.1")
    for i, (blocks, up) in enumerate(zip(decoder.up_blocks, decoder.upsamplers)):
        for j, block in enumerate(blocks):
            _port_resnet(block, sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if up is not None:
            _port_conv(up, sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
    _port_gn(decoder.norm_out, sd, "decoder.conv_norm_out")
    _port_conv(decoder.conv_out, sd, "decoder.conv_out")
