"""Weight-porting validation with synthetic state dicts.

Builds numpy state dicts in the exact diffusers/dinov2 naming + layout
(torch [out, in] linears, [O, I, H, W] convs), ports them, and checks the
Flax modules produce the mathematically expected outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from diffulab_tpu.networks.repa.vit import ViTEncoder, load_dinov2_state_dict, resample_abs_pos_embed
from diffulab_tpu.networks.vision_towers.vae import (
    VAEDecoder,
    VAEEncoder,
    load_autoencoder_kl_state_dict,
)


def _vae_state_dict(base=8, ch_mult=(1, 2), nres=1, z=4):
    """Synthetic diffusers AutoencoderKL state dict matching the tiny config."""
    rng = np.random.default_rng(0)
    sd = {}

    def conv(prefix, cin, cout, k=3):
        sd[prefix + ".weight"] = rng.normal(scale=0.05, size=(cout, cin, k, k)).astype(np.float32)
        sd[prefix + ".bias"] = rng.normal(scale=0.01, size=(cout,)).astype(np.float32)

    def gn(prefix, c):
        sd[prefix + ".weight"] = rng.normal(1.0, 0.01, size=(c,)).astype(np.float32)
        sd[prefix + ".bias"] = rng.normal(0.0, 0.01, size=(c,)).astype(np.float32)

    def resnet(prefix, cin, cout):
        gn(prefix + ".norm1", cin)
        conv(prefix + ".conv1", cin, cout)
        gn(prefix + ".norm2", cout)
        conv(prefix + ".conv2", cout, cout)
        if cin != cout:
            conv(prefix + ".conv_shortcut", cin, cout, k=1)

    def attn(prefix, c):
        gn(prefix + ".group_norm", c)
        for name in ("to_q", "to_k", "to_v"):
            sd[f"{prefix}.{name}.weight"] = rng.normal(scale=0.05, size=(c, c)).astype(np.float32)
            sd[f"{prefix}.{name}.bias"] = np.zeros((c,), np.float32)
        sd[prefix + ".to_out.0.weight"] = rng.normal(scale=0.05, size=(c, c)).astype(np.float32)
        sd[prefix + ".to_out.0.bias"] = np.zeros((c,), np.float32)

    # encoder
    conv("encoder.conv_in", 3, base)
    ch = base
    for i, m in enumerate(ch_mult):
        cout = base * m
        for j in range(nres):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", ch, cout)
            ch = cout
        if i != len(ch_mult) - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", ch, ch)
    resnet("encoder.mid_block.resnets.0", ch, ch)
    attn("encoder.mid_block.attentions.0", ch)
    resnet("encoder.mid_block.resnets.1", ch, ch)
    gn("encoder.conv_norm_out", ch)
    conv("encoder.conv_out", ch, 2 * z)
    # decoder
    ch = base * ch_mult[-1]
    conv("decoder.conv_in", z, ch)
    resnet("decoder.mid_block.resnets.0", ch, ch)
    attn("decoder.mid_block.attentions.0", ch)
    resnet("decoder.mid_block.resnets.1", ch, ch)
    for i, m in enumerate(reversed(ch_mult)):
        cout = base * m
        for j in range(nres + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", ch, cout)
            ch = cout
        if i != len(ch_mult) - 1:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", ch, ch)
    gn("decoder.conv_norm_out", ch)
    conv("decoder.conv_out", ch, 3)
    return sd


def test_vae_state_dict_ports_and_runs():
    rngs = nnx.Rngs(0)
    enc = VAEEncoder(3, 8, (1, 2), 1, 4, double_z=True, rngs=rngs)
    dec = VAEDecoder(3, 8, (1, 2), 1, 4, rngs=rngs)
    sd = _vae_state_dict()
    load_autoencoder_kl_state_dict(enc, dec, sd)

    # conv_in weights landed transposed correctly: flax [H, W, I, O]
    np.testing.assert_allclose(
        np.asarray(enc.conv_in.kernel[...]),
        np.transpose(sd["encoder.conv_in.weight"], (2, 3, 1, 0)),
    )
    x = jax.random.uniform(jax.random.key(0), (1, 16, 16, 3))
    moments = enc(x)
    assert moments.shape == (1, 8, 8, 8)  # f2, 2*z
    out = dec(moments[..., :4])
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_vae_port_rejects_shape_mismatch():
    rngs = nnx.Rngs(0)
    enc = VAEEncoder(3, 8, (1, 2), 1, 4, rngs=rngs)
    dec = VAEDecoder(3, 8, (1, 2), 1, 4, rngs=rngs)
    sd = _vae_state_dict()
    sd["encoder.conv_in.weight"] = np.zeros((99, 3, 3, 3), np.float32)
    try:
        load_autoencoder_kl_state_dict(enc, dec, sd)
        raise RuntimeError("should have raised")
    except AssertionError:
        pass


def _dinov2_state_dict(dim=16, depth=2, heads=2, patch=4, grid=4, regs=2):
    rng = np.random.default_rng(0)
    sd = {
        "patch_embed.proj.weight": rng.normal(scale=0.05, size=(dim, 3, patch, patch)).astype(np.float32),
        "patch_embed.proj.bias": np.zeros((dim,), np.float32),
        "cls_token": rng.normal(scale=0.02, size=(1, 1, dim)).astype(np.float32),
        "register_tokens": rng.normal(scale=0.02, size=(1, regs, dim)).astype(np.float32),
        "pos_embed": rng.normal(scale=0.02, size=(1, grid * grid + 1, dim)).astype(np.float32),
        "norm.weight": np.ones((dim,), np.float32),
        "norm.bias": np.zeros((dim,), np.float32),
    }
    for i in range(depth):
        p = f"blocks.{i}."
        sd[p + "norm1.weight"] = np.ones((dim,), np.float32)
        sd[p + "norm1.bias"] = np.zeros((dim,), np.float32)
        sd[p + "attn.qkv.weight"] = rng.normal(scale=0.05, size=(3 * dim, dim)).astype(np.float32)
        sd[p + "attn.qkv.bias"] = np.zeros((3 * dim,), np.float32)
        sd[p + "attn.proj.weight"] = rng.normal(scale=0.05, size=(dim, dim)).astype(np.float32)
        sd[p + "attn.proj.bias"] = np.zeros((dim,), np.float32)
        sd[p + "norm2.weight"] = np.ones((dim,), np.float32)
        sd[p + "norm2.bias"] = np.zeros((dim,), np.float32)
        sd[p + "mlp.fc1.weight"] = rng.normal(scale=0.05, size=(4 * dim, dim)).astype(np.float32)
        sd[p + "mlp.fc1.bias"] = np.zeros((4 * dim,), np.float32)
        sd[p + "mlp.fc2.weight"] = rng.normal(scale=0.05, size=(dim, 4 * dim)).astype(np.float32)
        sd[p + "mlp.fc2.bias"] = np.zeros((dim,), np.float32)
        sd[p + "ls1.gamma"] = np.full((dim,), 0.5, np.float32)
        sd[p + "ls2.gamma"] = np.full((dim,), 0.5, np.float32)
    return sd


def test_dinov2_state_dict_ports_and_runs():
    model = ViTEncoder(img_size=16, patch_size=4, embed_dim=16, depth=2, num_heads=2,
                       num_register_tokens=2, rngs=nnx.Rngs(0))
    sd = _dinov2_state_dict()
    load_dinov2_state_dict(model, sd)
    np.testing.assert_allclose(np.asarray(model.blocks[0].ls1[...]), 0.5)
    out = model(jax.random.uniform(jax.random.key(0), (2, 16, 16, 3)))
    assert out["patch_tokens"].shape == (2, 16, 16)
    assert np.isfinite(np.asarray(out["patch_tokens"])).all()


def test_pos_embed_resample():
    pos = np.random.default_rng(0).normal(size=(1, 17, 8)).astype(np.float32)  # 4x4 grid + cls
    out = resample_abs_pos_embed(pos, (8, 8))
    assert out.shape == (1, 65, 8)
    np.testing.assert_allclose(out[:, :1], pos[:, :1])  # prefix preserved


def _dc_ae_state_dict():
    """Synthetic diffusers AutoencoderDC state dict for the tiny config
    (channels (8,16), types (res,vit), 1 layer/block, latent 4, ms (5,))."""
    rng = np.random.default_rng(0)
    sd = {}

    def conv(prefix, cin, cout, k=3, bias=True, groups=1):
        sd[prefix + ".weight"] = rng.normal(
            scale=0.05, size=(cout, cin // groups, k, k)
        ).astype(np.float32)
        if bias:
            sd[prefix + ".bias"] = rng.normal(scale=0.01, size=(cout,)).astype(np.float32)

    def lin(prefix, cin, cout):
        sd[prefix + ".weight"] = rng.normal(scale=0.05, size=(cout, cin)).astype(np.float32)

    def norm(prefix, c):
        sd[prefix + ".weight"] = rng.normal(1.0, 0.01, size=(c,)).astype(np.float32)
        sd[prefix + ".bias"] = rng.normal(0.0, 0.01, size=(c,)).astype(np.float32)

    def res(prefix, c):
        conv(prefix + ".conv1", c, c)
        conv(prefix + ".conv2", c, c, bias=False)
        norm(prefix + ".norm", c)

    def vit(prefix, c):
        for n in ("to_q", "to_k", "to_v"):
            lin(f"{prefix}.attn.{n}", c, c)
        conv(f"{prefix}.attn.to_qkv_multiscale.0.proj", 3 * c, 3 * c, k=5, bias=True,
             groups=3 * c)
        lin(f"{prefix}.attn.to_out", 2 * c, c)
        norm(f"{prefix}.attn.norm_out", c)
        h = 4 * c
        conv(f"{prefix}.conv_out.conv_inverted", c, 2 * h, k=1)
        conv(f"{prefix}.conv_out.conv_depth", 2 * h, 2 * h, k=3, groups=2 * h)
        conv(f"{prefix}.conv_out.conv_point", h, c, k=1, bias=False)
        norm(f"{prefix}.conv_out.norm", c)

    conv("encoder.conv_in", 3, 8)
    res("encoder.down_blocks.0.0", 8)
    conv("encoder.down_blocks.1.0.conv", 8, 16)  # DCDownBlock
    vit("encoder.down_blocks.1.1", 16)
    conv("encoder.conv_out", 16, 4)

    conv("decoder.conv_in", 4, 16)
    vit("decoder.up_blocks.0.0", 16)
    conv("decoder.up_blocks.1.0.conv", 16, 8 * 4)  # DCUpBlock pixel_shuffle
    res("decoder.up_blocks.1.1", 8)
    norm("decoder.norm_out", 8)
    conv("decoder.conv_out", 8, 3)
    return sd


def test_dc_ae_state_dict_ports_and_runs():
    from diffulab_tpu.networks.vision_towers.dc_ae import DCAE, load_dc_ae_state_dict

    vae = DCAE(
        block_out_channels=(8, 16),
        block_types=("res", "vit"),
        encoder_layers_per_block=(1, 1),
        decoder_layers_per_block=(1, 1),
        latent_channels=4,
        qkv_multiscales=((), (5,)),
        attention_head_dim=4,
        rngs=nnx.Rngs(0),
    )
    sd = _dc_ae_state_dict()
    load_dc_ae_state_dict(vae, sd)
    np.testing.assert_allclose(
        np.asarray(vae.encoder.conv_in.kernel[...]),
        np.transpose(sd["encoder.conv_in.weight"], (2, 3, 1, 0)),
    )
    x = jax.random.uniform(jax.random.key(0), (1, 8, 8, 3))
    z = vae.encode(x)
    assert z.shape == (1, 4, 4, 4)
    out = vae.decode(z)
    assert out.shape == (1, 8, 8, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dc_ae_port_rejects_unmatched_keys():
    from diffulab_tpu.networks.vision_towers.dc_ae import DCAE, load_dc_ae_state_dict

    vae = DCAE(
        block_out_channels=(8, 16), block_types=("res", "vit"),
        encoder_layers_per_block=(1, 1), decoder_layers_per_block=(1, 1),
        latent_channels=4, qkv_multiscales=((), (5,)), attention_head_dim=4,
        rngs=nnx.Rngs(0),
    )
    sd = _dc_ae_state_dict()
    sd["encoder.bogus.weight"] = np.zeros((1,), np.float32)
    try:
        load_dc_ae_state_dict(vae, sd)
        raise RuntimeError("should have raised")
    except AssertionError as e:
        assert "unmatched" in str(e)
