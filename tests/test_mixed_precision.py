"""Mixed-precision policy (VERDICT r2 item 1): constructing a denoiser with
dtype=bf16 must mean bf16 MATMULS ONLY — the conditioning path (time embed,
modulation, label embed, final projection) and the residual token stream stay
fp32, mirroring the torch-autocast semantics the reference trains under
(reference trainers/common.py:105). The old whole-model bf16 cast cost 5x FID
on the EDM recipe (BASELINE.md precision ablation)."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from diffulab_tpu.networks.denoisers.mmdit import MMDiT
from diffulab_tpu.networks.denoisers.unet import UNetModel
from diffulab_tpu.networks.nn import stable_dtype


def test_stable_dtype_mapping():
    assert stable_dtype(jnp.bfloat16) == jnp.float32
    assert stable_dtype(jnp.float16) == jnp.float32
    assert stable_dtype(jnp.float32) == jnp.float32
    assert stable_dtype(None) is None


def _dit(dtype):
    return MMDiT(
        simple_dit=True, input_channels=3, inner_dim=64, embedding_dim=64,
        num_heads=4, mlp_ratio=2, patch_size=2, depth=2, n_classes=5,
        classifier_free=True, rngs=nnx.Rngs(0), dtype=dtype,
    )


def test_bf16_model_keeps_stable_path_fp32():
    m = _dit(jnp.bfloat16)
    # matmul path: bf16
    assert m.layers[0].attention.qkv.dtype == jnp.bfloat16
    assert m.layers[0].mlp_input.fc_in.dtype == jnp.bfloat16
    # conditioning path: fp32
    assert m.time_embed.fc1.dtype == jnp.float32
    assert m.layers[0].modulation.lin.dtype == jnp.float32
    assert m.last_layer.linear.dtype == jnp.float32
    assert m.label_embed.embedding.dtype == jnp.float32
    # residual stream carried fp32
    tokens, _ = m.patchify(jnp.zeros((1, 8, 8, 3)))
    assert tokens.dtype == jnp.float32


def test_bf16_output_close_to_fp32_model():
    """Same params (fp32 master), bf16 vs fp32 compute: outputs must agree to
    bf16 matmul rounding (the residual/conditioning path no longer compounds
    the error across depth)."""
    m32 = _dit(None)
    m16 = _dit(jnp.bfloat16)
    # copy params so both models share weights exactly
    nnx.update(m16, nnx.state(m32, nnx.Param))
    x = jax.random.normal(jax.random.key(1), (4, 8, 8, 3))
    t = jnp.array([0.1, 0.4, 0.7, 0.9])
    y = jnp.array([0, 1, 2, 3])
    o32 = m32(x, t, cond={"y": y})["x"]
    o16 = m16(x, t, cond={"y": y})["x"]
    assert o16.dtype == jnp.float32  # final layer is fp32
    err = float(jnp.abs(o32 - o16).max())
    scale = float(jnp.abs(o32).max())
    assert err <= 0.02 * max(scale, 1e-3), (err, scale)


def test_bf16_unet_stable_path():
    m = UNetModel(
        image_size=[8, 8], in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=[4], channel_mult=[1, 2],
        n_classes=5, classifier_free=True, rngs=nnx.Rngs(0), dtype=jnp.bfloat16,
    )
    assert m.time_fc1.dtype == jnp.float32
    res = m.input_blocks[1][0]
    assert res.emb_layer.dtype == jnp.float32
    assert res.in_conv.dtype == jnp.bfloat16
    out = m(jnp.zeros((2, 8, 8, 3)), jnp.array([0.5, 0.5]), cond={"y": jnp.array([0, 1])})
    assert np.isfinite(np.asarray(out["x"], np.float32)).all()


def test_stable_conditioning_off_is_whole_model_cast():
    """stable_conditioning=False (config: model.stable_conditioning=false) is
    the round-2-style whole-model bf16 cast — the measured +6.5%-throughput
    variant (BASELINE.md round 4 drift attribution). Everything, including
    the conditioning path and the default stream dtype, runs at the compute
    dtype; the global protection flag must be restored afterwards."""
    from diffulab_tpu.networks import nn as nn_mod

    m = MMDiT(
        simple_dit=True, input_channels=3, inner_dim=64, embedding_dim=64,
        num_heads=4, mlp_ratio=2, patch_size=2, depth=2, n_classes=5,
        classifier_free=True, stable_conditioning=False,
        rngs=nnx.Rngs(0), dtype=jnp.bfloat16,
    )
    assert m.time_embed.fc1.dtype == jnp.bfloat16
    assert m.layers[0].modulation.lin.dtype == jnp.bfloat16
    assert m.last_layer.linear.dtype == jnp.bfloat16
    assert m.label_embed.embedding.dtype == jnp.bfloat16
    assert m.conv_proj.dtype == jnp.bfloat16
    tokens, _ = m.patchify(jnp.zeros((1, 8, 8, 3)))
    assert tokens.dtype == jnp.bfloat16
    # scope restored: a subsequent default model still protects
    assert nn_mod.STABLE_CONDITIONING is True
    m2 = _dit(jnp.bfloat16)
    assert m2.time_embed.fc1.dtype == jnp.float32


def test_stable_conditioning_scope_restores_on_error():
    from diffulab_tpu.networks import nn as nn_mod

    try:
        with nn_mod.stable_conditioning_scope(False):
            assert nn_mod.STABLE_CONDITIONING is False
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert nn_mod.STABLE_CONDITIONING is True
