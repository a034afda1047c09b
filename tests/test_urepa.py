"""U-REPA: representation alignment for the UNet family (arXiv:2503.18414).

The reference only wires REPA into DiT-family models; U-REPA extends the
same hook-free capture to the UNet — flat capture points over (encoder
groups, middle block, decoder groups), flattened to [B, H*W, C] tokens so
RepaLoss/set_model work unchanged. configs/train_synthetic_ddpm_repa.yaml
is the measured ablation arm.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from diffulab_tpu.diffuse import Diffuser
from diffulab_tpu.networks.denoisers.unet import UNetModel
from diffulab_tpu.training.losses.repa import RepaLoss


def _tiny_unet(**kw):
    args = dict(
        image_size=[16, 16], in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=[4], num_heads=2,
        channel_mult="1, 2", resblock_updown=True, use_scale_shift_norm=True,
        n_classes=5, classifier_free=True, rngs=nnx.Rngs(0),
    )
    args.update(kw)
    return UNetModel(**args)


def test_unet_capture_points_and_shapes():
    model = _tiny_unet()
    n_in = len(model.input_blocks)
    n_out = len(model.output_blocks)
    assert len(model.layers) == n_in + 1 + n_out
    # capture the middle block (index n_in) and the first decoder group
    model.feature_layers = (n_in, n_in + 1)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    out = model(x, jnp.array([3, 7]), cond={"y": jnp.array([1, 2])},
                capture_features=True)
    feats = out["features"]
    assert len(feats) == 2
    # middle block runs at ds=2: 8x8 = 64 tokens, 2x model channels
    assert feats[0].shape == (2, 64, 64)
    assert all(np.isfinite(np.asarray(f)).all() for f in feats)
    # without capture_features no features key is emitted
    out2 = model(x, jnp.array([3, 7]), cond={"y": jnp.array([1, 2])})
    assert "features" not in out2


def test_urepa_loss_trains_through_gaussian():
    model = _tiny_unet()
    n_in = len(model.input_blocks)
    repa = RepaLoss(
        repa_encoder="fixed_vit",
        encoder_args={"img_size": 16, "patch_size": 2, "embed_dim": 64,
                      "depth": 2, "num_heads": 2, "seed": 7},
        alignment_layer=n_in + 1,  # 1-based -> flat index n_in (the middle block)
        denoiser_dimension=64, hidden_dim=64, load_dino=True,
        coeff=0.5, rngs=nnx.Rngs(1),
    )
    repa.set_model(model)
    assert model.feature_layers == (n_in,)

    diffuser = Diffuser(model, sampling_method="ddim",
                        model_type="gaussian_diffusion", n_steps=32,
                        extra_losses=[repa])
    x0 = jax.random.normal(jax.random.key(0), (4, 16, 16, 3))
    cond = {"y": jnp.array([0, 1, 2, 3])}
    t = diffuser.diffusion.draw_timesteps(jax.random.key(2), 4)
    noise = jax.random.normal(jax.random.key(1), x0.shape)

    def model_fn(**kw):
        return model(**kw, train=False, capture_features=True)

    losses = diffuser.diffusion.compute_loss(
        model_fn, x0, cond, t, noise, extra_losses=[repa])
    assert "RepaLoss" in losses
    val = float(losses["RepaLoss"])
    assert np.isfinite(val) and val > 0

    # the alignment loss is differentiable wrt BOTH the UNet and the proj MLP
    graphdef, params, rest = nnx.split((model, repa), nnx.Param, ...)

    def loss_of(params):
        m, r = nnx.merge(graphdef, params, rest)

        def fn(**kw):
            return m(**kw, train=False, capture_features=True)

        return r(model_output=fn(x=jnp.zeros_like(x0) + 0.1, timesteps=t,
                                 cond=cond, drop=jnp.zeros((4,), bool)), x0=x0)

    grads = jax.grad(loss_of)(params)
    gnorms = [float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)]
    assert max(gnorms) > 0
