"""Diffuser facade: latent decode path, set_steps, GRPO dispatch guards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from diffulab_tpu.diffuse import Diffuser
from diffulab_tpu.networks.denoisers.mmdit import MMDiT
from diffulab_tpu.networks.vision_towers.flux2 import Flux2VAE


def _latent_diffuser():
    vae = Flux2VAE(base_channels=16, ch_mult=(1, 2), num_res_blocks=1, latent_channels=4,
                   rngs=nnx.Rngs(1))
    model = MMDiT(
        simple_dit=True, input_channels=vae.latent_channels, inner_dim=32, embedding_dim=32,
        num_heads=2, mlp_ratio=2, patch_size=2, depth=1, n_classes=5,
        classifier_free=True, rngs=nnx.Rngs(0),
    )
    return Diffuser(model, sampling_method="euler", model_type="rectified_flow",
                    n_steps=3, vision_tower=vae)


def test_generate_decodes_through_tower():
    diffuser = _latent_diffuser()
    # latent grid for a 16x16 image at compression 4: 4x4x16
    out = diffuser.generate(
        jax.random.key(0), cond={"y": jnp.array([1, 2])}, data_shape=(2, 4, 4, 16),
    )
    assert out["x"].shape == (2, 16, 16, 3)  # decoded RGB
    assert np.isfinite(np.asarray(out["x"])).all()


def test_generate_return_latents():
    diffuser = _latent_diffuser()
    out = diffuser.generate(
        jax.random.key(0), cond={"y": jnp.array([1])}, data_shape=(1, 4, 4, 16),
        return_latents=True,
    )
    assert out["x"].shape == (1, 4, 4, 16)  # raw latents


def test_set_steps_swaps_schedule():
    diffuser = _latent_diffuser()
    assert diffuser.diffusion.steps == 3
    diffuser.set_steps(7, shift=2.0)
    assert diffuser.diffusion.steps == 7
    assert diffuser.diffusion.shift == 2.0


def test_grpo_requires_flow():
    model = MMDiT(simple_dit=True, input_channels=3, inner_dim=32, embedding_dim=32,
                  num_heads=2, mlp_ratio=2, patch_size=2, depth=1, n_classes=5,
                  rngs=nnx.Rngs(0))
    diffuser = Diffuser(model, sampling_method="ddpm", model_type="gaussian_diffusion",
                        n_steps=100)
    with pytest.raises(AssertionError):
        diffuser.compute_loss(None, {}, grpo=True, grpo_args={})


def test_unknown_model_type_rejected():
    with pytest.raises(NotImplementedError):
        Diffuser(None, sampling_method="euler", model_type="not_a_thing")
