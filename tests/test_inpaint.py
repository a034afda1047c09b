"""Sampling-time inpainting (RePaint-lite known-region blending).

No reference counterpart (the reference has no inpainting surface); the
blend runs inside each formalization's scan (flow/gaussian_diffusion/edm
``denoise(inpaint=...)``) and through ``Diffuser.generate(inpaint=...)``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from diffulab_tpu.diffuse.diffuser import Diffuser
from diffulab_tpu.diffuse.flow import Flow
from diffulab_tpu.networks.denoisers.mmdit import MMDiT


def _box_mask(shape, keep_left=True):
    """1 = keep known. Keeps the left half of the image."""
    mask = np.zeros(shape, np.float32)
    mask[:, :, : shape[2] // 2, :] = 1.0
    return jnp.asarray(mask)


def test_flow_inpaint_keeps_known_region_exactly():
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, (2, 8, 8, 1))
    known = jax.random.normal(jax.random.key(1), (2, 8, 8, 1))
    mask = _box_mask((2, 8, 8, 1))

    def model_fn(x, timesteps, cond, drop):
        t = timesteps.reshape(-1, 1, 1, 1)
        return {"x": (x - x0) / jnp.maximum(t, 0.05)}  # v with data pred x0

    flow = Flow(n_steps=8, sampling_method="euler")
    out = flow.denoise(model_fn, cond={}, rng=jax.random.key(2),
                       data_shape=(2, 8, 8, 1),
                       inpaint={"known": known, "mask": mask})
    # known region is the clean known exactly; the rest converged to the field
    np.testing.assert_allclose(
        np.asarray(out["x"] * mask), np.asarray(known * mask), atol=1e-6)
    free = np.asarray(out["x"] * (1 - mask))
    np.testing.assert_allclose(free, np.asarray(x0 * (1 - mask)), atol=1e-4)


@pytest.mark.parametrize("model_type,sampling_method", [
    ("rectified_flow", "euler"),
    ("rectified_flow", "unipc"),
    ("gaussian_diffusion", "ddim"),
    ("edm", "heun"),
])
def test_inpaint_through_diffuser_facade(model_type, sampling_method):
    denoiser = MMDiT(
        simple_dit=True, input_channels=3, inner_dim=64, embedding_dim=64,
        num_heads=4, mlp_ratio=2, patch_size=2, depth=1, n_classes=10,
        classifier_free=True, rngs=nnx.Rngs(0),
    )
    n_steps = 50 if model_type == "gaussian_diffusion" else 6
    diffuser = Diffuser(denoiser, model_type=model_type, n_steps=n_steps,
                        sampling_method=sampling_method)
    known = jnp.clip(jax.random.normal(jax.random.key(1), (2, 8, 8, 3)), -1, 1)
    mask = _box_mask((2, 8, 8, 3))
    out = diffuser.generate(
        jax.random.key(0), {"y": jnp.arange(2)}, data_shape=(2, 8, 8, 3),
        guidance_scale=1.5, clamp_x=True,
        inpaint={"known": known, "mask": mask},
    )
    assert np.isfinite(np.asarray(out["x"])).all()
    np.testing.assert_allclose(
        np.asarray(out["x"] * mask), np.asarray(known * mask), atol=1e-5)
    # the free region must differ from the known content (it was generated)
    assert not np.allclose(np.asarray(out["x"] * (1 - mask)),
                           np.asarray(known * (1 - mask)), atol=1e-2)
    # plain generation still works through the same (cached-keyed) facade
    plain = diffuser.generate(
        jax.random.key(0), {"y": jnp.arange(2)}, data_shape=(2, 8, 8, 3),
        guidance_scale=1.5, clamp_x=True,
    )
    assert not np.allclose(np.asarray(plain["x"]), np.asarray(out["x"]))
