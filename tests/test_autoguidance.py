"""Autoguidance (Karras et al., arXiv:2406.02507): guide with a degraded
model instead of the condition-dropped branch. No reference counterpart."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from diffulab_tpu.diffuse.diffuser import Diffuser
from diffulab_tpu.diffuse.flow import Flow
from diffulab_tpu.networks.denoisers.mmdit import MMDiT


def _const_v(u):
    def model_fn(x, timesteps, cond, drop):
        return {"x": jnp.broadcast_to(u, x.shape)}
    return model_fn


def test_flow_autoguidance_extrapolates_good_minus_bad():
    """Constant fields: Euler integrates the guided velocity exactly, so the
    final x is x1 - (bad + s * (good - bad))."""
    u_good = jnp.float32(1.0)
    u_bad = jnp.float32(0.4)
    x1 = jnp.zeros((2, 4, 4, 1))
    s = 2.0
    flow = Flow(n_steps=8, sampling_method="euler")
    out = flow.denoise(_const_v(u_good), cond={}, rng=jax.random.key(0), x=x1,
                       guidance_scale=jnp.float32(s), use_cfg=True,
                       guide_fn=_const_v(u_bad))
    expect = -(0.4 + s * (1.0 - 0.4))
    np.testing.assert_allclose(np.asarray(out["x"]), expect, atol=1e-5)


def test_autoguidance_with_identical_models_is_identity():
    """bad == good collapses the guidance term at any scale."""
    u = jnp.float32(0.7)
    x1 = jnp.zeros((1, 4, 4, 1))
    flow = Flow(n_steps=6, sampling_method="euler")
    guided = flow.denoise(_const_v(u), cond={}, rng=jax.random.key(0), x=x1,
                          guidance_scale=jnp.float32(5.0), use_cfg=True,
                          guide_fn=_const_v(u))
    plain = flow.denoise(_const_v(u), cond={}, rng=jax.random.key(0), x=x1)
    np.testing.assert_allclose(np.asarray(guided["x"]), np.asarray(plain["x"]), atol=1e-5)


def _tiny(seed):
    return MMDiT(simple_dit=True, input_channels=3, inner_dim=64, embedding_dim=64,
                 num_heads=4, mlp_ratio=2, patch_size=2, depth=1, n_classes=10,
                 classifier_free=True, rngs=nnx.Rngs(seed))


@pytest.mark.parametrize("model_type,sampling_method,n_steps", [
    ("rectified_flow", "unipc", 6),
    ("gaussian_diffusion", "ddim", 50),
    ("edm", "heun", 6),
])
def test_autoguidance_through_diffuser_facade(model_type, sampling_method, n_steps):
    diffuser = Diffuser(_tiny(0), model_type=model_type, n_steps=n_steps,
                        sampling_method=sampling_method)
    bad = _tiny(1)
    cond = {"y": jnp.arange(2)}
    auto = diffuser.generate(jax.random.key(0), cond, data_shape=(2, 8, 8, 3),
                             guidance_scale=2.0, clamp_x=True, guide_denoiser=bad)
    cfg = diffuser.generate(jax.random.key(0), cond, data_shape=(2, 8, 8, 3),
                            guidance_scale=2.0, clamp_x=True)
    assert np.isfinite(np.asarray(auto["x"])).all()
    # a different negative branch changes the output vs plain CFG
    assert not np.allclose(np.asarray(auto["x"]), np.asarray(cfg["x"]))
    # deterministic per (seed, guide model)
    again = diffuser.generate(jax.random.key(0), cond, data_shape=(2, 8, 8, 3),
                              guidance_scale=2.0, clamp_x=True, guide_denoiser=bad)
    np.testing.assert_array_equal(np.asarray(auto["x"]), np.asarray(again["x"]))


def test_autoguidance_requires_cfg():
    diffuser = Diffuser(_tiny(0), model_type="rectified_flow", n_steps=4,
                        sampling_method="euler")
    with pytest.raises(AssertionError, match="guidance_scale"):
        diffuser.generate(jax.random.key(0), {"y": jnp.arange(2)},
                          data_shape=(2, 8, 8, 3), guide_denoiser=_tiny(1))
