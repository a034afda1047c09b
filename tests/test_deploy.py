"""AOT deployment artifacts (diffulab_tpu/deploy): export the jitted sampler
via jax.export and serve it back with jax + numpy only."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from diffulab_tpu.deploy import DeployedSampler, export_generate
from diffulab_tpu.diffuse.diffuser import Diffuser
from diffulab_tpu.networks.denoisers.mmdit import MMDiT


def _tiny_diffuser():
    denoiser = MMDiT(
        simple_dit=True, input_channels=3, inner_dim=64, embedding_dim=64,
        num_heads=4, mlp_ratio=2, patch_size=2, depth=1, n_classes=10,
        classifier_free=True, rngs=nnx.Rngs(0),
    )
    return Diffuser(denoiser, sampling_method="euler", model_type="rectified_flow",
                    n_steps=4)


def test_export_roundtrip_matches_live_generate(tmp_path):
    diffuser = _tiny_diffuser()
    batch, shape = 2, (8, 8, 3)
    cond_spec = {"y": jax.ShapeDtypeStruct((), jnp.int32)}
    art = export_generate(
        diffuser, cond_spec, batch_size=batch, image_shape=shape,
        out_dir=tmp_path / "artifact", guidance_scale=1.5,
    )
    assert (art / "sampler.jaxexport").exists()
    assert (art / "params.npz").exists()
    assert (art / "manifest.json").exists()

    sampler = DeployedSampler(art)
    assert sampler.batch_size == batch
    y = np.array([3, 7])
    out = sampler(seed=0, y=y)
    assert out.shape == (batch, *shape)

    # must match the live library path bit-for-bit (same program, same seed)
    live = diffuser.generate(
        jax.random.key(0), {"y": jnp.asarray(y)},
        data_shape=(batch, *shape), guidance_scale=1.5, clamp_x=True,
    )["x"]
    np.testing.assert_allclose(out, np.asarray(live), atol=1e-5)

    # deterministic per seed, different across seeds
    np.testing.assert_array_equal(out, sampler(seed=0, y=y))
    assert not np.allclose(out, sampler(seed=1, y=y))


def test_deployed_sampler_validates_inputs(tmp_path):
    diffuser = _tiny_diffuser()
    art = export_generate(
        diffuser, {"y": jax.ShapeDtypeStruct((), jnp.int32)},
        batch_size=2, image_shape=(8, 8, 3), out_dir=tmp_path / "a",
    )
    sampler = DeployedSampler(art)
    try:
        sampler(seed=0)
        raise AssertionError("missing cond must raise")
    except ValueError as e:
        assert "missing conditioning" in str(e)
    try:
        sampler(seed=0, y=np.zeros((5,), np.int32))
        raise AssertionError("wrong batch must raise")
    except ValueError as e:
        assert "shape" in str(e)


def test_export_edm_manifest(tmp_path):
    """EDM exposes `steps` like the other formalizations (manifest regression)."""
    import json

    denoiser = MMDiT(
        simple_dit=True, input_channels=3, inner_dim=64, embedding_dim=64,
        num_heads=4, mlp_ratio=2, patch_size=2, depth=1, n_classes=10,
        classifier_free=True, rngs=nnx.Rngs(0),
    )
    diffuser = Diffuser(denoiser, sampling_method="heun", model_type="edm", n_steps=4)
    art = export_generate(
        diffuser, {"y": jax.ShapeDtypeStruct((), jnp.int32)},
        batch_size=2, image_shape=(8, 8, 3), out_dir=tmp_path / "edm",
        guidance_scale=1.5,
    )
    manifest = json.loads((art / "manifest.json").read_text())
    assert manifest["n_steps"] == 4
    out = DeployedSampler(art)(seed=0, y=np.array([1, 2]))
    assert out.shape == (2, 8, 8, 3) and np.isfinite(out).all()
