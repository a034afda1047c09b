"""Vision tower + ImageNet dataset tests."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from diffulab_tpu.data.imagenet import (
    ImageNetLatentREPA,
    ImageNetmultiAR,
    MultiARBatchSampler,
    collate_fn,
)
from diffulab_tpu.data.loader import DataLoader
from diffulab_tpu.data.streaming import ShardedDatasetWriter
from diffulab_tpu.networks.vision_towers.dc_ae import DCAE
from diffulab_tpu.networks.vision_towers.flux2 import Flux2VAE
from diffulab_tpu.networks.vision_towers.vae import diagonal_gaussian_sample


def _tiny_flux2(**kw):
    args = dict(base_channels=16, ch_mult=(1, 2), num_res_blocks=1, latent_channels=4,
                rngs=nnx.Rngs(0))
    args.update(kw)
    return Flux2VAE(**args)


def test_flux2_encode_decode_shapes():
    vae = _tiny_flux2()
    x = jax.random.uniform(jax.random.key(0), (2, 16, 16, 3))
    z = vae.encode(x, rng=jax.random.key(1))
    # conv f2 (one downsample) + 2x2 packing -> f4, channels 4*4=16
    assert z.shape == (2, 4, 4, 16)
    assert vae.latent_channels == 16
    assert vae.compression_factor == 4  # 2**len(ch_mult)
    out = vae.decode(z)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_flux2_pack_unpack_roundtrip():
    """decode's unpack must exactly invert encode's 2x2 pixel-shuffle pack."""
    vae = _tiny_flux2()
    z_conv = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
    b, h, w, c = z_conv.shape
    packed = z_conv.reshape(b, h // 2, 2, w // 2, 2, c)
    packed = jnp.einsum("bhpwqc->bhwcpq", packed).reshape(b, h // 2, w // 2, c * 4)
    # manual unpack (decode's prologue)
    z = packed.reshape(b, h // 2, w // 2, c, 2, 2)
    z = jnp.einsum("bhwcpq->bhpwqc", z).reshape(b, h, w, c)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_conv))


def test_flux2_bn_stats_latent_scale():
    mean = np.arange(16, dtype=np.float32)
    var = np.ones(16, dtype=np.float32)
    vae = _tiny_flux2(bn_running_mean=mean, bn_running_var=var)
    assert vae.latent_scale.shape == (1, 1, 1, 16)
    np.testing.assert_allclose(
        np.asarray(vae.latent_scale)[0, 0, 0], 1.0 / np.sqrt(1.0 + 1e-4), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(vae.latent_bias)[0, 0, 0], mean)


def test_diagonal_gaussian_mean_vs_sample():
    moments = jnp.concatenate([jnp.full((1, 2, 2, 4), 3.0), jnp.zeros((1, 2, 2, 4))], axis=-1)
    mean = diagonal_gaussian_sample(moments, None)
    np.testing.assert_allclose(np.asarray(mean), 3.0)
    sample = diagonal_gaussian_sample(moments, jax.random.key(0))
    assert not np.allclose(np.asarray(sample), 3.0)
    assert abs(float(sample.mean()) - 3.0) < 1.5


def _tiny_dcae(**kw):
    return DCAE(
        block_out_channels=(8, 16, 16),
        block_types=("res", "vit", "vit"),
        encoder_layers_per_block=(1, 1, 1),
        decoder_layers_per_block=(1, 1, 1),
        latent_channels=8,
        qkv_multiscales=((), (5,), (5,)),
        attention_head_dim=4,
        rngs=nnx.Rngs(0),
        **kw,
    )


def test_dcae_shapes():
    vae = _tiny_dcae()
    x = jax.random.uniform(jax.random.key(0), (1, 16, 16, 3))
    z = vae.encode(x)
    assert z.shape == (1, 4, 4, 8)  # f4 (2 downsamples)
    assert vae.compression_factor == 4
    out = vae.decode(z)
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dcae_interpolate_upsample():
    vae = _tiny_dcae(upsample_mode="interpolate")
    z = jax.random.normal(jax.random.key(0), (1, 4, 4, 8))
    assert vae.decode(z).shape == (1, 16, 16, 3)


def test_dcae_residual_shortcuts():
    """Space-to-channel shortcuts are parameter-free group means/duplication."""
    from diffulab_tpu.networks.vision_towers.dc_ae import (
        DCDownBlock,
        _channel_group_mean,
        _depth_to_space,
        _space_to_depth,
    )

    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    # s2d/d2s are exact inverses
    np.testing.assert_allclose(
        np.asarray(_depth_to_space(_space_to_depth(x))), np.asarray(x)
    )
    # torch channel order: ch = c*4 + subpixel(dy*2+dx)
    s2d = np.asarray(_space_to_depth(x))
    np.testing.assert_allclose(s2d[0, 0, 0, 1], np.asarray(x)[0, 0, 1, 0])  # dx=1
    np.testing.assert_allclose(s2d[0, 0, 0, 4], np.asarray(x)[0, 0, 0, 1])  # c=1
    # group mean: consecutive channel pairs averaged
    gm = np.asarray(_channel_group_mean(x, 2))
    np.testing.assert_allclose(gm[..., 0], np.asarray(x)[..., :2].mean(-1), rtol=1e-6)
    # down block with a zeroed conv reduces to the pure shortcut
    down = DCDownBlock(4, 8, rngs=nnx.Rngs(0))
    down.conv.kernel[...] = 0.0
    down.conv.bias[...] = 0.0
    np.testing.assert_allclose(
        np.asarray(down(x)),
        np.asarray(_channel_group_mean(_space_to_depth(x), 8)),
        rtol=1e-6,
    )


def test_litemla_matches_quadratic_reference():
    """ReLU linear attention == explicit relu(q)relu(k)^T v / relu(q)relu(k)^T 1."""
    from diffulab_tpu.networks.vision_towers.dc_ae import LiteMLA

    mla = LiteMLA(8, head_dim=4, multiscales=(), rngs=nnx.Rngs(0))
    qkv = jax.random.normal(jax.random.key(1), (2, 4, 4, 24))
    out = np.asarray(mla._attend(qkv))

    q, k, v = np.split(np.asarray(qkv).reshape(2, 16, 24), 3, axis=-1)
    q, k = np.maximum(q, 0), np.maximum(k, 0)
    ref = np.zeros((2, 16, 8))
    for h in range(2):  # heads
        sl = slice(h * 4, (h + 1) * 4)
        scores = q[:, :, sl] @ k[:, :, sl].transpose(0, 2, 1)  # [B,S,S]
        ref[:, :, sl] = (scores @ v[:, :, sl]) / (
            scores.sum(-1, keepdims=True) + 1e-15
        )
    np.testing.assert_allclose(out.reshape(2, 16, 8), ref, rtol=1e-4, atol=1e-5)


def test_vision_tower_compute_on_dataset(tmp_path):
    with ShardedDatasetWriter(tmp_path / "src", shard_size=4) as w:
        for i in range(6):
            w.write({"image": np.random.default_rng(i).uniform(size=(16, 16, 3)).astype(np.float32),
                     "label": np.int64(i % 3), "caption": f"img {i}"})
    vae = _tiny_flux2()
    vae.compute_on_dataset(str(tmp_path / "src"), str(tmp_path / "latents"), batch_size=4)

    ds = ImageNetLatentREPA(str(tmp_path / "latents"))
    ds.set_latent_scale(2.0)
    assert len(ds) == 6
    item = ds[0]
    assert item["model_inputs"]["x"].shape == (4, 4, 16)
    assert "x0" in item["extra"]  # no dst_features -> raw image for live DINO


def test_multi_ar_bucketing(tmp_path):
    with ShardedDatasetWriter(tmp_path / "ar" / "train", shard_size=16) as w:
        rng = np.random.default_rng(0)
        for i in range(10):  # two buckets: 4x4 and 4x8 latents
            hw = (4, 4) if i < 6 else (4, 8)
            w.write({
                "vision_latents": rng.normal(size=(*hw, 16)).astype(np.float32),
                "caption": f"caption {i}",
                "dst_features": rng.normal(size=(16, 32)).astype(np.float32),
            })
    ds = ImageNetmultiAR(str(tmp_path / "ar"), split="train", cache_dir=tmp_path / "cache")
    ds.set_latent_scale(1.0)
    ds.set_latent_bias(0.0)
    assert len(ds) == 10
    assert set(ds.buckets.keys()) == {(4, 4), (4, 8)}

    sampler = MultiARBatchSampler(ds, batch_size=4, shuffle=True, drop_last=False)
    loader = DataLoader(ds, batch_size=4, sampler=sampler, collate_fn=collate_fn, prefetch=0)
    shapes = set()
    n_batches = 0
    for batch in loader:
        x = batch["model_inputs"]["x"]
        shapes.add(x.shape[1:])
        assert isinstance(batch["model_inputs"]["initial_context"], list)
        assert batch["extra"]["dst_features"].shape[0] == x.shape[0]
        n_batches += 1
    assert n_batches == len(sampler) == 3  # ceil(6/4) + ceil(4/4) = 2 + 1
    assert shapes == {(4, 4, 16), (4, 8, 16)}


def test_bucket_cache_roundtrip(tmp_path):
    with ShardedDatasetWriter(tmp_path / "ar2" / "train", shard_size=16) as w:
        for i in range(4):
            w.write({"vision_latents": np.zeros((4, 4, 8), np.float32), "caption": "c"})
    ds1 = ImageNetmultiAR(str(tmp_path / "ar2"), split="train", cache_dir=tmp_path / "cache2")
    ds2 = ImageNetmultiAR(str(tmp_path / "ar2"), split="train", cache_dir=tmp_path / "cache2")
    assert ds1.buckets == ds2.buckets


def test_sampler_epoch_replay_and_sideeffect_free_len(tmp_path):
    """Resume fidelity for sampler-based (multi-AR) runs: DataLoader.set_epoch
    forwards to the sampler so a resumed epoch replays its shuffle order, and
    multi-host len() must not advance the sampler's epoch counter."""

    class FakeDS:
        buckets = {(4, 4): list(range(8)), (4, 8): list(range(8, 14))}

        def __len__(self):
            return 14

        def __getitem__(self, i):
            return {"x": np.zeros(2, np.float32)}

    def orders(sampler, n):
        return [list(sampler) for _ in range(n)]

    a = MultiARBatchSampler(FakeDS(), batch_size=2, shuffle=True, seed=0)
    b = MultiARBatchSampler(FakeDS(), batch_size=2, shuffle=True, seed=0)
    ep1, ep2 = orders(a, 2)
    assert ep1 != ep2  # shuffle differs per epoch
    b.set_epoch(1)  # resume at trainer epoch 1 -> replay ep2's order
    assert list(b) == ep2

    # loader forwards set_epoch; len() is side-effect free on multi-host
    s = MultiARBatchSampler(FakeDS(), batch_size=2, shuffle=True, seed=0)
    dl = DataLoader(FakeDS(), batch_size=2, sampler=s, prefetch=0,
                    process_count=2, process_index=0)
    before = s._epoch
    n = len(dl)
    assert n > 0 and s._epoch == before
    dl.set_epoch(7)
    assert s._epoch == 7


def test_normalize_to_pm1_all_three_ranges():
    """[-1,1] inputs must pass through unchanged — the round-5 regression
    (negatives clipped to 0 then remapped) corrupted every tower.encode
    call fed by the [-1,1] data pipelines."""
    from diffulab_tpu.networks.vision_towers.common import normalize_to_pm1

    pm1 = jnp.linspace(-1.0, 1.0, 64).reshape(1, 4, 4, 4)
    np.testing.assert_allclose(np.asarray(normalize_to_pm1(pm1)), np.asarray(pm1), atol=1e-6)

    zero_one = jnp.linspace(0.0, 1.0, 64).reshape(1, 4, 4, 4)
    np.testing.assert_allclose(
        np.asarray(normalize_to_pm1(zero_one)), np.asarray((zero_one - 0.5) * 2.0), atol=1e-6
    )

    u8 = jnp.linspace(0.0, 255.0, 64).reshape(1, 4, 4, 4)
    np.testing.assert_allclose(
        np.asarray(normalize_to_pm1(u8)), np.asarray((u8 / 255.0 - 0.5) * 2.0), atol=1e-6
    )

    # encode(x_pm1) must now agree with the raw encoder path used in training
    vae = _tiny_flux2()
    x = jax.random.uniform(jax.random.key(2), (2, 16, 16, 3)) * 2.0 - 1.0
    z_wrap = vae.encode(x)
    moments = vae.encoder(x)
    mean, _ = jnp.split(moments, 2, axis=-1)
    b, h, w, c = mean.shape
    z_raw = jnp.einsum(
        "bhpwqc->bhwcpq", mean.reshape(b, h // 2, 2, w // 2, 2, c)
    ).reshape(b, h // 2, w // 2, c * 4)
    np.testing.assert_allclose(np.asarray(z_wrap), np.asarray(z_raw), atol=1e-5)
