"""NN primitives (layer L0) unit tests: RoPE invariants, adaLN-zero, norms."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from diffulab_tpu.networks.nn import (
    Downsample,
    GroupNorm32,
    LabelEmbed,
    Modulation,
    QKNorm,
    RMSNorm,
    TimestepEmbedder,
    Upsample,
    apply_rope_1d,
    apply_rope_ndim,
    geglu,
    get_cos_sin_ndim_grid,
    make_drop_mask,
    modulate,
    packed_swiglu,
    rope_1d_cos_sin,
    timestep_embedding,
    zero_linear,
)


def test_timestep_embedding_shape_and_structure():
    emb = timestep_embedding(jnp.array([0.0, 1.0, 500.0]), 128)
    assert emb.shape == (3, 128)
    # t=0: cos block == 1, sin block == 0 (guided-diffusion convention)
    np.testing.assert_allclose(np.asarray(emb[0, :64]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 64:]), 0.0, atol=1e-6)


def test_timestep_embedding_odd_dim_pads():
    emb = timestep_embedding(jnp.array([1.0]), 33)
    assert emb.shape == (1, 33)
    assert float(emb[0, -1]) == 0.0


def test_rope_1d_preserves_norm_and_relativity():
    """Rotations preserve vector norms; q.k depends only on relative offset."""
    dim = 32
    cos, sin = rope_1d_cos_sin(16, dim)
    q = jax.random.normal(jax.random.key(0), (1, 16, 1, dim))
    k = jnp.broadcast_to(q, q.shape)  # same content at every position? no—use distinct
    k = jax.random.normal(jax.random.key(1), (1, 16, 1, dim))
    qr, kr = apply_rope_1d(q, k, cos, sin, dim)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(qr), axis=-1), np.linalg.norm(np.asarray(q), axis=-1), rtol=1e-5
    )
    # relative property: <R_i q, R_j k> == <R_{i+c} q, R_{j+c} k>
    qv = jnp.tile(q[:, :1], (1, 16, 1, 1))
    kv = jnp.tile(k[:, :1], (1, 16, 1, 1))
    qr, kr = apply_rope_1d(qv, kv, cos, sin, dim)
    dots = np.einsum("bshd,bshd->bsh", np.asarray(qr[:, 1:]), np.asarray(kr[:, :-1]))
    np.testing.assert_allclose(dots, np.broadcast_to(dots[0, 0], dots.shape), rtol=1e-3)


def test_rope_ndim_relative_invariance_per_axis():
    axes_dim = (16, 16)
    B, S = 1, 9
    # 3x3 grid positions
    hh, ww = jnp.meshgrid(jnp.arange(3), jnp.arange(3), indexing="ij")
    pos = jnp.stack([hh.reshape(-1), ww.reshape(-1)], axis=-1)[None]  # [1, 9, 2]
    cos, sin = get_cos_sin_ndim_grid(pos, 10_000.0, axes_dim)
    assert cos.shape == (B, S, sum(axes_dim) // 2)

    q = jnp.tile(jax.random.normal(jax.random.key(0), (1, 1, 2, 32)), (1, S, 1, 1))
    k = jnp.tile(jax.random.normal(jax.random.key(1), (1, 1, 2, 32)), (1, S, 1, 1))
    qr, kr = apply_rope_ndim(q, k, cos, sin, 32)
    dots = np.einsum("bshd,bshd->bsh", np.asarray(qr), np.asarray(kr))
    # same relative offset (0,0) everywhere -> all dots equal
    np.testing.assert_allclose(dots, np.broadcast_to(dots[0, 0], dots.shape), rtol=1e-3)


def test_rope_ndim_passthrough_channels():
    pos = jnp.zeros((1, 4, 1), jnp.int32)
    cos, sin = get_cos_sin_ndim_grid(pos, 10_000.0, (8,))
    q = jax.random.normal(jax.random.key(0), (1, 4, 1, 16))
    k = jax.random.normal(jax.random.key(1), (1, 4, 1, 16))
    qr, kr = apply_rope_ndim(q, k, cos, sin, 8)
    np.testing.assert_allclose(np.asarray(qr[..., 8:]), np.asarray(q[..., 8:]))  # pass-through


def test_rmsnorm_unit_scale_normalizes():
    norm = RMSNorm(16, rngs=nnx.Rngs(0))
    x = 100.0 * jax.random.normal(jax.random.key(0), (4, 16))
    y = norm(x)
    rms = np.sqrt(np.mean(np.asarray(y) ** 2, axis=-1))
    np.testing.assert_allclose(rms, 1.0, rtol=1e-3)


def test_rmsnorm_fp32_stats_in_bf16():
    norm = RMSNorm(16, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.key(0), (4, 16), jnp.bfloat16)
    y = norm(x)
    assert y.dtype == jnp.bfloat16


def test_qknorm_outputs_match_value_dtype():
    qk = QKNorm(8, rngs=nnx.Rngs(0))
    q = jax.random.normal(jax.random.key(0), (2, 4, 8))
    k = jax.random.normal(jax.random.key(1), (2, 4, 8))
    v = jax.random.normal(jax.random.key(2), (2, 4, 8), jnp.bfloat16)
    qn, kn = qk(q, k, v)
    assert qn.dtype == v.dtype and kn.dtype == v.dtype


def test_swiglu_geglu_shapes():
    x = jax.random.normal(jax.random.key(0), (2, 4, 32))
    assert packed_swiglu(x).shape == (2, 4, 16)
    assert geglu(x).shape == (2, 4, 16)


def test_modulation_zero_init_is_identity_modulate():
    mod = Modulation(32, 16, zero_init=True, rngs=nnx.Rngs(0))
    out = mod(jax.random.normal(jax.random.key(0), (2, 32)))
    # all six chunks zero at init -> modulate(x, alpha, beta) == x
    x = jax.random.normal(jax.random.key(1), (2, 1, 16))
    np.testing.assert_allclose(np.asarray(modulate(x, out.alpha, out.beta)), np.asarray(x))
    np.testing.assert_allclose(np.asarray(out.gamma), 0.0)


def test_label_embed_cfg_null_class():
    embed = LabelEmbed(10, 8, classifier_free_guidance=True, rngs=nnx.Rngs(0))
    labels = jnp.array([0, 1, 2, 3])
    drop = jnp.array([False, True, False, True])
    out = embed(labels, drop)
    null = embed(jnp.array([10, 10]))  # explicit null class
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(null[0]))
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(null[0]))
    assert not np.allclose(np.asarray(out[0]), np.asarray(null[0]))


def test_make_drop_mask_rate():
    mask = make_drop_mask(jax.random.key(0), 0.25, 10_000)
    assert 0.2 < float(mask.mean()) < 0.3
    assert not bool(make_drop_mask(jax.random.key(0), 0.0, 100).any())
    assert bool(make_drop_mask(jax.random.key(0), 1.0, 100).all())


def test_group_norm_fp32_roundtrip():
    gn = GroupNorm32(32, 64, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 64), jnp.bfloat16)
    y = gn(x)
    assert y.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(y, np.float32)).all()


def test_upsample_downsample_roundtrip_shapes():
    up = Upsample(8, use_conv=True, rngs=nnx.Rngs(0))
    down = Downsample(8, use_conv=True, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 8))
    assert up(x).shape == (2, 32, 32, 8)
    assert down(x).shape == (2, 8, 8, 8)
    down_pool = Downsample(8, use_conv=False, rngs=nnx.Rngs(0))
    assert down_pool(x).shape == (2, 8, 8, 8)


def test_timestep_embedder():
    te = TimestepEmbedder(64, rngs=nnx.Rngs(0))
    out = te(jnp.array([0.1, 0.5, 0.9]))
    assert out.shape == (3, 64)


def test_zero_linear_outputs_zero():
    lin = zero_linear(8, 4, rngs=nnx.Rngs(0))
    out = lin(jax.random.normal(jax.random.key(0), (2, 8)))
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_rope_planar_equivalent_to_interleaved_under_perm():
    """planar(x[..., perm]) == interleaved(x)[..., perm] — the exact identity
    that lets attention swap pairings with no score change (both q and k get
    the same permutation; scores are channel-permutation invariant)."""
    from diffulab_tpu.networks.nn import apply_rope_ndim_planar, rope_planar_perm

    B, S, H, D, rot = 2, 6, 3, 16, 12
    key = jax.random.key(0)
    q = jax.random.normal(key, (B, S, H, D))
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, H, D))
    pos = jax.random.randint(jax.random.fold_in(key, 2), (B, S, 2), 0, 7)
    cos, sin = get_cos_sin_ndim_grid(pos, 10_000.0, (8, 4))

    perm = rope_planar_perm(H, D, rot)
    perm_hd = perm.reshape(H, D) % D  # per-head channel map

    qi, ki = apply_rope_ndim(q, k, cos, sin, rot)
    qp, kp = apply_rope_ndim_planar(
        jnp.take_along_axis(q, jnp.asarray(perm_hd)[None, None], axis=-1),
        jnp.take_along_axis(k, jnp.asarray(perm_hd)[None, None], axis=-1),
        cos, sin, rot,
    )
    np.testing.assert_allclose(
        np.asarray(qp),
        np.asarray(jnp.take_along_axis(qi, jnp.asarray(perm_hd)[None, None], axis=-1)),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(kp),
        np.asarray(jnp.take_along_axis(ki, jnp.asarray(perm_hd)[None, None], axis=-1)),
        atol=1e-6,
    )
    # and the attention scores are identical between conventions
    s_i = jnp.einsum("bshd,bthd->bhst", qi, ki)
    s_p = jnp.einsum("bshd,bthd->bhst", qp, kp)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_i), atol=1e-5)


def test_rope_planar_preserves_norm():
    from diffulab_tpu.networks.nn import apply_rope_ndim_planar

    B, S, H, D = 1, 5, 2, 16
    q = jax.random.normal(jax.random.key(3), (B, S, H, D))
    pos = jnp.tile(jnp.arange(S)[None, :, None], (B, 1, 2))
    cos, sin = get_cos_sin_ndim_grid(pos, 10_000.0, (8, 8))
    qr, _ = apply_rope_ndim_planar(q, q, cos, sin, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(qr), axis=-1),
        np.linalg.norm(np.asarray(q), axis=-1), rtol=1e-5,
    )


def test_nearest_upsample_2x_matches_resize():
    import jax
    from diffulab_tpu.networks.nn import nearest_upsample_2x

    x = jax.random.normal(jax.random.key(0), (2, 5, 7, 3))
    ref = jax.image.resize(x, (2, 10, 14, 3), method="nearest")
    np.testing.assert_array_equal(np.asarray(nearest_upsample_2x(x)), np.asarray(ref))


def test_grad_clip_norm_optimizer_option():
    """optimizer.grad_clip_norm=N clips by global norm before the update —
    the guard against the measured GRPO runaway-update collapse (BASELINE.md
    round 4: one lr-3e-3 update jumped ratio_dev 0.06 -> 0.80, after which
    the fully-clipped PPO objective was zero-gradient and unrecoverable)."""
    import optax

    from diffulab_tpu.training.optim import adamw, sgd

    params = {"w": jnp.ones((4,))}
    big_grads = {"w": jnp.full((4,), 1e6)}

    # sgd's update is -lr*grad, so the clip is directly observable
    tx = sgd(lr=1.0, grad_clip_norm=1.0)
    updates, _ = tx.update(big_grads, tx.init(params), params)
    assert float(optax.global_norm(updates)) <= 1.0 + 1e-6
    tx_plain = sgd(lr=1.0)
    updates_plain, _ = tx_plain.update(big_grads, tx_plain.init(params), params)
    assert float(optax.global_norm(updates_plain)) > 1e5

    # adamw path: accepts the key and still yields finite updates
    tx = adamw(lr=1.0, grad_clip_norm=1.0)
    updates, _ = tx.update(big_grads, tx.init(params), params)
    assert jnp.all(jnp.isfinite(updates["w"]))
