"""NN primitives (layer L0).

JAX/Flax-NNX redesign of reference src/diffulab/networks/utils/nn.py:11-540.
Everything is NHWC (TPU-native conv layout) and dtype-polymorphic: modules take
a ``dtype`` (compute) and ``param_dtype`` pair, norms always compute in fp32.

RoPE comes in the reference's two distinct conventions, both preserved:
- 1-D RoPE (reference nn.py:167-259) uses the "rotate-half" pairing
  (x[:d/2], x[d/2:]);
- N-D RoPE (reference nn.py:262-400) uses interleaved even/odd complex pairs,
  with per-axis frequency allocations (``axes_dim``) concatenated.
Both are pure functions here (no module state, no caches): cos/sin grids are
precomputed per sequence layout and closed over by the jitted step.
"""

from __future__ import annotations

import math
from contextlib import contextmanager
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

# --------------------------------------------------------------------------- #
# Functional pieces
# --------------------------------------------------------------------------- #


#: When False, ``stable_dtype`` becomes the identity — the whole model runs
#: at the compute dtype (round-2-style full cast). Measured on the v5e chip
#: (BASELINE.md round 4): the fp32 conditioning path costs ~6.5% train-step
#: throughput (541 vs 577 samples/s) and was the named cause of the round-3
#: bench drift. Toggle per-model via the ``stable_conditioning`` constructor
#: arg (config-reachable: ``model.stable_conditioning=false``), not by
#: writing this global directly.
STABLE_CONDITIONING = True


@contextmanager
def stable_conditioning_scope(enabled: bool):
    """Scoped override of the conditioning-path fp32 protection, used by
    model constructors so every ``stable_dtype`` call during submodule
    construction (time/label embed, modulation, patchify, final proj)
    resolves consistently."""
    global STABLE_CONDITIONING
    prev = STABLE_CONDITIONING
    STABLE_CONDITIONING = enabled
    try:
        yield
    finally:
        STABLE_CONDITIONING = prev


def stable_dtype(dtype):
    """Compute dtype for the numerically sensitive conditioning path under
    mixed precision: half dtypes (bf16/fp16) promote to fp32; None/fp32 pass
    through unchanged (identity when ``STABLE_CONDITIONING`` is scoped off).

    This encodes the torch-autocast semantics the reference trains under
    (trainers/common.py:105): autocast runs matmuls/convs in bf16 but keeps
    normalization, the loss, and small pointwise paths fp32. A whole-model
    ``dtype=bf16`` cast instead degraded quality measurably (BASELINE.md
    precision ablation: EDM FID 4.24 -> 22.89; later attributed to the EMA
    horizon, see the round-4 bf16 verdict), so modulation / time-embed /
    label-embed / final-projection layers and the residual token stream use
    this helper to stay fp32 while the big matmuls keep the half dtype.
    """
    if not STABLE_CONDITIONING:
        return dtype
    if dtype is not None and jnp.issubdtype(dtype, jnp.floating) and jnp.finfo(dtype).bits < 32:
        return jnp.float32
    return dtype


#: opt-in switch for fp32 matmul emission under a half compute dtype.
#: Measured on the v5e chip (BASELINE.md round 3): emitting fp32 from every
#: Linear bought ~0 FID on the bf16 EDM recipe (22.0 vs 22.9; fp32 is 4.24)
#: while costing 25-36% train-step throughput and OOMing the batch-256 step
#: (fp32 activation temps double the working set). Default OFF; flip for
#: precision experiments only.
ACCUM_FP32 = False


def accum_dtype_kwargs(dtype) -> dict:
    """Matmul constructor kwargs that keep the MXU's fp32 accumulator:
    under a half compute dtype, emit fp32 outputs (``preferred_element_type``)
    instead of rounding the accumulated result back to bf16.

    Gated by ``ACCUM_FP32`` (default off — see the measurement note above):
    matmul INPUTS stay bf16 either way (TPU matmul precision DEFAULT
    truncates fp32 operands to bf16, so this only changes output rounding).
    """
    if (ACCUM_FP32 and dtype is not None and jnp.issubdtype(dtype, jnp.floating)
            and jnp.finfo(dtype).bits < 32):
        return {"preferred_element_type": jnp.float32}
    return {}


def timestep_embedding(timesteps: jax.Array, dim: int, max_period: int = 10_000) -> jax.Array:
    """Sinusoidal timestep embeddings, [B] -> [B, dim] (reference nn.py:91-114).

    Matches the guided-diffusion convention: cos block then sin block,
    zero-padded if dim is odd. Always computed in fp32.
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate([embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding


def nearest_upsample_2x(x: jax.Array) -> jax.Array:
    """2x nearest-neighbor upsample, NHWC, as broadcast + reshape.

    Identical output to ``jax.image.resize(..., method="nearest")`` at an
    exact 2x factor (pure pixel duplication), lowering to a copy-free
    broadcast instead of resize's general gather. Measured equal on the
    155M ADM UNet step (XLA already specializes the 2x gather; BASELINE.md)
    — kept for the guaranteed-cheap lowering and explicitness."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def modulate(x: jax.Array, scale: jax.Array, shift: jax.Array) -> jax.Array:
    """adaLN modulation ``x * (1 + scale) + shift`` (reference nn.py:539-540)."""
    return x * (1 + scale) + shift


def packed_swiglu(x: jax.Array) -> jax.Array:
    """SwiGLU over a packed [..., 2*dim] tensor (reference nn.py:478-486)."""
    x1, x3 = jnp.split(x, 2, axis=-1)
    return jax.nn.silu(x1) * x3


def geglu(x: jax.Array) -> jax.Array:
    """GEGLU over a packed [..., 2*dim] tensor (reference unet.py:325-340)."""
    x1, gate = jnp.split(x, 2, axis=-1)
    return x1 * jax.nn.gelu(gate)


# --------------------------------------------------------------------------- #
# RoPE
# --------------------------------------------------------------------------- #


def rope_1d_cos_sin(seq_len: int, dim: int, base: float = 10_000.0) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables [S, dim] for rotate-half 1-D RoPE (reference nn.py:194-207)."""
    theta = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, theta)  # [S, dim/2]
    embs = jnp.concatenate([freqs, freqs], axis=-1)  # [S, dim]
    return jnp.cos(embs), jnp.sin(embs)


def apply_rope_1d(
    q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array, rotary_dim: int
) -> tuple[jax.Array, jax.Array]:
    """Rotate-half RoPE on the first ``rotary_dim`` channels of q/k [B,S,H,D]."""

    def rot(x: jax.Array) -> jax.Array:
        x_rope, x_pass = x[..., :rotary_dim], x[..., rotary_dim:]
        neg_half = jnp.concatenate(
            [-x_rope[..., rotary_dim // 2 :], x_rope[..., : rotary_dim // 2]], axis=-1
        )
        c = cos[None, :, None, :].astype(x.dtype)
        s = sin[None, :, None, :].astype(x.dtype)
        x_rope = x_rope * c + neg_half * s
        return jnp.concatenate([x_rope, x_pass], axis=-1)

    return rot(q), rot(k)


def get_cos_sin_ndim_grid(
    pos_id: jax.Array, base: float, axes_dim: Sequence[int]
) -> tuple[jax.Array, jax.Array]:
    """cos/sin for N-D grid positions (reference nn.py:262-307).

    pos_id: [B, S, n_axes] integer positions along each axis.
    Returns (cos, sin): [B, S, sum(axes_dim)/2], fp32. Angle tables use fp64 on
    host-precomputable inputs in the reference; fp32 is sufficient for the
    position ranges here (<= a few thousand) and keeps the whole grid on-device.
    """
    assert len(axes_dim) == pos_id.shape[-1], "axes_dim length must match pos_id n_axes"
    cos_chunks, sin_chunks = [], []
    for axis_idx, axis_dim in enumerate(axes_dim):
        pos_i = pos_id[..., axis_idx].astype(jnp.float32)
        freqs = 1.0 / (base ** (jnp.arange(0, axis_dim, 2, dtype=jnp.float32) / axis_dim))
        angles = jnp.einsum("...s,d->...sd", pos_i, freqs)
        cos_chunks.append(jnp.cos(angles))
        sin_chunks.append(jnp.sin(angles))
    return jnp.concatenate(cos_chunks, axis=-1), jnp.concatenate(sin_chunks, axis=-1)


def apply_rope_ndim(
    q: jax.Array,
    k: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    rotary_dim: int,
) -> tuple[jax.Array, jax.Array]:
    """Interleaved-pair N-D RoPE on the first ``rotary_dim`` channels.

    q/k: [B, S, H, D]; cos/sin: [B, S, rotary_dim/2]
    (reference nn.py:330-400, q/k rotated, v untouched).
    """

    def rot(x: jax.Array) -> jax.Array:
        x_rope, x_pass = x[..., :rotary_dim], x[..., rotary_dim:]
        c = cos[:, :, None, :].astype(x.dtype)  # [B, S, 1, D/2]
        s = sin[:, :, None, :].astype(x.dtype)
        x_even = x_rope[..., 0::2]
        x_odd = x_rope[..., 1::2]
        rot_even = x_even * c - x_odd * s
        rot_odd = x_even * s + x_odd * c
        x_rot = jnp.stack([rot_even, rot_odd], axis=-1).reshape(x_rope.shape)
        return jnp.concatenate([x_rot, x_pass], axis=-1)

    return rot(q), rot(k)


def rope_planar_perm(num_heads: int, head_dim: int, rotary_dim: int) -> np.ndarray:
    """Channel permutation turning interleaved-pair RoPE into rotate-half.

    Attention scores are invariant to any fixed permutation applied to BOTH
    q and k channels, so the interleaved pairing of the reference convention
    (nn.py:330-400) can be re-indexed to planar halves — pair ``(2i, 2i+1)``
    lands at ``(i, rot/2 + i)`` per head — and then
    :func:`apply_rope_ndim_planar` rotates two CONTIGUOUS half-slices instead
    of stride-2 lanes. On TPU the stride-2 gather forces a (2,1)-tiled layout
    and per-layer relayout copies (~10% of the DiT-B/2 step, profiled on
    v5e); the planar form is copy-free. Folding this permutation into the
    qkv projection's output columns (and the QKNorm scales) makes the whole
    transform exact: same multiplies, same pairings, reordered channels that
    only attention's inner product ever sees.
    """
    perm = np.arange(num_heads * head_dim)
    half = rotary_dim // 2
    for h in range(num_heads):
        base = h * head_dim
        perm[base:base + half] = base + 2 * np.arange(half)  # evens
        perm[base + half:base + rotary_dim] = base + 2 * np.arange(half) + 1  # odds
    return perm


def apply_rope_ndim_planar(
    q: jax.Array,
    k: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    rotary_dim: int,
) -> tuple[jax.Array, jax.Array]:
    """Rotate-half N-D RoPE on channels permuted by :func:`rope_planar_perm`.

    Numerically identical to :func:`apply_rope_ndim` composed with the
    permutation: ``planar(q[..., perm]) == apply_rope_ndim(q)[..., perm]``.
    q/k: [B, S, H, D]; cos/sin: [B, S, rotary_dim/2].
    """
    half = rotary_dim // 2

    def rot(x: jax.Array) -> jax.Array:
        x1 = x[..., :half]
        x2 = x[..., half:rotary_dim]
        x_pass = x[..., rotary_dim:]
        c = cos[:, :, None, :].astype(x.dtype)
        s = sin[:, :, None, :].astype(x.dtype)
        return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c, x_pass], axis=-1)

    return rot(q), rot(k)


# --------------------------------------------------------------------------- #
# Norms
# --------------------------------------------------------------------------- #


class GroupNorm32(nnx.Module):
    """GroupNorm with forced fp32 compute (reference nn.py:11-25), NHWC."""

    def __init__(self, num_groups: int, channels: int, *, rngs: nnx.Rngs, param_dtype=jnp.float32):
        self.norm = nnx.GroupNorm(
            num_features=channels,
            num_groups=min(num_groups, channels),
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=param_dtype,
            rngs=rngs,
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.norm(x.astype(jnp.float32)).astype(x.dtype)


def normalization(channels: int, *, rngs: nnx.Rngs) -> GroupNorm32:
    """Standard 32-group normalization layer (reference nn.py:16-25)."""
    return GroupNorm32(32, channels, rngs=rngs)


class RMSNorm(nnx.Module):
    """RMSNorm with fp32 statistics (reference nn.py:403-431)."""

    def __init__(self, dim: int, *, rngs: nnx.Rngs, param_dtype=jnp.float32):
        del rngs
        self.scale = nnx.Param(jnp.ones((dim,), dtype=param_dtype))

    def __call__(self, x: jax.Array) -> jax.Array:
        x_dtype = x.dtype
        xf = x.astype(jnp.float32)
        rrms = jax.lax.rsqrt(jnp.mean(xf**2, axis=-1, keepdims=True) + 1e-6)
        return (xf * rrms).astype(x_dtype) * self.scale[...].astype(x_dtype)


class QKNorm(nnx.Module):
    """Separate RMSNorms for query/key (reference nn.py:434-475)."""

    def __init__(self, dim: int, *, rngs: nnx.Rngs, param_dtype=jnp.float32):
        self.query_norm = RMSNorm(dim, rngs=rngs, param_dtype=param_dtype)
        self.key_norm = RMSNorm(dim, rngs=rngs, param_dtype=param_dtype)

    def __call__(self, q: jax.Array, k: jax.Array, v: jax.Array) -> tuple[jax.Array, jax.Array]:
        return self.query_norm(q).astype(v.dtype), self.key_norm(k).astype(v.dtype)


# --------------------------------------------------------------------------- #
# Resampling
# --------------------------------------------------------------------------- #


class Upsample(nnx.Module):
    """2x nearest-neighbor upsample with optional 3x3 conv, NHWC
    (reference nn.py:28-56, guided-diffusion lineage)."""

    def __init__(
        self,
        channels: int,
        use_conv: bool,
        out_channels: int | None = None,
        *,
        rngs: nnx.Rngs,
        dtype=jnp.float32,
        param_dtype=jnp.float32,
    ):
        self.channels = channels
        self.out_channels = out_channels or channels
        self.use_conv = use_conv
        if use_conv:
            self.conv = nnx.Conv(
                self.channels, self.out_channels, (3, 3), padding=1,
                dtype=dtype, param_dtype=param_dtype, rngs=rngs,
            )

    def __call__(self, x: jax.Array) -> jax.Array:
        assert x.shape[-1] == self.channels
        x = nearest_upsample_2x(x)
        if self.use_conv:
            x = self.conv(x)
        return x


class Downsample(nnx.Module):
    """2x downsample via strided conv or average pool, NHWC (reference nn.py:59-88)."""

    def __init__(
        self,
        channels: int,
        use_conv: bool,
        out_channels: int | None = None,
        *,
        rngs: nnx.Rngs,
        dtype=jnp.float32,
        param_dtype=jnp.float32,
    ):
        self.channels = channels
        self.out_channels = out_channels or channels
        self.use_conv = use_conv
        if use_conv:
            self.op = nnx.Conv(
                self.channels, self.out_channels, (3, 3), strides=(2, 2), padding=1,
                dtype=dtype, param_dtype=param_dtype, rngs=rngs,
            )
        else:
            assert self.channels == self.out_channels

    def __call__(self, x: jax.Array) -> jax.Array:
        assert x.shape[-1] == self.channels
        if self.use_conv:
            return self.op(x)
        return nnx.avg_pool(x, window_shape=(2, 2), strides=(2, 2))


# --------------------------------------------------------------------------- #
# Embeddings & modulation
# --------------------------------------------------------------------------- #


class LabelEmbed(nnx.Module):
    """Class-label embedding with a CFG null class (reference nn.py:117-164).

    The reference drops labels stochastically inside forward given a scalar
    probability ``p``; here the drop decision is an explicit per-sample boolean
    mask computed from a threaded PRNG key (see ``make_drop_mask``), which keeps
    the module pure and the fused 2x CFG batch expressible as a constant mask.
    """

    def __init__(
        self,
        num_classes: int,
        embed_dim: int,
        classifier_free_guidance: bool = False,
        *,
        rngs: nnx.Rngs,
        dtype=jnp.float32,
        param_dtype=jnp.float32,
    ):
        self.num_classes = num_classes
        self.embed_dim = embed_dim
        self.classifier_free_guidance = classifier_free_guidance
        n_embed = num_classes + 1 if classifier_free_guidance else num_classes
        self.embedding = nnx.Embed(
            n_embed, embed_dim, dtype=stable_dtype(dtype), param_dtype=param_dtype, rngs=rngs
        )

    def drop_labels(self, labels: jax.Array, drop: jax.Array) -> jax.Array:
        """Replace labels by the null class wherever ``drop`` is True."""
        return jnp.where(drop, self.num_classes, labels)

    def __call__(self, labels: jax.Array, drop: jax.Array | None = None) -> jax.Array:
        if drop is not None:
            assert self.classifier_free_guidance, (
                "Label dropout is only supported with classifier-free guidance."
            )
            labels = self.drop_labels(labels, drop)
        return self.embedding(labels)


def make_drop_mask(rng: jax.Array, p: float | jax.Array, batch_size: int) -> jax.Array:
    """Per-sample CFG condition-drop mask: True with probability ``p``.

    The JAX analog of the reference's in-module ``rand() < p`` sites
    (nn.py:149, qwen.py:46, precomputed.py:22-39)."""
    return jax.random.uniform(rng, (batch_size,)) < p


class TimestepEmbedder(nnx.Module):
    """Sinusoidal embedding + 2-layer SiLU MLP (the ``time_embed`` blocks in
    reference unet.py:700-704 / mmdit.py:676-682)."""

    def __init__(
        self,
        hidden_dim: int,
        frequency_dim: int = 256,
        *,
        rngs: nnx.Rngs,
        dtype=jnp.float32,
        param_dtype=jnp.float32,
    ):
        self.frequency_dim = frequency_dim
        dtype = stable_dtype(dtype)  # per-sample conditioning path stays fp32
        self.fc1 = nnx.Linear(frequency_dim, hidden_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.fc2 = nnx.Linear(hidden_dim, hidden_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, timesteps: jax.Array) -> jax.Array:
        emb = timestep_embedding(timesteps, self.frequency_dim)
        emb = emb.astype(self.fc1.kernel[...].dtype)
        return self.fc2(jax.nn.silu(self.fc1(emb)))


class ModulationOut:
    """Six-way adaLN modulation parameters (reference nn.py:489-496)."""

    __slots__ = ("alpha", "beta", "gamma", "delta", "epsilon", "zeta")

    def __init__(self, alpha, beta, gamma, delta, epsilon, zeta):
        self.alpha = alpha
        self.beta = beta
        self.gamma = gamma
        self.delta = delta
        self.epsilon = epsilon
        self.zeta = zeta


class Modulation(nnx.Module):
    """silu + linear producing six adaLN chunks (reference nn.py:499-536).

    ``zero_init`` gives adaLN-zero behavior: at init the modulated residual
    branches contribute exactly nothing (mirrors the reference's explicit
    zero-init of modulation weights, mmdit.py:742-745).
    """

    def __init__(
        self,
        embedding_dim: int,
        input_dim: int,
        n_chunks: int = 6,
        zero_init: bool = True,
        *,
        rngs: nnx.Rngs,
        dtype=jnp.float32,
        param_dtype=jnp.float32,
    ):
        self.n_chunks = n_chunks
        kernel_init = nnx.initializers.zeros_init() if zero_init else nnx.initializers.xavier_uniform()
        self.lin = nnx.Linear(
            embedding_dim, n_chunks * input_dim,
            kernel_init=kernel_init, bias_init=nnx.initializers.zeros_init(),
            dtype=stable_dtype(dtype), param_dtype=param_dtype, rngs=rngs,
        )

    def __call__(self, vec: jax.Array):
        out = self.lin(jax.nn.silu(vec))
        if out.ndim == 2:
            out = out[:, None, :]
        chunks = jnp.split(out, self.n_chunks, axis=-1)
        if self.n_chunks == 6:
            return ModulationOut(*chunks)
        return chunks


def zero_linear(in_dim: int, out_dim: int, *, rngs: nnx.Rngs, dtype=jnp.float32, param_dtype=jnp.float32) -> nnx.Linear:
    """Zero-initialized linear (the reference's ``zero_module`` idiom, utils.py:7-10)."""
    return nnx.Linear(
        in_dim, out_dim,
        kernel_init=nnx.initializers.zeros_init(), bias_init=nnx.initializers.zeros_init(),
        dtype=dtype, param_dtype=param_dtype, rngs=rngs, **accum_dtype_kwargs(dtype),
    )


def zero_conv(
    in_ch: int, out_ch: int, kernel: tuple[int, int], *, rngs: nnx.Rngs, dtype=jnp.float32, param_dtype=jnp.float32
) -> nnx.Conv:
    """Zero-initialized conv (guided-diffusion zero_module on out convs)."""
    # no accum_dtype_kwargs: conv VJPs require matching operand dtypes, so a
    # fp32 preferred output breaks the backward pass (unlike dot_general)
    return nnx.Conv(
        in_ch, out_ch, kernel, padding=(kernel[0] // 2, kernel[1] // 2),
        kernel_init=nnx.initializers.zeros_init(), bias_init=nnx.initializers.zeros_init(),
        dtype=dtype, param_dtype=param_dtype, rngs=rngs,
    )
