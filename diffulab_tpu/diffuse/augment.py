"""Non-leaky geometric augmentation with conditioning labels (EDM-style).

Karras et al. (arXiv:2206.00364 §2.5) show diffusion models on small
datasets overfit long before convergence, and that geometric augmentation
becomes *non-leaky* when the applied transform is fed to the model as a
conditioning vector: at sampling time the zero vector selects the clean
(un-augmented) distribution. The reference has no augmentation subsystem;
this is an independent JAX implementation of the idea (not a port of the
EDM code): everything is batched `where`/`take_along_axis` arithmetic so it
traces into the jitted train step.

Transforms (each applied independently with probability ``p``):
- horizontal flip
- 90-degree rotation, k drawn from {1, 2, 3}
- integer translation, per-axis shift drawn from [-max_shift, max_shift]
  (circular)

Label layout [6]: ``[flip, cos(theta), sin(theta), tx/S, ty/S, applied]``
with all-zero entries for transforms that were not applied — note an
*applied* 0-degree rotation would encode (1, 0), distinct from "no
rotation" (0, 0): that distinction is what makes conditioning non-leaky.
The trailing ``applied`` bit marks whether any transform fired.

Denoisers consume the labels through a zero-init, bias-free linear into the
time embedding (``augment_dim`` config), so an absent label vector at
sampling time is exactly the zero-label path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

AUGMENT_DIM = 6


@dataclasses.dataclass(frozen=True)
class AugmentPipe:
    """Batched augmentation: ``pipe(rng, x)`` -> (augmented x, labels [B, 6]).

    ``x`` is NHWC with H == W (square grids; the rotation group requires it).
    """

    p: float = 0.12
    max_shift_frac: float = 0.125  # EDM uses 1/8 of the image side

    def __call__(self, rng: jax.Array, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        b, h, w, _ = x.shape
        assert h == w, "AugmentPipe requires square images (90-degree rotations)"
        r_flip, r_rot, r_trans, r_k, r_tx, r_ty = jax.random.split(rng, 6)
        expand = (-1,) + (1,) * (x.ndim - 1)

        # --- horizontal flip ------------------------------------------------
        do_flip = jax.random.bernoulli(r_flip, self.p, (b,))
        x = jnp.where(do_flip.reshape(expand), x[:, :, ::-1, :], x)

        # --- 90-degree rotation (k in {1, 2, 3} when applied) ----------------
        do_rot = jax.random.bernoulli(r_rot, self.p, (b,))
        k = jax.random.randint(r_k, (b,), 1, 4)
        k = jnp.where(do_rot, k, 0)
        # all four rotations, per-sample one-hot select (tiny batch tensors)
        rots = jnp.stack(
            [x, jnp.rot90(x, 1, (1, 2)), jnp.rot90(x, 2, (1, 2)), jnp.rot90(x, 3, (1, 2))]
        )  # [4, B, H, W, C]
        onehot = jax.nn.one_hot(k, 4, dtype=x.dtype)  # [B, 4]
        x = jnp.einsum("kbhwc,bk->bhwc", rots, onehot)

        # --- integer circular translation ------------------------------------
        max_shift = max(int(round(self.max_shift_frac * h)), 1)
        do_trans = jax.random.bernoulli(r_trans, self.p, (b,))
        tx = jnp.where(do_trans, jax.random.randint(r_tx, (b,), -max_shift, max_shift + 1), 0)
        ty = jnp.where(do_trans, jax.random.randint(r_ty, (b,), -max_shift, max_shift + 1), 0)
        rows = (jnp.arange(h)[None, :] - ty[:, None]) % h  # [B, H]
        cols = (jnp.arange(w)[None, :] - tx[:, None]) % w  # [B, W]
        x = jnp.take_along_axis(x, rows[:, :, None, None], axis=1)
        x = jnp.take_along_axis(x, cols[:, None, :, None], axis=2)

        theta = k.astype(jnp.float32) * (jnp.pi / 2.0)
        applied = do_flip | do_rot | do_trans
        labels = jnp.stack(
            [
                do_flip.astype(jnp.float32),
                jnp.where(do_rot, jnp.cos(theta), 0.0),
                jnp.where(do_rot, jnp.sin(theta), 0.0),
                tx.astype(jnp.float32) / h,
                ty.astype(jnp.float32) / h,
                applied.astype(jnp.float32),
            ],
            axis=1,
        )
        return x, labels
