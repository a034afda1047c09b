"""Cross-commit train-step A/B probe (VERDICT r3 item 3).

Measures ONLY the bench train step (DiT-B/2, batch 64, bf16, identical to
bench.py::make_train_burst) so the same file can run against two library
versions: invoke with PYTHONPATH pointing at the tree whose ``diffulab_tpu``
should be imported, cwd=/root/repo (TPU relay requirement, CLAUDE.md).

    PYTHONPATH=/tmp/r2tree AB_SIDE=r2   python scripts/ab_train_bench.py
    PYTHONPATH=/root/repo  AB_SIDE=head python scripts/ab_train_bench.py

Interleave several invocations per side and take the per-side MIN across
processes — per BASELINE.md timing doctrine (single-run relay timings swing
+-40%; min-of-N rejects spikes). Compile time is excluded (warmup step).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from diffulab_tpu.diffuse import Diffuser
from diffulab_tpu.networks.denoisers.mmdit import MMDiT

BATCH = 64
LATENT = (32, 32, 4)
N_ROUNDS = 6
TRAIN_BURST = 10


def main():
    model = MMDiT(
        simple_dit=True, input_channels=4, inner_dim=768, embedding_dim=768,
        num_heads=12, mlp_ratio=4, patch_size=2, depth=12, n_classes=1000,
        classifier_free=True, dtype=jnp.bfloat16, rngs=nnx.Rngs(0),
    )
    diffuser = Diffuser(model, sampling_method="euler", model_type="rectified_flow",
                        n_steps=50, extra_args={"logits_normal": True})
    diffusion = diffuser.diffusion
    optimizer = optax.adamw(1e-4)
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    opt_state = optimizer.init(params)

    x0 = jnp.zeros((BATCH, *LATENT), jnp.bfloat16)
    y = jnp.zeros((BATCH,), jnp.int32)

    @jax.jit
    def train_step(params, opt_state, rng):
        def loss_fn(params):
            m = nnx.merge(graphdef, params, rest)
            t_rng, n_rng, d_rng = jax.random.split(rng, 3)
            t = diffusion.draw_timesteps(t_rng, BATCH)
            noise = jax.random.normal(n_rng, x0.shape, dtype=x0.dtype)
            drop = jax.random.uniform(d_rng, (BATCH,)) < 0.1
            return diffusion.compute_loss(
                lambda **kw: m(**kw, train=True), x0, {"y": y}, t, noise, drop=drop
            )["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.key(0)
    p, o, loss = train_step(params, opt_state, rng)
    float(loss)  # compile + settle

    best = float("inf")
    for r in range(N_ROUNDS):
        t0 = time.perf_counter()
        for i in range(TRAIN_BURST):
            p, o, loss = train_step(p, o, jax.random.fold_in(rng, r * TRAIN_BURST + i))
        float(loss)  # host transfer: real completion through the relay
        best = min(best, (time.perf_counter() - t0) / TRAIN_BURST)

    print(json.dumps({
        "side": os.environ.get("AB_SIDE", "?"),
        "min_step_ms": round(best * 1e3, 2),
        "samples_per_s": round(BATCH / best, 2),
    }))


if __name__ == "__main__":
    main()
