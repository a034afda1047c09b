"""Interleaved step-time A/B: bf16 mixed-precision policy vs fp32 on the
bench.py DiT-B/2 shapes (BASELINE.md house rule: A/B only via interleaved
min-of-N inside one process). Records the step-time cost of the round-3
mixed-precision policy; the old all-bf16 reference is BENCH_r02's 591.7
samples/s (same harness, pre-policy code)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from diffulab_tpu.diffuse import Diffuser
from diffulab_tpu.networks.denoisers.mmdit import MMDiT

BATCH = 64
LATENT = (32, 32, 4)


def build(dtype):
    model = MMDiT(
        simple_dit=True, input_channels=4, inner_dim=768, embedding_dim=768,
        num_heads=12, mlp_ratio=4, patch_size=2, depth=12, n_classes=1000,
        classifier_free=True, dtype=dtype, rngs=nnx.Rngs(0),
    )
    diffuser = Diffuser(model, sampling_method="euler", model_type="rectified_flow",
                        n_steps=50, extra_args={"logits_normal": True})
    return model, diffuser


def make_step(model, diffuser, in_dtype):
    diffusion = diffuser.diffusion
    optimizer = optax.adamw(1e-4)
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    opt_state = optimizer.init(params)
    x0 = jnp.zeros((BATCH, *LATENT), in_dtype)
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

    return train_step, params, opt_state


def time_chain(step, params, opt_state, n):
    rng = jax.random.key(0)
    t0 = time.perf_counter()
    for i in range(n):
        params, opt_state, loss = step(params, opt_state, jax.random.fold_in(rng, i))
    float(loss)  # host fence through the relay
    return (time.perf_counter() - t0) / n, params, opt_state


def main():
    # Two DiT-B variants + opt states resident together exhaust the relay
    # chip's memory, so interleave at build granularity instead: build one
    # variant, time it, free it, build the other — alternating rounds keeps
    # the A/B property (both variants sample every thermal/relay phase)
    # while only one variant is ever resident. jit's executable cache makes
    # the rebuilds cheap after the first round.
    import gc

    specs = {"bf16_policy": jnp.bfloat16, "fp32": None}
    best = {name: float("inf") for name in specs}
    for round_i in range(4):
        for name, dtype in specs.items():
            model, diffuser = build(dtype)
            step, params, opt_state = make_step(model, diffuser, jnp.float32)
            params, opt_state, loss = step(params, opt_state, jax.random.key(0))
            float(loss)  # compile + fence
            dt, params, opt_state = time_chain(step, params, opt_state, 10)
            best[name] = min(best[name], dt)
            print(f"round {round_i} {name}: {dt*1e3:.1f} ms", flush=True)
            del model, diffuser, step, params, opt_state, loss
            gc.collect()
    for name, dt in best.items():
        print(f"BEST {name}: {dt*1e3:.2f} ms/step = {BATCH/dt:.1f} samples/s")


if __name__ == "__main__":
    main()
