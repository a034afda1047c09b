"""Benchmark: DiT-B/2 flow-matching training + 50-step Euler sampling on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The operative baseline (BASELINE.md) is measured, not quoted: the reference
publishes no numbers. ``vs_baseline`` compares this framework on its target
hardware (one TPU v5e chip) against the reference running the SAME model
config (DiT-B/2, rectified flow, logit-normal draws, p_cfg=0.1) on the best
hardware available to it in this container (torch 2.13 CPU, measured
2026-08-16 at batch 8 with warm autograd: 0.430 samples/s; this framework on
the same CPU via XLA: 0.159 samples/s — CPU is not the deployment path for
either).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from diffulab_tpu.diffuse import Diffuser
from diffulab_tpu.networks.denoisers.mmdit import MMDiT

BATCH = 64
LATENT = (32, 32, 4)  # ImageNet-256 with f8 VAE / DC-AE-ish latent grid
SAMPLE_BATCH = 16
SAMPLE_STEPS = 50


def build():
    model = MMDiT(
        simple_dit=True, input_channels=4, inner_dim=768, embedding_dim=768,
        num_heads=12, mlp_ratio=4, patch_size=2, depth=12, n_classes=1000,
        classifier_free=True, dtype=jnp.bfloat16, rngs=nnx.Rngs(0),
    )
    diffuser = Diffuser(model, sampling_method="euler", model_type="rectified_flow",
                        n_steps=SAMPLE_STEPS, extra_args={"logits_normal": True})
    return model, diffuser


def bench_train(model, diffuser, n_iters=30):
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
    params, opt_state, loss = train_step(params, opt_state, rng)  # compile
    float(loss)  # host transfer: guarantees real completion through the relay
    t0 = time.perf_counter()
    for i in range(n_iters):
        params, opt_state, loss = train_step(params, opt_state, jax.random.fold_in(rng, i))
    float(loss)  # step i depends on step i-1's params -> the chain is sequential
    dt = (time.perf_counter() - t0) / n_iters
    return BATCH / dt, dt


def bench_sample(model, diffuser, n_iters=5):
    # the LIBRARY path: Diffuser.generate jits + caches the whole reverse scan
    y = jnp.zeros((SAMPLE_BATCH,), jnp.int32)

    def sample(rng):
        return diffuser.generate(
            rng, {"y": y}, data_shape=(SAMPLE_BATCH, *LATENT),
            guidance_scale=4.0, dtype=jnp.bfloat16,
        )["x"]

    float(sample(jax.random.key(0)).sum())  # compile + complete
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(n_iters):
        acc += float(sample(jax.random.key(i)).sum())  # forced completion per call
    dt = (time.perf_counter() - t0) / n_iters
    return SAMPLE_BATCH / dt, dt


def main():
    model, diffuser = build()
    train_sps, train_dt = bench_train(model, diffuser)
    sample_ips, sample_dt = bench_sample(model, diffuser)
    # few-step sampling: DPM-Solver++(2M) at 15 steps (docs/samplers.md)
    fast_diffuser = Diffuser(
        model, sampling_method="dpmpp_2m", model_type="rectified_flow",
        n_steps=15, extra_args={"logits_normal": True},
    )
    fast_ips, fast_dt = bench_sample(model, fast_diffuser)
    # Delta-DiT block caching (docs/samplers.md): Euler-50 with the middle
    # 8 of 12 blocks cached and refreshed every 2nd step (~1/3 FLOPs saved)
    diffuser.set_block_cache(2, span=(2, 10))
    cached_ips, cached_dt = bench_sample(model, diffuser)
    diffuser.set_block_cache(None)
    reference_cpu_sps = 0.430  # measured: reference DiT-B/2 train step, torch CPU (see module docstring)
    print(json.dumps({
        "metric": "dit_b2_train_samples_per_sec_per_chip",
        "value": round(train_sps, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(train_sps / reference_cpu_sps, 1),
        "extras": {
            "baseline_note": "reference torch-CPU DiT-B/2 0.430 samples/s (no TPU backend exists for the reference); same-CPU XLA runs 0.159",
            "train_step_ms": round(train_dt * 1e3, 2),
            "train_batch": BATCH,
            "euler50_imgs_per_sec": round(sample_ips, 2),
            "euler50_batch_time_ms": round(sample_dt * 1e3, 2),
            "dpmpp15_imgs_per_sec": round(fast_ips, 2),
            "dpmpp15_batch_time_ms": round(fast_dt * 1e3, 2),
            "euler50_blockcache2_imgs_per_sec": round(cached_ips, 2),
            "euler50_blockcache2_batch_time_ms": round(cached_dt * 1e3, 2),
            "sample_batch": SAMPLE_BATCH,
            "device": str(jax.devices()[0]),
            "model": "DiT-B/2 class-cond, 32x32x4 latents, bf16, CFG-fused sampling",
        },
    }))


if __name__ == "__main__":
    main()
