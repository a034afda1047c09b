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

Timing doctrine (BASELINE.md "Measured perf facts"): single-run timings on
the relay chip swing +-40%, so every metric is measured as the MIN over
N_ROUNDS interleaved rounds in one process — each round times every metric
once, so drift hits all metrics equally and the min rejects relay spikes.
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
N_ROUNDS = 6
TRAIN_BURST = 10  # chained steps per timed burst (params of step i feed i+1)


def build():
    # Whole-model bf16 cast (stable_conditioning=False, bf16 residual stream):
    # the round-3 fp32 conditioning path was the named cause of the round-3/4
    # train-step drift (+6.5% step time, scripts/ab_stable_dtype.py), and the
    # round-4 full-cast quality arm measured it FID-free at the optimal
    # post-hoc-EMA horizon (0.909 vs fp32 1.01 — BASELINE.md round-4
    # precision-reclaim). The bench therefore runs the fastest measured-safe
    # policy; the library default keeps stable_conditioning=True for
    # reference-autocast parity.
    model = MMDiT(
        simple_dit=True, input_channels=4, inner_dim=768, embedding_dim=768,
        num_heads=12, mlp_ratio=4, patch_size=2, depth=12, n_classes=1000,
        classifier_free=True, dtype=jnp.bfloat16, stable_conditioning=False,
        stream_dtype=jnp.bfloat16, rngs=nnx.Rngs(0),
    )
    diffuser = Diffuser(model, sampling_method="euler", model_type="rectified_flow",
                        n_steps=SAMPLE_STEPS, extra_args={"logits_normal": True})
    return model, diffuser


def make_train_burst(model, diffuser):
    """Returns burst() -> seconds per step, timing TRAIN_BURST chained steps."""
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

    state = {"params": params, "opt": opt_state}
    rng = jax.random.key(0)

    def burst(i0: int) -> float:
        t0 = time.perf_counter()
        p, o = state["params"], state["opt"]
        for i in range(TRAIN_BURST):
            p, o, loss = train_step(p, o, jax.random.fold_in(rng, i0 + i))
        float(loss)  # host transfer: guarantees real completion through the relay
        dt = (time.perf_counter() - t0) / TRAIN_BURST
        state["params"], state["opt"] = p, o
        return dt

    # compile + settle
    p, o, loss = train_step(state["params"], state["opt"], rng)
    float(loss)
    state["params"], state["opt"] = p, o
    return burst


def make_sampler(diffuser):
    """Returns run(i) -> seconds per batch through the library Diffuser.generate."""
    y = jnp.zeros((SAMPLE_BATCH,), jnp.int32)

    def sample(rng):
        return diffuser.generate(
            rng, {"y": y}, data_shape=(SAMPLE_BATCH, *LATENT),
            guidance_scale=4.0, dtype=jnp.bfloat16,
        )["x"]

    float(sample(jax.random.key(0)).sum())  # compile + complete

    def run(i: int) -> float:
        t0 = time.perf_counter()
        float(sample(jax.random.key(i)).sum())  # forced completion per call
        return time.perf_counter() - t0

    return run


def main():
    model, diffuser = build()
    # few-step sampling: DPM-Solver++(2M) at 15 steps (docs/samplers.md)
    fast_diffuser = Diffuser(
        model, sampling_method="dpmpp_2m", model_type="rectified_flow",
        n_steps=15, extra_args={"logits_normal": True},
    )
    # Delta-DiT block caching (docs/samplers.md): Euler-50 with the middle
    # 8 of 12 blocks cached and refreshed every 2nd step (~1/3 FLOPs saved).
    # The span is set on the shared denoiser BEFORE any compile: the plain
    # diffusers never thread a cache, so their traced program is unaffected
    # (mmdit.py gates on `cache_span is not None AND block_cache is not None`)
    # and no recompiles happen between interleaved rounds.
    cached_diffuser = Diffuser(
        model, sampling_method="euler", model_type="rectified_flow",
        n_steps=SAMPLE_STEPS, extra_args={"logits_normal": True},
    )
    cached_diffuser.set_block_cache(2, span=(2, 10))

    train_burst = make_train_burst(model, diffuser)
    euler50 = make_sampler(diffuser)
    dpmpp15 = make_sampler(fast_diffuser)
    euler50_cached = make_sampler(cached_diffuser)

    mins = {"train": float("inf"), "euler50": float("inf"),
            "dpmpp15": float("inf"), "cached": float("inf")}
    for r in range(N_ROUNDS):
        mins["train"] = min(mins["train"], train_burst(r * TRAIN_BURST))
        mins["euler50"] = min(mins["euler50"], euler50(r))
        mins["dpmpp15"] = min(mins["dpmpp15"], dpmpp15(r))
        mins["cached"] = min(mins["cached"], euler50_cached(r))

    train_sps = BATCH / mins["train"]
    reference_cpu_sps = 0.430  # measured: reference DiT-B/2 train step, torch CPU (see module docstring)
    print(json.dumps({
        "metric": "dit_b2_train_samples_per_sec_per_chip",
        "value": round(train_sps, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(train_sps / reference_cpu_sps, 1),
        "extras": {
            "baseline_note": "reference torch-CPU DiT-B/2 0.430 samples/s (no TPU backend exists for the reference); same-CPU XLA runs 0.159",
            # self-describing precision bookkeeping (ADVICE r4): r01-r02 ran
            # the whole-model bf16 cast, r03 added the fp32 conditioning path
            # (stable_conditioning, ~6.5% step cost), r04+ reverted to the
            # full cast after the quality arm cleared it — diff bench trends
            # against rounds with the same policy string
            "precision_policy": "full_bf16_cast",
            "timing": f"interleaved min of {N_ROUNDS} rounds (train bursts of {TRAIN_BURST} chained steps)",
            "train_step_ms": round(mins["train"] * 1e3, 2),
            "train_batch": BATCH,
            "euler50_imgs_per_sec": round(SAMPLE_BATCH / mins["euler50"], 2),
            "euler50_batch_time_ms": round(mins["euler50"] * 1e3, 2),
            "dpmpp15_imgs_per_sec": round(SAMPLE_BATCH / mins["dpmpp15"], 2),
            "dpmpp15_batch_time_ms": round(mins["dpmpp15"] * 1e3, 2),
            "euler50_blockcache2_imgs_per_sec": round(SAMPLE_BATCH / mins["cached"], 2),
            "euler50_blockcache2_batch_time_ms": round(mins["cached"] * 1e3, 2),
            "sample_batch": SAMPLE_BATCH,
            "device": str(jax.devices()[0]),
            "model": "DiT-B/2 class-cond, 32x32x4 latents, bf16, CFG-fused sampling",
        },
    }))


if __name__ == "__main__":
    main()
