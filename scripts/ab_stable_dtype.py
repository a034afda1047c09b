"""Interleaved one-process A/B: HEAD mixed-precision policy vs a full bf16
cast (round-2-like) on the bench train step.

The stream-dtype probe (ab_stream_dtype.py) exonerated the fp32 residual
stream (541.7 vs 544.1 samples/s — identical). The remaining round-3 policy
components are the fp32 conditioning path (TimestepEmbedder / Modulation /
LabelEmbedder via ``nn.stable_dtype``), the fp32 patchify conv, and the fp32
final projection. This probe rebuilds the bench model with ``stable_dtype``
monkeypatched to identity — every round-3 protection off at once, i.e. the
round-2 whole-model bf16 cast — and times both variants interleaved
min-of-N. If the bf16-cast side recovers ~590 samples/s, the 590.8 -> 542.7
bench drift is named: the mixed-precision policy, not feature plumbing.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import optax
from flax import nnx

import diffulab_tpu.networks.nn as nn_mod
import diffulab_tpu.networks.denoisers.mmdit as mmdit_mod
from diffulab_tpu.diffuse import Diffuser

BATCH = 64
LATENT = (32, 32, 4)
N_ROUNDS = 6
TRAIN_BURST = 10

_real_stable = nn_mod.stable_dtype


def make_burst(protect: bool):
    ident = _real_stable if protect else (lambda dt: dt)
    # both modules bind the name at import time; patch each binding
    nn_mod.stable_dtype = ident
    mmdit_mod.stable_dtype = ident
    try:
        model = mmdit_mod.MMDiT(
            simple_dit=True, input_channels=4, inner_dim=768, embedding_dim=768,
            num_heads=12, mlp_ratio=4, patch_size=2, depth=12, n_classes=1000,
            classifier_free=True, dtype=jnp.bfloat16,
            stream_dtype=None if protect else "bfloat16",
            rngs=nnx.Rngs(0),
        )
    finally:
        nn_mod.stable_dtype = _real_stable
        mmdit_mod.stable_dtype = _real_stable
    diffusion = Diffuser(model, sampling_method="euler", model_type="rectified_flow",
                         n_steps=50, extra_args={"logits_normal": True}).diffusion
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

    state = {"p": params, "o": opt_state}
    rng = jax.random.key(0)
    p, o, loss = train_step(state["p"], state["o"], rng)
    float(loss)  # compile + settle
    state["p"], state["o"] = p, o

    def burst(i0: int) -> float:
        t0 = time.perf_counter()
        p, o = state["p"], state["o"]
        for i in range(TRAIN_BURST):
            p, o, loss = train_step(p, o, jax.random.fold_in(rng, i0 + i))
        float(loss)  # host transfer: real completion through the relay
        dt = (time.perf_counter() - t0) / TRAIN_BURST
        state["p"], state["o"] = p, o
        return dt

    return burst


def main():
    bursts = {"policy_head": make_burst(True),      # HEAD mixed-precision policy
              "bf16_cast_r2": make_burst(False)}    # round-2 whole-model cast
    mins = {k: float("inf") for k in bursts}
    for r in range(N_ROUNDS):
        for k, b in bursts.items():
            mins[k] = min(mins[k], b(r * TRAIN_BURST))
    print(json.dumps({
        k: {"min_step_ms": round(v * 1e3, 2), "samples_per_s": round(BATCH / v, 2)}
        for k, v in mins.items()
    }))


if __name__ == "__main__":
    main()
