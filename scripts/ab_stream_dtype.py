"""Interleaved one-process A/B: fp32 vs bf16 residual-stream train step.

Names the cause of the round-2 -> round-4 bench train-step drift (590.8 ->
542.7 samples/s): round 3's mixed-precision policy carries the residual
token stream (plus patchify conv + conditioning MLPs) at fp32 under a bf16
compute dtype (`MMDiT.stream_dtype`, nn.stable_dtype). This probe times the
EXACT bench train step (bench.py::make_train_burst shapes) for both stream
dtypes in one process, interleaved min-of-N per BASELINE.md timing doctrine.

The conditioning-path fp32 (stable_dtype in TimestepEmbedder/Modulation/...)
is not switchable per-model, so the bf16 side here isolates the STREAM cost
only; the remainder vs the round-2 number bounds the conditioning-path cost.
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

from diffulab_tpu.diffuse import Diffuser
from diffulab_tpu.networks.denoisers.mmdit import MMDiT

BATCH = 64
LATENT = (32, 32, 4)
N_ROUNDS = 6
TRAIN_BURST = 10


def make_burst(stream_dtype):
    model = MMDiT(
        simple_dit=True, input_channels=4, inner_dim=768, embedding_dim=768,
        num_heads=12, mlp_ratio=4, patch_size=2, depth=12, n_classes=1000,
        classifier_free=True, dtype=jnp.bfloat16, stream_dtype=stream_dtype,
        rngs=nnx.Rngs(0),
    )
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
    bursts = {"stream_fp32": make_burst(None),         # default policy
              "stream_bf16": make_burst("bfloat16")}   # round-2-like stream
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
