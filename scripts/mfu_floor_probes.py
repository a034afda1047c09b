"""Per-op floor probes for the DiT-B/2 bench train step (VERDICT r3 item 9).

Answers "where are the remaining ~10 ms?" with interleaved min-of-N timing in
ONE process (the repo's timing doctrine — single relay runs swing +-40%):

  A. full train step (HEAD, bf16 policy, batch 64)          -> ms + TF/s
  B. train step with the RoPE rotation patched to identity  -> RoPE's true cost
  C. isolated adamw update + EMA lerp over the param tree   -> ms vs HBM floor
  D. param-tree read+write bandwidth anchor (x + 1 over the fp32 tree)

The HBM floor for C is computed from bytes actually touched; D measures what
this chip's HBM sustains on the same access pattern, so C/D separates
"optimizer is slow" from "bandwidth is what it is".

Run (chip, cwd=/root/repo, no concurrent TPU process):
    python scripts/mfu_floor_probes.py
"""

from __future__ import annotations

import functools
import gc
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import optax
from flax import nnx

sys.path.insert(0, str(Path(__file__).parent.parent))

from diffulab_tpu.diffuse import Diffuser
import diffulab_tpu.networks.denoisers.mmdit as mmdit_mod
from diffulab_tpu.networks.denoisers.mmdit import MMDiT

import os

BATCH = int(os.environ.get("MFU_BATCH", 64))
LATENT = (32, 32, 4)
N_ROUNDS = int(os.environ.get("MFU_ROUNDS", 8))
BURST = int(os.environ.get("MFU_BURST", 10))
DEPTH = int(os.environ.get("MFU_DEPTH", 12))


def build_step(model, diffusion, rope_identity: bool):
    """A jitted chained train step; optionally with RoPE rotation removed."""
    optimizer = optax.adamw(1e-4)
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    # private copy: train_step donates its inputs, and the model's own buffers
    # must survive for the other probes
    params = jax.tree.map(jnp.copy, params)

    orig = mmdit_mod.apply_rope_ndim_planar
    if rope_identity:
        mmdit_mod.apply_rope_ndim_planar = lambda q, k, cos, sin, rd: (q, k)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, rng):
        def loss_fn(params):
            m = nnx.merge(graphdef, params, rest)
            t_rng, n_rng, d_rng = jax.random.split(rng, 3)
            t = diffusion.draw_timesteps(t_rng, BATCH)
            x0 = jnp.zeros((BATCH, *LATENT), jnp.bfloat16)
            noise = jax.random.normal(n_rng, x0.shape, dtype=x0.dtype)
            drop = jax.random.uniform(d_rng, (BATCH,)) < 0.1
            y = jnp.zeros((BATCH,), jnp.int32)
            return diffusion.compute_loss(
                lambda **kw: m(**kw, train=True), x0, {"y": y}, t, noise, drop=drop
            )["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    opt_state = optimizer.init(params)
    p, o, loss = train_step(params, opt_state, jax.random.key(0))  # compile
    float(loss)
    # flops while the patch is still active (lower() retraces)
    cost = train_step.lower(p, o, jax.random.key(0)).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = cost["flops"]
    if rope_identity:
        mmdit_mod.apply_rope_ndim_planar = orig

    state = {"p": p, "o": o}

    def burst(i0: int) -> float:
        t0 = time.perf_counter()
        p, o = state["p"], state["o"]
        for i in range(BURST):
            p, o, loss = train_step(p, o, jax.random.fold_in(jax.random.key(1), i0 + i))
        float(loss)
        dt = (time.perf_counter() - t0) / BURST
        state["p"], state["o"] = p, o
        return dt

    return burst, flops


def build_opt_probe(params):
    """Isolated adamw + EMA lerp over the DiT param tree."""
    params = jax.tree.map(jnp.copy, params)  # donation below must not eat the model
    optimizer = optax.adamw(1e-4)
    opt_state = optimizer.init(params)
    grads = jax.tree.map(lambda x: jnp.full_like(x, 1e-4), params)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def opt_step(params, opt_state, ema):
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree.map(lambda e, p: e * 0.999 + p * 0.001, ema, params)
        return params, opt_state, ema

    ema = jax.tree.map(jnp.copy, params)
    p, o, e = opt_step(params, opt_state, ema)
    float(jax.tree.leaves(p)[0].sum())
    state = {"p": p, "o": o, "e": e}

    def burst(_: int) -> float:
        t0 = time.perf_counter()
        p, o, e = state["p"], state["o"], state["e"]
        for _ in range(BURST):
            p, o, e = opt_step(p, o, e)
        float(jax.tree.leaves(p)[0].sum())
        dt = (time.perf_counter() - t0) / BURST
        state.update(p=p, o=o, e=e)
        return dt

    n_params = sum(x.size for x in jax.tree.leaves(params))
    # touched per step: read p,g,m,v,ema + write p,m,v,ema (grads constant-folded
    # aside, count them: they are real HBM reads in the fused train step too)
    bytes_touched = n_params * 4 * 9
    return burst, n_params, bytes_touched


def build_bw_probe(params):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def bump(t):
        return jax.tree.map(lambda x: x + 1.0, t)

    t = bump(jax.tree.map(jnp.copy, params))
    float(jax.tree.leaves(t)[0].sum())
    state = {"t": t}
    n_bytes = sum(x.size * 4 for x in jax.tree.leaves(params)) * 2  # read+write

    def burst(_: int) -> float:
        t0 = time.perf_counter()
        t = state["t"]
        for _ in range(BURST):
            t = bump(t)
        float(jax.tree.leaves(t)[0].sum())
        dt = (time.perf_counter() - t0) / BURST
        state["t"] = t
        return dt

    return burst, n_bytes


def main():
    model = MMDiT(
        simple_dit=True, input_channels=4, inner_dim=768, embedding_dim=768,
        num_heads=12, mlp_ratio=4, patch_size=2, depth=DEPTH, n_classes=1000,
        classifier_free=True, dtype=jnp.bfloat16, rngs=nnx.Rngs(0),
    )
    diffusion = Diffuser(model, sampling_method="euler", model_type="rectified_flow",
                         n_steps=50, extra_args={"logits_normal": True}).diffusion

    mins = {"full": float("inf"), "norope": float("inf"),
            "opt": float("inf"), "bw": float("inf")}

    # Phase 1: the full-vs-norope A/B (the pair that must interleave). Holding
    # all four probes' states resident at once OOMed the chip — the
    # optimizer/bandwidth pair runs as a second phase after teardown.
    step_full, flops_full = build_step(model, diffusion, rope_identity=False)
    step_norope, flops_norope = build_step(model, diffusion, rope_identity=True)
    for r in range(N_ROUNDS):
        mins["full"] = min(mins["full"], step_full(r * BURST))
        mins["norope"] = min(mins["norope"], step_norope(r * BURST))
    del step_full, step_norope
    gc.collect()

    # Phase 2: optimizer-vs-bandwidth interleave.
    # param_dtype is fp32 regardless of the bf16 compute dtype — reuse the tree
    _, fp32_params, _ = nnx.split(model, nnx.Param, ...)
    opt_burst, n_params, opt_bytes = build_opt_probe(fp32_params)
    bw_burst, bw_bytes = build_bw_probe(fp32_params)
    for r in range(N_ROUNDS):
        mins["opt"] = min(mins["opt"], opt_burst(r))
        mins["bw"] = min(mins["bw"], bw_burst(r))

    bw_gbs = bw_bytes / mins["bw"] / 1e9
    opt_floor_ms = opt_bytes / (bw_gbs * 1e9) * 1e3
    print(json.dumps({
        "train_step_ms": round(mins["full"] * 1e3, 2),
        "train_tf_per_s": round(flops_full / mins["full"] / 1e12, 1),
        "train_step_norope_ms": round(mins["norope"] * 1e3, 2),
        "rope_cost_ms": round((mins["full"] - mins["norope"]) * 1e3, 2),
        "flops_full_tf": round(flops_full / 1e12, 3),
        "flops_norope_tf": round(flops_norope / 1e12, 3),
        "opt_update_ms": round(mins["opt"] * 1e3, 2),
        "opt_hbm_floor_ms_at_measured_bw": round(opt_floor_ms, 2),
        "opt_bytes_touched_mb": round(opt_bytes / 1e6, 1),
        "measured_hbm_gb_per_s": round(bw_gbs, 1),
        "n_params_m": round(n_params / 1e6, 2),
        "timing": f"interleaved min of {N_ROUNDS} rounds, bursts of {BURST} chained calls",
    }))


if __name__ == "__main__":
    main()
