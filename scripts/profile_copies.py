"""Name the residual ~8 ms of copies/reshapes in the bench train step
(BASELINE.md round-4 MFU floor probes left it as the one unattributed line)
and localize the measured 6.5% fp32-conditioning-path cost: traces the
DiT-B/2 bench step at batch 64 under (a) the HEAD mixed-precision policy and
(b) the full bf16 cast (stable_conditioning=False + stream bf16), then
prints the per-op-category device-time table and the top individual ops in
the copy/transpose/reshape families for each, plus the per-op diff.

Reuses the xplane parsing from scripts/profile_batch_scaling.py.
"""

from __future__ import annotations

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
from scripts.profile_batch_scaling import xplane_op_times

BATCH = 64
LATENT = (32, 32, 4)
TRACE_STEPS = 3
COPYISH = ("copy", "transpose", "reshape", "bitcast", "slice", "concatenate",
           "dynamic-update-slice", "convert")


def make_step(full_cast: bool):
    model = MMDiT(
        simple_dit=True, input_channels=4, inner_dim=768, embedding_dim=768,
        num_heads=12, mlp_ratio=4, patch_size=2, depth=12, n_classes=1000,
        classifier_free=True, dtype=jnp.bfloat16,
        stable_conditioning=not full_cast,
        stream_dtype="bfloat16" if full_cast else None,
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

    return train_step, params, opt_state


def profile(tag: str, full_cast: bool):
    step, params, opt_state = make_step(full_cast)
    rng = jax.random.key(0)
    params, opt_state, loss = step(params, opt_state, rng)
    float(loss)  # compile + settle
    t0 = time.perf_counter()
    for i in range(10):
        params, opt_state, loss = step(params, opt_state, jax.random.fold_in(rng, i))
    float(loss)
    dt = (time.perf_counter() - t0) / 10
    print(f"[{tag}] {dt*1e3:.2f} ms/step = {BATCH/dt:.1f} samples/s", flush=True)

    log_dir = f"/tmp/xplane_copies_{tag}"
    with jax.profiler.trace(log_dir):
        for i in range(TRACE_STEPS):
            params, opt_state, loss = step(params, opt_state, jax.random.fold_in(rng, 100 + i))
        float(loss)
    by_cat, by_op = xplane_op_times(log_dir)
    scale = 1e3 / TRACE_STEPS  # -> ms per step
    print(f"[{tag}] device time by category (ms/step):")
    for c, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {c:<28} {v*scale:8.3f}")
    print(f"[{tag}] top copy/reshape-family ops (ms/step):")
    # op names come back as full HLO text ("%copy-start.123 = ..."), so a
    # plain substring match is the right filter (startswith misses the '%')
    fam = [(op, v) for op, v in by_op.items() if any(p in op for p in COPYISH)]
    for op, v in sorted(fam, key=lambda kv: -kv[1])[:20]:
        print(f"  {op:<60} {v*scale:8.3f}")
    print(f"[{tag}] top 15 ops overall (ms/step):")
    for op, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {op:<60} {v*scale:8.3f}")
    return by_op


def main():
    head = profile("head_policy", full_cast=False)
    cast = profile("full_cast", full_cast=True)
    # per-op diff: what the fp32 conditioning path costs, op by op
    scale = 1e3 / TRACE_STEPS
    diff = {op: head.get(op, 0.0) - cast.get(op, 0.0)
            for op in set(head) | set(cast)}
    print("top ops HEAD-minus-CAST (ms/step; positive = policy overhead):")
    for op, v in sorted(diff.items(), key=lambda kv: -abs(kv[1]))[:20]:
        print(f"  {op:<60} {v*scale:+8.3f}")


if __name__ == "__main__":
    main()
