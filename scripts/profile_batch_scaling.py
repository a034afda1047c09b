"""Attribute the batch-256 throughput drop (BASELINE.md: 592 samples/s at
64/128 -> 508 at 256, bandwidth-bound, remat makes it worse). Traces the
bench train step at batches 64/128/256 and prints the per-op-category
device time from the xplane dump, normalized per sample — whatever grows
superlinearly is the culprit (VERDICT r2 next-step 8)."""

import glob
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from diffulab_tpu.diffuse import Diffuser
from diffulab_tpu.networks.denoisers.mmdit import MMDiT

LATENT = (32, 32, 4)


def build():
    model = MMDiT(
        simple_dit=True, input_channels=4, inner_dim=768, embedding_dim=768,
        num_heads=12, mlp_ratio=4, patch_size=2, depth=12, n_classes=1000,
        classifier_free=True, dtype=jnp.bfloat16, rngs=nnx.Rngs(0),
    )
    diffuser = Diffuser(model, sampling_method="euler", model_type="rectified_flow",
                        n_steps=50, extra_args={"logits_normal": True})
    return model, diffuser


def make_step(model, diffuser, batch):
    diffusion = diffuser.diffusion
    optimizer = optax.adamw(1e-4)
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    opt_state = optimizer.init(params)
    x0 = jnp.zeros((batch, *LATENT), jnp.float32)
    y = jnp.zeros((batch,), jnp.int32)

    @jax.jit
    def train_step(params, opt_state, rng):
        def loss_fn(params):
            m = nnx.merge(graphdef, params, rest)
            t_rng, n_rng, d_rng = jax.random.split(rng, 3)
            t = diffusion.draw_timesteps(t_rng, batch)
            noise = jax.random.normal(n_rng, x0.shape, dtype=x0.dtype)
            drop = jax.random.uniform(d_rng, (batch,)) < 0.1
            return diffusion.compute_loss(
                lambda **kw: m(**kw, train=True), x0, {"y": y}, t, noise, drop=drop
            )["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return train_step, params, opt_state


def xplane_op_times(log_dir: str) -> dict[str, float]:
    """Sum device-plane event durations by HLO category from the xplane dump."""
    from xprof.convert import raw_to_tool_data as rttd  # tensorboard_plugin_profile

    files = glob.glob(f"{log_dir}/**/*.xplane.pb", recursive=True)
    if not files:
        return {}
    data, _ = rttd.xspace_to_tool_data(files, "op_profile", {})
    return {"_raw": data}


def main():
    model, diffuser = build()
    out = {}
    for batch in (64, 128, 256):
        step, params, opt_state = make_step(model, diffuser, batch)
        rng = jax.random.key(0)
        params, opt_state, loss = step(params, opt_state, rng)
        float(loss)
        # steady-state timing chain
        t0 = time.perf_counter()
        for i in range(10):
            params, opt_state, loss = step(params, opt_state, jax.random.fold_in(rng, i))
        float(loss)
        dt = (time.perf_counter() - t0) / 10
        out[batch] = dt
        print(f"batch {batch}: {dt*1e3:.1f} ms/step = {batch/dt:.1f} samples/s")
        log_dir = f"/tmp/xplane_b{batch}"
        with jax.profiler.trace(log_dir):
            for i in range(3):
                params, opt_state, loss = step(params, opt_state, jax.random.fold_in(rng, 100 + i))
            float(loss)
        print(f"  trace -> {log_dir}")
    for b, dt in out.items():
        print(f"SUMMARY batch={b} {b/dt:.1f} samples/s  per-sample {dt/b*1e6:.1f} us")


if __name__ == "__main__":
    main()
