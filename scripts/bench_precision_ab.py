"""Step-time A/B: bf16 mixed-precision policy vs fp32 on the bench.py
DiT-B/2 shapes. Records the step-time cost of the round-3 mixed-precision
policy; the old all-bf16 reference is BENCH_r02's 591.7 samples/s (same
harness, pre-policy code).

A/B protocol on the relay chip (BASELINE.md house rule): single-run
timings swing +-40%, so variants must alternate within one measurement
window. In-process interleaving OOMs the relay (two DiT-B variants +
executables resident exhausted it twice, queues 11-12), so each timing
round runs in its OWN subprocess (one variant resident at a time) and the
rounds alternate A,B,A,B,... — both variants still sample every
thermal/relay phase; min-of-rounds per variant is reported.
"""

import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

BATCH = 64
LATENT = (32, 32, 4)
ROUNDS = 4


def run_variant(name: str) -> None:
    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from diffulab_tpu.diffuse import Diffuser
    from diffulab_tpu.networks.denoisers.mmdit import MMDiT

    dtype, stream = {
        "bf16_policy": (jnp.bfloat16, None),          # fp32 residual stream (default)
        "bf16_stream_bf16": (jnp.bfloat16, "bfloat16"),  # round-2 all-bf16 stream
        "fp32": (None, None),
    }[name]
    model = MMDiT(
        simple_dit=True, input_channels=4, inner_dim=768, embedding_dim=768,
        num_heads=12, mlp_ratio=4, patch_size=2, depth=12, n_classes=1000,
        classifier_free=True, dtype=dtype, stream_dtype=stream, rngs=nnx.Rngs(0),
    )
    diffuser = Diffuser(model, sampling_method="euler", model_type="rectified_flow",
                        n_steps=50, extra_args={"logits_normal": True})
    diffusion = diffuser.diffusion
    optimizer = optax.adamw(1e-4)
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    opt_state = optimizer.init(params)
    x0 = jnp.zeros((BATCH, *LATENT), jnp.float32)
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

    params, opt_state, loss = train_step(params, opt_state, jax.random.key(0))
    float(loss)  # compile + host fence through the relay
    rng = jax.random.key(0)
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        params, opt_state, loss = train_step(params, opt_state, jax.random.fold_in(rng, i))
    float(loss)
    dt = (time.perf_counter() - t0) / n
    print(f"VARIANT {name}: {dt * 1e3:.2f} ms/step = {BATCH / dt:.1f} samples/s", flush=True)


def main() -> None:
    if len(sys.argv) > 1:
        run_variant(sys.argv[1])
        return
    best: dict[str, float] = {}
    for round_i in range(ROUNDS):
        for name in ("bf16_policy", "bf16_stream_bf16", "fp32"):
            try:
                out = subprocess.run(
                    [sys.executable, __file__, name],
                    capture_output=True, text=True, timeout=1200,
                    cwd=Path(__file__).parent.parent,
                )
            except subprocess.TimeoutExpired:
                print(f"round {round_i} {name}: TIMEOUT (relay hang?) — continuing", flush=True)
                continue
            line = next((l for l in out.stdout.splitlines() if l.startswith("VARIANT")), None)
            if line is None:
                print(f"round {round_i} {name}: FAILED\n{out.stderr[-2000:]}", flush=True)
                continue
            ms = float(line.split(":")[1].split("ms")[0])
            best[name] = min(best.get(name, float("inf")), ms)
            print(f"round {round_i} {line}", flush=True)
    for name, ms in best.items():
        print(f"BEST {name}: {ms:.2f} ms/step = {BATCH / (ms / 1e3):.1f} samples/s")


if __name__ == "__main__":
    main()
