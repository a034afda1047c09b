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


def xplane_op_times(log_dir: str) -> tuple[dict[str, float], dict[str, float]]:
    """Sum device-plane event durations from the xplane dump.

    Returns ``(by_category, by_op)`` in seconds of device time across the
    whole trace. Categories come from each op's ``hlo_category`` stat
    (fusion/convolution/copy/all-reduce/...), ops are the HLO op names.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(f"{log_dir}/**/*.xplane.pb", recursive=True)
    by_cat: dict[str, float] = defaultdict(float)
    by_op: dict[str, float] = defaultdict(float)

    def consume(plane, line) -> None:
        emeta = plane.event_metadata
        smeta = plane.stat_metadata
        for ev in line.events:
            md = emeta.get(ev.metadata_id)
            if md is None:
                continue
            dur_s = ev.duration_ps * 1e-12
            cat = None
            for st in list(ev.stats) + list(md.stats):
                sm = smeta.get(st.metadata_id)
                if sm is not None and sm.name == "hlo_category":
                    cat = st.str_value
                    if not cat and st.ref_value:
                        ref = smeta.get(st.ref_value)
                        cat = ref.name if ref is not None else None
                    break
            by_cat[cat or "uncategorized"] += dur_s
            by_op[md.name] += dur_s

    for f in files:
        space = xplane_pb2.XSpace()
        space.ParseFromString(Path(f).read_bytes())
        device_planes = [
            p for p in space.planes
            if ("tpu" in p.name.lower() or "device" in p.name.lower())
            and "host" not in p.name.lower()
        ]
        if device_planes:
            for plane in device_planes:
                for line in plane.lines:
                    lname = line.name.lower()
                    # XLA op lines carry per-op events; skip step/module rollups
                    if "step" in lname or "module" in lname:
                        continue
                    consume(plane, line)
        else:
            # CPU fallback (no device plane): the PjRt client thread line on
            # the host plane carries the op events — keeps this script
            # smoke-testable without a TPU
            for plane in space.planes:
                for line in plane.lines:
                    if "xla" in line.name.lower() or "pjrt" in line.name.lower():
                        consume(plane, line)
    return dict(by_cat), dict(by_op)


TRACE_STEPS = 3


def main():
    model, diffuser = build()
    out = {}
    cats: dict[int, dict[str, float]] = {}
    ops: dict[int, dict[str, float]] = {}
    batches = (64, 128, 256)
    for batch in batches:
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
        print(f"batch {batch}: {dt*1e3:.1f} ms/step = {batch/dt:.1f} samples/s", flush=True)
        log_dir = f"/tmp/xplane_b{batch}"
        with jax.profiler.trace(log_dir):
            for i in range(TRACE_STEPS):
                params, opt_state, loss = step(params, opt_state, jax.random.fold_in(rng, 100 + i))
            float(loss)
        by_cat, by_op = xplane_op_times(log_dir)
        cats[batch], ops[batch] = by_cat, by_op
        print(f"  trace -> {log_dir}: {sum(by_cat.values())*1e3:.1f} ms device time "
              f"over {TRACE_STEPS} steps", flush=True)

    for b, dt in out.items():
        print(f"SUMMARY batch={b} {b/dt:.1f} samples/s  per-sample {dt/b*1e6:.1f} us")

    # per-sample device time by category: whatever grows from batch 64 -> 256
    # is the superlinear term responsible for the throughput drop
    all_cats = sorted({c for d in cats.values() for c in d},
                      key=lambda c: -cats[batches[-1]].get(c, 0.0))
    print(f"\n{'category':<28}" + "".join(f"  b{b}(us/sample)" for b in batches) + "  b256/b64")
    for c in all_cats:
        row = [cats[b].get(c, 0.0) / (TRACE_STEPS * b) * 1e6 for b in batches]
        ratio = row[-1] / row[0] if row[0] else float("inf")
        print(f"{c:<28}" + "".join(f"  {v:14.2f}" for v in row) + f"  {ratio:7.2f}x")

    # top ops whose per-sample time grew the most 64 -> 256
    grow = []
    for name, t256 in ops[256].items():
        ps256 = t256 / (TRACE_STEPS * 256)
        ps64 = ops[64].get(name, 0.0) / (TRACE_STEPS * 64)
        grow.append((ps256 - ps64, ps64, ps256, name))
    grow.sort(reverse=True)
    print(f"\ntop ops by per-sample growth 64->256 (us/sample):")
    for d, ps64, ps256, name in grow[:25]:
        print(f"  {ps64*1e6:9.2f} -> {ps256*1e6:9.2f}  (+{d*1e6:8.2f})  {name[:90]}")


if __name__ == "__main__":
    main()
