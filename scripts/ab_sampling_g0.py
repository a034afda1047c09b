"""Interleaved one-process probe: CFG-fused vs unguided sampling throughput.

The distilled student (BASELINE.md round 4) samples at guidance 0 through
the static ``use_cfg=False`` branch (flow.py::_cfg_model_call) — one model
forward per step instead of the fused cond+uncond double batch. This probe
times both paths on the bench model/shapes so the distillation row can cite
a measured imgs/s, not a FLOPs argument.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from flax import nnx

from diffulab_tpu.diffuse import Diffuser
from diffulab_tpu.networks.denoisers.mmdit import MMDiT

SAMPLE_BATCH = 16
N_ROUNDS = 6


def main():
    model = MMDiT(
        simple_dit=True, input_channels=4, inner_dim=768, embedding_dim=768,
        num_heads=12, mlp_ratio=4, patch_size=2, depth=12, n_classes=1000,
        classifier_free=True, dtype=jnp.bfloat16, rngs=nnx.Rngs(0),
    )
    diffuser = Diffuser(model, sampling_method="euler", model_type="rectified_flow",
                        n_steps=50, extra_args={"logits_normal": True})
    y = jnp.zeros((SAMPLE_BATCH,), jnp.int32)

    def make_run(guidance):
        def sample(rng):
            return diffuser.generate(
                rng, {"y": y}, data_shape=(SAMPLE_BATCH, 32, 32, 4),
                guidance_scale=guidance, dtype=jnp.bfloat16,
            )["x"]
        float(sample(jax.random.key(0)).sum())  # compile + complete

        def run(i: int) -> float:
            t0 = time.perf_counter()
            float(sample(jax.random.key(i)).sum())
            return time.perf_counter() - t0
        return run

    runs = {"cfg_fused_g4": make_run(4.0), "unguided_g0": make_run(0.0)}
    mins = {k: float("inf") for k in runs}
    for r in range(N_ROUNDS):
        for k, f in runs.items():
            mins[k] = min(mins[k], f(r + 1))
    print(json.dumps({
        k: {"batch_time_ms": round(v * 1e3, 2),
            "imgs_per_s": round(SAMPLE_BATCH / v, 2)}
        for k, v in mins.items()
    }))


if __name__ == "__main__":
    main()
