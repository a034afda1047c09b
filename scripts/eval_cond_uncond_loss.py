"""Per-branch validation loss: conditional vs unconditional (CFG-dropped).

The trainer's val loss runs with drop=None (conditional only), so a
degraded unconditional head — trained on only p_cfg of samples — is
invisible there while CFG sampling consults it at every step. Compares the
two branches for a checkpoint; run for bf16- and fp32-trained runs to
attribute generation-quality gaps that val loss misses."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from diffulab_tpu.config import compose_config, instantiate
from diffulab_tpu.diffuse import Diffuser
from diffulab_tpu.training.checkpoint import restore_train_modules
from diffulab_tpu.training.trainer import _TrainModules

CONFIG_DIR = Path(__file__).parent.parent / "configs"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-name", default="train_synthetic_flow_matching")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=200)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    cfg = compose_config(str(CONFIG_DIR), args.config_name, args.overrides)
    val_ds = instantiate(cfg["dataset"]["val"])
    denoiser = instantiate(cfg["model"], rngs=nnx.Rngs(0))
    diffuser = Diffuser(denoiser=denoiser, model_type=cfg["diffuser"]["model_type"],
                        n_steps=cfg["diffuser"]["n_steps"],
                        sampling_method=cfg["diffuser"]["sampling_method"],
                        extra_args=cfg["diffuser"].get("extra_args", {}))
    restore_train_modules(args.ckpt, _TrainModules(denoiser, []))
    diffusion = diffuser.diffusion
    graphdef, state = nnx.split(denoiser)

    @jax.jit
    def loss_at(state, x0, y, rng, drop_all):
        m = nnx.merge(graphdef, state)
        t_rng, n_rng = jax.random.split(rng)
        t = diffusion.draw_timesteps(t_rng, x0.shape[0])
        noise = jax.random.normal(n_rng, x0.shape, x0.dtype)
        drop = jnp.full((x0.shape[0],), drop_all, bool)
        return diffusion.compute_loss(
            lambda **kw: m(**kw, train=False), x0, {"y": y}, t, noise, drop=drop
        )["loss"]

    rng = jax.random.key(0)
    sums = {"cond": 0.0, "uncond": 0.0}
    n = 0
    for i in range(args.batches):
        sl = slice(i * args.batch_size, (i + 1) * args.batch_size)
        imgs = val_ds.images[sl]
        if len(imgs) == 0:
            break
        x0 = jnp.asarray(np.stack([val_ds.preprocess_image(im) for im in imgs]))
        y = jnp.asarray(val_ds.labels[sl])
        r = jax.random.fold_in(rng, i)
        sums["cond"] += float(loss_at(state, x0, y, r, False))
        sums["uncond"] += float(loss_at(state, x0, y, r, True))
        n += 1
    for k, v in sums.items():
        print(f"{k}_val_loss: {v / max(n,1):.5f}")


if __name__ == "__main__":
    main()
