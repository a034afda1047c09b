"""Export a trained checkpoint into a self-contained AOT serving artifact.

The artifact directory (sampler.jaxexport + params.npz + manifest.json,
diffulab_tpu/deploy/export.py) serves with jax + numpy only:

    python examples/export_sampler.py --config-name train_synthetic_flow_matching \
        --ckpt runs/synthetic_flow_matching/checkpoints/ema \
        --out artifacts/flow --batch-size 16 --guidance 1.5

    >>> from diffulab_tpu.deploy import DeployedSampler   # or vendor export.py
    >>> images = DeployedSampler("artifacts/flow")(seed=0, y=labels)

Export on the platform you serve on: the lowering bakes platform-specific
kernels (the Pallas attention paths only exist in TPU lowerings).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from flax import nnx

from diffulab_tpu.config.compose import compose_config
from diffulab_tpu.config.instantiate import instantiate
from diffulab_tpu.deploy import DeployedSampler, export_generate
from diffulab_tpu.diffuse.diffuser import Diffuser
from diffulab_tpu.training.checkpoint import restore_sampling_model
from diffulab_tpu.training.losses.build import build_extra_losses

CONFIG_DIR = Path(__file__).parent.parent / "configs"


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-name", required=True)
    parser.add_argument("--config-dir", default=str(CONFIG_DIR))
    parser.add_argument("--ckpt", required=True, help="orbax denoiser/ema checkpoint dir")
    parser.add_argument("--out", required=True, help="artifact output directory")
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--guidance", type=float, default=0.0)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--image-size", type=int, default=None)
    parser.add_argument("--smoke", action="store_true",
                        help="load the artifact back and run one batch")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    cfg = compose_config(args.config_dir, args.config_name, args.overrides)
    ds_cfg = cfg["dataset"]["val"]

    model_kwargs = {}
    if cfg.get("embedder"):
        model_kwargs["context_embedder"] = instantiate(cfg["embedder"], rngs=nnx.Rngs(args.seed))
    denoiser = instantiate(cfg["model"], rngs=nnx.Rngs(args.seed), **model_kwargs)
    vision_tower = None
    if cfg.get("vision_tower"):
        vision_tower = instantiate(cfg["vision_tower"], rngs=nnx.Rngs(args.seed))

    diffuser = Diffuser(
        denoiser=denoiser,
        model_type=cfg["diffuser"]["model_type"],
        n_steps=cfg["diffuser"]["n_steps"],
        sampling_method=cfg["diffuser"]["sampling_method"],
        extra_args=cfg["diffuser"].get("extra_args", {}),
        extra_losses=build_extra_losses(cfg, seed=args.seed),
        vision_tower=vision_tower,
    )
    if args.steps:
        diffuser.set_steps(args.steps)

    # checkpoints store the trainer's _TrainModules split (denoiser + extra
    # losses); LoRA runs replicate the training wrap order inside the helper
    restore_sampling_model(args.ckpt, denoiser, diffuser.extra_losses,
                           cfg["trainer"], seed=args.seed)
    print(f"restored {args.ckpt}")

    size = args.image_size or ds_cfg.get("image_size", 32)
    channels = cfg["model"].get("input_channels", cfg["model"].get("in_channels", 3))
    if vision_tower is not None:
        size //= vision_tower.compression_factor
        channels = vision_tower.latent_channels
    image_shape = (size, size, channels)

    cond_spec = {}
    if cfg["model"].get("n_classes"):
        cond_spec["y"] = jax.ShapeDtypeStruct((), jnp.int32)

    art = export_generate(
        diffuser, cond_spec, batch_size=args.batch_size, image_shape=image_shape,
        out_dir=args.out, guidance_scale=args.guidance,
    )
    total_bytes = sum(p.stat().st_size for p in art.iterdir())
    print(f"exported artifact to {art} ({total_bytes / 1e6:.1f} MB)")

    if args.smoke:
        import numpy as np

        sampler = DeployedSampler(art)
        kwargs = {}
        if "y" in cond_spec:
            kwargs["y"] = np.zeros((args.batch_size,), np.int32)
        out = sampler(seed=args.seed, **kwargs)
        print(f"smoke sample ok: {out.shape} in [{out.min():.2f}, {out.max():.2f}]")


if __name__ == "__main__":
    main()
