"""Standalone sampling CLI: checkpoint -> image grid (+ optional per-image
PNGs). Completes the user surface around training (the reference exposes
generation only through validation-image logging, trainers/common.py:178-242):
any experiment config, any sampler/steps/guidance override, class labels or
precomputed text conditioning, latent decode through the configured tower.

Usage:
    python examples/sample.py --config-name train_synthetic_flow_matching \
        --ckpt runs/synthetic_flow_matching/checkpoints/ema \
        --n 16 --steps 50 --guidance 1.5 --out samples.png
    # class-conditional: repeat each class label
    python examples/sample.py ... --labels 0,1,2,3
    # few-step override (UniPC-10 is the measured few-step winner,
    # BASELINE.md round-4 shoot-out)
    python examples/sample.py ... --sampler unipc --steps 10
"""

from __future__ import annotations

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
from diffulab_tpu.training.checkpoint import restore_sampling_model
from diffulab_tpu.training.logging import make_grid

CONFIG_DIR = Path(__file__).parent.parent / "configs"


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-name", default="train_synthetic_flow_matching")
    parser.add_argument("--config-dir", default=str(CONFIG_DIR))
    parser.add_argument("--ckpt", required=True, help="orbax denoiser/ema checkpoint dir")
    parser.add_argument("--n", type=int, default=16)
    parser.add_argument("--steps", type=int, default=None, help="override sampling steps")
    parser.add_argument("--sampler", default=None, help="override sampling_method")
    parser.add_argument("--guidance", type=float, default=0.0)
    parser.add_argument("--guide-ckpt", default=None,
                        help="autoguidance: checkpoint of a degraded sibling model "
                             "replacing the unconditional branch (needs --guidance > 0)")
    parser.add_argument("--labels", default=None,
                        help="comma-separated class labels, tiled to --n (default: random)")
    parser.add_argument("--image-size", type=int, default=None,
                        help="pixel H=W (default: dataset image_size)")
    parser.add_argument("--prompts", default=None,
                        help="'|'-separated text prompts (HF text-embedder configs)")
    parser.add_argument("--out", default="samples.png")
    parser.add_argument("--inpaint-image", default=None,
                        help="PNG whose content is kept outside --inpaint-box")
    parser.add_argument("--inpaint-box", default=None,
                        help="'y0:y1,x0:x1' pixel region to REGENERATE (rest is kept)")
    parser.add_argument("--img2img-image", default=None,
                        help="PNG to edit (SDEdit): noised to --strength and denoised")
    parser.add_argument("--strength", type=float, default=0.6,
                        help="img2img noise strength in (0, 1]: fraction of the schedule run")
    parser.add_argument("--separate", action="store_true", help="also write per-image PNGs")
    parser.add_argument("--cache-interval", type=int, default=None,
                        help="Delta-DiT block caching: refresh the cached block "
                             "span every N denoise steps (training-free speedup)")
    parser.add_argument("--cache-span", type=int, nargs=2, default=None,
                        metavar=("LO", "HI"),
                        help="block index range [LO, HI) to cache between refreshes")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    cfg = compose_config(args.config_dir, args.config_name, args.overrides)
    ds_cfg = cfg["dataset"]["val"]

    # txt2img configs carry an embedder group: the train CLIs construct the
    # denoiser WITH it (train_repa_txt_to_img.py:43-46), and the checkpoint's
    # `rest` includes the frozen embedder state — the restore target must too
    model_kwargs = {}
    if cfg.get("embedder"):
        model_kwargs["context_embedder"] = instantiate(cfg["embedder"], rngs=nnx.Rngs(args.seed))
    denoiser = instantiate(cfg["model"], rngs=nnx.Rngs(args.seed), **model_kwargs)
    from diffulab_tpu.training.losses.build import build_extra_losses

    # latent-diffusion configs carry a vision_tower group; sampling in latent
    # space then decoding through the tower is the user path the training
    # CLIs use (train_grpo.py:90-132)
    vision_tower = None
    if cfg.get("vision_tower"):
        vision_tower = instantiate(cfg["vision_tower"], rngs=nnx.Rngs(args.seed))

    diffuser = Diffuser(
        denoiser=denoiser,
        model_type=cfg["diffuser"]["model_type"],
        n_steps=cfg["diffuser"]["n_steps"],
        sampling_method=args.sampler or cfg["diffuser"]["sampling_method"],
        extra_args=cfg["diffuser"].get("extra_args", {}),
        extra_losses=build_extra_losses(cfg, seed=args.seed),
        vision_tower=vision_tower,
    )
    if args.steps:
        diffuser.set_steps(args.steps)
    if args.cache_interval:
        assert args.cache_span is not None, "--cache-interval needs --cache-span LO HI"
        diffuser.set_block_cache(args.cache_interval, tuple(args.cache_span))

    # LoRA runs replicate the training wrap order (base restore -> wrap ->
    # adapter restore) inside the helper
    restore_sampling_model(args.ckpt, denoiser, diffuser.extra_losses,
                           cfg["trainer"], seed=args.seed)
    print(f"restored {args.ckpt}")

    guide_denoiser = None
    if args.guide_ckpt:
        assert args.guidance > 0, "--guide-ckpt requires --guidance > 0"
        guide_denoiser = instantiate(cfg["model"], rngs=nnx.Rngs(args.seed), **model_kwargs)
        restore_sampling_model(args.guide_ckpt, guide_denoiser,
                               build_extra_losses(cfg, seed=args.seed),
                               cfg["trainer"], seed=args.seed + 100)
        print(f"autoguidance: negative branch from {args.guide_ckpt}")

    size = args.image_size or ds_cfg.get("image_size", 32)
    channels = cfg["model"].get("input_channels", cfg["model"].get("in_channels", 3))
    if vision_tower is not None:
        # the denoiser runs on the latent grid; generate() decodes to pixels
        size //= vision_tower.compression_factor

    cond: dict[str, jnp.ndarray] = {}
    embedder = getattr(denoiser, "context_embedder", None)
    if args.prompts:
        if not hasattr(embedder, "embed_host"):
            raise SystemExit(
                "--prompts requires an HF text embedder (embedder group with "
                "embed_host); precomputed-embedding configs must sample through "
                "a dataset that carries the cached caption embeddings."
            )
        texts = args.prompts.split("|")
        texts = (texts * ((args.n + len(texts) - 1) // len(texts)))[: args.n]
        # embed_host caches the CFG null embedding internally on first call
        cond["context"] = {k: jnp.asarray(v) for k, v in embedder.embed_host(texts).items()}
        print(f"prompts: {texts}")
    n_classes = cfg["model"].get("n_classes")
    if n_classes:
        if args.labels:
            base = [int(v) for v in args.labels.split(",")]
            labels = np.resize(np.asarray(base, np.int64), args.n)
        else:
            labels = np.random.default_rng(args.seed).integers(0, n_classes, args.n)
        cond["y"] = jnp.asarray(labels)
        print(f"labels: {labels.tolist()}")

    inpaint = None
    if args.inpaint_image:
        from PIL import Image

        if not args.inpaint_box:
            raise SystemExit("--inpaint-image requires --inpaint-box y0:y1,x0:x1")
        px = args.image_size or ds_cfg.get("image_size", 32)
        img = Image.open(args.inpaint_image).convert("RGB" if channels >= 3 else "L")
        img = img.resize((px, px))
        known_px = np.asarray(img, np.float32) / 127.5 - 1.0
        if known_px.ndim == 2:
            known_px = known_px[..., None]
        known_px = np.broadcast_to(known_px, (args.n, px, px, known_px.shape[-1]))
        ys, xs = args.inpaint_box.split(",")
        y0, y1 = (int(v) for v in ys.split(":"))
        x0, x1 = (int(v) for v in xs.split(":"))
        mask_px = np.ones((args.n, px, px, 1), np.float32)  # 1 = keep known
        mask_px[:, y0:y1, x0:x1, :] = 0.0
        if vision_tower is not None:
            # the reverse process runs in latent space: encode the known image
            # and pool the keep-mask onto the latent grid (a latent is kept
            # only when its whole receptive field is known)
            f = vision_tower.compression_factor
            known = np.asarray(vision_tower.encode(jnp.asarray(known_px)))
            m = mask_px.reshape(args.n, px // f, f, px // f, f, 1).min(axis=(2, 4))
            inpaint = {"known": known, "mask": m}
        else:
            inpaint = {"known": known_px, "mask": mask_px}
        print(f"inpainting {args.inpaint_image}, regenerating [{y0}:{y1}, {x0}:{x1}]")

    img2img = None
    if args.img2img_image:
        from PIL import Image

        px = args.image_size or ds_cfg.get("image_size", 32)
        img = Image.open(args.img2img_image).convert("RGB" if channels >= 3 else "L")
        init_px = np.asarray(img.resize((px, px)), np.float32) / 127.5 - 1.0
        if init_px.ndim == 2:
            init_px = init_px[..., None]
        init = np.broadcast_to(init_px, (args.n, px, px, init_px.shape[-1]))
        if vision_tower is not None:
            init = np.asarray(vision_tower.encode(jnp.asarray(init)))
        img2img = {"init": init, "strength": args.strength}
        print(f"img2img from {args.img2img_image} at strength {args.strength}")

    out = diffuser.generate(
        jax.random.key(args.seed), cond,
        data_shape=(args.n, size, size, channels),
        guidance_scale=args.guidance, clamp_x=True,
        inpaint=inpaint, img2img=img2img, guide_denoiser=guide_denoiser,
    )
    images = np.clip(np.asarray(out["x"], np.float32) * 0.5 + 0.5, 0, 1)

    from PIL import Image

    grid = (make_grid(images) * 255).astype(np.uint8)
    if grid.shape[-1] == 1:
        grid = grid[..., 0]
    Image.fromarray(grid).save(args.out)
    print(f"wrote {args.out} ({args.n} images)")
    if args.separate:
        stem = Path(args.out)
        for i, img in enumerate(images):
            arr = (img * 255).astype(np.uint8)
            Image.fromarray(arr[..., 0] if arr.shape[-1] == 1 else arr).save(
                stem.with_name(f"{stem.stem}_{i:03d}.png"))


if __name__ == "__main__":
    main()
