"""Quality evaluation for the latent txt2img path (VERDICT r4 item 1).

Scores a trained caption-conditional latent diffusion run (MMDiT / SprintDiT
/ DDT through the in-framework-trained flux2 tower,
configs/train_hard_txt2img_*.yaml) on the compositional-scenes benchmark:

- **FID / KID / precision-recall** between DECODED samples and the
  re-rendered real val split, in the same frozen-ViT feature space as
  evaluate_fid.py (one FEATURE_SPACE_VERSION, shared cache semantics);
- **caption consistency**: the deterministic pixel-statistics judge
  (data/synthetic_txt2img.py::caption_consistency) checks each sample
  against the caption it was generated from — per-attribute accuracies for
  color / count / size / background plus the all-attributes rate;
- calibration rows: FID(train, val) floor, FID(val, tower recon) — the
  tower's own ceiling on achievable FID — and judge accuracy on recons.

Like evaluate_fid.py, several --ckpt dirs share one compile + one
real-feature pass (a post-hoc-EMA sigma_rel sweep pays compile once).

Usage:
    python examples/evaluate_txt2img.py --config-name train_hard_txt2img_mmdit \
        --ckpt runs/r5/hard_txt2img_mmdit/checkpoints/phema_sr0.05 \
        --n-samples 2000 --guidance 1.5
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from diffulab_tpu.config import compose_config, instantiate
from diffulab_tpu.data.synthetic_txt2img import (
    SyntheticCompositionalDataset,
    caption_consistency,
    caption_embedding_table,
    embed_captions,
)
from diffulab_tpu.diffuse import Diffuser
from diffulab_tpu.training.checkpoint import restore_train_modules
from diffulab_tpu.training.evaluation import (
    compute_fid,
    compute_kid,
    compute_precision_recall,
    extract_features,
    frozen_vit_features,
)
from diffulab_tpu.training.trainer import _TrainModules

CONFIG_DIR = Path(__file__).parent.parent / "configs"


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-name", default="train_hard_txt2img_mmdit")
    parser.add_argument("--config-dir", default=str(CONFIG_DIR))
    parser.add_argument("--ckpt", required=True, nargs="+")
    parser.add_argument("--n-samples", type=int, default=2000)
    parser.add_argument("--batch-size", type=int, default=100)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--guidance", type=float, default=1.5)
    parser.add_argument("--image-size", type=int, default=64)
    parser.add_argument("--n-val", type=int, default=2000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--skip-floor", action="store_true",
                        help="skip the train-vs-val floor row (saves a render pass)")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    cfg = compose_config(args.config_dir, args.config_name, args.overrides)
    rngs = nnx.Rngs(args.seed)

    embedder = instantiate(cfg["embedder"], rngs=rngs)
    denoiser = instantiate(cfg["model"], context_embedder=embedder, rngs=rngs)
    vision_tower = instantiate(cfg["vision_tower"], rngs=rngs)
    from diffulab_tpu.training.losses.build import build_extra_losses

    extra_losses = build_extra_losses(cfg, seed=args.seed)
    diffuser = Diffuser(
        denoiser=denoiser,
        model_type=cfg["diffuser"]["model_type"],
        n_steps=cfg["diffuser"]["n_steps"],
        sampling_method=cfg["diffuser"]["sampling_method"],
        vision_tower=vision_tower,
        extra_args=cfg["diffuser"].get("extra_args", {}),
        extra_losses=extra_losses,
    )
    if args.steps:
        diffuser.set_steps(args.steps)
    modules = _TrainModules(diffuser.denoiser, diffuser.extra_losses)

    # --- real data (deterministic re-render of the builder's splits) --------
    n = args.n_samples
    val_ds = SyntheticCompositionalDataset(
        train=False, n_samples=max(args.n_val, n), image_size=args.image_size,
        seed=args.seed,
    )
    real_val = val_ds.images.astype(np.float32) / 127.5 - 1.0
    feature_fn = frozen_vit_features(image_size=args.image_size)
    val_feats = extract_features(real_val, feature_fn, args.batch_size)

    if not args.skip_floor:
        train_ds = SyntheticCompositionalDataset(
            train=True, n_samples=len(real_val), image_size=args.image_size,
            seed=args.seed,
        )
        train_feats = extract_features(
            train_ds.images.astype(np.float32) / 127.5 - 1.0, feature_fn,
            args.batch_size,
        )
        print(f"FID(train, val) floor        = {compute_fid(train_feats, val_feats):.3f}")

    # --- tower ceiling: encode->decode the val images -----------------------
    rec_fn = jax.jit(lambda x: vision_tower.decode(vision_tower.encode(x)))
    recs = []
    for s0 in range(0, n, args.batch_size):
        recs.append(np.asarray(rec_fn(jnp.asarray(real_val[s0 : s0 + args.batch_size]))))
    rec = np.concatenate(recs)[:n]
    rec_feats = extract_features(rec, feature_fn, args.batch_size)
    print(f"FID(val, tower recon) ceiling = {compute_fid(val_feats[:n], rec_feats):.3f}")
    rec_acc = caption_consistency(rec, val_ds.captions[:n])
    print(f"judge on tower recons         = {rec_acc}")

    # --- conditioning: embed the val captions (fixed table) -----------------
    table = caption_embedding_table()
    emb, mask = embed_captions(val_ds.captions[:n], table)
    latent_hw = args.image_size // vision_tower.compression_factor
    data_shape_tail = (latent_hw, latent_hw, vision_tower.latent_channels)

    for ckpt in args.ckpt:
        restore_train_modules(ckpt, modules)
        print(f"restored checkpoint from {ckpt}")
        fakes = []
        key = jax.random.key(args.seed)
        t0 = time.perf_counter()
        for s0 in range(0, n, args.batch_size):
            bsz = min(args.batch_size, n - s0)
            cond = {"context": {
                "embeddings": jnp.asarray(emb[s0 : s0 + bsz]),
                "attn_mask": jnp.asarray(mask[s0 : s0 + bsz]),
            }}
            out = diffuser.generate(
                jax.random.fold_in(key, s0), cond,
                data_shape=(bsz, *data_shape_tail),
                guidance_scale=args.guidance, clamp_x=True,
            )
            fakes.append(np.asarray(out["x"], np.float32))
        fake = np.concatenate(fakes)[:n]
        dt = time.perf_counter() - t0
        print(f"sampled+decoded {n} images in {dt:.1f}s ({n / dt:.2f} imgs/s)")

        fake_feats = extract_features(fake, feature_fn, args.batch_size)
        fid = compute_fid(val_feats[:n], fake_feats)
        kid = compute_kid(val_feats[:n], fake_feats, seed=args.seed)
        pr = compute_precision_recall(val_feats[:n], fake_feats)
        acc = caption_consistency(fake, val_ds.captions[:n])
        print(f"FID(val, samples)             = {fid:.3f}  [{ckpt}]")
        print(f"KID x1000                     = {kid['kid'] * 1e3:.2f} +- {kid['kid_std'] * 1e3:.2f}")
        print(f"precision/recall              = {pr['precision']:.3f} / {pr['recall']:.3f}")
        print(f"caption consistency           = {acc}")
        print(
            '{"metric": "txt2img", "fid": %.3f, "kid_x1000": %.3f, '
            '"precision": %.3f, "recall": %.3f, "acc_color": %.3f, '
            '"acc_count": %.3f, "acc_size": %.3f, "acc_background": %.3f, '
            '"acc_shape": %.3f, "acc_all": %.3f, "ckpt": "%s"}'
            % (fid, kid["kid"] * 1e3, pr["precision"], pr["recall"],
               acc["color"], acc["count"], acc["size"], acc["background"],
               acc["shape"], acc["all"], ckpt)
        )


if __name__ == "__main__":
    main()
