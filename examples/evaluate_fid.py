"""FID evaluation entry point — the measurement half of the BASELINE.md
"FID measured end-to-end" recipe (the reference ships no evaluation code;
north star is FID parity, VERDICT round 1 item 5).

Loads a training config + checkpoint, samples with the jitted
``Diffuser.generate`` path, and computes FID in a fixed-seed frozen ViT
feature space (reproducible without downloaded encoder weights; swap in
ported DINOv2 weights via --encoder-ckpt when available). Also prints two
calibration rows: FID(train, val) — the floor — and FID(val, noise) — the
ceiling — so the model's number is interpretable.

Usage:
    python examples/evaluate_fid.py --config-name train_synthetic_flow_matching \
        --ckpt runs/synthetic/checkpoints/ema --n-samples 2000 --guidance 1.5
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
from diffulab_tpu.diffuse import Diffuser
from diffulab_tpu.training.checkpoint import (
    restore_sampling_model,
    restore_train_modules,
)
from diffulab_tpu.training.trainer import _TrainModules
from diffulab_tpu.training.evaluation import (
    FEATURE_SPACE_VERSION,
    compute_fid,
    compute_kid,
    compute_precision_recall,
    extract_features,
    frozen_vit_features,
)

CONFIG_DIR = Path(__file__).parent.parent / "configs"



def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-name", default="train_synthetic_flow_matching")
    parser.add_argument("--config-dir", default=str(CONFIG_DIR))
    parser.add_argument("--ckpt", required=True, nargs="+",
                        help="orbax denoiser/ema checkpoint dir(s); several dirs "
                             "share one model build, one sampler compile, and the "
                             "real-feature cache (e.g. a post-hoc EMA sigma_rel sweep)")
    parser.add_argument("--n-samples", type=int, default=2000)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--steps", type=int, default=None, help="override sampling steps")
    parser.add_argument("--guidance", default=[0.0],
                        type=lambda s: [float(g) for g in s.split(",")],
                        help="CFG scale, or several comma-separated scales "
                             "(e.g. 0.0,1.5,3.0) — scales share the process, "
                             "the checkpoint restores, the real-feature cache, "
                             "and (for scales > 0) one sampler compile, so a "
                             "sweep costs one startup instead of five; comma "
                             "form (not nargs) so trailing config overrides "
                             "still parse as positionals")
    parser.add_argument("--guide-ckpt", default=None,
                        help="autoguidance (arXiv:2406.02507): checkpoint of a DEGRADED "
                             "sibling (early epoch / long-horizon EMA) that replaces the "
                             "unconditional branch; requires --guidance > 0")
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

    val_ds = instantiate(cfg["dataset"]["val"])
    train_ds = instantiate(cfg["dataset"]["train"])
    real_val = np.stack([val_ds.preprocess_image(img) for img in val_ds.images])
    real_train = np.stack(
        [train_ds.preprocess_image(img) for img in train_ds.images[: len(real_val)]]
    )

    denoiser = instantiate(cfg["model"], rngs=nnx.Rngs(args.seed))
    # checkpoints store the trainable split of denoiser + extra losses, so
    # the restore target must include the same loss modules the run trained
    from diffulab_tpu.training.losses.build import build_extra_losses

    diffuser = Diffuser(
        denoiser=denoiser,
        model_type=cfg["diffuser"]["model_type"],
        n_steps=cfg["diffuser"]["n_steps"],
        sampling_method=cfg["diffuser"]["sampling_method"],
        extra_args=cfg["diffuser"].get("extra_args", {}),
        extra_losses=build_extra_losses(cfg, seed=args.seed),
    )
    if args.steps:
        # respace instead of rebuilding: gaussian models keep their training
        # beta tables (constructing with tiny n_steps would redefine them)
        diffuser.set_steps(args.steps)
    if args.cache_interval:
        assert args.cache_span is not None, "--cache-interval needs --cache-span LO HI"
        diffuser.set_block_cache(args.cache_interval, tuple(args.cache_span))
        print(f"block cache: interval={args.cache_interval} span={args.cache_span}")
    # LoRA-run checkpoints store adapters in params / base in rest; wrap the
    # model the same way the training CLI did before restoring. An `ema` dir
    # from a LoRA run holds ONLY adapter params, so the base weights must be
    # restored from trainer.lora_from first — otherwise FID would silently be
    # computed on random base weights.
    lora_rank = cfg["trainer"].get("lora_rank")
    if lora_rank:
        from diffulab_tpu.training.lora import apply_lora

        base_ckpt = cfg["trainer"].get("lora_from")
        if base_ckpt:
            restore_train_modules(base_ckpt, _TrainModules(denoiser, []))
            print(f"restored LoRA base weights from {base_ckpt}")
        elif any(Path(c).name == "ema" or Path(c).name.startswith("phema")
                 for c in args.ckpt):
            raise SystemExit(
                "--ckpt points at a LoRA run's params-only dir (ema / phema_sr*), "
                "which stores only adapter params; set trainer.lora_from so the "
                "base weights can be restored (evaluating without them would "
                "score a random model)."
            )
        apply_lora(denoiser, int(lora_rank), rngs=nnx.Rngs(args.seed + 1),
                   variant=cfg["trainer"].get("lora_variant", "lora"))
    modules = _TrainModules(diffuser.denoiser, diffuser.extra_losses)

    guide_denoiser = None
    if args.guide_ckpt:
        assert min(args.guidance) > 0, "--guide-ckpt requires --guidance > 0"
        guide_denoiser = instantiate(cfg["model"], rngs=nnx.Rngs(args.seed))
        # replicates the LoRA wrap order for adapter-layout guide checkpoints
        restore_sampling_model(args.guide_ckpt, guide_denoiser,
                               build_extra_losses(cfg, seed=args.seed),
                               cfg["trainer"], seed=args.seed + 100)
        print(f"autoguidance: negative branch from {args.guide_ckpt}")

    feature_fn = frozen_vit_features(image_size=real_val.shape[1])

    # real-data features are identical across evals of the same dataset
    # split/seed — cache them (device time dominates on a relayed chip)
    import hashlib

    # key covers BOTH splits' configs (the blob stores train features too,
    # so a train-only override must miss the cache) AND the feature
    # extractor's identity — features cached under an older extractor would
    # silently be compared against fresh sample features from a new one
    cache_key = hashlib.sha1(
        repr((sorted(cfg["dataset"]["val"].items()),
              sorted(cfg["dataset"]["train"].items()),
              len(real_val), args.seed, FEATURE_SPACE_VERSION)).encode()
    ).hexdigest()[:16]
    cache_path = Path("data") / "fid_cache" / f"{cache_key}.npz"
    if cache_path.exists():
        cached = np.load(cache_path)
        val_feats, train_feats, noise_feats = (
            cached["val"], cached["train"], cached["noise"]
        )
        print(f"loaded cached real features ({cache_path})")
    else:
        val_feats = extract_features(real_val, feature_fn, args.batch_size)
        train_feats = extract_features(real_train, feature_fn, args.batch_size)
        noise = np.random.default_rng(args.seed).uniform(-1, 1, real_val.shape).astype(np.float32)
        noise_feats = extract_features(noise, feature_fn, args.batch_size)
        cache_path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(cache_path, val=val_feats, train=train_feats, noise=noise_feats)
    fid_floor = compute_fid(train_feats, val_feats)
    fid_ceiling = compute_fid(val_feats, noise_feats)
    print(f"FID(train, val) floor     = {fid_floor:.3f}")
    print(f"FID(val, uniform noise)   = {fid_ceiling:.3f}")

    n = min(args.n_samples, len(real_val))
    n_classes = int(getattr(val_ds, "n_classes", int(val_ds.labels.max()) + 1))
    rng = np.random.default_rng(args.seed)
    labels = rng.integers(0, n_classes, size=n).astype(np.int64)

    # several checkpoints share the model build, the jitted sampler (params
    # are call arguments, so nnx.update swaps weights without recompiling),
    # and the real-feature cache — a sigma_rel sweep pays compile once
    for ckpt in args.ckpt:
        restore_train_modules(ckpt, modules, lora=bool(lora_rank))
        print(f"restored checkpoint from {ckpt}")
        for guidance in args.guidance:
            fakes = []
            key = jax.random.key(args.seed)
            t0 = time.perf_counter()
            for start in range(0, n, args.batch_size):
                bsz = min(args.batch_size, n - start)
                cond = {"y": jnp.asarray(labels[start : start + bsz])}
                out = diffuser.generate(
                    jax.random.fold_in(key, start), cond,
                    data_shape=(bsz, *real_val.shape[1:]),
                    guidance_scale=guidance, clamp_x=True,
                    guide_denoiser=guide_denoiser,
                )
                fakes.append(np.asarray(out["x"], np.float32))
            fake = np.concatenate(fakes)[:n]
            dt = time.perf_counter() - t0
            print(f"sampled {n} images in {dt:.1f}s ({n / dt:.2f} imgs/s)")

            fake_feats = extract_features(fake, feature_fn, args.batch_size)
            ref_feats = val_feats[:n] if n < len(val_feats) else val_feats
            fid = compute_fid(ref_feats, fake_feats)
            pr = compute_precision_recall(ref_feats, fake_feats)
            kid = compute_kid(ref_feats, fake_feats, seed=args.seed)
            tag = f"  [g={guidance:g}]" if len(args.guidance) > 1 else ""
            print(f"FID(val, model samples)   = {fid:.3f}  [{ckpt}]{tag}")
            print(
                "precision/recall (k=3)    = %.3f / %.3f   density/coverage = %.3f / %.3f"
                % (pr["precision"], pr["recall"], pr["density"], pr["coverage"])
            )
            print("KID x 1000                = %.3f +- %.3f (unbiased)"
                  % (kid["kid"] * 1e3, kid["kid_std"] * 1e3))
            print(
                '{"metric": "fid_synthetic", "value": %.3f, "floor": %.3f, "ceiling": %.3f, '
                '"precision": %.3f, "recall": %.3f, "density": %.3f, "coverage": %.3f, '
                '"kid_x1000": %.3f, "guidance": %.3f, "ckpt": "%s"}'
                % (fid, fid_floor, fid_ceiling, pr["precision"], pr["recall"],
                   pr["density"], pr["coverage"], kid["kid"] * 1e3, guidance, ckpt)
            )


if __name__ == "__main__":
    main()
