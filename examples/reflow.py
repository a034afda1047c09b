"""ReFlow entry point: straighten a trained rectified flow for few-step
sampling (reference README roadmap item "add reflow algorithm", unimplemented
there; Liu et al. 2022, arXiv:2209.03003).

Two phases, both on-device:
1. generate N coupled pairs (z, x-hat = ODE-solve(z)) from the checkpoint
   with the jitted ``Diffuser.generate`` path;
2. continue training the SAME model on the couplings — the trainer consumes
   the stored z through the ``coupled_noise`` batch key, so interpolation runs along
   the pair's own trajectory.

Usage:
    python examples/reflow.py --config-name train_synthetic_flow_matching \
        --ckpt runs/synthetic_flow_matching/checkpoints/ema \
        --n-pairs 8192 --epochs 8 trainer.save_path=runs

Evaluate few-step sampling before/after with examples/evaluate_fid.py
(--steps 1/2/4).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import numpy as np
from flax import nnx

from diffulab_tpu.config import compose_config, instantiate
from diffulab_tpu.data.loader import DataLoader
from diffulab_tpu.data.reflow import ReflowPairsDataset, generate_pairs
from diffulab_tpu.diffuse import Diffuser
from diffulab_tpu.training.checkpoint import restore_train_modules
from diffulab_tpu.training.trainer import BaseTrainer, _TrainModules

CONFIG_DIR = Path(__file__).parent.parent / "configs"


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-name", default="train_synthetic_flow_matching")
    parser.add_argument("--config-dir", default=str(CONFIG_DIR))
    parser.add_argument("--ckpt", required=True, help="trained flow checkpoint (denoiser or ema)")
    parser.add_argument("--n-pairs", type=int, default=8192)
    parser.add_argument("--val-pairs", type=int, default=512)
    parser.add_argument("--pair-steps", type=int, default=None,
                        help="ODE steps for pair generation (default: config n_steps)")
    parser.add_argument("--pair-guidance", type=float, default=0.0)
    parser.add_argument("--epochs", type=int, default=8)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=None, help="override optimizer lr")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    cfg = compose_config(args.config_dir, args.config_name, args.overrides)
    assert cfg["diffuser"]["model_type"] == "rectified_flow", "reflow straightens flow models"

    from diffulab_tpu.config.instantiate import model_dtype_kwargs
    denoiser = instantiate(cfg["model"], rngs=nnx.Rngs(args.seed),
                           **model_dtype_kwargs(cfg["trainer"]))
    diffuser = Diffuser(
        denoiser=denoiser,
        model_type="rectified_flow",
        n_steps=args.pair_steps or cfg["diffuser"]["n_steps"],
        sampling_method=cfg["diffuser"]["sampling_method"],
        extra_args=cfg["diffuser"].get("extra_args", {}),
    )
    modules = _TrainModules(diffuser.denoiser, diffuser.extra_losses)
    restore_train_modules(args.ckpt, modules)
    print(f"restored flow checkpoint from {args.ckpt}")

    # phase 1: couplings ---------------------------------------------------
    ds_cfg = cfg["dataset"]["train"]
    image_size = ds_cfg.get("image_size", 32)
    channels = cfg["model"].get("input_channels", 3)
    n_classes = cfg["model"].get("n_classes")
    total = args.n_pairs + args.val_pairs
    pairs = generate_pairs(
        diffuser, total, (image_size, image_size, channels),
        n_classes=n_classes, batch_size=args.batch_size,
        guidance_scale=args.pair_guidance, seed=args.seed,
    )
    print(f"generated {total} coupled pairs")
    train_ds = ReflowPairsDataset(
        pairs.x[: args.n_pairs], pairs.noise[: args.n_pairs],
        None if pairs.labels is None else pairs.labels[: args.n_pairs],
    )
    val_ds = ReflowPairsDataset(
        pairs.x[args.n_pairs :], pairs.noise[args.n_pairs :],
        None if pairs.labels is None else pairs.labels[args.n_pairs :],
    )

    # phase 2: straighten --------------------------------------------------
    trainer_cfg = cfg["trainer"]
    opt_cfg = dict(cfg["optimizer"])
    if args.lr is not None:
        opt_cfg["lr"] = args.lr
    optimizer = instantiate(opt_cfg)
    trainer = BaseTrainer(
        n_epoch=args.epochs,
        precision_type=trainer_cfg.get("precision_type", "no"),
        project_name=trainer_cfg.get("project_name", "flow") + "_reflow",
        save_path=trainer_cfg.get("save_path"),
        use_ema=trainer_cfg.get("use_ema", False),
        ema_rate=trainer_cfg.get("ema_rate", 0.999),
        ema_update_every=trainer_cfg.get("ema_update_every", 10),
        run_config=cfg,
        mesh=trainer_cfg.get("mesh"),
        log_every_n_steps=trainer_cfg.get("log_every_n_steps"),
        async_checkpointing=trainer_cfg.get("async_checkpointing", True),
        posthoc_ema=trainer_cfg.get("posthoc_ema", False),
        posthoc_ema_gammas=tuple(trainer_cfg.get("posthoc_ema_gammas", (6.94, 16.97))),
        save_every_n_epochs=trainer_cfg.get("save_every_n_epochs"),
    )
    # CFG drop stays on only for class-conditional reflow
    p_cfg = trainer_cfg.get("p_classifier_free_guidance", 0.1) if n_classes else 0.0
    trainer.train(
        diffuser=diffuser,
        optimizer=optimizer,
        train_dataloader=DataLoader(train_ds, batch_size=args.batch_size, seed=args.seed),
        val_dataloader=DataLoader(val_ds, batch_size=args.batch_size, shuffle=False),
        log_validation_images=False,
        p_classifier_free_guidance=p_cfg,
        val_steps=trainer_cfg.get("val_steps", 50),
        seed=args.seed,
        auto_resume=trainer_cfg.get("auto_resume", False),
    )
    print("reflow training complete")


if __name__ == "__main__":
    main()
