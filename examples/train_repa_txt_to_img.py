"""Text-to-image latent diffusion + REPA with multi-aspect-ratio bucketing
(parity: reference examples/train_repa_txt_to_img.py:15-117).

Usage:
    python examples/train_repa_txt_to_img.py \
        --config-name train_imagenet_repa_txt_to_img_sprint
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))  # allow running without install

import yaml
from flax import nnx

from diffulab_tpu.config import instantiate
from diffulab_tpu.config import sweep
from diffulab_tpu.data.imagenet import MultiARBatchSampler, collate_fn
from diffulab_tpu.data.loader import DataLoader
from diffulab_tpu.diffuse import Diffuser
from diffulab_tpu.training.trainer import BaseTrainer

CONFIG_DIR = Path(__file__).parent.parent / "configs"


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-name", default="train_imagenet_repa_txt_to_img")
    parser.add_argument("--config-dir", default=str(CONFIG_DIR))
    parser.add_argument("--seed", type=int, default=0)
    sweep.add_sweep_arg(parser)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    def run_one(cfg: dict, seed: int) -> None:
        print(yaml.safe_dump(cfg, sort_keys=False))
        rngs = nnx.Rngs(seed)

        train_dataset = instantiate(cfg["dataset"]["train"])
        val_dataset = instantiate(cfg["dataset"]["val"])

        embedder = instantiate(cfg["embedder"], rngs=rngs)
        from diffulab_tpu.config.instantiate import model_dtype_kwargs
        denoiser = instantiate(cfg["model"], context_embedder=embedder, rngs=rngs,
                               **model_dtype_kwargs(cfg["trainer"]))

        # precomputed-features RepaLoss via the shared constructor (the
        # config pins repa.embedding_dim; eval CLIs rebuild identically)
        from diffulab_tpu.training.losses.build import build_extra_losses

        extra_losses = build_extra_losses(cfg, rngs=rngs)
        vision_tower = instantiate(cfg["vision_tower"], rngs=rngs)

        for ds in (train_dataset, val_dataset):
            ds.set_latent_scale(vision_tower.latent_scale)
            ds.set_latent_bias(vision_tower.latent_bias)

        dl_cfg = cfg.get("dataloader", {})
        bs = dl_cfg.get("batch_size", 32)
        train_loader = DataLoader(
            train_dataset, batch_size=bs, collate_fn=collate_fn,
            sampler=MultiARBatchSampler(train_dataset, bs, shuffle=True, drop_last=True, seed=seed),
        )
        val_loader = DataLoader(
            val_dataset, batch_size=bs, collate_fn=collate_fn,
            sampler=MultiARBatchSampler(val_dataset, bs, shuffle=False, drop_last=False),
        )

        diffuser = Diffuser(
            denoiser=denoiser,
            model_type=cfg["diffuser"]["model_type"],
            n_steps=cfg["diffuser"]["n_steps"],
            sampling_method=cfg["diffuser"]["sampling_method"],
            vision_tower=vision_tower,
            extra_args=cfg["diffuser"].get("extra_args", {}),
            extra_losses=extra_losses,
        )
        optimizer = instantiate(cfg["optimizer"])

        trainer_cfg = cfg["trainer"]
        trainer = BaseTrainer(
            n_epoch=trainer_cfg["n_epoch"],
            gradient_accumulation_step=trainer_cfg.get("gradient_accumulation_step", 1),
            precision_type=trainer_cfg.get("precision_type", "no"),
            project_name=trainer_cfg.get("project_name", "diffulab"),
            save_path=trainer_cfg.get("save_path"),
            save_optimizer=trainer_cfg.get("save_optimizer", True),
            use_ema=trainer_cfg.get("use_ema", False),
            ema_rate=trainer_cfg.get("ema_rate", 0.9999),
            ema_update_after_step=trainer_cfg.get("ema_update_after_step", 0),
            ema_update_every=trainer_cfg.get("ema_update_every", 10),
            ema_inv_gamma=trainer_cfg.get("ema_inv_gamma", 1.0),
            ema_power=trainer_cfg.get("ema_power", 2.0 / 3.0),
            run_config=cfg,
            compile=trainer_cfg.get("compile", False),
            mesh=trainer_cfg.get("mesh"),
            init_kwargs={"wandb": trainer_cfg.get("wandb", {})},
            log_every_n_steps=trainer_cfg.get("log_every_n_steps"),
            async_checkpointing=trainer_cfg.get("async_checkpointing", True),
            posthoc_ema=trainer_cfg.get("posthoc_ema", False),
            posthoc_ema_gammas=tuple(trainer_cfg.get("posthoc_ema_gammas", (6.94, 16.97))),
            save_every_n_epochs=trainer_cfg.get("save_every_n_epochs"),
        )
        trainer.train(
            diffuser=diffuser,
            optimizer=optimizer,
            train_dataloader=train_loader,
            val_dataloader=val_loader,
            log_validation_images=trainer_cfg.get("log_validation_images", True),
            val_steps=trainer_cfg.get("val_steps", 50),
            val_step_shift=trainer_cfg.get("val_step_shift"),
            p_classifier_free_guidance=trainer_cfg.get("p_classifier_free_guidance", 0),
            scheduler=(instantiate(trainer_cfg["lr_scheduler"])
                       if trainer_cfg.get("lr_scheduler") else None),
            per_batch_scheduler=trainer_cfg.get("per_batch_scheduler", False),
            train_embedder=trainer_cfg.get("train_embedder", False),
            denoiser_ckpt=trainer_cfg.get("denoiser_ckpt"),
            optimizer_ckpt=trainer_cfg.get("optimizer_ckpt"),
            ema_ckpt=trainer_cfg.get("ema_ckpt"),
            epoch_start=trainer_cfg.get("epoch_start", 0),
            auto_resume=trainer_cfg.get("auto_resume", False),
            seed=seed,
        )

    sweep.dispatch(args, run_one)


if __name__ == "__main__":
    main()
