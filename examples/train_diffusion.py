"""Supervised diffusion training entry point
(parity: reference examples/train_diffusion.py:11-81).

Usage:
    python examples/train_diffusion.py --config-name train_mnist_flow_matching \
        trainer.n_epoch=5 dataloader.batch_size=64
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))  # allow running without install

import jax
import yaml
from flax import nnx

from diffulab_tpu.config import instantiate
from diffulab_tpu.config import sweep
from diffulab_tpu.config.instantiate import model_dtype_kwargs
from diffulab_tpu.data.loader import DataLoader
from diffulab_tpu.diffuse import Diffuser
from diffulab_tpu.training.trainer import BaseTrainer

CONFIG_DIR = Path(__file__).parent.parent / "configs"


def count_parameters(model) -> int:
    return sum(
        leaf.size for leaf in jax.tree.leaves(nnx.state(model, nnx.Param))
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-name", default="train_mnist_flow_matching")
    parser.add_argument("--config-dir", default=str(CONFIG_DIR))
    parser.add_argument("--seed", type=int, default=0)
    sweep.add_sweep_arg(parser)
    parser.add_argument("overrides", nargs="*", help="dotlist overrides key=value")
    args = parser.parse_args()
    sweep.dispatch(args, run_one)


def run_one(cfg: dict, seed: int) -> None:
    print(yaml.safe_dump(cfg, sort_keys=False))

    train_dataset = instantiate(cfg["dataset"]["train"])
    val_dataset = instantiate(cfg["dataset"]["val"])

    dl_cfg = cfg.get("dataloader", {})
    train_loader = DataLoader(
        train_dataset,
        batch_size=dl_cfg.get("batch_size", 32),
        shuffle=dl_cfg.get("shuffle", True),
        prefetch=dl_cfg.get("prefetch", 2),
        seed=seed,
    )
    val_loader = DataLoader(
        val_dataset,
        batch_size=dl_cfg.get("batch_size", 32),
        shuffle=False,
        prefetch=dl_cfg.get("prefetch", 2),
    )

    denoiser = instantiate(cfg["model"], rngs=nnx.Rngs(seed),
                           **model_dtype_kwargs(cfg["trainer"]))

    # LoRA finetuning (trainer.lora_rank + optional trainer.lora_from base
    # checkpoint): restore the base BEFORE wrapping (the wrapped param tree
    # differs), then train adapters only
    lora_rank = cfg["trainer"].get("lora_rank")
    if lora_rank:
        from diffulab_tpu.training.lora import apply_lora, count_lora_params
        from diffulab_tpu.training.checkpoint import restore_train_modules
        from diffulab_tpu.training.trainer import _TrainModules

        base_ckpt = cfg["trainer"].get("lora_from")
        if base_ckpt:
            restore_train_modules(base_ckpt, _TrainModules(denoiser, []))
            print(f"restored LoRA base weights from {base_ckpt}")
        variant = cfg["trainer"].get("lora_variant", "lora")
        n_adapters = apply_lora(denoiser, int(lora_rank), rngs=nnx.Rngs(seed + 1),
                                variant=variant)
        print(f"{variant.upper()}: wrapped {n_adapters} projections at rank {lora_rank} "
              f"({count_lora_params(denoiser):,} adapter params)")

    # guidance distillation (trainer.distill_from + trainer.distill_guidance):
    # the teacher is a frozen copy restored from a trained checkpoint; the
    # student warm-starts from the same weights unless a denoiser_ckpt is given
    distill_teacher = None
    distill_from = cfg["trainer"].get("distill_from")
    if distill_from:
        from diffulab_tpu.training.checkpoint import restore_train_modules
        from diffulab_tpu.training.trainer import _TrainModules

        distill_teacher = instantiate(cfg["model"], rngs=nnx.Rngs(seed + 2),
                                      **model_dtype_kwargs(cfg["trainer"]))
        restore_train_modules(distill_from, _TrainModules(distill_teacher, []))
        print(f"distillation teacher restored from {distill_from}")
        if not cfg["trainer"].get("denoiser_ckpt"):
            restore_train_modules(distill_from, _TrainModules(denoiser, []))
            print("student warm-started from the teacher weights")

    print(f"Number of trainable parameters: {count_parameters(denoiser):,}")

    # optional REPA auxiliary loss on pixel-space runs: a `repa:` config
    # section builds RepaLoss with a live frozen encoder; the formalizations
    # forward x0 to it automatically, so no dataset change is needed
    from diffulab_tpu.training.losses.build import build_extra_losses

    extra_losses = build_extra_losses(cfg, seed=seed)

    diffuser = Diffuser(
        denoiser=denoiser,
        model_type=cfg["diffuser"]["model_type"],
        n_steps=cfg["diffuser"]["n_steps"],
        sampling_method=cfg["diffuser"]["sampling_method"],
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
        use_ema=trainer_cfg.get("use_ema", False),
        ema_rate=trainer_cfg.get("ema_rate", 0.999),
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
        save_optimizer=trainer_cfg.get("save_optimizer", True),
        augment_p=trainer_cfg.get("augment_p", 0.0),
        distill_guidance=trainer_cfg.get("distill_guidance", 0.0),
    )

    scheduler = None
    if trainer_cfg.get("lr_scheduler"):
        scheduler = instantiate(trainer_cfg["lr_scheduler"])

    trainer.train(
        diffuser=diffuser,
        optimizer=optimizer,
        train_dataloader=train_loader,
        val_dataloader=val_loader,
        scheduler=scheduler,
        per_batch_scheduler=trainer_cfg.get("per_batch_scheduler", False),
        train_embedder=trainer_cfg.get("train_embedder", False),
        log_validation_images=trainer_cfg.get("log_validation_images", True),
        p_classifier_free_guidance=trainer_cfg.get("p_classifier_free_guidance", 0.2),
        val_steps=trainer_cfg.get("val_steps", 50),
        val_step_shift=trainer_cfg.get("val_step_shift"),
        denoiser_ckpt=trainer_cfg.get("denoiser_ckpt"),
        optimizer_ckpt=trainer_cfg.get("optimizer_ckpt"),
        ema_ckpt=trainer_cfg.get("ema_ckpt"),
        epoch_start=trainer_cfg.get("epoch_start", 0),
        auto_resume=trainer_cfg.get("auto_resume", False),
        seed=seed,
        lora_only=bool(trainer_cfg.get("lora_rank")),
        distill_teacher=distill_teacher,
    )


if __name__ == "__main__":
    main()
