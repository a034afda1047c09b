"""GRPO post-training entry point (drives training/grpo_trainer.py).

The reference implements GRPO (trainers/grpo_trainer.py:25-623) but ships no
example script for it; this CLI completes the loop: prompts come from any
dataset yielding captions (+ precomputed caption embeddings for the
jit-friendly conditioning path), images are sampled in groups with the
Euler-Maruyama SDE sampler, the VLM judge scores pairwise preferences
host-side, and the clipped-ratio objective updates the denoiser.

Usage:
    python examples/train_grpo.py --config-name train_grpo_alignment \
        reward.version=7b grpo.n_image_per_prompt=16

    # offline smoke test (no VLM weights): deterministic stub judge
    python examples/train_grpo.py --config-name train_grpo_alignment --stub-judge ...
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
from diffulab_tpu.training.grpo_trainer import GRPOTrainer

CONFIG_DIR = Path(__file__).parent.parent / "configs"


def _prompt_batches(loader):
    """Adapt latent-dataset batches to the GRPO contract: captions move to
    extra['captions'], and 'x' is dropped (GRPO samples from noise)."""
    for batch in loader:
        mi = dict(batch["model_inputs"])
        captions = mi.pop("initial_context", None)
        mi.pop("x", None)
        extra = dict(batch.get("extra", {}))
        if captions is not None:
            extra["captions"] = list(captions)
        yield {"model_inputs": mi, "extra": extra}


class _ListLoader:
    """Re-iterable view over the adapted batches (the trainer iterates the
    train loader once per epoch and peeks the first batch up front)."""

    def __init__(self, loader):
        self.loader = loader

    def __iter__(self):
        return _prompt_batches(self.loader)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-name", default="train_grpo_alignment")
    parser.add_argument("--config-dir", default=str(CONFIG_DIR))
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--stub-judge", action="store_true",
        help="replace the VLM judge with a deterministic stub (offline smoke runs)",
    )
    parser.add_argument(
        "--luma-judge", action="store_true",
        help="deterministic brighter-image-wins judge: a REAL preference the "
             "policy can learn (val/judge_score tracks mean luma per epoch)",
    )
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
        vision_tower = instantiate(cfg["vision_tower"], rngs=rngs)
        for ds in (train_dataset, val_dataset):
            ds.set_latent_scale(vision_tower.latent_scale)
            if hasattr(ds, "set_latent_bias"):
                ds.set_latent_bias(vision_tower.latent_bias)

        reward_cfg = dict(cfg["reward"])
        if args.luma_judge:
            from diffulab_tpu.networks.rewards.grpo import LumaJudge

            reward_cfg["judge"] = LumaJudge()
        elif args.stub_judge:
            # Alignment Score-format replies preferring image 1: exercises the
            # full parse -> win-rate -> z-score path without VLM weights.
            reward_cfg["judge"] = lambda queries: [
                "Alignment Score:\nImage 1: 0.6\nImage 2: 0.4\n"
                "Coherence Score:\nImage 1: 0.6\nImage 2: 0.4\n"
                "Style Score:\nImage 1: 0.6\nImage 2: 0.4"
                for _ in queries
            ]
        reward_model = instantiate(reward_cfg)

        dl_cfg = cfg.get("dataloader", {})
        bs = dl_cfg.get("batch_size", 8)
        mk = dict(batch_size=bs, collate_fn=collate_fn)
        if type(train_dataset).__name__ == "ImageNetmultiAR":
            train_loader = DataLoader(
                train_dataset, sampler=MultiARBatchSampler(
                    train_dataset, bs, shuffle=True, drop_last=True, seed=seed), **mk)
            val_loader = DataLoader(
                val_dataset, sampler=MultiARBatchSampler(
                    val_dataset, bs, shuffle=False, drop_last=False), **mk)
        else:
            train_loader = DataLoader(train_dataset, shuffle=True, seed=seed,
                                      drop_last=True, **mk)
            val_loader = DataLoader(val_dataset, shuffle=False, **mk)

        diffuser = Diffuser(
            denoiser=denoiser,
            model_type=cfg["diffuser"]["model_type"],
            n_steps=cfg["diffuser"]["n_steps"],
            sampling_method=cfg["diffuser"]["sampling_method"],
            vision_tower=vision_tower,
            extra_args=cfg["diffuser"].get("extra_args", {}),
        )
        optimizer = instantiate(cfg["optimizer"])

        trainer_cfg = cfg["trainer"]
        grpo_cfg = cfg.get("grpo", {})
        trainer = GRPOTrainer(
            n_epoch=trainer_cfg["n_epoch"],
            gradient_accumulation_step=trainer_cfg.get("gradient_accumulation_step", 1),
            precision_type=trainer_cfg.get("precision_type", "no"),
            project_name=trainer_cfg.get("project_name", "grpo_alignment"),
            save_path=trainer_cfg.get("save_path"),
            save_optimizer=trainer_cfg.get("save_optimizer", True),
            use_ema=trainer_cfg.get("use_ema", True),
            ema_rate=trainer_cfg.get("ema_rate", 0.9999),
            ema_update_after_step=trainer_cfg.get("ema_update_after_step", 0),
            ema_update_every=trainer_cfg.get("ema_update_every", 1),
            ema_inv_gamma=trainer_cfg.get("ema_inv_gamma", 1.0),
            ema_power=trainer_cfg.get("ema_power", 2.0 / 3.0),
            run_config=cfg,
            mesh=trainer_cfg.get("mesh"),
            init_kwargs={"wandb": trainer_cfg.get("wandb", {})},
            async_checkpointing=trainer_cfg.get("async_checkpointing", True),
            timestep_fraction=grpo_cfg.get("timestep_fraction", 0.6),
            kl_beta=grpo_cfg.get("kl_beta", 0.0),
            eps=grpo_cfg.get("eps", 0.1),
            mini_batch_size=grpo_cfg.get("mini_batch_size"),
            offload_trajectories=grpo_cfg.get("offload_trajectories", True),
            trust_region=grpo_cfg.get("trust_region", 0.3),
            trust_region_backoff=grpo_cfg.get("trust_region_backoff", 0.5),
        )
        trainer.train(
            diffuser=diffuser,
            reward_model=reward_model,
            optimizer=optimizer,
            train_dataloader=_ListLoader(train_loader),
            val_dataloader=_ListLoader(val_loader),
            log_validation_images=trainer_cfg.get("log_validation_images", True),
            n_image_per_prompt=grpo_cfg.get("n_image_per_prompt", 16),
            guidance_scale=grpo_cfg.get("guidance_scale", 4.0),
            image_resolution=tuple(grpo_cfg.get("image_resolution", (512, 512))),
            seed=seed,
        )

    sweep.dispatch(args, run_one)


if __name__ == "__main__":
    main()
