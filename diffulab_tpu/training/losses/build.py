"""Shared extra-loss construction from a composed config.

Training and evaluation CLIs must build the SAME extra-loss modules: the
trainer's checkpoints store the trainable split of denoiser + extra losses
(``_TrainModules``), so an evaluator restoring without them hits an orbax
structure mismatch.
"""

from __future__ import annotations

from typing import Any

from flax import nnx


def build_extra_losses(cfg: dict[str, Any], *, seed: int = 0) -> list[Any]:
    """Extra-loss modules for a composed experiment config (currently the
    optional ``repa:`` section of pixel-space recipes; latent REPA CLIs build
    their RepaLoss explicitly with dataset-specific dims)."""
    losses: list[Any] = []
    repa_cfg = cfg.get("repa")
    if repa_cfg:
        from diffulab_tpu.training.losses.repa import RepaLoss

        resampler_cfg = cfg.get("perceiver_resampler", {})
        losses.append(RepaLoss(
            repa_encoder=repa_cfg.get("repa_encoder", "fixed_vit"),
            encoder_args=repa_cfg.get("encoder_args"),
            denoiser_dimension=cfg["model"]["inner_dim"],
            alignment_layer=repa_cfg.get("alignment_layer", 8),
            hidden_dim=repa_cfg.get("hidden_dim", 1024),
            load_dino=True,
            use_resampler=resampler_cfg.get("use_resampler", False),
            resampler_params=resampler_cfg.get("parameters"),
            coeff=repa_cfg.get("coeff", 0.5),
            rngs=nnx.Rngs(seed + 2),
        ))
    return losses
