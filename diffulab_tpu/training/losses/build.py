"""Shared extra-loss construction from a composed config.

Training and evaluation CLIs must build the SAME extra-loss modules: the
trainer's checkpoints store the trainable split of denoiser + extra losses
(``_TrainModules``), so an evaluator restoring without them hits an orbax
structure mismatch. All four REPA CLIs (train_diffusion / train_repa /
train_repa_txt_to_img / the eval-side evaluate_fid, sample,
eval_cond_uncond_loss) construct through this one function.
"""

from __future__ import annotations

from typing import Any

from flax import nnx


def build_extra_losses(cfg: dict[str, Any], *, seed: int = 0,
                       rngs: nnx.Rngs | None = None) -> list[Any]:
    """Extra-loss modules for a composed experiment config.

    Two REPA styles, distinguished by the config:

    - **live encoder** (pixel-space recipes): a ``repa:`` section naming a
      ``repa_encoder`` (+ ``encoder_args``) — features are computed from
      ``x0`` by a frozen encoder during training (``load_dino=True``);
    - **precomputed features** (latent recipes, reference
      datasets/imagenet.py latent+REPA shards): a ``perceiver_resampler:``
      section and/or a ``repa:`` section carrying ``embedding_dim`` — the
      dataset supplies ``dst_features`` (``load_dino=False``).
    """
    losses: list[Any] = []
    repa_cfg = cfg.get("repa") or {}
    resampler_cfg = cfg.get("perceiver_resampler") or {}
    if repa_cfg or resampler_cfg:
        from diffulab_tpu.training.losses.repa import RepaLoss

        live = "repa_encoder" in repa_cfg or "encoder_args" in repa_cfg
        # DiT-family models carry one token width (inner_dim); UNet capture
        # points have per-layer channel widths, so U-REPA recipes must name
        # the width of the chosen alignment layer explicitly
        denoiser_dim = repa_cfg.get("denoiser_dimension") or cfg["model"].get("inner_dim")
        assert denoiser_dim is not None, (
            "REPA needs the aligned-layer token width: set model.inner_dim "
            "(DiT) or repa.denoiser_dimension (UNet capture-point channels)"
        )
        common: dict[str, Any] = dict(
            denoiser_dimension=denoiser_dim,
            alignment_layer=repa_cfg.get("alignment_layer", 8),
            use_resampler=resampler_cfg.get("use_resampler", False),
            resampler_params=resampler_cfg.get("parameters"),
            coeff=repa_cfg.get("coeff", 0.5),
            rngs=rngs if rngs is not None else nnx.Rngs(seed + 2),
        )
        if live:
            losses.append(RepaLoss(
                repa_encoder=repa_cfg.get("repa_encoder", "fixed_vit"),
                encoder_args=repa_cfg.get("encoder_args"),
                hidden_dim=repa_cfg.get("hidden_dim", 1024),
                load_dino=True,
                **common,
            ))
        else:
            losses.append(RepaLoss(
                embedding_dim=repa_cfg.get("embedding_dim", 1024),
                load_dino=False,
                **common,
            ))
    return losses
