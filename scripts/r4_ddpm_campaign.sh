#!/bin/bash
# Round-4 DDPM campaign: the three cells of the 2x2(+min-SNR) that carry new
# information — cosine-x-fixed, cosine-x-hybrid, and min-SNR — at the exact
# linear-arm protocol (24 epochs / 1872 updates, UNet 69M at
# model_channels=64, fp32, batch 128, DDIM-50 eval). The linear cells stand
# on the round-2/3 runs at this same protocol (fixed 88.8, hybrid 58.1,
# ramped-ema-track eval); these arms report the same ramped-track FID for the
# 2x2 completion PLUS post-hoc EMA tracks for the clean round-4 protocol.
set -x
cd /root/repo

COMMON=(trainer.n_epoch=24 trainer.posthoc_ema=true trainer.save_optimizer=false
        trainer.save_path=runs/ddpm_r4 model.model_channels=64)

python examples/train_diffusion.py --config-name train_synthetic_ddpm \
  "${COMMON[@]}" trainer.project_name=fixed_cosine \
  diffuser.extra_args.schedule=cosine \
  > /tmp/r4_train_ddpm_fixed_cosine.log 2>&1

python examples/train_diffusion.py --config-name train_synthetic_ddpm \
  "${COMMON[@]}" trainer.project_name=hybrid_cosine \
  diffuser.extra_args.schedule=cosine \
  model.out_channels=6 \
  "diffuser.extra_args.sampler_parameters={var_type: learned_range}" \
  > /tmp/r4_train_ddpm_hybrid_cosine.log 2>&1

python examples/train_diffusion.py --config-name train_synthetic_ddpm \
  "${COMMON[@]}" trainer.project_name=minsnr \
  diffuser.extra_args.loss_weighting=min_snr \
  > /tmp/r4_train_ddpm_minsnr.log 2>&1

echo "DDPM CAMPAIGN DONE"
