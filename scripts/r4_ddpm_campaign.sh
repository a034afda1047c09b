#!/bin/bash
# Round-4 DDPM campaign: all four 2x2 schedule-x-variance cells + a min-SNR
# arm, one protocol (24 epochs, UNet 69M at model_channels=64, fp32,
# posthoc_ema, batch 128, DDIM). Distinct project names per invocation —
# the sweep tag only carries SWEPT axes, so fixed and hybrid sweeps would
# otherwise template to the same run dirs.
set -x
cd /root/repo

COMMON=(trainer.n_epoch=24 trainer.posthoc_ema=true trainer.save_optimizer=false
        trainer.save_path=runs/ddpm_r4 model.model_channels=64)

python examples/train_diffusion.py --sweep --config-name train_synthetic_ddpm \
  "${COMMON[@]}" trainer.project_name=fixed \
  diffuser.extra_args.schedule=linear,cosine \
  > /tmp/r4_train_ddpm_fixed.log 2>&1

python examples/train_diffusion.py --sweep --config-name train_synthetic_ddpm \
  "${COMMON[@]}" trainer.project_name=hybrid \
  diffuser.extra_args.schedule=linear,cosine \
  model.out_channels=6 \
  "diffuser.extra_args.sampler_parameters={var_type: learned_range}" \
  > /tmp/r4_train_ddpm_hybrid.log 2>&1

python examples/train_diffusion.py --config-name train_synthetic_ddpm \
  "${COMMON[@]}" trainer.project_name=minsnr \
  diffuser.extra_args.loss_weighting=min_snr \
  > /tmp/r4_train_ddpm_minsnr.log 2>&1

echo "DDPM CAMPAIGN DONE"
