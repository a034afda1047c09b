#!/bin/bash
# Round-4 chip queue, stage 2b (launch AFTER r4_queue2a.sh exits — never two
# TPU processes). Priority order per VERDICT r3: training-time feature arms,
# then the bf16 scale verdict, then the GRPO sweep.
set -x
cd /root/repo

bash scripts/r4_feature_trainings.sh  > /tmp/r4_feature_trainings.log 2>&1
bash scripts/r4_bf16_campaign.sh      > /tmp/r4_bf16_campaign.log 2>&1
bash scripts/r4_grpo_campaign.sh      > /tmp/r4_grpo_campaign.log 2>&1

# U-REPA arm at the linear-fixed protocol (control: round-2 ramped-track 88.8
# at mc64/24ep + this round's minsnr/hybrid posthoc tracks) — tail position =
# natural time-based cutoff
python examples/train_diffusion.py --config-name train_synthetic_ddpm_repa \
  trainer.n_epoch=24 trainer.posthoc_ema=true trainer.save_optimizer=false \
  trainer.save_path=runs/ddpm_r4 trainer.project_name=urepa \
  model.model_channels=64 > /tmp/r4_train_urepa.log 2>&1
env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/reconstruct_ema.py \
  --run-dir runs/ddpm_r4/urepa --sigma-rel 0.05 0.1
python examples/evaluate_fid.py --config-name train_synthetic_ddpm_repa \
  --ckpt runs/ddpm_r4/urepa/checkpoints/ema runs/ddpm_r4/urepa/checkpoints/denoiser \
         runs/ddpm_r4/urepa/checkpoints/phema_sr0.05 runs/ddpm_r4/urepa/checkpoints/phema_sr0.1 \
  --n-samples 2000 --batch-size 200 --steps 50 --guidance 1.5 \
  model.model_channels=64 > /tmp/r4_fid_urepa.log 2>&1

echo "QUEUE2B DONE"
