#!/bin/bash
# Round-4 feature-surface A/B campaign, part B: training-time features, each
# trained at its control's exact protocol and scored through the same
# post-hoc-EMA eval as the round-4 re-baseline tables.
#   guidance distillation : teacher = flow_fp32_r4 phema_sr0.05 (FID 1.01)
#   EDM augmentation      : control = edm_fp32_r3 (0.82 at sr0.05)
#   flow REPA             : control = flow_fp32_r4 (1.01 at sr0.05)
set -x
cd /root/repo

# 1. guidance distillation (6 epochs, warm-start from teacher): the student
#    reproduces CFG-1.5 quality at guidance 0 (half the per-step FLOPs)
python examples/train_diffusion.py --config-name train_synthetic_flow_distill \
  trainer.save_path=runs/r4 trainer.save_optimizer=false \
  trainer.distill_from=runs/flow_fp32_r4/checkpoints/phema_sr0.05 \
  > /tmp/r4_train_distill.log 2>&1
python examples/evaluate_fid.py --config-name train_synthetic_flow_distill \
  --ckpt runs/r4/synthetic_flow_distill/checkpoints/ema \
         runs/r4/synthetic_flow_distill/checkpoints/denoiser \
  --n-samples 2000 --batch-size 200 --guidance 0.0
# teacher-at-guidance-0 control (what the student must beat to prove the
# distilled CFG is real)
python examples/evaluate_fid.py --config-name train_synthetic_flow_matching \
  --ckpt runs/flow_fp32_r4/checkpoints/phema_sr0.05 \
  --n-samples 2000 --batch-size 200 --guidance 0.0

# 2. EDM non-leaky augmentation arm (12 epochs, same budget as control)
python examples/train_diffusion.py --config-name train_synthetic_edm_aug \
  trainer.save_path=runs/r4 trainer.save_optimizer=false \
  trainer.posthoc_ema=true > /tmp/r4_train_edm_aug.log 2>&1
python examples/reconstruct_ema.py --run-dir runs/r4/synthetic_edm_aug \
  --sigma-rel 0.05 0.1
python examples/evaluate_fid.py --config-name train_synthetic_edm_aug \
  --ckpt runs/r4/synthetic_edm_aug/checkpoints/phema_sr0.05 \
         runs/r4/synthetic_edm_aug/checkpoints/phema_sr0.1 \
         runs/r4/synthetic_edm_aug/checkpoints/denoiser \
  --n-samples 2000 --batch-size 200 --guidance 1.5

# 3. flow REPA arm under the clean protocol (round-3 measured -25% FID on the
#    ramped track; does it still help at the optimal post-hoc horizon?)
python examples/train_diffusion.py --config-name train_synthetic_flow_repa \
  trainer.save_path=runs/r4 trainer.save_optimizer=false \
  trainer.posthoc_ema=true > /tmp/r4_train_flow_repa.log 2>&1
python examples/reconstruct_ema.py --run-dir runs/r4/synthetic_flow_repa \
  --sigma-rel 0.05 0.1
python examples/evaluate_fid.py --config-name train_synthetic_flow_repa \
  --ckpt runs/r4/synthetic_flow_repa/checkpoints/phema_sr0.05 \
         runs/r4/synthetic_flow_repa/checkpoints/phema_sr0.1 \
         runs/r4/synthetic_flow_repa/checkpoints/denoiser \
  --n-samples 2000 --batch-size 200 --guidance 1.5

echo "FEATURE TRAININGS DONE"
