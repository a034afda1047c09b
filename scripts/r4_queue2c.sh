#!/bin/bash
# Round-4 chip queue, stage 2c — replaces the tail of r4_queue2b.sh (whose
# bash wrapper was stopped at 12:10 UTC with the distill TRAINING still
# running as an orphan). Reordered by value-per-chip-hour for the ~3h left:
#   1. distill evals (the training is already done by the time this runs)
#   2. DDPM linear x fixed arm   — isolates the min-SNR lever (4.83 claim)
#   3. bf16 58M flow arm         — the EMA-deconfounded precision verdict
#   4. EDM augmentation arm      — zero measurements so far
#   5. flow REPA arm             — killable tail (round 3 already has an A/B)
# DDPM linear x hybrid, U-REPA, and GRPO arms are cut for time; recorded as
# residues in BASELINE.md. Serial on purpose — the relay wedges under two
# concurrent TPU processes (CLAUDE.md).
set -x
cd /root/repo

CPU=(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)
EVAL=(--n-samples 2000 --batch-size 200)

# wait for the orphaned distill training (pid in /tmp/r4_distill_train.pid)
if [ -f /tmp/r4_distill_train.pid ]; then
  while kill -0 "$(cat /tmp/r4_distill_train.pid)" 2>/dev/null; do sleep 15; done
fi

# ---- 1. guidance distillation evals ---------------------------------------
# student must reproduce teacher CFG-1.5 quality (1.01) at guidance 0;
# the teacher-at-guidance-0 control is what it must beat.
{
python examples/evaluate_fid.py --config-name train_synthetic_flow_distill \
  --ckpt runs/r4/synthetic_flow_distill/checkpoints/ema \
         runs/r4/synthetic_flow_distill/checkpoints/denoiser \
  "${EVAL[@]}" --guidance 0.0
python examples/evaluate_fid.py --config-name train_synthetic_flow_matching \
  --ckpt runs/flow_fp32_r4/checkpoints/phema_sr0.05 \
  "${EVAL[@]}" --guidance 0.0
} > /tmp/r4_distill_evals.log 2>&1

# ---- 2. DDPM linear x fixed (completes the min-SNR attribution) ------------
COMMON=(trainer.n_epoch=24 trainer.posthoc_ema=true trainer.save_optimizer=false
        trainer.save_path=runs/ddpm_r4 model.model_channels=64)
{
python examples/train_diffusion.py --config-name train_synthetic_ddpm \
  "${COMMON[@]}" trainer.project_name=fixed_linear diffuser.extra_args.schedule=linear
"${CPU[@]}" python examples/reconstruct_ema.py --run-dir runs/ddpm_r4/fixed_linear \
  --sigma-rel 0.05 0.1
python examples/evaluate_fid.py --config-name train_synthetic_ddpm \
  --ckpt runs/ddpm_r4/fixed_linear/checkpoints/ema \
         runs/ddpm_r4/fixed_linear/checkpoints/denoiser \
         runs/ddpm_r4/fixed_linear/checkpoints/phema_sr0.05 \
         runs/ddpm_r4/fixed_linear/checkpoints/phema_sr0.1 \
  "${EVAL[@]}" --steps 50 --guidance 1.5 model.model_channels=64 \
  diffuser.extra_args.schedule=linear
} > /tmp/r4_arm_fixed_linear.log 2>&1

# ---- 3. bf16 58M flow arm (EMA-deconfounded precision verdict) -------------
{
python examples/train_diffusion.py --config-name train_synthetic_flow_matching \
  trainer.save_path=runs/bf16_r4 trainer.save_optimizer=false \
  trainer.project_name=flow58_bf16 trainer.precision_type=bf16
"${CPU[@]}" python examples/reconstruct_ema.py \
  --run-dir runs/bf16_r4/flow58_bf16 --sigma-rel 0.02 0.05 0.1
python examples/evaluate_fid.py --config-name train_synthetic_flow_matching \
  --ckpt runs/bf16_r4/flow58_bf16/checkpoints/denoiser \
         runs/bf16_r4/flow58_bf16/checkpoints/phema_sr0.02 \
         runs/bf16_r4/flow58_bf16/checkpoints/phema_sr0.05 \
         runs/bf16_r4/flow58_bf16/checkpoints/phema_sr0.1 \
  "${EVAL[@]}" --guidance 1.5
} > /tmp/r4_bf16_58m.log 2>&1

# ---- 4. EDM augmentation arm ----------------------------------------------
{
python examples/train_diffusion.py --config-name train_synthetic_edm_aug \
  trainer.save_path=runs/r4 trainer.save_optimizer=false \
  trainer.posthoc_ema=true
"${CPU[@]}" python examples/reconstruct_ema.py \
  --run-dir runs/r4/synthetic_edm_aug --sigma-rel 0.05 0.1
python examples/evaluate_fid.py --config-name train_synthetic_edm_aug \
  --ckpt runs/r4/synthetic_edm_aug/checkpoints/phema_sr0.05 \
         runs/r4/synthetic_edm_aug/checkpoints/phema_sr0.1 \
         runs/r4/synthetic_edm_aug/checkpoints/denoiser \
  "${EVAL[@]}" --guidance 1.5
} > /tmp/r4_edm_aug.log 2>&1

# ---- 5. flow REPA arm (killable tail) --------------------------------------
{
python examples/train_diffusion.py --config-name train_synthetic_flow_repa \
  trainer.save_path=runs/r4 trainer.save_optimizer=false \
  trainer.posthoc_ema=true
"${CPU[@]}" python examples/reconstruct_ema.py \
  --run-dir runs/r4/synthetic_flow_repa --sigma-rel 0.05 0.1
python examples/evaluate_fid.py --config-name train_synthetic_flow_repa \
  --ckpt runs/r4/synthetic_flow_repa/checkpoints/phema_sr0.05 \
         runs/r4/synthetic_flow_repa/checkpoints/phema_sr0.1 \
         runs/r4/synthetic_flow_repa/checkpoints/denoiser \
  "${EVAL[@]}" --guidance 1.5
} > /tmp/r4_flow_repa.log 2>&1

echo "QUEUE2C DONE"
