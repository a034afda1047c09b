#!/bin/bash
# Round-4 chip queue, stage 2b — REPLANNED at 11:15 UTC: ~3.2h of chip
# remains in the round (round end ~15:30, driver bench needs the chip from
# ~15:15). Phases are ordered by value-per-chip-hour and later phases are
# expendable: a kill mid-training still leaves per-epoch JSONL curves and
# best-val checkpoints. Serial on purpose — the relay wedges under two
# concurrent TPU processes (CLAUDE.md). Launch AFTER r4_queue2a.sh exits.
#
# Cut from the original plan for time: the 130M fp32/bf16 scale pair (the
# 58M bf16 arm below gives the EMA-deconfounded verdict at the measured
# scale; the scale interaction is recorded as an open residue) and the
# second GRPO arm.
set -x
cd /root/repo

CPU=(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)
EVAL=(--n-samples 2000 --batch-size 200)

# ---- 1. fixed MFU floor probes (~10 min; item 9) -------------------------
python scripts/mfu_floor_probes.py > /tmp/r4_mfu_probes2.log 2>&1

# ---- 2. guidance distillation (~30 min; item 2 headline) ------------------
# student warm-starts from the teacher (flow_fp32_r4 phema_sr0.05, FID 1.01
# at CFG 1.5) and must reproduce CFG-1.5 quality at guidance 0.
{
python examples/train_diffusion.py --config-name train_synthetic_flow_distill \
  trainer.save_path=runs/r4 trainer.save_optimizer=false \
  trainer.distill_from=runs/flow_fp32_r4/checkpoints/phema_sr0.05
python examples/evaluate_fid.py --config-name train_synthetic_flow_distill \
  --ckpt runs/r4/synthetic_flow_distill/checkpoints/ema \
         runs/r4/synthetic_flow_distill/checkpoints/denoiser \
  "${EVAL[@]}" --guidance 0.0
# teacher-at-guidance-0 control: what the student must beat for the folded
# CFG to be real
python examples/evaluate_fid.py --config-name train_synthetic_flow_matching \
  --ckpt runs/flow_fp32_r4/checkpoints/phema_sr0.05 \
  "${EVAL[@]}" --guidance 0.0
} > /tmp/r4_distill.log 2>&1

# ---- 3. bf16 58M flow arm (~35 min; item 4) -------------------------------
# the round-2 "21.05 vs 17.6-18.2" comparison redone with post-hoc EMA
# horizon selection on both sides (fp32 control = flow_fp32_r4, sr0.05 1.01)
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

# ---- 4. flow REPA arm (~35 min; item 2) -----------------------------------
# round 3 measured -25% FID on the ramped track; does REPA still help at the
# post-hoc optimum (control 1.01)?
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

# ---- 5/6. DDPM linear arms (~65 min each; item 5, completes the 2x2) ------
COMMON=(trainer.n_epoch=24 trainer.posthoc_ema=true trainer.save_optimizer=false
        trainer.save_path=runs/ddpm_r4 model.model_channels=64)

tail_arm () {
  local name="$1"; shift
  {
  python examples/train_diffusion.py --config-name train_synthetic_ddpm \
    "${COMMON[@]}" trainer.project_name="$name" "$@"
  "${CPU[@]}" python examples/reconstruct_ema.py --run-dir "runs/ddpm_r4/$name" \
    --sigma-rel 0.05 0.1
  python examples/evaluate_fid.py --config-name train_synthetic_ddpm \
    --ckpt "runs/ddpm_r4/$name/checkpoints/ema" "runs/ddpm_r4/$name/checkpoints/denoiser" \
           "runs/ddpm_r4/$name/checkpoints/phema_sr0.05" "runs/ddpm_r4/$name/checkpoints/phema_sr0.1" \
    "${EVAL[@]}" --steps 50 --guidance 1.5 model.model_channels=64 "$@"
  } > "/tmp/r4_arm_$name.log" 2>&1
}

tail_arm fixed_linear diffuser.extra_args.schedule=linear

tail_arm hybrid_linear diffuser.extra_args.schedule=linear \
  model.out_channels=6 \
  "diffuser.extra_args.sampler_parameters={var_type: learned_range}"

# ---- 7. EDM augmentation arm (~40 min; item 2) ----------------------------
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

# ---- 8. GRPO best-guess arm (killable tail; item 6) -----------------------
# lr 3x round-3, full-chain credit assignment; the per-epoch JSONL learning
# curve + clip_frac/ratio_dev diagnostics are the deliverable even if cut.
python examples/train_grpo.py --config-name train_grpo_alignment --luma-judge \
  dataset.train._target_=diffulab_tpu.data.imagenet.ImageNetmultiAR \
  dataset.val._target_=diffulab_tpu.data.imagenet.ImageNetmultiAR \
  dataset.train.data_path=data/imagenet_txt dataset.val.data_path=data/imagenet_txt \
  model.inner_dim=256 model.num_heads=4 model.depth=6 \
  vision_tower.base_channels=32 "vision_tower.ch_mult=[1, 2]" \
  vision_tower.num_res_blocks=1 vision_tower.latent_channels=32 \
  grpo.n_image_per_prompt=8 reward.n_image_per_prompt=8 \
  "grpo.image_resolution=[64, 64]" grpo.guidance_scale=1.5 \
  diffuser.n_steps=8 dataloader.batch_size=8 \
  trainer.n_epoch=40 trainer.precision_type=no trainer.save_optimizer=false \
  trainer.save_path=runs/grpo_r4 optimizer.lr=3e-3 grpo.timestep_fraction=1.0 \
  trainer.project_name=luma_lr3e3_tf1 > /tmp/r4_grpo_lr3e3_tf1.log 2>&1

echo "QUEUE2B DONE"
