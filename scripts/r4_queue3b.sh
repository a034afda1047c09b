#!/bin/bash
# Round-4 chip queue, stage 3b — the remaining r4_queue3.sh phases (3-6),
# relaunched after injecting scripts/ab_stable_dtype.py at the phase-2/3
# boundary (waits for that probe's pid below). Same serial discipline.
set -x
cd /root/repo

CPU=(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)
EVAL=(--n-samples 2000 --batch-size 200)

if [ -f /tmp/r4_ab_stable.pid ]; then
  while kill -0 "$(cat /tmp/r4_ab_stable.pid)" 2>/dev/null; do sleep 10; done
fi

# ---- 3. full-bf16 flow arm: stream bf16 under bf16 compute -----------------
# If quality holds (vs flow58_bf16's 0.980 and fp32's 1.01), the fp32-stream
# protection is unnecessary and its train-step cost can be reclaimed.
{
python examples/train_diffusion.py --config-name train_synthetic_flow_matching \
  trainer.save_path=runs/bf16_r4 trainer.save_optimizer=false \
  trainer.project_name=flow58_bf16_full trainer.precision_type=bf16 \
  model.stream_dtype=bfloat16
"${CPU[@]}" python examples/reconstruct_ema.py \
  --run-dir runs/bf16_r4/flow58_bf16_full --sigma-rel 0.02 0.05 0.1
python examples/evaluate_fid.py --config-name train_synthetic_flow_matching \
  --ckpt runs/bf16_r4/flow58_bf16_full/checkpoints/denoiser \
         runs/bf16_r4/flow58_bf16_full/checkpoints/phema_sr0.02 \
         runs/bf16_r4/flow58_bf16_full/checkpoints/phema_sr0.05 \
         runs/bf16_r4/flow58_bf16_full/checkpoints/phema_sr0.1 \
  "${EVAL[@]}" --guidance 1.5
} > /tmp/r4_bf16_full.log 2>&1

# ---- 4. GRPO lr-3e-3 / full-chain arm (item 6) — bounded at 90 min ---------
timeout 5400 python examples/train_grpo.py --config-name train_grpo_alignment --luma-judge \
  dataset.train._target_=diffulab_tpu.data.imagenet.ImageNetmultiAR \
  dataset.val._target_=diffulab_tpu.data.imagenet.ImageNetmultiAR \
  dataset.train.data_path=data/imagenet_txt dataset.val.data_path=data/imagenet_txt \
  model.inner_dim=256 model.num_heads=4 model.depth=6 \
  vision_tower.base_channels=32 "vision_tower.ch_mult=[1, 2]" \
  vision_tower.num_res_blocks=1 vision_tower.latent_channels=32 \
  grpo.n_image_per_prompt=8 reward.n_image_per_prompt=8 \
  "grpo.image_resolution=[64, 64]" grpo.guidance_scale=1.5 grpo.eps=0.1 \
  diffuser.n_steps=8 dataloader.batch_size=8 \
  trainer.n_epoch=40 trainer.precision_type=no trainer.save_optimizer=false \
  trainer.save_path=runs/grpo_r4 optimizer.lr=3e-3 grpo.timestep_fraction=1.0 \
  trainer.project_name=luma_lr3e3_tf1 > /tmp/r4_grpo_lr3e3_tf1.log 2>&1

# ---- 5. DDPM linear x hybrid (last 2x2 cell) --------------------------------
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
tail_arm hybrid_linear diffuser.extra_args.schedule=linear \
  model.out_channels=6 \
  "diffuser.extra_args.sampler_parameters={var_type: learned_range}"

# ---- 6. U-REPA pair: matched control + treatment (item 2 residue) -----------
# Self-contained A/B at configs/train_synthetic_ddpm_repa.yaml's own protocol
# (12 epochs, model_channels 96, cosine default) — the 2x2 arms above ran a
# different protocol so none of them is a valid control.
{
python examples/train_diffusion.py --config-name train_synthetic_ddpm \
  trainer.save_path=runs/r4 trainer.save_optimizer=false \
  trainer.posthoc_ema=true trainer.project_name=urepa_control
"${CPU[@]}" python examples/reconstruct_ema.py --run-dir runs/r4/urepa_control \
  --sigma-rel 0.05 0.1
python examples/train_diffusion.py --config-name train_synthetic_ddpm_repa \
  trainer.save_path=runs/r4 trainer.save_optimizer=false \
  trainer.posthoc_ema=true trainer.project_name=urepa_treat
"${CPU[@]}" python examples/reconstruct_ema.py --run-dir runs/r4/urepa_treat \
  --sigma-rel 0.05 0.1
python examples/evaluate_fid.py --config-name train_synthetic_ddpm \
  --ckpt runs/r4/urepa_control/checkpoints/denoiser \
         runs/r4/urepa_control/checkpoints/phema_sr0.05 \
         runs/r4/urepa_control/checkpoints/phema_sr0.1 \
  "${EVAL[@]}" --steps 50 --guidance 1.5
python examples/evaluate_fid.py --config-name train_synthetic_ddpm_repa \
  --ckpt runs/r4/urepa_treat/checkpoints/denoiser \
         runs/r4/urepa_treat/checkpoints/phema_sr0.05 \
         runs/r4/urepa_treat/checkpoints/phema_sr0.1 \
  "${EVAL[@]}" --steps 50 --guidance 1.5
} > /tmp/r4_urepa.log 2>&1

echo "QUEUE3 DONE"
