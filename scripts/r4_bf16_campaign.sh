#!/bin/bash
# Round-4 bf16 verdict campaign (VERDICT item 4): remove the EMA confound
# from the bf16-vs-fp32 quality question and test the scale interaction.
#   arm 1: 58M flow bf16 (the round-2 "21.05 vs 17.6-18.2" comparison redone
#          under post-hoc EMA horizon selection; fp32 control = flow_fp32_r4,
#          sr0.05 FID 1.01)
#   arms 2+3: 2.3x-larger DiT (768/12, ~130M) fp32 vs bf16 at the same
#          12-epoch budget — does the bf16 floor close with model scale?
# All evals: 2000 samples, CFG 1.5, Euler-50, post-hoc sigma_rel sweep.
set -x
cd /root/repo

CPU=(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)
SCALE=(model.inner_dim=768 model.embedding_dim=768 model.num_heads=12 model.depth=12)
EVAL=(--n-samples 2000 --batch-size 200 --guidance 1.5)

run_flow () {
  local name="$1"; shift
  python examples/train_diffusion.py --config-name train_synthetic_flow_matching \
    trainer.save_path=runs/bf16_r4 trainer.save_optimizer=false \
    trainer.project_name="$name" "$@" > "/tmp/r4_train_$name.log" 2>&1
  "${CPU[@]}" python examples/reconstruct_ema.py --run-dir "runs/bf16_r4/$name" \
    --sigma-rel 0.02 0.05 0.1
}

# arm 1: 58M bf16
run_flow flow58_bf16 trainer.precision_type=bf16
python examples/evaluate_fid.py --config-name train_synthetic_flow_matching \
  --ckpt runs/bf16_r4/flow58_bf16/checkpoints/denoiser \
         runs/bf16_r4/flow58_bf16/checkpoints/phema_sr0.02 \
         runs/bf16_r4/flow58_bf16/checkpoints/phema_sr0.05 \
         runs/bf16_r4/flow58_bf16/checkpoints/phema_sr0.1 \
  "${EVAL[@]}"

# arm 2: 130M fp32
run_flow flow768_fp32 "${SCALE[@]}"
python examples/evaluate_fid.py --config-name train_synthetic_flow_matching \
  --ckpt runs/bf16_r4/flow768_fp32/checkpoints/denoiser \
         runs/bf16_r4/flow768_fp32/checkpoints/phema_sr0.02 \
         runs/bf16_r4/flow768_fp32/checkpoints/phema_sr0.05 \
         runs/bf16_r4/flow768_fp32/checkpoints/phema_sr0.1 \
  "${EVAL[@]}" "${SCALE[@]}"

# arm 3: 130M bf16
run_flow flow768_bf16 "${SCALE[@]}" trainer.precision_type=bf16
python examples/evaluate_fid.py --config-name train_synthetic_flow_matching \
  --ckpt runs/bf16_r4/flow768_bf16/checkpoints/denoiser \
         runs/bf16_r4/flow768_bf16/checkpoints/phema_sr0.02 \
         runs/bf16_r4/flow768_bf16/checkpoints/phema_sr0.05 \
         runs/bf16_r4/flow768_bf16/checkpoints/phema_sr0.1 \
  "${EVAL[@]}" "${SCALE[@]}"

echo "BF16 CAMPAIGN DONE"
