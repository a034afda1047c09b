#!/bin/bash
# Round-4 DDPM campaign evals: for each 2x2 (+min-SNR) arm, reconstruct the
# post-hoc EMA at the basin horizons measured on flow/EDM (sigma_rel
# 0.05/0.10), then score ema track + live weights + both reconstructions in
# ONE evaluate_fid process per arm (shared compile + cached features).
# Protocol matches rounds 2/3: DDIM-50 (respaced from 1000), CFG 1.5,
# 2000 samples. Eval-side config overrides must mirror each arm's
# TRAINING overrides that affect sampling (schedule tables, learned-range
# variance head out_channels).
set -x
cd /root/repo

eval_arm () {
  local run_dir="$1"; shift
  python examples/reconstruct_ema.py --run-dir "$run_dir" --sigma-rel 0.05 0.1
  python examples/evaluate_fid.py --config-name train_synthetic_ddpm \
    --ckpt "$run_dir/checkpoints/ema" "$run_dir/checkpoints/denoiser" \
           "$run_dir/checkpoints/phema_sr0.05" "$run_dir/checkpoints/phema_sr0.1" \
    --n-samples 2000 --batch-size 200 --steps 50 --guidance 1.5 \
    model.model_channels=64 "$@"
}

eval_arm "runs/ddpm_r4/fixed/diffuser.extra_args.schedule=linear" \
  diffuser.extra_args.schedule=linear

eval_arm "runs/ddpm_r4/fixed/diffuser.extra_args.schedule=cosine" \
  diffuser.extra_args.schedule=cosine

eval_arm "runs/ddpm_r4/hybrid/diffuser.extra_args.schedule=linear" \
  diffuser.extra_args.schedule=linear model.out_channels=6 \
  "diffuser.extra_args.sampler_parameters={var_type: learned_range}"

eval_arm "runs/ddpm_r4/hybrid/diffuser.extra_args.schedule=cosine" \
  diffuser.extra_args.schedule=cosine model.out_channels=6 \
  "diffuser.extra_args.sampler_parameters={var_type: learned_range}"

eval_arm "runs/ddpm_r4/minsnr"

echo "DDPM EVAL DONE"
