#!/bin/bash
# Round-4 DDPM campaign evals: for each arm, reconstruct the post-hoc EMA at
# the basin horizons measured on flow/EDM (sigma_rel 0.05/0.10, CPU-forced —
# pure host averaging), then score ema track + live weights + both
# reconstructions in ONE evaluate_fid process per arm. Protocol matches
# rounds 2/3: DDIM-50 (respaced from 1000), CFG 1.5, 2000 samples.
# Eval-side config overrides must mirror each arm's TRAINING overrides that
# affect sampling (schedule tables, learned-range variance head out_channels).
set -x
cd /root/repo

# quick (~8 min) per-op floor probes first — their data decides whether a
# fused optimizer kernel is worth building later in the round
python scripts/mfu_floor_probes.py > /tmp/r4_mfu_probes.log 2>&1

CPU=(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)

eval_arm () {
  local run_dir="$1"; shift
  "${CPU[@]}" python examples/reconstruct_ema.py --run-dir "$run_dir" --sigma-rel 0.05 0.1
  python examples/evaluate_fid.py --config-name train_synthetic_ddpm \
    --ckpt "$run_dir/checkpoints/ema" "$run_dir/checkpoints/denoiser" \
           "$run_dir/checkpoints/phema_sr0.05" "$run_dir/checkpoints/phema_sr0.1" \
    --n-samples 2000 --batch-size 200 --steps 50 --guidance 1.5 \
    model.model_channels=64 "$@"
}

eval_arm "runs/ddpm_r4/fixed_cosine" diffuser.extra_args.schedule=cosine

eval_arm "runs/ddpm_r4/hybrid_cosine" \
  diffuser.extra_args.schedule=cosine model.out_channels=6 \
  "diffuser.extra_args.sampler_parameters={var_type: learned_range}"

eval_arm "runs/ddpm_r4/minsnr"

echo "DDPM EVAL DONE"
