#!/bin/bash
# Round-5 chip queue, stage 1 (VERDICT r4 items 3 + 5):
#   1. EDM clean-bf16 arm  — the EDM half of the bf16 2x2 that round 4 left
#      "not run for time". EDM is the formalization whose lambda(sigma) loss
#      weights originally flagged bf16 (round 2: 22.89 vs 4.24, later shown
#      EMA-confounded); comparison targets are the recorded clean-protocol
#      fp32 numbers (BASELINE.md: edm_fp32_r3 phema_sr0.05 = 0.82).
#   2. EDM full-cast arm   — completes the formalization x cast square the
#      bench flip rests on.
#   3. profile_copies      — names the residual ~8 ms copies/reshapes in the
#      bench step (queued in r4_queue5, never landed).
# Serial on purpose — the relay wedges under two concurrent TPU processes.
set -x
cd /root/repo

CPU=(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)
EVAL=(--n-samples 2000 --batch-size 200 --guidance 1.5)
CAST=(trainer.precision_type=bf16 model.stable_conditioning=false model.stream_dtype=bfloat16)

arm () {
  local config="$1" name="$2"; shift 2
  {
  python examples/train_diffusion.py --config-name "$config" \
    trainer.save_path=runs/r5 trainer.save_optimizer=false \
    trainer.posthoc_ema=true trainer.project_name="$name" "$@"
  "${CPU[@]}" python examples/reconstruct_ema.py --run-dir "runs/r5/$name" \
    --sigma-rel 0.02 0.05 0.1
  # eval stays fp32 (house protocol: fp32 sampling in all evals) — the
  # precision overrides are train-time only and none of them change shapes
  python examples/evaluate_fid.py --config-name "$config" \
    --ckpt "runs/r5/$name/checkpoints/denoiser" \
           "runs/r5/$name/checkpoints/phema_sr0.02" \
           "runs/r5/$name/checkpoints/phema_sr0.05" \
           "runs/r5/$name/checkpoints/phema_sr0.1" \
    "${EVAL[@]}"
  } > "/tmp/r5_arm_$name.log" 2>&1
}

# ---- 1. EDM clean bf16 (default mixed-precision policy) --------------------
arm train_synthetic_edm edm58_bf16 trainer.precision_type=bf16

# ---- 2. EDM full-cast -------------------------------------------------------
arm train_synthetic_edm edm58_bf16_cast "${CAST[@]}"

# ---- 3. copies/reshapes profile at bench shapes -----------------------------
timeout 1800 python scripts/profile_copies.py > /tmp/r5_profile_copies.log 2>&1

echo "QUEUE1 DONE"
