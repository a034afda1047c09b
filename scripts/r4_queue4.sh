#!/bin/bash
# Round-4 chip queue, stage 4 — the precision-reclaim campaign. Waits for
# queue3b (GRPO lr3e3 arm + DDPM linear-x-hybrid + U-REPA pair) to release
# the chip, then measures the QUALITY side of the named bench-drift cause
# (the fp32 conditioning path, +6.5% step throughput when dropped — see
# BASELINE.md round-4 drift attribution):
#   1. flow full-cast arm  — stable_conditioning=false + stream bf16: if FID
#      holds vs flow58_bf16_full's 0.963 / fp32's 1.01, the whole-model cast
#      is quality-free and the bench model can flip to it.
#   2. EDM bf16 arm        — the formalization that flagged bf16 in round 2
#      (22.89 vs 4.24, later shown EMA-confounded) has no CLEAN bf16 number.
#   3. EDM full-cast arm   — completes the 2x2 (formalization x cast).
#   4. bench.py at HEAD    — current-policy number for the drift bookkeeping.
# Serial on purpose — the relay wedges under two concurrent TPU processes.
set -x
cd /root/repo

CPU=(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)
EVAL=(--n-samples 2000 --batch-size 200 --guidance 1.5)
CAST=(trainer.precision_type=bf16 model.stable_conditioning=false model.stream_dtype=bfloat16)

if [ -f /tmp/r4_queue3b.pid ]; then
  while kill -0 "$(cat /tmp/r4_queue3b.pid)" 2>/dev/null; do sleep 20; done
fi

arm () {
  local config="$1" name="$2"; shift 2
  {
  python examples/train_diffusion.py --config-name "$config" \
    trainer.save_path=runs/bf16_r4 trainer.save_optimizer=false \
    trainer.posthoc_ema=true trainer.project_name="$name" "$@"
  "${CPU[@]}" python examples/reconstruct_ema.py --run-dir "runs/bf16_r4/$name" \
    --sigma-rel 0.02 0.05 0.1
  # eval stays fp32 (house protocol: fp32 sampling in all evals) — the
  # precision overrides are train-time only and none of them change shapes
  python examples/evaluate_fid.py --config-name "$config" \
    --ckpt "runs/bf16_r4/$name/checkpoints/denoiser" \
           "runs/bf16_r4/$name/checkpoints/phema_sr0.02" \
           "runs/bf16_r4/$name/checkpoints/phema_sr0.05" \
           "runs/bf16_r4/$name/checkpoints/phema_sr0.1" \
    "${EVAL[@]}"
  } > "/tmp/r4_arm_$name.log" 2>&1
}

# ---- 1. flow full-cast (the bench-flip gate) -------------------------------
arm train_synthetic_flow_matching flow58_bf16_cast "${CAST[@]}"

# ---- 2. EDM clean bf16 (default mixed-precision policy) --------------------
arm train_synthetic_edm edm58_bf16 trainer.precision_type=bf16

# ---- 3. EDM full-cast ------------------------------------------------------
arm train_synthetic_edm edm58_bf16_cast "${CAST[@]}"

# ---- 4. bench at HEAD policy (drift bookkeeping) ---------------------------
python bench.py > /tmp/r4_bench_head.log 2>&1

echo "QUEUE4 DONE"
