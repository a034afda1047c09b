#!/bin/bash
# Round-5 chip queue, stage 2c: resume after the ~75-min remote-compile
# outage (11:10-11:25; the terminal's compile service backed up behind the
# killed eval's in-flight compiles, then drained — BASELINE.md round-5
# infra note). The MMDiT arm already trained+reconstructed; evaluate it,
# then run the sprint/ddt arms. To fit the remaining chip budget all
# hard-benchmark evals drop to 1000 samples x 3 checkpoints (ema-track,
# live, phema_sr0.05 — sr0.05 was the optimal horizon on every 12-epoch
# recipe this repo has measured); one protocol for every row, so the trio
# stays cross-comparable.
# Serial on purpose — the relay wedges under two concurrent TPU processes.
set -x
cd /root/repo

CPU=(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)

eval_arm () {
  local config="$1" name="$2"
  python examples/evaluate_txt2img.py --config-name "$config" \
    --ckpt "runs/r5/$name/checkpoints/ema" \
           "runs/r5/$name/checkpoints/denoiser" \
           "runs/r5/$name/checkpoints/phema_sr0.05" \
    --n-samples 1000 --batch-size 100 --guidance 1.5
}

# ---- 1. mmdit: eval only (train + recon landed before the outage) -----------
eval_arm train_hard_txt2img_mmdit hard_txt2img_mmdit \
  >> /tmp/r5_arm_hard_txt2img_mmdit.log 2>&1

arm () {
  local config="$1" name="$2"
  {
  python examples/train_repa_txt_to_img.py --config-name "$config" \
    trainer.save_path=runs/r5 trainer.log_validation_images=false
  "${CPU[@]}" python examples/reconstruct_ema.py --run-dir "runs/r5/$name" \
    --sigma-rel 0.05
  eval_arm "$config" "$name"
  } > "/tmp/r5_arm_$name.log" 2>&1
}

arm train_hard_txt2img_sprint hard_txt2img_sprint
arm train_hard_txt2img_ddt hard_txt2img_ddt

echo "QUEUE2C DONE"
