#!/bin/bash
# Round-5 chip queue, stage 2 (VERDICT r4 item 1 — the headline item):
# quality numbers for the production latent txt2img path.
#   0. build the benchmark: train the shrunk flux2 tower on the compositional
#      scenes (30 epochs), gate-check it (judge on recons), write latent
#      shards + null embedding;
#   1-3. train MMDiT / SprintDiT / DDT at one equal budget (20 epochs x 156
#      updates, bf16, posthoc_ema), reconstruct post-hoc EMAs offline, and
#      score each with evaluate_txt2img (FID/KID/P-R + caption consistency)
#      on (ema track, live, phema 0.05, phema 0.1).
# Serial on purpose — the relay wedges under two concurrent TPU processes.
set -x
cd /root/repo

CPU=(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)

if [ -f /tmp/r5_queue1.pid ]; then
  while kill -0 "$(cat /tmp/r5_queue1.pid)" 2>/dev/null; do sleep 20; done
fi

# ---- 0. benchmark build (tower + shards) ------------------------------------
python scripts/build_hard_txt2img.py --phase all --out data/hard_txt2img \
  --epochs 30 > /tmp/r5_tower_build.log 2>&1

arm () {
  local config="$1" name="$2"; shift 2
  {
  python examples/train_repa_txt_to_img.py --config-name "$config" \
    trainer.save_path=runs/r5 trainer.log_validation_images=false "$@"
  "${CPU[@]}" python examples/reconstruct_ema.py --run-dir "runs/r5/$name" \
    --sigma-rel 0.05 0.1
  python examples/evaluate_txt2img.py --config-name "$config" \
    --ckpt "runs/r5/$name/checkpoints/ema" \
           "runs/r5/$name/checkpoints/denoiser" \
           "runs/r5/$name/checkpoints/phema_sr0.05" \
           "runs/r5/$name/checkpoints/phema_sr0.1" \
    --n-samples 2000 --batch-size 100 --guidance 1.5 "$@"
  } > "/tmp/r5_arm_$name.log" 2>&1
}

arm train_hard_txt2img_mmdit hard_txt2img_mmdit
arm train_hard_txt2img_sprint hard_txt2img_sprint
arm train_hard_txt2img_ddt hard_txt2img_ddt

echo "QUEUE2 DONE"
