#!/bin/bash
# Round-5 chip queue, stage 2b: the RERUN of the headline trio after the
# normalize_to_pm1 fix (f677a47). The first stage-2 pass trained MMDiT on
# latents encoded from corrupted images (negative half crushed — tower gate
# mse 0.126 / judge 8%); after the fix the same tower gates at mse 0.00149 /
# PSNR 34.3 dB / judge-all 0.734. The tower checkpoint itself was trained on
# the raw encoder path and is reused — only the shards are rebuilt.
# Budget: 12 epochs x 156 updates per arm (house protocol), eval 4 ckpts x
# 2000 samples at guidance 1.5.
# Serial on purpose — the relay wedges under two concurrent TPU processes.
set -x
cd /root/repo

CPU=(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)

# ---- 0. rebuild the latent shards through the fixed encode path -------------
python scripts/build_hard_txt2img.py --phase shards --out data/hard_txt2img \
  > /tmp/r5_shards_rebuild.log 2>&1

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

echo "QUEUE2B DONE"
