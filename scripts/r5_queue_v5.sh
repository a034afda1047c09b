#!/bin/bash
# Round-5 chip queue, v5 — final. Differences vs v4:
#   - the relay wedges for 10-20 min after EVERY client exit (three times
#     tonight); a 150 s probe timeout converts that into failed-probe/sleep
#     cycles with 5-minute granularity. v5 probes with a 600 s timeout and a
#     60 s retry, so recovery is caught the moment the relay releases.
#   - the MMDiT arm is RE-EVALUATED first: the clamp_x bug (latents clipped
#     at +-1 before decode, fixed in 4006201) polluted its first eval; all
#     trio rows must come from the fixed code path.
#   - value order under the remaining clock: sprint train -> mmdit re-eval ->
#     sprint eval -> guidance control + sweep -> ddt (guarded) -> features
#     (only with headroom).
# Serial on purpose — the relay wedges under two concurrent TPU processes.
set -x
cd /root/repo

echo $$ > /tmp/r5_final.pid
CPU=(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)
GUARD_DDT=${GUARD_DDT:-0135}       # HHMM UTC: last moment to start the DDT arm
stamp () { echo "=== $1 @ $(date -u +%H:%M:%S) ===" >> /tmp/r5_final_timeline.log; }
before () { [ "$(date -u +%H%M)" -lt "$1" ] || [ "$(date -u +%H%M)" -gt 2000 ]; }

wait_chip () {
  local tries=0
  # short probe + long idle: the relay seems to need CLIENT-FREE time to
  # release after an exit — a long-held hanging probe starves it (observed
  # 00:05-00:30: 600 s probes kept it wedged past both prior drain times)
  until timeout 150 python /tmp/probe_chip.py >> /tmp/r5_probe.log 2>&1; do
    tries=$((tries + 1))
    stamp "chip wedged (probe $tries failed)"
    if [ "$tries" -ge 10 ]; then stamp "chip GIVEN UP after $tries probes"; return 1; fi
    sleep 240
  done
  return 0
}

eval_arm () {
  local config="$1" name="$2"
  wait_chip
  timeout 1800 python examples/evaluate_txt2img.py --config-name "$config" \
    --ckpt "runs/r5/$name/checkpoints/ema" \
           "runs/r5/$name/checkpoints/denoiser" \
           "runs/r5/$name/checkpoints/phema_sr0.05" \
    --n-samples 1000 --batch-size 100 --guidance 1.5 \
    >> "/tmp/r5_arm_$name.log" 2>&1
}

train_arm () {
  local config="$1" name="$2"
  wait_chip || return 1
  {
  rm -rf "runs/r5/$name"
  timeout 3300 python examples/train_repa_txt_to_img.py --config-name "$config" \
    trainer.save_path=runs/r5 trainer.log_validation_images=false \
    trainer.n_epoch=6
  "${CPU[@]}" python examples/reconstruct_ema.py --run-dir "runs/r5/$name" \
    --sigma-rel 0.05
  } >> "/tmp/r5_arm_$name.log" 2>&1
}

# ---- 1. sprint train (+CPU recon inside) ------------------------------------
stamp "v5 sprint train start"
train_arm train_hard_txt2img_sprint hard_txt2img_sprint
stamp "sprint trained"

# ---- 2. mmdit re-eval with the clamp fix ------------------------------------
echo "=== re-eval with clamp fix (4006201) ===" >> /tmp/r5_arm_hard_txt2img_mmdit.log
eval_arm train_hard_txt2img_mmdit hard_txt2img_mmdit
stamp "mmdit re-eval done"

# ---- 3. sprint eval ---------------------------------------------------------
eval_arm train_hard_txt2img_sprint hard_txt2img_sprint
stamp "sprint eval done"

# ---- 4. guidance-binding control (6 epochs) + CFG sweep ---------------------
RUN=runs/r5/synthetic_hard_flow
wait_chip
{
rm -rf "$RUN"
timeout 3300 python examples/train_diffusion.py --config-name train_synthetic_hard_flow \
  trainer.save_path=runs/r5 trainer.n_epoch=6
"${CPU[@]}" python examples/reconstruct_ema.py --run-dir "$RUN" \
  --sigma-rel 0.05 --t-out 156
mv "$RUN/checkpoints/phema_sr0.05" "$RUN/checkpoints/phema_sr0.05_ep2"
"${CPU[@]}" python examples/reconstruct_ema.py --run-dir "$RUN" \
  --sigma-rel 0.05
} > /tmp/r5_hard_control_train.log 2>&1
stamp "C control trained"

wait_chip
timeout 2400 python examples/evaluate_fid.py --config-name train_synthetic_hard_flow \
  --ckpt "$RUN/checkpoints/phema_sr0.05" \
  --n-samples 1000 --batch-size 200 --guidance 0.0,1.0,1.5,2.0,3.0 \
  > /tmp/r5_hard_cfg_sweep.log 2>&1
stamp "C sweep done"

# ---- 5. DDT arm (clock-guarded) ---------------------------------------------
if before "$GUARD_DDT"; then
  stamp "ddt start"
  train_arm train_hard_txt2img_ddt hard_txt2img_ddt
  eval_arm train_hard_txt2img_ddt hard_txt2img_ddt
  stamp "ddt done"
else
  stamp "ddt SKIPPED (past $GUARD_DDT)"
fi

# ---- 6. autoguidance on the hard control (cheapest feature arm) -------------
if before 0205; then
  wait_chip
  timeout 1200 python examples/evaluate_fid.py --config-name train_synthetic_hard_flow \
    --n-samples 1000 --batch-size 200 --ckpt "$RUN/checkpoints/phema_sr0.05" \
    --guidance 1.5 --guide-ckpt "$RUN/checkpoints/phema_sr0.05_ep2" \
    > /tmp/r5_hard_autoguide_g1.5.log 2>&1
  stamp "autoguide done"
fi

echo "QUEUE V5 DONE"
