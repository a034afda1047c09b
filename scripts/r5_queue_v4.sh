#!/bin/bash
# Round-5 chip queue, v4 — final schedule after the v2 timeout bug.
# v2's `timeout 2700` killed the MMDiT arm at 45 min — exactly epoch 6 of 12
# — and v3's takeover then reconstructed + evaluated that 6-epoch state. The
# remaining round budget (~2.3 h) cannot fit 12-epoch arms, so the trio
# protocol is pinned at SIX epochs x 156 updates for every arm (equal budget,
# internally cross-comparable; the MMDiT rows already measured ARE this
# protocol). Then the guidance-binding control trains 6 epochs and the CFG
# sweep runs as one process. Feature arms and distillation only if the clock
# allows; otherwise recorded honestly.
# Serial on purpose — the relay wedges under two concurrent TPU processes.
set -x
cd /root/repo

echo $$ > /tmp/r5_final.pid
CPU=(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)
GUARD_FEATURES=${GUARD_FEATURES:-0205}   # HHMM UTC
stamp () { echo "=== $1 @ $(date -u +%H:%M:%S) ===" >> /tmp/r5_final_timeline.log; }
before () { [ "$(date -u +%H%M)" -lt "$1" ] || [ "$(date -u +%H%M)" -gt 2000 ]; }

wait_chip () {
  local tries=0
  until timeout 150 python /tmp/probe_chip.py >> /tmp/r5_probe.log 2>&1; do
    tries=$((tries + 1))
    stamp "chip wedged (probe $tries failed), drain-waiting"
    if [ "$tries" -ge 8 ]; then stamp "chip GIVEN UP after $tries probes"; return 1; fi
    sleep 300
  done
  return 0
}

eval_arm () {
  local config="$1" name="$2"
  timeout 1800 python examples/evaluate_txt2img.py --config-name "$config" \
    --ckpt "runs/r5/$name/checkpoints/ema" \
           "runs/r5/$name/checkpoints/denoiser" \
           "runs/r5/$name/checkpoints/phema_sr0.05" \
    --n-samples 1000 --batch-size 100 --guidance 1.5
}

arm () {  # 6-epoch protocol arm: train + recon + eval
  local config="$1" name="$2"
  wait_chip || return 1
  {
  rm -rf "runs/r5/$name"
  timeout 3300 python examples/train_repa_txt_to_img.py --config-name "$config" \
    trainer.save_path=runs/r5 trainer.log_validation_images=false \
    trainer.n_epoch=6
  "${CPU[@]}" python examples/reconstruct_ema.py --run-dir "runs/r5/$name" \
    --sigma-rel 0.05
  wait_chip && eval_arm "$config" "$name"
  } >> "/tmp/r5_arm_$name.log" 2>&1
}

# ---- 0. wait for the in-flight MMDiT eval -----------------------------------
if [ -n "$MMDIT_EVAL_PID" ]; then
  while kill -0 "$MMDIT_EVAL_PID" 2>/dev/null; do sleep 20; done
fi
stamp "v4: mmdit eval finished"

# ---- 1-2. sprint + ddt at the 6-epoch protocol ------------------------------
stamp "sprint start"; arm train_hard_txt2img_sprint hard_txt2img_sprint; stamp "sprint done"
stamp "ddt start";    arm train_hard_txt2img_ddt hard_txt2img_ddt;       stamp "ddt done"

# ---- 3. guidance-binding control (6 epochs) + CFG sweep ---------------------
RUN=runs/r5/synthetic_hard_flow
wait_chip
{
rm -rf "$RUN"
timeout 3300 python examples/train_diffusion.py --config-name train_synthetic_hard_flow \
  trainer.save_path=runs/r5 trainer.n_epoch=6
# epoch-2 sibling for autoguidance (t_out=156: same 1/3-horizon degradation
# ratio as the 12-epoch plan's epoch-4 sibling), saved aside before the
# full-horizon recon overwrites the dir
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

# ---- 4. gated feature arms (only with clock headroom) -----------------------
HARD=(--config-name train_synthetic_hard_flow --n-samples 1000 --batch-size 200)
CK="$RUN/checkpoints/phema_sr0.05"
read -r g0 best_g best_fid <<< "$(python - <<'EOF'
import json
rows = []
for line in open("/tmp/r5_hard_cfg_sweep.log"):
    if line.startswith('{"metric": "fid_synthetic"'):
        r = json.loads(line)
        rows.append((r.get("guidance", 0.0), r["value"]))
g0 = next((f for g, f in rows if g == 0.0), None)
guided = [(g, f) for g, f in rows if g > 0]
if g0 is None or not guided:
    print("nan nan nan")
else:
    bg, bf = min(guided, key=lambda t: t[1])
    print(f"{g0} {bg:g} {bf}")
EOF
)"
echo "GATE: g0=$g0 best_g=$best_g best_fid=$best_fid" | tee /tmp/r5_queue3b_gate.log
if [ "$g0" = "nan" ] || ! python -c "exit(0 if $best_fid < $g0 else 1)" 2>/dev/null; then
  echo "GATE FAILED: guidance does not bind on the hard control" | tee -a /tmp/r5_queue3b_gate.log
  if before "$GUARD_FEATURES"; then
    wait_chip
    timeout 1200 python examples/evaluate_fid.py "${HARD[@]}" --ckpt "$CK" --guidance 1.5 \
      --guide-ckpt "$RUN/checkpoints/phema_sr0.05_ep2" \
      > /tmp/r5_hard_autoguide_g1.5.log 2>&1
  fi
  stamp "feature arms gated out"
  echo "QUEUE V4 DONE (gated)"
  exit 0
fi

if before "$GUARD_FEATURES"; then
  wait_chip
  timeout 1200 python examples/evaluate_fid.py "${HARD[@]}" --ckpt "$CK" --guidance "$best_g" \
    "diffuser.extra_args.guidance_interval=[0.05, 0.75]" \
    > /tmp/r5_hard_interval_gbest.log 2>&1
  timeout 1200 python examples/evaluate_fid.py "${HARD[@]}" --ckpt "$CK" --guidance 3.0 \
    diffuser.extra_args.guidance_rescale=0.7 \
    > /tmp/r5_hard_rescale_g3.log 2>&1
  timeout 1200 python examples/evaluate_fid.py "${HARD[@]}" --ckpt "$CK" --guidance 1.5 \
    --guide-ckpt "$RUN/checkpoints/phema_sr0.05_ep2" \
    > /tmp/r5_hard_autoguide_g1.5.log 2>&1
  stamp "feature arms done"
else
  stamp "feature arms SKIPPED (past $GUARD_FEATURES)"
fi

echo "QUEUE V4 DONE"
