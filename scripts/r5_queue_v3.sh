#!/bin/bash
# Round-5 chip queue, v3 — takeover of v2 with clock guards.
# Measured pace (tonight's chip): MMDiT hard-txt2img arm trains at ~4.7
# min/epoch -> ~60 min per 12-epoch arm + ~15 min eval. The full v2 plan
# (trio + control + sweep + 4 feature arms + distill) no longer fits the
# round, so v3 runs in VALUE order with wall-clock guards:
#   1. finish the in-flight MMDiT arm (recon + eval)
#   2. SprintDiT arm            (the "does 75% token drop cost quality" half)
#   3. guidance control + CFG sweep (the item-2 gate: does guidance bind?)
#   4. DDT arm                  (only if started before GUARD_DDT)
#   5. gated feature arms       (interval@best, rescale@3, autoguidance)
#   6. distillation             (only if started before GUARD_DISTILL)
# Anything skipped is recorded honestly in BASELINE.md.
# Serial on purpose — the relay wedges under two concurrent TPU processes.
set -x
cd /root/repo

echo $$ > /tmp/r5_final.pid
CPU=(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)
GUARD_DDT=${GUARD_DDT:-0120}        # HHMM UTC: last moment to start the DDT arm
GUARD_DISTILL=${GUARD_DISTILL:-0130}

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

finish_arm () {  # recon + eval only (training already done)
  local config="$1" name="$2"
  {
  "${CPU[@]}" python examples/reconstruct_ema.py --run-dir "runs/r5/$name" \
    --sigma-rel 0.05
  wait_chip && eval_arm "$config" "$name"
  } >> "/tmp/r5_arm_$name.log" 2>&1
}

arm () {
  local config="$1" name="$2"
  wait_chip || return 1
  {
  rm -rf "runs/r5/$name"
  timeout 3600 python examples/train_repa_txt_to_img.py --config-name "$config" \
    trainer.save_path=runs/r5 trainer.log_validation_images=false
  } > "/tmp/r5_arm_$name.log" 2>&1
  finish_arm "$config" "$name"
}

# ---- 1. finish the in-flight MMDiT arm --------------------------------------
if [ -f /tmp/r5_mmdit_train.pid ]; then
  while kill -0 "$(cat /tmp/r5_mmdit_train.pid)" 2>/dev/null; do sleep 30; done
fi
stamp "v3: mmdit train finished, recon+eval"
finish_arm train_hard_txt2img_mmdit hard_txt2img_mmdit
stamp "mmdit done"

# ---- 2. SprintDiT arm -------------------------------------------------------
stamp "sprint start"
arm train_hard_txt2img_sprint hard_txt2img_sprint
stamp "sprint done"

# ---- 3. guidance-binding control + CFG sweep --------------------------------
RUN=runs/r5/synthetic_hard_flow
wait_chip
{
rm -rf "$RUN"
timeout 3600 python examples/train_diffusion.py --config-name train_synthetic_hard_flow \
  trainer.save_path=runs/r5
# epoch-4 sibling first (mv before the full-horizon recon overwrites the dir)
"${CPU[@]}" python examples/reconstruct_ema.py --run-dir "$RUN" \
  --sigma-rel 0.05 --t-out 312
mv "$RUN/checkpoints/phema_sr0.05" "$RUN/checkpoints/phema_sr0.05_ep4"
"${CPU[@]}" python examples/reconstruct_ema.py --run-dir "$RUN" \
  --sigma-rel 0.05 0.1
} > /tmp/r5_hard_control_train.log 2>&1
stamp "C control trained"

wait_chip
timeout 2400 python examples/evaluate_fid.py --config-name train_synthetic_hard_flow \
  --ckpt "$RUN/checkpoints/phema_sr0.05" \
  --n-samples 1000 --batch-size 200 --guidance 0.0,1.0,1.5,2.0,3.0 \
  > /tmp/r5_hard_cfg_sweep.log 2>&1
stamp "C sweep done"

# ---- 4. DDT arm (clock-guarded) --------------------------------------------
if before "$GUARD_DDT"; then
  stamp "ddt start"
  arm train_hard_txt2img_ddt hard_txt2img_ddt
  stamp "ddt done"
else
  stamp "ddt SKIPPED (past $GUARD_DDT)"
fi

# ---- 5. gated feature arms --------------------------------------------------
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
  wait_chip
  timeout 1200 python examples/evaluate_fid.py "${HARD[@]}" --ckpt "$CK" --guidance 1.5 \
    --guide-ckpt "$RUN/checkpoints/phema_sr0.05_ep4" \
    > /tmp/r5_hard_autoguide_g1.5.log 2>&1
  stamp "feature arms gated out"
  echo "QUEUE V3 DONE (gated)"
  exit 0
fi

wait_chip
timeout 1200 python examples/evaluate_fid.py "${HARD[@]}" --ckpt "$CK" --guidance "$best_g" \
  "diffuser.extra_args.guidance_interval=[0.05, 0.75]" \
  > /tmp/r5_hard_interval_gbest.log 2>&1
timeout 1200 python examples/evaluate_fid.py "${HARD[@]}" --ckpt "$CK" --guidance 3.0 \
  diffuser.extra_args.guidance_rescale=0.7 \
  > /tmp/r5_hard_rescale_g3.log 2>&1
stamp "D interval+rescale done"
wait_chip
timeout 1200 python examples/evaluate_fid.py "${HARD[@]}" --ckpt "$CK" --guidance 1.5 \
  --guide-ckpt "$RUN/checkpoints/phema_sr0.05_ep4" \
  > /tmp/r5_hard_autoguide_g1.5.log 2>&1
stamp "D autoguide done"

# ---- 6. distillation (clock-guarded) ---------------------------------------
if before "$GUARD_DISTILL"; then
  wait_chip
  {
  rm -rf runs/r5/synthetic_hard_distill
  timeout 1800 python examples/train_diffusion.py --config-name train_synthetic_hard_flow \
    trainer.save_path=runs/r5 trainer.project_name=synthetic_hard_distill \
    trainer.n_epoch=6 trainer.posthoc_ema=false trainer.use_ema=true \
    trainer.ema_rate=0.99 trainer.p_classifier_free_guidance=0.0 \
    "trainer.distill_from=$CK" "trainer.distill_guidance=$best_g" \
    optimizer.lr=1e-4
  timeout 1200 python examples/evaluate_fid.py "${HARD[@]}" \
    --ckpt runs/r5/synthetic_hard_distill/checkpoints/ema \
           runs/r5/synthetic_hard_distill/checkpoints/denoiser \
    --guidance 0.0
  } > /tmp/r5_hard_distill.log 2>&1
  stamp "D distill done"
else
  stamp "distill SKIPPED (past $GUARD_DISTILL)"
fi

echo "QUEUE V3 DONE"
