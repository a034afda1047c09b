#!/bin/bash
# Round-5 consolidated chip queue (fresh machine — runs/ and data/ from the
# earlier round-5 session are gone; BASELINE.md carries the harvested results
# that DID land: EDM bf16 square, copies attribution, tower postmortem).
# Re-runs, serially, the two VERDICT items still without data:
#   A. hard-txt2img benchmark build (tower 30 ep + gate + shards)
#   B. the headline trio (MMDiT / Sprint / DDT, 12 ep, 1000-sample 3-ckpt evals)
#   C. guidance-binding control + CFG sweep (queue3a protocol)
#   D. gated guidance feature arms (queue3b protocol)
# Stage E (GRPO trust-region on-chip arm, 75 min) is launched separately only
# if wall-clock remains — see scripts/r5_queue4.sh.
# Serial on purpose — the relay wedges under two concurrent TPU processes.
set -x
cd /root/repo

echo $$ > /tmp/r5_final.pid
CPU=(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)

stamp () { echo "=== $1 @ $(date -u +%H:%M:%S) ===" >> /tmp/r5_final_timeline.log; }

# ---- A. benchmark build -----------------------------------------------------
stamp "A build start"
python scripts/build_hard_txt2img.py --phase all --out data/hard_txt2img \
  --epochs 30 > /tmp/r5_tower_build.log 2>&1
stamp "A build done"

eval_arm () {
  local config="$1" name="$2"
  python examples/evaluate_txt2img.py --config-name "$config" \
    --ckpt "runs/r5/$name/checkpoints/ema" \
           "runs/r5/$name/checkpoints/denoiser" \
           "runs/r5/$name/checkpoints/phema_sr0.05" \
    --n-samples 1000 --batch-size 100 --guidance 1.5
}

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

# ---- B. the trio ------------------------------------------------------------
stamp "B mmdit start";  arm train_hard_txt2img_mmdit hard_txt2img_mmdit
stamp "B sprint start"; arm train_hard_txt2img_sprint hard_txt2img_sprint
stamp "B ddt start";    arm train_hard_txt2img_ddt hard_txt2img_ddt
stamp "B done"

# ---- C. guidance-binding control (queue3a) ----------------------------------
RUN=runs/r5/synthetic_hard_flow
{
python examples/train_diffusion.py --config-name train_synthetic_hard_flow \
  trainer.save_path=runs/r5
# epoch-4 sibling first (mv before the full-horizon recon overwrites the dir)
"${CPU[@]}" python examples/reconstruct_ema.py --run-dir "$RUN" \
  --sigma-rel 0.05 --t-out 312
mv "$RUN/checkpoints/phema_sr0.05" "$RUN/checkpoints/phema_sr0.05_ep4"
"${CPU[@]}" python examples/reconstruct_ema.py --run-dir "$RUN" \
  --sigma-rel 0.05 0.1
} > /tmp/r5_hard_control_train.log 2>&1
stamp "C control trained"

for g in 0.0 1.0 1.5 2.0 3.0; do
  python examples/evaluate_fid.py --config-name train_synthetic_hard_flow \
    --ckpt "$RUN/checkpoints/phema_sr0.05" \
    --n-samples 1000 --batch-size 200 --guidance "$g" \
    > "/tmp/r5_hard_cfg_g$g.log" 2>&1
done
stamp "C sweep done"
python examples/evaluate_fid.py --config-name train_synthetic_hard_flow \
  --ckpt "$RUN/checkpoints/denoiser" "$RUN/checkpoints/ema" "$RUN/checkpoints/phema_sr0.1" \
  --n-samples 1000 --batch-size 200 --guidance 1.5 \
  > /tmp/r5_hard_cfg_triple.log 2>&1
stamp "C triple done"

# ---- D. gated feature arms (queue3b logic inline) ---------------------------
HARD=(--config-name train_synthetic_hard_flow --n-samples 1000 --batch-size 200)
CK="$RUN/checkpoints/phema_sr0.05"
g0=$(grep -h "FID(val, model samples)" /tmp/r5_hard_cfg_g0.0.log | awk '{print $5}')
best_g="" ; best_fid=""
for g in 1.0 1.5 2.0 3.0; do
  f=$(grep -h "FID(val, model samples)" "/tmp/r5_hard_cfg_g$g.log" | awk '{print $5}')
  [ -z "$f" ] && continue
  if [ -z "$best_fid" ] || python -c "exit(0 if $f < $best_fid else 1)"; then
    best_fid="$f"; best_g="$g"
  fi
done
echo "GATE: g0=$g0 best_g=$best_g best_fid=$best_fid" | tee /tmp/r5_queue3b_gate.log
if [ -z "$g0" ] || [ -z "$best_fid" ] || ! python -c "exit(0 if $best_fid < $g0 else 1)"; then
  echo "GATE FAILED: guidance does not bind on the hard control" | tee -a /tmp/r5_queue3b_gate.log
  python examples/evaluate_fid.py "${HARD[@]}" --ckpt "$CK" --guidance 1.5 \
    --guide-ckpt "$RUN/checkpoints/phema_sr0.05_ep4" \
    > /tmp/r5_hard_autoguide_g1.5.log 2>&1
  stamp "D done (gated out)"
  echo "QUEUE FINAL DONE (gated)"
  exit 0
fi

python examples/evaluate_fid.py "${HARD[@]}" --ckpt "$CK" --guidance "$best_g" \
  "diffuser.extra_args.guidance_interval=[0.05, 0.75]" \
  > /tmp/r5_hard_interval_gbest.log 2>&1
python examples/evaluate_fid.py "${HARD[@]}" --ckpt "$CK" --guidance 3.0 \
  "diffuser.extra_args.guidance_interval=[0.05, 0.75]" \
  > /tmp/r5_hard_interval_g3.log 2>&1
python examples/evaluate_fid.py "${HARD[@]}" --ckpt "$CK" --guidance 3.0 \
  diffuser.extra_args.guidance_rescale=0.7 \
  > /tmp/r5_hard_rescale_g3.log 2>&1
stamp "D interval+rescale done"
python examples/evaluate_fid.py "${HARD[@]}" --ckpt "$CK" --guidance 1.5 \
  --guide-ckpt "$RUN/checkpoints/phema_sr0.05_ep4" \
  > /tmp/r5_hard_autoguide_g1.5.log 2>&1
stamp "D autoguide done"

{
python examples/train_diffusion.py --config-name train_synthetic_hard_flow \
  trainer.save_path=runs/r5 trainer.project_name=synthetic_hard_distill \
  trainer.n_epoch=6 trainer.posthoc_ema=false trainer.use_ema=true \
  trainer.ema_rate=0.99 trainer.p_classifier_free_guidance=0.0 \
  "trainer.distill_from=$CK" "trainer.distill_guidance=$best_g" \
  optimizer.lr=1e-4
python examples/evaluate_fid.py "${HARD[@]}" \
  --ckpt runs/r5/synthetic_hard_distill/checkpoints/ema \
         runs/r5/synthetic_hard_distill/checkpoints/denoiser \
  --guidance 0.0
} > /tmp/r5_hard_distill.log 2>&1
stamp "D distill done"

echo "QUEUE FINAL DONE"
