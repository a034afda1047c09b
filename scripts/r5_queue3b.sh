#!/bin/bash
# Round-5 chip queue, stage 3b (VERDICT r4 item 2, second half): re-measure
# the guidance-shaping features where guidance binds. Gated on the stage-3a
# CFG sweep: proceed only if some g>0 beats g=0 on the hard control
# (otherwise the round-4 "doesn't transfer" caveat stands and we record that).
# Arms (all on the hard control's phema_sr0.05, 2000 samples / batch 200):
#   1. guidance interval [0.05, 0.75] at the best guided scale and at 3.0
#   2. guidance rescale 0.7 at 3.0
#   3. autoguidance: guide with the same run's epoch-4 post-hoc EMA sibling
#   4. guidance distillation: student trained against the guided teacher,
#      evaluated at guidance 0 (half per-step FLOPs)
# Serial on purpose — the relay wedges under two concurrent TPU processes.
set -x
cd /root/repo

CPU=(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)
RUN=runs/r5/synthetic_hard_flow
HARD=(--config-name train_synthetic_hard_flow --n-samples 1000 --batch-size 200)
CK="$RUN/checkpoints/phema_sr0.05"

if [ -f /tmp/r5_queue3a.pid ]; then
  while kill -0 "$(cat /tmp/r5_queue3a.pid)" 2>/dev/null; do sleep 20; done
fi

# ---- gate: does guidance bind on the hard control? --------------------------
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
  # still run autoguidance (a different mechanism — guide with a worse model,
  # not the unconditional branch) so the feature gets a hard-control verdict
  python examples/evaluate_fid.py "${HARD[@]}" --ckpt "$CK" --guidance 1.5 \
    --guide-ckpt "$RUN/checkpoints/phema_sr0.05_ep4" \
    > /tmp/r5_hard_autoguide_g1.5.log 2>&1
  echo "QUEUE3B DONE (gated)"
  exit 0
fi

# ---- 1-2. interval + rescale at the binding scales ---------------------------
python examples/evaluate_fid.py "${HARD[@]}" --ckpt "$CK" --guidance "$best_g" \
  "diffuser.extra_args.guidance_interval=[0.05, 0.75]" \
  > /tmp/r5_hard_interval_gbest.log 2>&1
python examples/evaluate_fid.py "${HARD[@]}" --ckpt "$CK" --guidance 3.0 \
  "diffuser.extra_args.guidance_interval=[0.05, 0.75]" \
  > /tmp/r5_hard_interval_g3.log 2>&1
python examples/evaluate_fid.py "${HARD[@]}" --ckpt "$CK" --guidance 3.0 \
  diffuser.extra_args.guidance_rescale=0.7 \
  > /tmp/r5_hard_rescale_g3.log 2>&1

# ---- 3. autoguidance (epoch-4 degraded sibling as guide) ---------------------
python examples/evaluate_fid.py "${HARD[@]}" --ckpt "$CK" --guidance 1.5 \
  --guide-ckpt "$RUN/checkpoints/phema_sr0.05_ep4" \
  > /tmp/r5_hard_autoguide_g1.5.log 2>&1

# ---- 4. guidance distillation at the best binding scale ----------------------
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

echo "QUEUE3B DONE"
