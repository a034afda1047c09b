#!/bin/bash
# Round-5 chip queue, stage 3a (VERDICT r4 item 2): the guidance-binding
# control. Trains the class-conditional flow recipe on the HARD compositional
# benchmark, reconstructs post-hoc EMAs (full horizon + an epoch-4 sibling
# for autoguidance), and sweeps CFG scale — the gate for the stage-3b feature
# arms is FID(g>0) < FID(g=0) somewhere on the sweep.
# Serial on purpose — the relay wedges under two concurrent TPU processes.
set -x
cd /root/repo

CPU=(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)
RUN=runs/r5/synthetic_hard_flow

if [ -f /tmp/r5_queue2c.pid ]; then
  while kill -0 "$(cat /tmp/r5_queue2c.pid)" 2>/dev/null; do sleep 20; done
fi

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

for g in 0.0 1.0 1.5 2.0 3.0; do
  python examples/evaluate_fid.py --config-name train_synthetic_hard_flow \
    --ckpt "$RUN/checkpoints/phema_sr0.05" \
    --n-samples 1000 --batch-size 200 --guidance "$g" \
    > "/tmp/r5_hard_cfg_g$g.log" 2>&1
done
# live + sr0.1 at the canonical 1.5 for the (ema, live, phema) triple
python examples/evaluate_fid.py --config-name train_synthetic_hard_flow \
  --ckpt "$RUN/checkpoints/denoiser" "$RUN/checkpoints/ema" "$RUN/checkpoints/phema_sr0.1" \
  --n-samples 1000 --batch-size 200 --guidance 1.5 \
  > /tmp/r5_hard_cfg_triple.log 2>&1

echo "QUEUE3A DONE"
