#!/bin/bash
# Round-4 feature-surface A/B campaign, part A: sampling-time features
# measured against the clean re-baselined checkpoints (BASELINE.md round 4).
# Controls: flow phema_sr0.05 Euler-50 CFG1.5 = FID 1.01; EDM phema_sr0.05
# Heun-18 CFG1.5 = FID 0.82. All evals 2000 samples / batch 200 so numbers
# are directly comparable with the baseline tables.
set -x
cd /root/repo

F=runs/flow_fp32_r4/checkpoints/phema_sr0.05
E=runs/edm_fp32_r3/checkpoints/phema_sr0.05
FLOW=(--config-name train_synthetic_flow_matching --n-samples 2000 --batch-size 200)
EDM=(--config-name train_synthetic_edm --n-samples 2000 --batch-size 200)

# 1. few-step sampler shootout on flow: UniPC vs DPM++(2M) vs Euler at 5/10
for steps in 5 10; do
  for m in euler dpmpp_2m unipc; do
    python examples/evaluate_fid.py "${FLOW[@]}" --ckpt "$F" \
      --steps $steps --guidance 1.5 diffuser.sampling_method=$m
  done
done

# 2. block caching, Euler-50, interval 2 over the middle span — blocks 2-8 of
#    the depth-10 synthetic DiT (same ~2/3-of-depth middle placement as the
#    BENCH depth-12 span 2-10): quality cost of the ~1.45x-throughput setting
#    vs control 1.01
python examples/evaluate_fid.py "${FLOW[@]}" --ckpt "$F" \
  --guidance 1.5 --cache-interval 2 --cache-span 2 8

# 3. guidance shaping at high CFG (where interval/rescale are claimed to help)
python examples/evaluate_fid.py "${FLOW[@]}" --ckpt "$F" --guidance 3.0
python examples/evaluate_fid.py "${FLOW[@]}" --ckpt "$F" --guidance 3.0 \
  "diffuser.extra_args.guidance_interval=[0.05, 0.75]"
python examples/evaluate_fid.py "${FLOW[@]}" --ckpt "$F" --guidance 3.0 \
  diffuser.extra_args.guidance_rescale=0.7
python examples/evaluate_fid.py "${FLOW[@]}" --ckpt "$F" --guidance 1.5 \
  "diffuser.extra_args.guidance_interval=[0.05, 0.75]"

# 4. autoguidance: guide the post-hoc-EMA model with a degraded sibling — the
#    SAME run's post-hoc EMA reconstructed at epoch 4 (t_out=312) — instead of
#    the unconditional branch (Karras et al., arXiv:2406.02507)
python examples/evaluate_fid.py "${FLOW[@]}" --ckpt "$F" --guidance 1.5 \
  --guide-ckpt runs/flow_fp32_r4/checkpoints/phema_sr0.05_ep4
python examples/evaluate_fid.py "${FLOW[@]}" --ckpt "$F" --guidance 2.0 \
  --guide-ckpt runs/flow_fp32_r4/checkpoints/phema_sr0.05_ep4

# 5. EDM few-step: UniPC vs DPM++(2M) at 10 steps (control: Heun-18 = 0.82)
for m in dpmpp_2m unipc; do
  python examples/evaluate_fid.py "${EDM[@]}" --ckpt "$E" \
    --steps 10 --guidance 1.5 diffuser.sampling_method=$m
done

echo "FEATURE EVALS DONE"
