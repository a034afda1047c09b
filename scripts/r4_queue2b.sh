#!/bin/bash
# Round-4 chip queue, stage 2b (launch AFTER r4_queue2a.sh exits — never two
# TPU processes). Priority order per VERDICT r3: training-time feature arms,
# then the bf16 scale verdict, then the GRPO sweep.
set -x
cd /root/repo

bash scripts/r4_feature_trainings.sh  > /tmp/r4_feature_trainings.log 2>&1
bash scripts/r4_bf16_campaign.sh      > /tmp/r4_bf16_campaign.log 2>&1
bash scripts/r4_grpo_campaign.sh      > /tmp/r4_grpo_campaign.log 2>&1

# Tail arms (each train + reconstruct + eval; tail position = natural
# time-based cutoff). The round-2/3 linear DDPM numbers (88.8 / 58.1) were
# ramped-track evals whose exact eval flags are no longer recoverable, so the
# 2x2 completes WITHIN this round's protocol: linear-fixed and linear-hybrid
# retrain here under the same 24ep/posthoc/DDIM-50/CFG-1.5 pipeline as the
# cosine arms.
COMMON=(trainer.n_epoch=24 trainer.posthoc_ema=true trainer.save_optimizer=false
        trainer.save_path=runs/ddpm_r4 model.model_channels=64)
CPU=(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)

tail_arm () {
  local config="$1" name="$2"; shift 2
  python examples/train_diffusion.py --config-name "$config" \
    "${COMMON[@]}" trainer.project_name="$name" "$@" \
    > "/tmp/r4_train_$name.log" 2>&1
  "${CPU[@]}" python examples/reconstruct_ema.py --run-dir "runs/ddpm_r4/$name" \
    --sigma-rel 0.05 0.1
  python examples/evaluate_fid.py --config-name "$config" \
    --ckpt "runs/ddpm_r4/$name/checkpoints/ema" "runs/ddpm_r4/$name/checkpoints/denoiser" \
           "runs/ddpm_r4/$name/checkpoints/phema_sr0.05" "runs/ddpm_r4/$name/checkpoints/phema_sr0.1" \
    --n-samples 2000 --batch-size 200 --steps 50 --guidance 1.5 \
    model.model_channels=64 "$@" > "/tmp/r4_fid_$name.log" 2>&1
}

tail_arm train_synthetic_ddpm fixed_linear diffuser.extra_args.schedule=linear

tail_arm train_synthetic_ddpm hybrid_linear diffuser.extra_args.schedule=linear \
  model.out_channels=6 \
  "diffuser.extra_args.sampler_parameters={var_type: learned_range}"

tail_arm train_synthetic_ddpm_repa urepa

echo "QUEUE2B DONE"
