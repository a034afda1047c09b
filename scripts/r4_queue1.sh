#!/bin/bash
# Round-4 chip queue, stage 1: flow re-baseline FID sweep, then the DDPM
# 2x2(+min-SNR) campaign. Serial on purpose — the relay wedges under two
# concurrent TPU processes (CLAUDE.md). Reconstructions run CPU-forced.
set -x
cd /root/repo

CPU="env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu"

# --- flow re-baseline: reconstruct post-hoc EMAs (host-side, CPU) ----------
$CPU python examples/reconstruct_ema.py --run-dir runs/flow_fp32_r4 \
  --sigma-rel 0.02 0.05 0.10 0.15 0.20
# degraded sibling for autoguidance: same width, reconstructed at epoch 4
$CPU python examples/reconstruct_ema.py --run-dir runs/flow_fp32_r4 \
  --sigma-rel 0.05 --t-out 312
mv runs/flow_fp32_r4/checkpoints/phema_sr0.05 runs/flow_fp32_r4/checkpoints/phema_sr0.05_ep4
$CPU python examples/reconstruct_ema.py --run-dir runs/flow_fp32_r4 \
  --sigma-rel 0.05

# --- flow FID sweep: one process, 7 weight sets (TPU) -----------------------
python examples/evaluate_fid.py --config-name train_synthetic_flow_matching \
  --ckpt runs/flow_fp32_r4/checkpoints/ema \
         runs/flow_fp32_r4/checkpoints/denoiser \
         runs/flow_fp32_r4/checkpoints/phema_sr0.02 \
         runs/flow_fp32_r4/checkpoints/phema_sr0.05 \
         runs/flow_fp32_r4/checkpoints/phema_sr0.1 \
         runs/flow_fp32_r4/checkpoints/phema_sr0.15 \
         runs/flow_fp32_r4/checkpoints/phema_sr0.2 \
  --n-samples 2000 --batch-size 200 --guidance 1.5 \
  > /tmp/r4_fid_flow_sweep.log 2>&1

# --- DDPM campaign: all four 2x2 cells + min-SNR, one protocol --------------
# (24 epochs, UNet 69M at model_channels=64, fp32, posthoc_ema, batch 128)
COMMON=(trainer.n_epoch=24 trainer.posthoc_ema=true trainer.save_optimizer=false
        trainer.save_path=runs/ddpm_r4 model.model_channels=64)

python examples/train_diffusion.py --sweep --config-name train_synthetic_ddpm \
  "${COMMON[@]}" diffuser.extra_args.schedule=linear,cosine \
  > /tmp/r4_train_ddpm_fixed.log 2>&1

python examples/train_diffusion.py --sweep --config-name train_synthetic_ddpm \
  "${COMMON[@]}" diffuser.extra_args.schedule=linear,cosine \
  model.out_channels=6 \
  "diffuser.extra_args.sampler_parameters={var_type: learned_range}" \
  > /tmp/r4_train_ddpm_hybrid.log 2>&1

python examples/train_diffusion.py --config-name train_synthetic_ddpm \
  "${COMMON[@]}" trainer.project_name=synthetic_ddpm_minsnr \
  diffuser.extra_args.loss_weighting=min_snr \
  > /tmp/r4_train_ddpm_minsnr.log 2>&1

echo "QUEUE1 DONE"
