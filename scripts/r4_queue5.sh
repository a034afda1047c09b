#!/bin/bash
# Round-4 chip queue, stage 5 — runs after queue4 (the precision-reclaim
# campaign) releases the chip:
#   1. GRPO grad-clip arm — lr 3e-3 / tf 1.0 exactly like the arm that
#      collapsed at epoch 22 (BASELINE.md GRPO stiffness campaign), plus
#      optimizer.grad_clip_norm=1.0: does global-norm clipping prevent the
#      runaway update and sustain the climb? Bounded at 90 min.
#   2. profile_copies — names the residual ~8 ms copies/reshapes in the
#      bench step and localizes the 6.5% conditioning-path cost op-by-op.
# Serial on purpose — the relay wedges under two concurrent TPU processes.
set -x
cd /root/repo

if [ -f /tmp/r4_queue4.pid ]; then
  while kill -0 "$(cat /tmp/r4_queue4.pid)" 2>/dev/null; do sleep 20; done
fi

# ---- 1. GRPO grad-clip arm --------------------------------------------------
timeout 5400 python examples/train_grpo.py --config-name train_grpo_alignment --luma-judge \
  dataset.train._target_=diffulab_tpu.data.imagenet.ImageNetmultiAR \
  dataset.val._target_=diffulab_tpu.data.imagenet.ImageNetmultiAR \
  dataset.train.data_path=data/imagenet_txt dataset.val.data_path=data/imagenet_txt \
  model.inner_dim=256 model.num_heads=4 model.depth=6 \
  vision_tower.base_channels=32 "vision_tower.ch_mult=[1, 2]" \
  vision_tower.num_res_blocks=1 vision_tower.latent_channels=32 \
  grpo.n_image_per_prompt=8 reward.n_image_per_prompt=8 \
  "grpo.image_resolution=[64, 64]" grpo.guidance_scale=1.5 grpo.eps=0.1 \
  diffuser.n_steps=8 dataloader.batch_size=8 \
  trainer.n_epoch=40 trainer.precision_type=no trainer.save_optimizer=false \
  trainer.save_path=runs/grpo_r4 optimizer.lr=3e-3 grpo.timestep_fraction=1.0 \
  optimizer.grad_clip_norm=1.0 \
  trainer.project_name=luma_lr3e3_tf1_clip > /tmp/r4_grpo_clip.log 2>&1

# ---- 2. copies/reshapes profile at bench shapes -----------------------------
python scripts/profile_copies.py > /tmp/r4_profile_copies.log 2>&1

echo "QUEUE5 DONE"
