#!/bin/bash
# Round-5 chip queue, stage 4 (VERDICT r4 item 4, on-chip half): the
# trust-region guard at the exact recipe that collapsed on-chip in round 4
# (runs/grpo_r4/luma_lr3e3_tf1 — lr 3e-3, timestep_fraction 1.0, dead from
# epoch 22: ratio_dev 0.80, clip_frac ~0.70, grad exactly 0). Same recipe,
# guard ON (grpo.trust_region=0.3 — the config default round 5 shipped).
# Expected: the guard fires at/before the runaway update, rejects + rolls
# back + backs off lr, and the run keeps a live gradient past the round-4
# death point. Bounded: the round-4 arm reached epoch 22 in well under its
# 90-minute cap, so 75 minutes covers the death point with margin.
# Serial on purpose — the relay wedges under two concurrent TPU processes.
set -x
cd /root/repo

if [ -f /tmp/r5_queue3b.pid ]; then
  while kill -0 "$(cat /tmp/r5_queue3b.pid)" 2>/dev/null; do sleep 20; done
fi

timeout 4500 python examples/train_grpo.py --config-name train_grpo_alignment --luma-judge \
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
  trainer.save_path=runs/grpo_r5 optimizer.lr=3e-3 grpo.timestep_fraction=1.0 \
  trainer.project_name=luma_lr3e3_tf1_tr > /tmp/r5_grpo_tr.log 2>&1

echo "QUEUE4 DONE"
