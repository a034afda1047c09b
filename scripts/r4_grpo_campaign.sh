#!/bin/bash
# Round-4 GRPO on-chip sweep (VERDICT item 6): can the machinery produce a
# judge_score gain a user would care about (>= +0.05 absolute)? Round 3
# measured +0.0017 over 40 epochs at lr 1e-3 / eps 0.1. The round-3 stiffness
# hypothesis predicts the lever is lr; the new clip_frac/ratio_dev
# diagnostics (training/grpo metrics) record whether clipping or tiny ratio
# deviations explain any residual flatness.
#
# Protocol (new this round; r3 run dirs were cleaned): full latent txt2img
# pipeline — MMDiT 256/6 on flux2-shrunk 32ch latents (2x2-packed to 128),
# 64x64 images, luma preference judge, 8-step Euler-Maruyama, group size 8,
# eps 0.1, 40 epochs (320 updates). Arms vary lr and timestep_fraction.
set -x
cd /root/repo

COMMON=(--config-name train_grpo_alignment --luma-judge
  dataset.train._target_=diffulab_tpu.data.imagenet.ImageNetmultiAR
  dataset.val._target_=diffulab_tpu.data.imagenet.ImageNetmultiAR
  dataset.train.data_path=data/imagenet_txt dataset.val.data_path=data/imagenet_txt
  model.inner_dim=256 model.num_heads=4 model.depth=6
  vision_tower.base_channels=32 "vision_tower.ch_mult=[1, 2]"
  vision_tower.num_res_blocks=1 vision_tower.latent_channels=32
  grpo.n_image_per_prompt=8 reward.n_image_per_prompt=8
  "grpo.image_resolution=[64, 64]" grpo.guidance_scale=1.5
  diffuser.n_steps=8 dataloader.batch_size=8
  trainer.n_epoch=40 trainer.precision_type=no trainer.save_optimizer=false
  trainer.save_path=runs/grpo_r4)

python examples/train_grpo.py "${COMMON[@]}" optimizer.lr=3e-3 \
  trainer.project_name=luma_lr3e3 > /tmp/r4_grpo_lr3e3.log 2>&1

# full-chain credit assignment: train on every denoise step, not 60%
python examples/train_grpo.py "${COMMON[@]}" optimizer.lr=3e-3 \
  grpo.timestep_fraction=1.0 \
  trainer.project_name=luma_lr3e3_tf1 > /tmp/r4_grpo_lr3e3_tf1.log 2>&1

echo "GRPO CAMPAIGN DONE"
