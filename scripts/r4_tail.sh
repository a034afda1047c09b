#!/bin/bash
# Round-4 final chip slot (launched manually after killing queue2c at the
# EDM-aug boundary, ~14:10 UTC): the throughput-drift attribution probes,
# then a GRPO stiffness arm that runs until the round-end kill (~15:03 —
# per-epoch metrics.jsonl is the deliverable, not the final checkpoint).
# EDM-aug / flow-REPA / DDPM linear-hybrid / U-REPA arms are the recorded
# residues for round 5.
set -x
cd /root/repo

# 1. named-cause probe for the bench train-step drift (VERDICT r3 item 3)
python scripts/ab_stream_dtype.py > /tmp/r4_ab_stream.log 2>&1

# 2. unguided vs CFG-fused sampling throughput (distillation imgs/s row)
python scripts/ab_sampling_g0.py > /tmp/r4_ab_g0.log 2>&1

# 3. GRPO lr-3e-3 / full-chain arm (VERDICT r3 item 6) — killable tail
python examples/train_grpo.py --config-name train_grpo_alignment --luma-judge \
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
  trainer.project_name=luma_lr3e3_tf1 > /tmp/r4_grpo_lr3e3_tf1.log 2>&1

echo "TAIL DONE"
