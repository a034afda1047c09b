#!/bin/bash
# Round-4 chip queue, stage 2b (launch AFTER r4_queue2a.sh exits — never two
# TPU processes). Priority order per VERDICT r3: training-time feature arms,
# then the bf16 scale verdict, then the GRPO sweep.
set -x
cd /root/repo

bash scripts/r4_feature_trainings.sh  > /tmp/r4_feature_trainings.log 2>&1
bash scripts/r4_bf16_campaign.sh      > /tmp/r4_bf16_campaign.log 2>&1
bash scripts/r4_grpo_campaign.sh      > /tmp/r4_grpo_campaign.log 2>&1

echo "QUEUE2B DONE"
