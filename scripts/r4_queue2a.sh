#!/bin/bash
# Round-4 chip queue, stage 2a. Serial on purpose — the relay wedges under
# two concurrent TPU processes (CLAUDE.md). Phases are independent (no -e):
# a crash in one leaves the rest running. Progress: tail /tmp/r4_queue2a.log
set -x
cd /root/repo

bash scripts/r4_ddpm_campaign.sh
bash scripts/r4_ddpm_eval.sh          > /tmp/r4_ddpm_eval.log 2>&1
bash scripts/r4_feature_evals.sh      > /tmp/r4_feature_evals.log 2>&1
python bench.py                       > /tmp/r4_bench.log 2>&1

echo "QUEUE2A DONE"
