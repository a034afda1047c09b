#!/bin/bash
# Wrapper for the single-process stage runner (scripts/r5_mega.py):
#   1. wait for the in-flight sprint trainer to exit
#   2. reconstruct the sprint post-hoc EMA on CPU (no relay involvement)
#   3. drain-wait with short probes + long idle (the relay needs client-free
#      time to release after an exit; a held connection starves it)
#   4. hand the chip to the mega runner — ONE client for all remaining stages
set -x
cd /root/repo
echo $$ > /tmp/r5_final.pid
stamp () { echo "=== $1 @ $(date -u +%H:%M:%S) ===" >> /tmp/r5_final_timeline.log; }

if [ -n "$SPRINT_PID" ]; then
  while kill -0 "$SPRINT_PID" 2>/dev/null; do sleep 30; done
fi
stamp "sprint trainer exited"

env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/reconstruct_ema.py \
  --run-dir runs/r5/hard_txt2img_sprint --sigma-rel 0.05 \
  >> /tmp/r5_arm_hard_txt2img_sprint.log 2>&1
stamp "sprint recon done"

tries=0
until timeout 150 python /tmp/probe_chip.py >> /tmp/r5_probe.log 2>&1; do
  tries=$((tries + 1))
  stamp "chip wedged (probe $tries failed)"
  [ "$tries" -ge 10 ] && { stamp "chip GIVEN UP"; exit 1; }
  sleep 240
done
stamp "chip healthy, starting mega"

python scripts/r5_mega.py > /tmp/r5_mega.log 2>&1
stamp "mega wrapper done"
