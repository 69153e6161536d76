#!/bin/bash
# Watchdog: when the axon tunnel relay revives, run the short on-chip
# binsum A/B first (guaranteed deliverable), then the noupsample 400px
# flagship protocol run.
cd /root/repo
while ! pgrep -f tpu_init >/dev/null 2>&1; do
  sleep 30
done
echo "tunnel back at $(date)" >> /root/repo/runs/watch_tunnel.log
sleep 60
timeout 2400 python runs/run_binsum_ab.py \
  >> /root/repo/runs/binsum_ab.log 2>&1
echo "AB_DONE rc=$?" >> /root/repo/runs/binsum_ab.log
bash runs/run_flagship_noup400.sh
