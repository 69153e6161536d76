#!/bin/bash
# Watchdog: when the axon tunnel relay revives (tpu_init process back),
# wait 60s for it to settle, then launch the noupsample 400px flagship.
cd /root/repo
while ! pgrep -f tpu_init >/dev/null 2>&1; do
  sleep 30
done
echo "tunnel back at $(date)" >> /root/repo/runs/watch_tunnel.log
sleep 60
bash runs/run_flagship_noup400.sh
