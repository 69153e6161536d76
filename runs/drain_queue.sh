#!/bin/bash
# Drain the v6 TPU queue before the round-end bench window: set the STOP
# file (the queue exits between attempts) and TERM the in-flight stage's
# process group (recorded by run_pg in /tmp/qv6_stage.pid). Training
# stages checkpoint via save_every and resume next round; verify_run
# keeps the queues idempotent, so a drained stage simply re-runs.
cd /root/repo
Q=runs/tpu_queue.log
touch runs/QUEUE_STOP
echo "drain: STOP set $(date)" >> "$Q"
if [ -f /tmp/qv6_stage.pid ]; then
  pgid=$(cat /tmp/qv6_stage.pid)
  if kill -0 "$pgid" 2>/dev/null; then
    echo "drain: TERM stage pgid $pgid $(date)" >> "$Q"
    kill -TERM -- "-$pgid" 2>/dev/null
    for i in $(seq 1 30); do
      kill -0 "$pgid" 2>/dev/null || break
      sleep 2
    done
    if kill -0 "$pgid" 2>/dev/null; then
      echo "drain: KILL stage pgid $pgid $(date)" >> "$Q"
      kill -KILL -- "-$pgid" 2>/dev/null
    fi
  fi
fi
echo "drain: done $(date)" >> "$Q"
