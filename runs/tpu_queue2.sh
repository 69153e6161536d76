#!/bin/bash
# Follow-on queue: waits for the primary queue (runs/tpu_queue.sh) to
# drain, then runs the fixed_shape wall-clock A/B on the chip.
cd /root/repo
Q=runs/tpu_queue.log
while ! grep -q "QUEUE DONE" "$Q" 2>/dev/null; do sleep 120; done
echo "queue2: start fixed_ab $(date)" >> "$Q"
timeout 7200 python runs/run_fixed_ab.py >> runs/fixed_ab.log 2>&1
echo "queue2: end fixed_ab rc=$? $(date)" >> "$Q"
