#!/bin/bash
# Round-4 final queue: batch-scaling probe + closing bench refresh (after
# every other queue drains, so BENCH_LAST.json reflects the round's final
# shipped defaults and a quiet chip).
cd /root/repo
QPREFIX=qr4d
Q=runs/tpu_queue.log
STOPF=runs/QUEUE_STOP
source runs/queue_lib.sh
echo $$ > /tmp/qr4d.pid

check_stop() {
  if [ -f "$STOPF" ]; then
    echo "$QPREFIX: STOP file present, exiting $(date)" >> "$Q"
    exit 0
  fi
}

for dep in /tmp/qr4.pid /tmp/qr4b.pid /tmp/qr4c.pid; do
  while [ -f "$dep" ] && kill -0 "$(cat $dep)" 2>/dev/null; do
    check_stop
    sleep 120
  done
done
echo "$QPREFIX: predecessors drained, starting $(date)" >> "$Q"

plain_stage bscale 2 bash -c \
  'timeout 4800 python runs/run_bscale.py >> runs/bscale.log 2>&1'
plain_stage bench_final 2 bash -c \
  'timeout 3600 python bench.py >> runs/bench_r04.log 2>&1'

echo "QR4D DONE $(date)" >> "$Q"
