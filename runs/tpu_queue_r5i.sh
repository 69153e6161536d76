#!/bin/bash
# Final round-5 stage: ONE fresh in-queue bench after everything drains
# (the qr5d bench self-suppressed before the ancestry fix), then leave the
# chip idle for the driver snapshot.
cd /root/repo
QPREFIX=qr5i
Q=runs/tpu_queue.log
echo $$ > /tmp/qr5i.pid
for dep in /tmp/qr5h.pid; do
  while [ -f "$dep" ] && kill -0 "$(cat $dep)" 2>/dev/null; do
    sleep 30
  done
done
echo "$QPREFIX: qr5h drained, starting $(date)" >> "$Q"
HARD_DL=$(date -d '2026-08-20 22:10 UTC' +%s)
if [ "$(date +%s)" -ge "$HARD_DL" ]; then
  echo "$QPREFIX: past deadline, skipping bench $(date)" >> "$Q"
  exit 0
fi
setsid bash -c 'timeout 1500 python bench.py > runs/bench_r5_final.json 2>runs/bench_r5_final.err' bench5 &
echo $! > /tmp/qv6_stage.pid
wait $!
rc=$?
rm -f /tmp/qv6_stage.pid
echo "$QPREFIX: bench rc=$rc — chip drained $(date)" >> "$Q"
