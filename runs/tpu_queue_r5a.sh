#!/bin/bash
# Round-5 session queue, part A: the 30k `params=quality` headline (VERDICT
# r4 next-#2) runs FIRST — it is the longest stage (~4 h at x2 budgets) and
# the single most important piece of missing evidence. Part B (authored
# while this trains) carries the perf program + remaining quality arms and
# chains on /tmp/qr5a.pid.
cd /root/repo
QPREFIX=qr5a
Q=runs/tpu_queue.log
STOPF=runs/QUEUE_STOP
source runs/verify_run.sh
echo $$ > /tmp/qr5a.pid

check_stop() {
  if [ -f "$STOPF" ]; then
    echo "$QPREFIX: STOP file present, exiting $(date)" >> "$Q"
    exit 0
  fi
}

probe() {
  timeout 240 python - <<'EOF' >/dev/null 2>&1
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
import jax.numpy as jnp
assert float(jnp.ones(8).sum()) == 8.0
EOF
}

ensure() {
  until probe; do
    check_stop
    echo "$QPREFIX: tunnel down $(date)" >> "$Q"
    sleep 120
  done
  echo "$QPREFIX: tunnel live $(date)" >> "$Q"
}

run_pg() {
  setsid bash -c '"$@"' runpg "$@" &
  echo $! > /tmp/qv6_stage.pid
  wait $!
  local rc=$?
  rm -f /tmp/qv6_stage.pid
  return $rc
}

run_stage() {  # <name> <rundir> <min_metrics_lines> <max_attempts> <cmd...>
  local name=$1 dir=$2 lines=$3 max=$4; shift 4
  if verify_run "$dir" "$lines"; then
    echo "$QPREFIX: skip $name (artifacts complete) $(date)" >> "$Q"
    return 0
  fi
  local a rc
  for a in $(seq 1 "$max"); do
    check_stop
    ensure
    echo "$QPREFIX: start $name attempt $a $(date)" >> "$Q"
    run_pg "$@"
    rc=$?
    if verify_run "$dir" "$lines"; then
      echo "$QPREFIX: VERIFIED $name attempt $a rc=$rc $(date)" >> "$Q"
      return 0
    fi
    echo "$QPREFIX: end $name attempt $a rc=$rc ARTIFACTS-INCOMPLETE $(date)" >> "$Q"
    sleep 60
  done
  echo "$QPREFIX: FAILED $name after $max attempts $(date)" >> "$Q"
  return 1
}

# wait for the old qr4g chain to drain, then clear its STOP
for dep in /tmp/qr4g.pid; do
  while [ -f "$dep" ] && kill -0 "$(cat $dep)" 2>/dev/null; do
    sleep 30
  done
done
rm -f "$STOPF"
echo "$QPREFIX: starting $(date)" >> "$Q"

# --- 1. THE headline: shipped preset, full 30k studio protocol ----------------
run_stage flagship_quality30k runs/synthetic_studio_flagship_quality30k 40 3 \
  bash runs/run_flagship_quality30k.sh

echo "QR5A DONE $(date)" >> "$Q"
