#!/bin/bash
# Resilient TPU work queue. Each stage waits for a LIVE backend (real
# jax.devices() probe -- process existence is not a signal, see
# runs/binsum_ab.log) and retries through tunnel outages; the long
# protocol runs resume from their save_every checkpoints.
cd /root/repo
Q=runs/tpu_queue.log

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
    echo "tunnel down $(date)" >> "$Q"
    sleep 120
  done
  echo "tunnel live $(date)" >> "$Q"
}

stage() {  # stage <name> <max_attempts> <cmd...>
  name=$1; max=$2; shift 2
  for a in $(seq 1 "$max"); do
    ensure
    echo "start $name attempt $a $(date)" >> "$Q"
    "$@"
    rc=$?
    echo "end $name attempt $a rc=$rc $(date)" >> "$Q"
    [ "$rc" -eq 0 ] && return 0
    sleep 60
  done
  return 1
}

stage binsum_ab 2 bash -c \
  'timeout 3000 python runs/run_binsum_ab.py >> runs/binsum_ab.log 2>&1'
stage flagship_noup400 10 bash runs/run_flagship_noup400.sh
stage tensorf_hemi400 4 bash runs/run_tensorf_hemi400.sh
stage bench 2 bash -c \
  'timeout 5400 python bench.py >> runs/bench_r02.log 2>&1'
echo "QUEUE DONE $(date)" >> "$Q"
