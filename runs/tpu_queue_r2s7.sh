#!/bin/bash
# Session-7 consolidated TPU queue (replaces the stalled tpu_queue*.sh
# chain from sessions 5-6: the tunnel was down 03:23-06:17 and the old
# watchers died with the session). New priority order:
#   1. flagship_fixed400  - headline protocol row (VERDICT #2), one compile
#   2. binsum_ab          - scatter-kernel perf A/B (VERDICT #5)
#   3. tensorf_hemi400    - comparison protocol row
#   4. fixed_ab           - fixed_shape wall-clock A/B on chip
#   5. layout_ab, mlp_ab  - quad-table layout / bf16-MLP A/Bs
#   6. flagship_cluster400- second protocol scene (fixed_shape schedule)
#   7. bench.py           - final official bench line
# Every stage gates on a real jax.devices() probe and retries through
# outages; long runs resume from save_every checkpoints.
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
    echo "q7: tunnel down $(date)" >> "$Q"
    sleep 120
  done
  echo "q7: tunnel live $(date)" >> "$Q"
}

stage() {  # stage <name> <max_attempts> <cmd...>
  name=$1; max=$2; shift 2
  for a in $(seq 1 "$max"); do
    ensure
    echo "q7: start $name attempt $a $(date)" >> "$Q"
    "$@"
    rc=$?
    echo "q7: end $name attempt $a rc=$rc $(date)" >> "$Q"
    [ "$rc" -eq 0 ] && return 0
    sleep 60
  done
  return 1
}

stage flagship_fixed400 10 bash runs/run_flagship_fixed400.sh
stage binsum_ab 2 bash -c \
  'timeout 3600 python runs/run_binsum_ab.py >> runs/binsum_ab.log 2>&1'
stage tensorf_hemi400 6 bash runs/run_tensorf_hemi400.sh
stage fixed_ab 2 bash -c \
  'timeout 7200 python runs/run_fixed_ab.py >> runs/fixed_ab.log 2>&1'
stage layout_ab 2 bash -c \
  'timeout 7200 python runs/run_layout_ab.py >> runs/layout_ab.log 2>&1'
stage mlp_ab 2 bash -c \
  'timeout 7200 python runs/run_mlp_ab.py >> runs/mlp_ab.log 2>&1'
stage flagship_cluster400 10 bash runs/run_flagship_cluster400.sh
stage bench 2 bash -c \
  'timeout 5400 python bench.py >> runs/bench_r02.log 2>&1'
echo "Q7 DONE $(date)" >> "$Q"
