#!/bin/bash
# Round-3 TPU queue. Differences from tpu_queue_r2s7.sh:
#   - ARTIFACT-VERIFIED stages (VERDICT r2 weak #1): a protocol stage is
#     DONE only when verify_run passes (non-trivial metrics.jsonl + final
#     imgs_test_all/mean.txt), never on exit code alone. rc=0 with missing
#     artifacts retries; pre-existing complete artifacts skip the stage,
#     so the queue is idempotent across machine restarts.
#   - Priority: the three 400px protocol rows first (VERDICT next #1),
#     then the cluster GI pair (#9), then perf A/Bs, bench last.
# Long runs resume from save_every checkpoints across attempts/outages.
cd /root/repo
Q=runs/tpu_queue.log
source runs/verify_run.sh

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
    echo "q3: tunnel down $(date)" >> "$Q"
    sleep 120
  done
  echo "q3: tunnel live $(date)" >> "$Q"
}

# run_stage <name> <rundir> <min_lines> <max_attempts> <cmd...>
run_stage() {
  name=$1; dir=$2; lines=$3; max=$4; shift 4
  if verify_run "$dir" "$lines"; then
    echo "q3: skip $name (artifacts complete) $(date)" >> "$Q"
    return 0
  fi
  for a in $(seq 1 "$max"); do
    ensure
    echo "q3: start $name attempt $a $(date)" >> "$Q"
    "$@"
    rc=$?
    if verify_run "$dir" "$lines"; then
      echo "q3: VERIFIED $name attempt $a rc=$rc $(date)" >> "$Q"
      return 0
    fi
    echo "q3: end $name attempt $a rc=$rc ARTIFACTS-INCOMPLETE $(date)" >> "$Q"
    sleep 60
  done
  echo "q3: FAILED $name after $max attempts $(date)" >> "$Q"
  return 1
}

# plain_stage <name> <max_attempts> <cmd...>  (A/Bs: gate on rc only, but
# they append their own JSON lines which the log shows)
plain_stage() {
  name=$1; max=$2; shift 2
  for a in $(seq 1 "$max"); do
    ensure
    echo "q3: start $name attempt $a $(date)" >> "$Q"
    "$@"
    rc=$?
    echo "q3: end $name attempt $a rc=$rc $(date)" >> "$Q"
    [ "$rc" -eq 0 ] && return 0
    sleep 60
  done
  return 1
}

run_stage flagship_fixed400 runs/synthetic_shiny_flagship_fixed400 60 10 \
  bash runs/run_flagship_fixed400.sh
run_stage tensorf_hemi400 runs/synthetic_shiny_tensorf_hemi400 60 8 \
  bash runs/run_tensorf_hemi400.sh
run_stage flagship_cluster400 runs/synthetic_cluster_flagship_cluster400 60 10 \
  bash runs/run_flagship_cluster400.sh
run_stage cluster400_noretrace runs/synthetic_cluster_cluster400_noretrace 60 10 \
  bash runs/run_flagship_cluster400_noretrace.sh
run_stage flagship_noup400 runs/synthetic_shiny_flagship_noup400 60 10 \
  bash runs/run_flagship_noup400.sh
plain_stage binsum_ab 2 bash -c \
  'timeout 3600 python runs/run_binsum_ab.py >> runs/binsum_ab.log 2>&1'
plain_stage layout_ab 2 bash -c \
  'timeout 7200 python runs/run_layout_ab.py >> runs/layout_ab.log 2>&1'
plain_stage mlp_ab 2 bash -c \
  'timeout 7200 python runs/run_mlp_ab.py >> runs/mlp_ab.log 2>&1'
plain_stage bench 2 bash -c \
  'timeout 5400 python bench.py >> runs/bench_r03.log 2>&1'
echo "Q3 DONE $(date)" >> "$Q"
