#!/bin/bash
# Shared helpers for the TPU work queues (source after setting QPREFIX).
# Q is the ledger log; QPREFIX tags each line so interleaved queues stay
# attributable. verify_run comes from runs/verify_run.sh.
Q=${Q:-runs/tpu_queue.log}
QPREFIX=${QPREFIX:-q}
source "$(dirname "${BASH_SOURCE[0]}")/verify_run.sh"

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
    echo "$QPREFIX: tunnel down $(date)" >> "$Q"
    sleep 120
  done
  echo "$QPREFIX: tunnel live $(date)" >> "$Q"
}

# run_stage <name> <rundir> <min_metrics_lines> <max_attempts> <cmd...>
# DONE only when verify_run passes (non-trivial metrics.jsonl + final
# imgs_test_all/mean.txt), never on exit code alone; complete artifacts
# skip the stage, so queues are idempotent across restarts.
run_stage() {
  local name=$1 dir=$2 lines=$3 max=$4; shift 4
  if verify_run "$dir" "$lines"; then
    echo "$QPREFIX: skip $name (artifacts complete) $(date)" >> "$Q"
    return 0
  fi
  local a rc
  for a in $(seq 1 "$max"); do
    ensure
    echo "$QPREFIX: start $name attempt $a $(date)" >> "$Q"
    "$@"
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

# plain_stage <name> <max_attempts> <cmd...> -- for A/Bs that write their
# own JSON result lines; gates on exit code.
plain_stage() {
  local name=$1 max=$2; shift 2
  local a rc
  for a in $(seq 1 "$max"); do
    ensure
    echo "$QPREFIX: start $name attempt $a $(date)" >> "$Q"
    "$@"
    rc=$?
    echo "$QPREFIX: end $name attempt $a rc=$rc $(date)" >> "$Q"
    [ "$rc" -eq 0 ] && return 0
    sleep 60
  done
  return 1
}
