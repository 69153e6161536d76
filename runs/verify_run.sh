#!/bin/bash
# Artifact gate for protocol runs (VERDICT r2 "what's weak" #1: a queue
# stage must not report DONE with empty output — tensorf_hemi400 once
# logged DONE while its metrics.jsonl had 0 lines).
#
# verify_run <rundir> <min_metrics_lines>
#   PASS (rc 0) iff the run directory contains:
#     - metrics.jsonl with at least <min_metrics_lines> lines
#     - a non-empty imgs_test_all/mean.txt (the final render_test eval ran)
# Covered by tests/test_queue_gate.py.
verify_run() {
  local d=$1 n=$2
  [ -f "$d/metrics.jsonl" ] || return 1
  [ "$(wc -l < "$d/metrics.jsonl")" -ge "$n" ] || return 1
  [ -s "$d/imgs_test_all/mean.txt" ] || return 1
  return 0
}

# When executed directly (the test does this), act as a CLI.
if [ "${BASH_SOURCE[0]}" = "$0" ]; then
  verify_run "$1" "${2:-1}"
  exit $?
fi
