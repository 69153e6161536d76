#!/bin/bash
# Round-3 TPU queue, v8 (v7 + review fixes: tier stages retry like
# every other stage, and A/B stages leave done-markers so a queue
# relaunch resumes the interrupted long run instead of re-deriving
# verdicts). v7 note kept below:
# (v7 superseded v6, which was drained mid-round after
# the binsum Mosaic compile failures — lane/sublane DMA alignment, fixed
# in ops/pallas/binsum.py). Reordered for the round's value:
#   1. tier_train400: full-test-set re-eval of the completed fixed400
#      flagship with the CORRECTED eval (interleaved chunking + thinning)
#      — the headline stripe bug made the recorded 14.30 dB bogus;
#   2. binsum_ab with the fixed kernel; its verdict decides whether the
#      studio headline run trains with scatter kernels on
#      (NMF_EXTRA_OVERRIDES consumed by run_flagship_studio400.sh);
#   3. trace_r3 xplane attribution (kernels on);
#   4. the long studio run + the rest of the v6 tail.
# Stages idempotent via verify_run; STOP-file drain; stage pgid recorded
# in /tmp/qv6_stage.pid (kept from v6 so stall_watchdog.py and
# drain_queue.sh work unchanged).
cd /root/repo
QPREFIX=qv8
Q=runs/tpu_queue.log
STOPF=runs/QUEUE_STOP
source runs/verify_run.sh
echo $$ > /tmp/qv8.pid

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

run_pg() {  # run "$@" in its own process group; record pgid for drain
  setsid bash -c '"$@"' runpg "$@" &
  echo $! > /tmp/qv6_stage.pid
  wait $!
  local rc=$?
  rm -f /tmp/qv6_stage.pid
  return $rc
}

# run_stage <name> <rundir> <min_metrics_lines> <max_attempts> <cmd...>
run_stage() {
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

plain_stage() {  # gates on exit code; done-marker skips re-runs on relaunch
  local name=$1 max=$2; shift 2
  local mark="runs/.done_$name"
  if [ -f "$mark" ]; then
    echo "$QPREFIX: skip $name (done-marker) $(date)" >> "$Q"
    return 0
  fi
  local a rc
  for a in $(seq 1 "$max"); do
    check_stop
    ensure
    echo "$QPREFIX: start $name attempt $a $(date)" >> "$Q"
    run_pg "$@"
    rc=$?
    echo "$QPREFIX: end $name attempt $a rc=$rc $(date)" >> "$Q"
    if [ "$rc" -eq 0 ]; then
      touch "$mark"
      return 0
    fi
    sleep 60
  done
  return 1
}

export CKPT=runs/synthetic_shiny_flagship_fixed400/synthetic_shiny_flagship_fixed400.th
tier_eval() {  # tier_eval <tier> <expname>
  timeout 7200 python train.py render_only=True "ckpt=$CKPT" \
    "eval_tier=$1" dataset=synthetic_shiny dataset.hemisphere=true \
    dataset.n_views=100 dataset.image_size=400 seed=20211200 \
    N_vis=-1 basedir=runs "expname=$2" \
    >> "runs/tier_ab.log" 2>&1
}
tier_stage() {  # tier_stage <tier> <expname>; retries like run_stage
  local d="runs/synthetic_shiny_$2/imgs_render"
  if [ ! -f "$CKPT" ]; then
    echo "$QPREFIX: no flagship ckpt at $CKPT; skip tier_$1 $(date)" >> "$Q"
    return 0
  fi
  local a rc
  for a in $(seq 1 3); do
    if [ -s "$d/mean.txt" ]; then
      echo "$QPREFIX: skip tier_$1 (done) $(date)" >> "$Q"
      return 0
    fi
    check_stop
    ensure
    echo "$QPREFIX: start tier_$1 attempt $a $(date)" >> "$Q"
    run_pg tier_eval "$1" "$2"
    rc=$?
    if [ -s "$d/mean.txt" ]; then
      echo "$QPREFIX: VERIFIED tier_$1 attempt $a rc=$rc $(date)" >> "$Q"
      return 0
    fi
    echo "$QPREFIX: tier_$1 attempt $a rc=$rc ARTIFACTS-INCOMPLETE $(date)" >> "$Q"
    sleep 60
  done
  return 1
}
export -f tier_eval  # run_pg's setsid bash -c needs these exported

# --- 1. corrected headline re-eval of the completed fixed400 flagship -------
tier_stage train tier_train400

# --- 2. binsum A/B with the alignment-fixed kernel ---------------------------
plain_stage binsum_ab 2 bash -c \
  'timeout 4800 python runs/run_binsum_ab.py >> runs/binsum_ab.log 2>&1'

# scatter-kernel verdict for the studio run: last JSON line of the A/B log
SCATTER=$(python - <<'EOF'
import json
verdict = ""
try:
    for line in open("runs/binsum_ab.log"):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            r = json.loads(line)
        except ValueError:
            continue
        if r.get("loss_rel_err_max_model", 1) < 1e-3 and \
                r.get("speedup_e2e_plus_model", 0) > 1.02:
            verdict = ("field.scatter_kernel=true "
                       "model.arch.bg_module.scatter_kernel=true "
                       "model.arch.model.scatter_kernel=true")
        elif r.get("loss_rel_err_max", 1) < 1e-3 and \
                r.get("speedup_e2e", 0) > 1.02:
            verdict = ("field.scatter_kernel=true "
                       "model.arch.bg_module.scatter_kernel=true")
        else:
            verdict = ""
except OSError:
    pass
print(verdict)
EOF
)
echo "$QPREFIX: scatter verdict: '$SCATTER' $(date)" >> "$Q"

# --- 3. fresh xplane attribution (kernels on; warm cache from the A/B) ------
plain_stage trace_r3 1 bash -c \
  'timeout 2400 python runs/run_trace.py field.scatter_kernel=true \
     model.arch.bg_module.scatter_kernel=true \
     model.arch.model.scatter_kernel=true >> runs/trace_r3.log 2>&1'

# --- 4. long studio headline run (resume-safe across the round boundary) ----
export NMF_EXTRA_OVERRIDES="$SCATTER"
run_stage flagship_studio400 runs/synthetic_studio_flagship_studio400 55 10 \
  bash runs/run_flagship_studio400.sh
unset NMF_EXTRA_OVERRIDES
tier_stage high tier_high400     # VERDICT r2 #8: bigger test-time MC budgets

# --- perf A/Bs ---------------------------------------------------------------
plain_stage layout_ab 2 bash -c \
  'timeout 7200 python runs/run_layout_ab.py >> runs/layout_ab.log 2>&1'
plain_stage mlp_ab 2 bash -c \
  'timeout 7200 python runs/run_mlp_ab.py >> runs/mlp_ab.log 2>&1'

# --- remaining protocol rows -------------------------------------------------
run_stage tensorf_studio400 runs/synthetic_studio_tensorf_studio400 55 8 \
  bash runs/run_tensorf_studio400.sh
run_stage flagship_cluster400 runs/synthetic_cluster_flagship_cluster400 55 10 \
  bash runs/run_flagship_cluster400.sh
run_stage cluster400_noretrace runs/synthetic_cluster_cluster400_noretrace 55 10 \
  bash runs/run_flagship_cluster400_noretrace.sh

# --- 8k diagnostic arms (200px, full-set finals) ----------------------------
arm8k() {  # arm8k <expname> <extra overrides...>
  local exp=$1; shift
  timeout 10800 python train.py model=microfacet_tensorf2 \
    dataset=synthetic_shiny dataset.hemisphere=true dataset.n_views=100 \
    dataset.image_size=200 seed=20211200 \
    model.params.max_batch_size=4096 model.params.n_iters=8000 \
    save_every=2500 resume=True \
    vis_every=0 N_vis=2 final_N_vis=-1 basedir=runs "expname=$exp" \
    progress_refresh_rate=512 render_test=True "$@" \
    >> runs/arm8k.log 2>&1
}
export -f arm8k
run_stage shgrad8k_on runs/synthetic_shiny_shgrad8k_on 10 4 \
  arm8k shgrad8k_on model.arch.bg_module.sh_grad=True
run_stage shgrad8k_off runs/synthetic_shiny_shgrad8k_off 10 4 \
  arm8k shgrad8k_off model.arch.bg_module.sh_grad=False
run_stage normoracle8k runs/synthetic_shiny_normoracle8k 10 4 \
  arm8k normoracle8k model.params.normal_err_lambda=0.02
# floater-halo arm: the corrected tier_train400 re-eval shows a white
# fog plume + acc holes; distortion loss penalizes the spread-out
# density the fog needs (reference exposes the same knob, shipped 0)
run_stage dist8k runs/synthetic_shiny_dist8k 10 4 \
  arm8k dist8k model.params.distortion_lambda=0.001

run_stage flagship_noup400 runs/synthetic_shiny_flagship_noup400 55 10 \
  bash runs/run_flagship_noup400.sh

echo "QV7 DONE $(date)" >> "$Q"
