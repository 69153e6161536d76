#!/bin/bash
# Round-4 TPU queue. Program (VERDICT r3 "Next round"):
#   1. Complete the 30k dist run (26111 -> 30000 + full final eval): a
#      finished failure-record artifact (its 25k probe reads 21.3 — the
#      distortion-only fix did NOT hold at the 30k lr shape).
#   2. use_pallas on-chip A/B on the flagship step (next #3 first half).
#   3. The corrected headline candidate `flagship_studio400_lrc`
#      (distortion + lr_upsample_reset=false): first 10k (stop_iter),
#      gated on the iter-9999 probe, then resumed to 30k + full eval.
#   4. Thinning cost curve (next #5): 8k studio arms at budget x1/x2 and
#      retrace x4.
#   5. sh_grad envmap A/B at scale (next #4): 8k shiny arms.
#   6. tier_high400 re-eval (next #6).
#   7. 800px supervision-density-matched studio row (next #7).
#   8. tensorf_studio400 comparison row.
# Stages idempotent via verify_run/done-markers; stage pgid recorded for
# stall_watchdog.py; STOP-file drain for the round boundary.
cd /root/repo
QPREFIX=qr4
Q=runs/tpu_queue.log
STOPF=runs/QUEUE_STOP
source runs/verify_run.sh
echo $$ > /tmp/qr4.pid

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

plain_stage() {  # gates on exit code; done-marker skips re-runs
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

probe_psnr() {  # probe_psnr <metrics.jsonl> <step> -> prints psnr or 0.0
  python - "$1" "$2" <<'EOF'
import json, sys
path, step = sys.argv[1], int(sys.argv[2])
best = 0.0
try:
    for line in open(path):
        r = json.loads(line)
        s = r.get("log", "")
        if s.startswith(f"iter {step} test:"):
            best = float(s.split("'psnr': ")[1].split(",")[0].rstrip("}"))
except Exception:
    pass
print(best)
EOF
}

# --- 1. complete the 30k dist run (failure record with full final eval) ----
run_stage flagship_studio400_dist runs/synthetic_studio_flagship_studio400_dist 55 6 \
  bash runs/run_flagship_studio400_dist.sh

# --- 2. use_pallas flagship-step A/B ----------------------------------------
plain_stage pallas_ab 2 bash -c \
  'timeout 3600 python runs/run_pallas_ab.py >> runs/pallas_ab.log 2>&1'

# --- 3. corrected headline candidate: first 10k, gate, then 30k -------------
LRC_DIR=runs/synthetic_studio_flagship_studio400_lrc
if ! verify_run "$LRC_DIR" 55; then
  plain_stage lrc10k 4 bash -c \
    'NMF_STOP_ITER=10000 bash runs/run_flagship_studio400_lrc.sh'
  LRC_PSNR=$(probe_psnr "$LRC_DIR/metrics.jsonl" 9999)
  echo "$QPREFIX: lrc iter-9999 probe psnr: $LRC_PSNR $(date)" >> "$Q"
  if python -c "import sys; sys.exit(0 if float('$LRC_PSNR') >= 24.0 else 1)"; then
    run_stage flagship_studio400_lrc "$LRC_DIR" 55 8 \
      bash runs/run_flagship_studio400_lrc.sh
  else
    echo "$QPREFIX: lrc arm below gate (24.0); not resuming to 30k $(date)" >> "$Q"
  fi
else
  echo "$QPREFIX: skip lrc program (artifacts complete) $(date)" >> "$Q"
fi

# --- 4. thinning cost curve: 8k studio arms (VERDICT next #5) ---------------
arm8ks() {  # arm8ks <expname> <extra overrides...>  (studio, 400px, 8k)
  local exp=$1; shift
  timeout 10800 python train.py model=microfacet_tensorf2 \
    dataset=synthetic_studio dataset.hemisphere=true dataset.n_views=100 \
    dataset.image_size=400 seed=20211200 \
    model.params.max_batch_size=4096 model.params.n_iters=8000 \
    model.params.distortion_lambda=0.001 \
    model.params.lr_upsample_reset=false \
    field.fixed_shape=True \
    save_every=2500 resume=True \
    vis_every=0 N_vis=2 final_N_vis=20 basedir=runs "expname=$exp" \
    progress_refresh_rate=512 render_test=True "$@" \
    >> runs/arm8k_studio.log 2>&1
}
export -f arm8ks
run_stage thin_base8k runs/synthetic_studio_thin_base8k 10 3 \
  arm8ks thin_base8k
run_stage thin_budget2x8k runs/synthetic_studio_thin_budget2x8k 10 3 \
  arm8ks thin_budget2x8k "model.arch.model.brdf_ray_budget=[131072,32768]"
run_stage thin_retrace4x8k runs/synthetic_studio_thin_retrace4x8k 10 3 \
  arm8ks thin_retrace4x8k "model.arch.model.max_retrace_rays=[4096]"

# --- 5. sh_grad envmap A/B at scale (VERDICT next #4) ------------------------
arm8k() {  # arm8k <expname> <extra overrides...>  (shiny, 200px, 8k)
  local exp=$1; shift
  timeout 10800 python train.py model=microfacet_tensorf2 \
    dataset=synthetic_shiny dataset.hemisphere=true dataset.n_views=100 \
    dataset.image_size=200 seed=20211200 \
    model.params.max_batch_size=4096 model.params.n_iters=8000 \
    model.params.distortion_lambda=0.001 \
    model.params.lr_upsample_reset=false \
    save_every=2500 resume=True \
    vis_every=0 N_vis=2 final_N_vis=-1 basedir=runs "expname=$exp" \
    progress_refresh_rate=512 render_test=True "$@" \
    >> runs/arm8k.log 2>&1
}
export -f arm8k
run_stage shgrad8k_on runs/synthetic_shiny_shgrad8k_on 10 3 \
  arm8k shgrad8k_on model.arch.bg_module.sh_grad=True
run_stage dist8k runs/synthetic_shiny_dist8k 10 3 \
  arm8k dist8k

# --- 6. tier_high400 re-eval (VERDICT next #6) -------------------------------
export CKPT=runs/synthetic_shiny_flagship_fixed400/synthetic_shiny_flagship_fixed400.th
tier_eval() {
  timeout 7200 python train.py render_only=True "ckpt=$CKPT" \
    "eval_tier=$1" dataset=synthetic_shiny dataset.hemisphere=true \
    dataset.n_views=100 dataset.image_size=400 seed=20211200 \
    N_vis=-1 basedir=runs "expname=$2" \
    >> "runs/tier_ab.log" 2>&1
}
export -f tier_eval
tier_stage() {
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
tier_stage high tier_high400

# --- 7. 800px supervision-density-matched studio row (VERDICT next #7) ------
run_stage flagship_studio800 runs/synthetic_studio_flagship_studio800 55 8 \
  bash runs/run_flagship_studio800.sh

# --- 8. comparison row -------------------------------------------------------
run_stage tensorf_studio400 runs/synthetic_studio_tensorf_studio400 55 4 \
  bash runs/run_tensorf_studio400.sh

echo "QR4 DONE $(date)" >> "$Q"
