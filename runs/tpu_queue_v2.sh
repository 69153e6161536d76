#!/bin/bash
# Round-3 queue, v2 ordering. Same artifact-verified stages as
# tpu_queue_r3.sh (source runs/verify_run.sh) but with the perf A/Bs and
# bench promoted to run right after the two HEADLINE protocol rows
# (flagship_fixed400 + tensorf_hemi400): the original order put all five
# 30k runs (~11 h) before the ~30-min A/Bs, so the VERDICT r2 #5
# measurement would never land inside a session. The cluster GI pair and
# the noupsample variant run after the A/Bs; every stage is idempotent
# (verify_run-skipped when already complete) so restarts are free.
#
# Takes an optional PID as $1: an already-running flagship attempt to
# wait on before stage 1 (used when the queue is restarted around a live
# training process).
cd /root/repo
Q=runs/tpu_queue.log
source runs/verify_run.sh

if [ -n "$1" ]; then
  echo "qv2: waiting on live pid $1 $(date)" >> "$Q"
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  echo "qv2: pid $1 exited $(date)" >> "$Q"
fi

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
    echo "qv2: tunnel down $(date)" >> "$Q"
    sleep 120
  done
  echo "qv2: tunnel live $(date)" >> "$Q"
}

# run_stage <name> <rundir> <min_lines> <max_attempts> <cmd...>
run_stage() {
  name=$1; dir=$2; lines=$3; max=$4; shift 4
  if verify_run "$dir" "$lines"; then
    echo "qv2: skip $name (artifacts complete) $(date)" >> "$Q"
    return 0
  fi
  for a in $(seq 1 "$max"); do
    ensure
    echo "qv2: start $name attempt $a $(date)" >> "$Q"
    "$@"
    rc=$?
    if verify_run "$dir" "$lines"; then
      echo "qv2: VERIFIED $name attempt $a rc=$rc $(date)" >> "$Q"
      return 0
    fi
    echo "qv2: end $name attempt $a rc=$rc ARTIFACTS-INCOMPLETE $(date)" >> "$Q"
    sleep 60
  done
  echo "qv2: FAILED $name after $max attempts $(date)" >> "$Q"
  return 1
}

plain_stage() {
  name=$1; max=$2; shift 2
  for a in $(seq 1 "$max"); do
    ensure
    echo "qv2: start $name attempt $a $(date)" >> "$Q"
    "$@"
    rc=$?
    echo "qv2: end $name attempt $a rc=$rc $(date)" >> "$Q"
    [ "$rc" -eq 0 ] && return 0
    sleep 60
  done
  return 1
}

# --- headline rows -------------------------------------------------------
run_stage flagship_fixed400 runs/synthetic_shiny_flagship_fixed400 55 10 \
  bash runs/run_flagship_fixed400.sh
run_stage tensorf_hemi400 runs/synthetic_shiny_tensorf_hemi400 55 8 \
  bash runs/run_tensorf_hemi400.sh

# --- perf A/Bs + bench (VERDICT r2 #3/#5 evidence) -----------------------
plain_stage binsum_ab 2 bash -c \
  'timeout 3600 python runs/run_binsum_ab.py >> runs/binsum_ab.log 2>&1'
plain_stage layout_ab 2 bash -c \
  'timeout 7200 python runs/run_layout_ab.py >> runs/layout_ab.log 2>&1'
plain_stage mlp_ab 2 bash -c \
  'timeout 7200 python runs/run_mlp_ab.py >> runs/mlp_ab.log 2>&1'
plain_stage bench 2 bash -c \
  'timeout 5400 python bench.py >> runs/bench_r03.log 2>&1'

# --- eval-tier A/B on the flagship ckpt (VERDICT r2 #8 done-criterion) ---
CKPT=runs/synthetic_shiny_flagship_fixed400/flagship_fixed400.th
tier_eval() {  # tier_eval <tier> <expname>
  timeout 5400 python train.py render_only=True "ckpt=$CKPT" \
    "eval_tier=$1" dataset=synthetic_shiny dataset.hemisphere=true \
    dataset.n_views=100 dataset.image_size=400 seed=20211200 \
    N_vis=2 basedir=runs "expname=$2" \
    >> "runs/tier_ab.log" 2>&1
}
if [ -f "$CKPT" ]; then
  for pair in "train tier_train400" "high tier_high400"; do
    set -- $pair
    d="runs/synthetic_shiny_$2/imgs_render"
    if [ -s "$d/mean.txt" ]; then
      echo "qv2: skip tier_$1 (done) $(date)" >> "$Q"
      continue
    fi
    ensure
    echo "qv2: start tier_$1 $(date)" >> "$Q"
    tier_eval "$1" "$2"
    rc=$?
    if [ -s "$d/mean.txt" ]; then
      echo "qv2: VERIFIED tier_$1 rc=$rc $(date)" >> "$Q"
    else
      echo "qv2: tier_$1 rc=$rc ARTIFACTS-INCOMPLETE $(date)" >> "$Q"
    fi
  done
else
  echo "qv2: no flagship ckpt; skipping tier_ab $(date)" >> "$Q"
fi

# --- cluster GI pair (VERDICT r2 #9) + noupsample variant ----------------
run_stage flagship_cluster400 runs/synthetic_cluster_flagship_cluster400 55 10 \
  bash runs/run_flagship_cluster400.sh
run_stage cluster400_noretrace runs/synthetic_cluster_cluster400_noretrace 55 10 \
  bash runs/run_flagship_cluster400_noretrace.sh
run_stage flagship_noup400 runs/synthetic_shiny_flagship_noup400 55 10 \
  bash runs/run_flagship_noup400.sh

# --- sh_grad envmap-supervision A/B (8k arms, 200px) ---------------------
shgrad_arm() {  # shgrad_arm <True|False> <expname>
  timeout 10800 python train.py model=microfacet_tensorf2 \
    dataset=synthetic_shiny dataset.hemisphere=true dataset.n_views=100 \
    dataset.image_size=200 seed=20211200 \
    model.params.max_batch_size=4096 model.params.n_iters=8000 \
    "model.arch.bg_module.sh_grad=$1" \
    save_every=2500 resume=True \
    vis_every=0 N_vis=2 basedir=runs "expname=$2" \
    progress_refresh_rate=512 render_test=True \
    >> runs/shgrad8k.log 2>&1
}
run_stage shgrad8k_on runs/synthetic_shiny_shgrad8k_on 10 4 \
  shgrad_arm True shgrad8k_on
run_stage shgrad8k_off runs/synthetic_shiny_shgrad8k_off 10 4 \
  shgrad_arm False shgrad8k_off

echo "QV2 DONE $(date)" >> "$Q"
