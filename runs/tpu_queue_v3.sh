#!/bin/bash
# Round-3 TPU queue, v3 ordering (supersedes tpu_queue_r3.sh + _r3b.sh,
# whose stages it contains). Artifact-verified stages via runs/queue_lib.sh;
# the perf A/Bs and bench run right after the two HEADLINE protocol rows
# (flagship_fixed400 + tensorf_hemi400) so the VERDICT r2 #5 measurement
# lands inside a session instead of behind ~11 h of protocol runs. Every
# stage is idempotent (verify_run-skipped when complete) so restarts are
# free.
#
# Takes an optional PID as $1: an already-running flagship attempt to
# wait on before stage 1 (used when the queue is restarted around a live
# training process).
cd /root/repo
QPREFIX=qv2
source runs/queue_lib.sh

if [ -n "$1" ]; then
  echo "qv2: waiting on live pid $1 $(date)" >> "$Q"
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  echo "qv2: pid $1 exited $(date)" >> "$Q"
fi

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
# train.py names the final checkpoint {scenedir}_{expname}.th inside the
# run dir (train.py:127,437).
CKPT=runs/synthetic_shiny_flagship_fixed400/synthetic_shiny_flagship_fixed400.th
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
  echo "qv2: no flagship ckpt at $CKPT; skipping tier_ab $(date)" >> "$Q"
fi

# --- studio quality-headline pair (well-posed scene; see
# configs/dataset/synthetic_studio.yaml) --------------------------------
run_stage flagship_studio400 runs/synthetic_studio_flagship_studio400 55 10 \
  bash runs/run_flagship_studio400.sh
run_stage tensorf_studio400 runs/synthetic_studio_tensorf_studio400 55 8 \
  bash runs/run_tensorf_studio400.sh

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
