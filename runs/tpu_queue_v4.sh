#!/bin/bash
# Round-3 TPU queue, v4 ordering (supersedes v3; stages idempotent via
# verify_run so the swap is free). Session-aware priority: the two shiny
# 400px headline rows, the binsum A/B (VERDICT r2 #5 measurement), and
# the studio quality-headline flagship must land inside this session;
# everything else is gravy that the queue keeps draining while the
# machine lives. Takes an optional live-flagship PID as $1.
cd /root/repo
QPREFIX=qv4
source runs/queue_lib.sh

if [ -n "$1" ]; then
  echo "qv4: waiting on live pid $1 $(date)" >> "$Q"
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  echo "qv4: pid $1 exited $(date)" >> "$Q"
fi

# --- must-land ------------------------------------------------------------
run_stage flagship_fixed400 runs/synthetic_shiny_flagship_fixed400 55 10 \
  bash runs/run_flagship_fixed400.sh
run_stage tensorf_hemi400 runs/synthetic_shiny_tensorf_hemi400 55 8 \
  bash runs/run_tensorf_hemi400.sh
plain_stage binsum_ab 2 bash -c \
  'timeout 3600 python runs/run_binsum_ab.py >> runs/binsum_ab.log 2>&1'
run_stage flagship_studio400 runs/synthetic_studio_flagship_studio400 55 10 \
  bash runs/run_flagship_studio400.sh

# --- perf A/Bs + eval-tier A/B + bench -------------------------------------
plain_stage layout_ab 2 bash -c \
  'timeout 7200 python runs/run_layout_ab.py >> runs/layout_ab.log 2>&1'
plain_stage mlp_ab 2 bash -c \
  'timeout 7200 python runs/run_mlp_ab.py >> runs/mlp_ab.log 2>&1'

# train.py names the final checkpoint {scenedir}_{expname}.th in the run dir
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
      echo "qv4: skip tier_$1 (done) $(date)" >> "$Q"
      continue
    fi
    ensure
    echo "qv4: start tier_$1 $(date)" >> "$Q"
    tier_eval "$1" "$2"
    rc=$?
    if [ -s "$d/mean.txt" ]; then
      echo "qv4: VERIFIED tier_$1 rc=$rc $(date)" >> "$Q"
    else
      echo "qv4: tier_$1 rc=$rc ARTIFACTS-INCOMPLETE $(date)" >> "$Q"
    fi
  done
else
  echo "qv4: no flagship ckpt at $CKPT; skipping tier_ab $(date)" >> "$Q"
fi

plain_stage bench 2 bash -c \
  'timeout 5400 python bench.py >> runs/bench_r03.log 2>&1'

# --- remaining protocol rows -----------------------------------------------
run_stage tensorf_studio400 runs/synthetic_studio_tensorf_studio400 55 8 \
  bash runs/run_tensorf_studio400.sh
run_stage flagship_cluster400 runs/synthetic_cluster_flagship_cluster400 55 10 \
  bash runs/run_flagship_cluster400.sh
run_stage cluster400_noretrace runs/synthetic_cluster_cluster400_noretrace 55 10 \
  bash runs/run_flagship_cluster400_noretrace.sh

# --- sh_grad envmap-supervision A/B (8k arms, 200px) ------------------------
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

# --- normals-oracle diagnostic (geometry vs envmap attribution of the
# shiny-scene train/test gap; compare against shgrad8k_off, the matching
# 8k baseline) ---------------------------------------------------------------
normals_arm() {
  timeout 10800 python train.py model=microfacet_tensorf2 \
    dataset=synthetic_shiny dataset.hemisphere=true dataset.n_views=100 \
    dataset.image_size=200 seed=20211200 \
    model.params.max_batch_size=4096 model.params.n_iters=8000 \
    model.params.normal_err_lambda=0.02 \
    save_every=2500 resume=True \
    vis_every=0 N_vis=2 basedir=runs expname=normoracle8k \
    progress_refresh_rate=512 render_test=True \
    >> runs/normoracle8k.log 2>&1
}
run_stage normoracle8k runs/synthetic_shiny_normoracle8k 10 4 normals_arm

run_stage flagship_noup400 runs/synthetic_shiny_flagship_noup400 55 10 \
  bash runs/run_flagship_noup400.sh

echo "QV4 DONE $(date)" >> "$Q"
