#!/bin/bash
# Round-3 TPU queue, v5 (supersedes v4; stages idempotent via verify_run
# so swaps are free). Changes vs v4: tier_train400 promoted right after
# the binsum A/B -- as a render_only full-test-set (N_vis=-1) eval of the
# flagship checkpoint it doubles as the HEADLINE mean.txt (the in-run
# final eval was started with N_vis=2 before final_N_vis existed);
# tier_high400 after the studio flagship; 8k arms report full-set finals.
# Takes an optional live-flagship PID as $1.
cd /root/repo
QPREFIX=qv5
source runs/queue_lib.sh

if [ -n "$1" ]; then
  echo "qv5: waiting on live pid $1 $(date)" >> "$Q"
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  echo "qv5: pid $1 exited $(date)" >> "$Q"
fi

CKPT=runs/synthetic_shiny_flagship_fixed400/synthetic_shiny_flagship_fixed400.th
tier_eval() {  # tier_eval <tier> <expname>
  timeout 7200 python train.py render_only=True "ckpt=$CKPT" \
    "eval_tier=$1" dataset=synthetic_shiny dataset.hemisphere=true \
    dataset.n_views=100 dataset.image_size=400 seed=20211200 \
    N_vis=-1 basedir=runs "expname=$2" \
    >> "runs/tier_ab.log" 2>&1
}
tier_stage() {  # tier_stage <tier> <expname>
  local d="runs/synthetic_shiny_$2/imgs_render"
  if [ ! -f "$CKPT" ]; then
    echo "qv5: no flagship ckpt at $CKPT; skip tier_$1 $(date)" >> "$Q"
    return 0
  fi
  if [ -s "$d/mean.txt" ]; then
    echo "qv5: skip tier_$1 (done) $(date)" >> "$Q"
    return 0
  fi
  ensure
  echo "qv5: start tier_$1 $(date)" >> "$Q"
  tier_eval "$1" "$2"
  local rc=$?
  if [ -s "$d/mean.txt" ]; then
    echo "qv5: VERIFIED tier_$1 rc=$rc $(date)" >> "$Q"
  else
    echo "qv5: tier_$1 rc=$rc ARTIFACTS-INCOMPLETE $(date)" >> "$Q"
  fi
}

# --- must-land ------------------------------------------------------------
run_stage flagship_fixed400 runs/synthetic_shiny_flagship_fixed400 55 10 \
  bash runs/run_flagship_fixed400.sh
run_stage tensorf_hemi400 runs/synthetic_shiny_tensorf_hemi400 55 8 \
  bash runs/run_tensorf_hemi400.sh
plain_stage binsum_ab 2 bash -c \
  'timeout 3600 python runs/run_binsum_ab.py >> runs/binsum_ab.log 2>&1'
tier_stage train tier_train400   # full-test-set headline eval of the flagship
run_stage flagship_studio400 runs/synthetic_studio_flagship_studio400 55 10 \
  bash runs/run_flagship_studio400.sh
tier_stage high tier_high400     # VERDICT r2 #8: bigger test-time MC budgets

# --- perf A/Bs + bench ------------------------------------------------------
plain_stage layout_ab 2 bash -c \
  'timeout 7200 python runs/run_layout_ab.py >> runs/layout_ab.log 2>&1'
plain_stage mlp_ab 2 bash -c \
  'timeout 7200 python runs/run_mlp_ab.py >> runs/mlp_ab.log 2>&1'
plain_stage bench 2 bash -c \
  'timeout 5400 python bench.py >> runs/bench_r03.log 2>&1'

# --- remaining protocol rows -----------------------------------------------
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
run_stage shgrad8k_on runs/synthetic_shiny_shgrad8k_on 10 4 \
  arm8k shgrad8k_on model.arch.bg_module.sh_grad=True
run_stage shgrad8k_off runs/synthetic_shiny_shgrad8k_off 10 4 \
  arm8k shgrad8k_off model.arch.bg_module.sh_grad=False
# normals-oracle: attributes the shiny-scene train/test gap between
# geometry and envmap co-adaptation (baseline = shgrad8k_off)
run_stage normoracle8k runs/synthetic_shiny_normoracle8k 10 4 \
  arm8k normoracle8k model.params.normal_err_lambda=0.02

run_stage flagship_noup400 runs/synthetic_shiny_flagship_noup400 55 10 \
  bash runs/run_flagship_noup400.sh

echo "QV5 DONE $(date)" >> "$Q"
