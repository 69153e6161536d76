#!/bin/bash
# Round-4 third queue: eval_tier curve completion + the two dormant
# opt-ins VERDICT r3 weak #5 lists that fit this round's chip budget.
#   1. tier_ultra spot-check (x4 test-time MC budgets, 30-view subset —
#      tier_high landed +3.3 dB over train tier; this bounds the curve).
#   2. tier_high eval of the corrected studio headline ckpt (if the lrc
#      run completed): the headline may owe dB to eval-time MC variance
#      exactly like the shiny scene did.
#   3. percent_bright 8k shiny arm (envmap importance mixing — mirror
#      scenes are where bright-ray sampling should pay).
#   4. russian_roulette 8k shiny arm.
cd /root/repo
QPREFIX=qr4c
Q=runs/tpu_queue.log
STOPF=runs/QUEUE_STOP
source runs/queue_lib.sh
echo $$ > /tmp/qr4c.pid

check_stop() {
  if [ -f "$STOPF" ]; then
    echo "$QPREFIX: STOP file present, exiting $(date)" >> "$Q"
    exit 0
  fi
}

for dep in /tmp/qr4.pid /tmp/qr4b.pid; do
  while [ -f "$dep" ] && kill -0 "$(cat $dep)" 2>/dev/null; do
    check_stop
    sleep 120
  done
done
echo "$QPREFIX: predecessors drained, starting $(date)" >> "$Q"

# --- 1. ultra tier spot-check on the shiny fixed400 ckpt ---------------------
CKPT=runs/synthetic_shiny_flagship_fixed400/synthetic_shiny_flagship_fixed400.th
ULTRA_DIR=runs/synthetic_shiny_tier_ultra400/imgs_render
if [ -f "$CKPT" ] && [ ! -s "$ULTRA_DIR/mean.txt" ]; then
  ensure
  echo "$QPREFIX: start tier_ultra $(date)" >> "$Q"
  timeout 10800 python train.py render_only=True "ckpt=$CKPT" \
    eval_tier=ultra dataset=synthetic_shiny dataset.hemisphere=true \
    dataset.n_views=100 dataset.image_size=400 seed=20211200 \
    N_vis=30 basedir=runs expname=tier_ultra400 \
    >> runs/tier_ab.log 2>&1
  echo "$QPREFIX: tier_ultra rc=$? $(date)" >> "$Q"
fi

# --- 2. tier_high eval of the corrected studio headline ----------------------
LRC_CKPT=runs/synthetic_studio_flagship_studio400_lrc/synthetic_studio_flagship_studio400_lrc.th
LRC_HIGH_DIR=runs/synthetic_studio_lrc_tier_high/imgs_render
if [ -f "$LRC_CKPT" ] && [ ! -s "$LRC_HIGH_DIR/mean.txt" ]; then
  ensure
  echo "$QPREFIX: start lrc_tier_high $(date)" >> "$Q"
  timeout 10800 python train.py render_only=True "ckpt=$LRC_CKPT" \
    eval_tier=high dataset=synthetic_studio dataset.hemisphere=true \
    dataset.n_views=100 dataset.image_size=400 seed=20211200 \
    N_vis=-1 basedir=runs expname=lrc_tier_high \
    >> runs/tier_ab.log 2>&1
  echo "$QPREFIX: lrc_tier_high rc=$? $(date)" >> "$Q"
else
  echo "$QPREFIX: no lrc ckpt yet; skip lrc_tier_high $(date)" >> "$Q"
fi

# --- 3/4. dormant opt-in arms (8k shiny, same protocol as dist8k) ------------
arm8k() {
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
run_stage pbright8k runs/synthetic_shiny_pbright8k 10 3 \
  arm8k pbright8k model.arch.model.percent_bright=0.2
run_stage rr8k runs/synthetic_shiny_rr8k 10 3 \
  arm8k rr8k model.arch.model.russian_roulette=true

echo "QR4C DONE $(date)" >> "$Q"
