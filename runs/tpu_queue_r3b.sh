#!/bin/bash
# Round-3 follow-on TPU stages (run after tpu_queue_r3.sh or standalone
# when the chip is free):
#   1. tier_ab     — eval_tier=train vs =high render_only re-eval of the
#                    completed 400px flagship checkpoint (VERDICT r2 next
#                    #8 done-criterion: PSNR delta from bigger test-time MC
#                    budgets).
#   2. shgrad_8k   — 8k-iter hemisphere flagship probe with bg sh_grad=true
#                    (coarse-scale envmap supervision extension) to compare
#                    envmap_psnr_top against the detached baseline.
# Both stages are artifact-verified and idempotent (skip when already done).
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
    echo "q3b: tunnel down $(date)" >> "$Q"
    sleep 120
  done
  echo "q3b: tunnel live $(date)" >> "$Q"
}

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
      echo "q3b: skip tier_$1 (done) $(date)" >> "$Q"
      continue
    fi
    ensure
    echo "q3b: start tier_$1 $(date)" >> "$Q"
    tier_eval "$1" "$2"
    rc=$?
    if [ -s "$d/mean.txt" ]; then
      echo "q3b: VERIFIED tier_$1 rc=$rc $(date)" >> "$Q"
    else
      echo "q3b: tier_$1 rc=$rc ARTIFACTS-INCOMPLETE $(date)" >> "$Q"
    fi
  done
else
  echo "q3b: no flagship_fixed400 ckpt; skipping tier_ab $(date)" >> "$Q"
fi

# sh_grad A/B: two 8k-iter arms, identical but for the knob, both with a
# final eval so envmap_psnr_top is directly comparable.
shgrad_arm() {  # shgrad_arm <on|off> <expname>
  local flag=False
  [ "$1" = on ] && flag=True
  timeout 10800 python train.py model=microfacet_tensorf2 \
    dataset=synthetic_shiny dataset.hemisphere=true dataset.n_views=100 \
    dataset.image_size=200 seed=20211200 \
    model.params.max_batch_size=4096 model.params.n_iters=8000 \
    "model.arch.bg_module.sh_grad=$flag" \
    save_every=2500 resume=True \
    vis_every=0 N_vis=2 basedir=runs "expname=$2" \
    progress_refresh_rate=512 render_test=True \
    >> runs/shgrad8k.log 2>&1
}

for pair in "on shgrad8k_on" "off shgrad8k_off"; do
  set -- $pair
  if verify_run "runs/synthetic_shiny_$2" 10; then
    echo "q3b: skip shgrad_8k_$1 (done) $(date)" >> "$Q"
    continue
  fi
  ensure
  echo "q3b: start shgrad_8k_$1 $(date)" >> "$Q"
  shgrad_arm "$1" "$2"
  rc=$?
  if verify_run "runs/synthetic_shiny_$2" 10; then
    echo "q3b: VERIFIED shgrad_8k_$1 rc=$rc $(date)" >> "$Q"
  else
    echo "q3b: shgrad_8k_$1 rc=$rc ARTIFACTS-INCOMPLETE $(date)" >> "$Q"
  fi
done
echo "Q3B DONE $(date)" >> "$Q"
