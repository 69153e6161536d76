#!/bin/bash
# Round-4 session-12 queue. The r4e queue died with the session at its
# first stage; the inter-session restore also wiped all gitignored run
# artifacts (*.th checkpoints, .jax_cache, .dataset_cache), which kills
# the two ckpt-dependent eval stages (lrc_tier_high, tier_ultra — the
# shiny tier_high artifact at runs/synthetic_shiny_tier_high400 already
# proves the eval_tier claim: 24.14 dB vs 20.80 at tier_train) and the
# 800px arm's pregen gate. Remaining stages re-ordered by value-per-
# minute for a ~4 h session:
#   1. trace_r4         (~4 min; decides the round-5 kernel program)
#   2. thin_budget2x8k  (~85 min; the single most-informative thinning arm)
#   3. shgrad_studio8k  (~85 min; envmap A/B — control thin_base8k landed)
#   4. thin_retrace4x8k (~85 min; second thinning-curve arm)
#   5+ best-effort: thin_adapt8k, shiny shgrad pair, bscale, opt-in arms.
cd /root/repo
QPREFIX=qr4f
Q=runs/tpu_queue.log
STOPF=runs/QUEUE_STOP
source runs/verify_run.sh
echo $$ > /tmp/qr4f.pid

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

plain_stage() {
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

arm8ks() {  # studio 400px 8k arm (same protocol as thin_base8k / qr4)
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

arm8k() {  # shiny 200px 8k arm (same protocol as qr4)
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

rm -f "$STOPF"
echo "$QPREFIX: starting $(date)" >> "$Q"

# --- 1. fresh per-op trace (decides the round-5 kernel program) ---------------
plain_stage trace_r4 2 bash -c \
  'timeout 2400 python runs/run_trace.py ${NMF_TRACE_OVERRIDES:-} >> runs/trace_r4.log 2>&1'

# --- 2. thinning cost curve (VERDICT next #5) ---------------------------------
run_stage thin_budget2x8k runs/synthetic_studio_thin_budget2x8k 10 3 \
  arm8ks thin_budget2x8k "model.arch.model.brdf_ray_budget=[131072,32768]"

# --- 3. sh_grad envmap A/B on the headline scene (VERDICT next #4) -------------
# Control = thin_base8k (27.99 dB / envmap_psnr_top 12.83, identical protocol).
run_stage shgrad_studio8k runs/synthetic_studio_shgrad_studio8k 10 3 \
  arm8ks shgrad_studio8k model.arch.bg_module.sh_grad=True

# --- 4. second thinning-curve arm ----------------------------------------------
run_stage thin_retrace4x8k runs/synthetic_studio_thin_retrace4x8k 10 3 \
  arm8ks thin_retrace4x8k "model.arch.model.max_retrace_rays=[4096]"

# --- 5. adaptive-budget quality arm (vs the static thin curve) ------------------
run_stage thin_adapt8k runs/synthetic_studio_thin_adapt8k 10 3 \
  arm8ks thin_adapt8k model.params.adapt_brdf_budget=true

# --- 6. sh_grad A/B on the mirror scene (where envmap recovery should shine) ---
run_stage shgrad8k_on runs/synthetic_shiny_shgrad8k_on 10 3 \
  arm8k shgrad8k_on model.arch.bg_module.sh_grad=True
run_stage dist8k runs/synthetic_shiny_dist8k 10 3 \
  arm8k dist8k

# --- 7. batch-scaling probe (perf lever) ----------------------------------------
plain_stage bscale 2 bash -c \
  'timeout 4800 python runs/run_bscale.py >> runs/bscale.log 2>&1'

# --- 8. dormant opt-in arms (shiny 8k) ------------------------------------------
run_stage pbright8k runs/synthetic_shiny_pbright8k 10 3 \
  arm8k pbright8k model.arch.model.percent_bright=0.2
run_stage rr8k runs/synthetic_shiny_rr8k 10 3 \
  arm8k rr8k model.arch.model.russian_roulette=true

# --- 9. studio tensorf comparison row --------------------------------------------
run_stage tensorf_studio400 runs/synthetic_studio_tensorf_studio400 55 4 \
  bash runs/run_tensorf_studio400.sh

echo "QR4F DONE $(date)" >> "$Q"
