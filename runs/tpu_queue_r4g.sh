#!/bin/bash
# Round-4 session-13 queue. thin_budget2x8k landed at 31.65 dB vs the
# 27.99 control (+3.66 dB): the x1 bounce budgets' thinning (0.62 L0)
# was the single largest known quality tax. Re-ordered remainder for a
# ~4 h session:
#   1. shgrad_studio8k  (VERDICT next #4 envmap A/B; usually already
#                        landed by qr4f before the STOP — idempotent)
#   2. thin_b2r4_8k     (~95 min; budget x2 + retrace x4 combo — the
#                        round-5 30k headline recipe candidate. The long
#                        stage runs before the short evals so a
#                        session-end cutoff hits the evals, not the arm)
#   3. b2x_tier_high    (~20 min; tier_high eval of the fresh 31.65 dB
#                        thin_budget2x8k ckpt before the inter-session
#                        wipe deletes it; N_vis=20 matches its final)
#   4. b2x_trace        (~5 min; per-op trace at the x2-budget config)
#   5. merge_ab         (~30 min; run-collapsed shading step-time A/B)
#   6. merge16_8k       (~90 min; run-collapsed shading quality arm)
#   7+ best-effort: thin_retrace4x8k, thin_adapt8k, shiny shgrad pair,
#      bscale, opt-in arms, tensorf studio row.
cd /root/repo
QPREFIX=qr4g
Q=runs/tpu_queue.log
STOPF=runs/QUEUE_STOP
source runs/verify_run.sh
echo $$ > /tmp/qr4g.pid

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

eval_stage() {  # <name> <ckpt> <rundir> <expname> <tier> <overrides...>
  local name=$1 ckpt=$2 d=$3 exp=$4 tier=$5; shift 5
  d="$d/imgs_render"
  if [ ! -f "$ckpt" ]; then
    echo "$QPREFIX: no ckpt at $ckpt; skip $name $(date)" >> "$Q"
    return 0
  fi
  local a
  for a in 1 2 3; do
    if [ -s "$d/mean.txt" ]; then
      echo "$QPREFIX: skip $name (done) $(date)" >> "$Q"
      return 0
    fi
    check_stop
    ensure
    echo "$QPREFIX: start $name attempt $a $(date)" >> "$Q"
    run_pg timeout 10800 python train.py render_only=True "ckpt=$ckpt" \
      "eval_tier=$tier" seed=20211200 N_vis=-1 basedir=runs \
      "expname=$exp" "$@" >> runs/tier_ab.log 2>&1
    if [ -s "$d/mean.txt" ]; then
      echo "$QPREFIX: VERIFIED $name attempt $a $(date)" >> "$Q"
      return 0
    fi
    echo "$QPREFIX: $name attempt $a ARTIFACTS-INCOMPLETE $(date)" >> "$Q"
    sleep 60
  done
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

# wait for the old queue to drain (it exits on the STOP file), then
# clear the STOP so this queue runs
for dep in /tmp/qr4f.pid; do
  while [ -f "$dep" ] && kill -0 "$(cat $dep)" 2>/dev/null; do
    sleep 30
  done
done
rm -f "$STOPF"
echo "$QPREFIX: old chain drained, starting $(date)" >> "$Q"

# --- 1. sh_grad envmap A/B on the headline scene (VERDICT next #4) -------------
# (usually already landed by qr4f before the STOP; idempotent skip)
run_stage shgrad_studio8k runs/synthetic_studio_shgrad_studio8k 10 3 \
  arm8ks shgrad_studio8k model.arch.bg_module.sh_grad=True

# --- 2. budget x2 + retrace x4 combo: the round-5 headline recipe candidate ----
# (the long stage runs FIRST so a session-end cutoff hits the short evals,
#  not the arm)
run_stage thin_b2r4_8k runs/synthetic_studio_thin_b2r4_8k 10 3 \
  arm8ks thin_b2r4_8k "model.arch.model.brdf_ray_budget=[131072,32768]" \
  "model.arch.model.max_retrace_rays=[4096]"

# --- 3. tier_high eval of the fresh 31.65 dB x2-budget ckpt (wiped at session end)
eval_stage b2x_tier_high \
  runs/synthetic_studio_thin_budget2x8k/synthetic_studio_thin_budget2x8k.th \
  runs/synthetic_studio_b2x_tier_high b2x_tier_high high \
  dataset=synthetic_studio dataset.hemisphere=true dataset.n_views=100 \
  dataset.image_size=400 N_vis=20

# --- 4. per-op trace at the x2-budget config (round-5 kernel program input) ----
plain_stage b2x_trace 2 bash -c \
  'timeout 2400 python runs/run_trace.py "model.arch.model.brdf_ray_budget=[131072,32768]" >> runs/trace_b2x.log 2>&1'

# --- 5. run-collapsed shading perf A/B (merge_runs; ops/runs.py) ----------------
plain_stage merge_ab 2 bash -c \
  'timeout 4800 python runs/run_merge_ab.py >> runs/merge_ab.log 2>&1'

# --- 6. run-collapsed shading quality arm (vs thin_base8k control) ---------------
run_stage merge16_8k runs/synthetic_studio_merge16_8k 10 3 \
  arm8ks merge16_8k model.arch.merge_runs=16

# --- 7. remaining thinning-curve arms -------------------------------------------
run_stage thin_retrace4x8k runs/synthetic_studio_thin_retrace4x8k 10 3 \
  arm8ks thin_retrace4x8k "model.arch.model.max_retrace_rays=[4096]"
run_stage thin_adapt8k runs/synthetic_studio_thin_adapt8k 10 3 \
  arm8ks thin_adapt8k model.params.adapt_brdf_budget=true

# --- 6. sh_grad A/B on the mirror scene -----------------------------------------
run_stage shgrad8k_on runs/synthetic_shiny_shgrad8k_on 10 3 \
  arm8k shgrad8k_on model.arch.bg_module.sh_grad=True
run_stage dist8k runs/synthetic_shiny_dist8k 10 3 \
  arm8k dist8k

# --- 7. batch-scaling probe (perf lever) -----------------------------------------
plain_stage bscale 2 bash -c \
  'timeout 4800 python runs/run_bscale.py >> runs/bscale.log 2>&1'

# --- 8. dormant opt-in arms (shiny 8k) -------------------------------------------
run_stage pbright8k runs/synthetic_shiny_pbright8k 10 3 \
  arm8k pbright8k model.arch.model.percent_bright=0.2
run_stage rr8k runs/synthetic_shiny_rr8k 10 3 \
  arm8k rr8k model.arch.model.russian_roulette=true

# --- 9. studio tensorf comparison row ---------------------------------------------
run_stage tensorf_studio400 runs/synthetic_studio_tensorf_studio400 55 4 \
  bash runs/run_tensorf_studio400.sh

echo "QR4G DONE $(date)" >> "$Q"
