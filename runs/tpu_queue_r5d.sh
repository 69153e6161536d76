#!/bin/bash
# Round-5 session queue, part B — chains on qr5a (30k headline). Carries the
# rest of the VERDICT r4 program, importance-ordered:
#   1. merge_ab          (~25 min; run-collapsed shading step-time A/B on the
#                         FIXED merge code: z_m stop-gradient per ADVICE r4)
#   2. merge16b2_8k      (~95 min; merge_runs=16 ON TOP of the shipped x2
#                         budgets — decision A/B vs thin_budget2x8k 31.65 dB)
#   3. refnerf_studio8k  (~90 min; first-ever refnerf quality row)
#   4. thin_adapt8k      (~80 min; adaptive budget controller's first
#                         quality evidence)
#   5. b2x_tier_high     (~20 min; tier-high eval of the 31.65 ckpt)
#   6. bscale            (~45 min; batch-scaling curve)
#   7. layout5_ab        (if runs/run_layout5_ab.py exists; corner-feature
#                         producer-layout experiments)
#   8. shgrad seed-2 pair + tensorf_studio400 (long-deadline-gated tail)
#   9. trace_r5 + fresh in-queue bench, then STOP + drain so the driver's
#      end-of-round bench measures an idle chip (VERDICT next-#4).
cd /root/repo
QPREFIX=qr5d
Q=runs/tpu_queue.log
STOPF=runs/QUEUE_STOP
source runs/verify_run.sh
echo $$ > /tmp/qr5d.pid

# no NEW long stage after LONG_DL; no new stage at all after ALL_DL
LONG_DL=$(date -d '2026-08-20 20:10 UTC' +%s)
ALL_DL=$(date -d '2026-08-20 21:45 UTC' +%s)
past() { [ "$(date +%s)" -ge "$1" ]; }

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
  if past "$ALL_DL"; then
    echo "$QPREFIX: skip $name (past ALL deadline) $(date)" >> "$Q"
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

long_stage() {  # gate a >60min stage on LONG_DL, then run_stage
  if past "$LONG_DL"; then
    echo "$QPREFIX: skip $1 (past LONG deadline) $(date)" >> "$Q"
    return 0
  fi
  run_stage "$@"
}

plain_stage() {
  local name=$1 max=$2; shift 2
  local mark="runs/.done_$name"
  if [ -f "$mark" ]; then
    echo "$QPREFIX: skip $name (done-marker) $(date)" >> "$Q"
    return 0
  fi
  if past "$ALL_DL"; then
    echo "$QPREFIX: skip $name (past ALL deadline) $(date)" >> "$Q"
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
    if past "$ALL_DL"; then
      echo "$QPREFIX: skip $name (past ALL deadline) $(date)" >> "$Q"
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

arm8ks_model() {  # like arm8ks but with a chosen model config group
  local model=$1 exp=$2; shift 2
  timeout 10800 python train.py "model=$model" \
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
export -f arm8ks_model

# chain: wait for qr5a (headline) to finish
for dep in /tmp/qr5a.pid; do
  while [ -f "$dep" ] && kill -0 "$(cat $dep)" 2>/dev/null; do
    sleep 30
  done
done
rm -f "$STOPF"
echo "$QPREFIX: qr5a drained, starting $(date)" >> "$Q"

# --- 1. run-collapsed shading step-time A/B (fixed merge code) ---------------
plain_stage merge_ab5 2 bash -c \
  'timeout 4800 python runs/run_merge_ab.py >> runs/merge_ab.log 2>&1'

# --- 2. corner-feature producer-layout x merge 2x2 A/B (VERDICT next-#1) -----
plain_stage layout5_ab 2 bash -c \
  'timeout 5400 python runs/run_layout5_ab.py >> runs/layout5_ab.log 2>&1'

# --- 3. merge quality arm ON the shipped x2 budgets (vs 31.65 control) -------
long_stage merge16b2_8k runs/synthetic_studio_merge16b2_8k 10 3 \
  arm8ks merge16b2_8k "model.arch.model.brdf_ray_budget=[131072,32768]" \
  model.arch.merge_runs=16

# --- 3b. sh_grad x (x2 budgets) combo: round-4 shgrad arm improved EVERY
#         view (+2.27 dB, norm-err -8.3deg) at x1 budgets; this measures
#         additivity with the shipped preset (control: thin_budget2x8k 31.65)
long_stage shgradb2_8k runs/synthetic_studio_shgradb2_8k 10 3 \
  arm8ks shgradb2_8k "model.arch.model.brdf_ray_budget=[131072,32768]" \
  model.arch.bg_module.sh_grad=True

# --- 4. first refnerf quality row (VERDICT weak #7) --------------------------
long_stage refnerf_studio8k runs/synthetic_studio_refnerf_studio8k 10 3 \
  arm8ks_model refnerf refnerf_studio8k

# --- 5. adaptive budget controller quality arm (VERDICT next #3) -------------
long_stage thin_adapt8k runs/synthetic_studio_thin_adapt8k 10 3 \
  arm8ks thin_adapt8k model.params.adapt_brdf_budget=true

# --- 6. batch-scaling curve (VERDICT next #9) --------------------------------
plain_stage bscale 2 bash -c \
  'timeout 4800 python runs/run_bscale.py >> runs/bscale.log 2>&1'

# --- 7. tier-high eval of the x2-budget ckpt (from r4g, still pending) -------
eval_stage b2x_tier_high \
  runs/synthetic_studio_thin_budget2x8k/synthetic_studio_thin_budget2x8k.th \
  runs/synthetic_studio_b2x_tier_high b2x_tier_high high \
  dataset=synthetic_studio dataset.hemisphere=true dataset.n_views=100 \
  dataset.image_size=400 N_vis=20

# --- 8. long-tail arms (deadline-gated) --------------------------------------
long_stage shgrad8k_s2 runs/synthetic_studio_shgrad8k_s2 10 2 \
  arm8ks shgrad8k_s2 seed=20260820 model.arch.bg_module.sh_grad=True
long_stage control8k_s2 runs/synthetic_studio_control8k_s2 10 2 \
  arm8ks control8k_s2 seed=20260820
long_stage tensorf_studio400 runs/synthetic_studio_tensorf_studio400 55 2 \
  bash runs/run_tensorf_studio400.sh

# --- 9. fresh per-op trace + in-queue bench, then drain ----------------------
plain_stage trace_r5 2 bash -c \
  'timeout 2400 python runs/run_trace.py > runs/trace_r5.log 2>&1'
plain_stage bench_r5 2 bash -c \
  'timeout 1800 python bench.py > runs/bench_r5_inqueue.json 2>runs/bench_r5_inqueue.err'

echo "QR5D DONE — chip drained $(date)" >> "$Q"
