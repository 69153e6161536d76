#!/bin/bash
# Round-4 consolidated priority queue. The r4/r4b/r4c/r4d chain held the
# cheap high-value stages (tier_high eval of the NEW 32.28 dB headline,
# sh_grad envmap arms, the round-5-deciding trace, the batch-scaling
# probe) behind ~12 h of long arms — more chip time than the round has
# left. This queue re-orders the REMAINING stages by value-per-minute;
# every stage is idempotent (verify_run artifacts / done-markers), so
# anything already completed by the old chain is skipped.
cd /root/repo
QPREFIX=qr4e
Q=runs/tpu_queue.log
STOPF=runs/QUEUE_STOP
source runs/verify_run.sh
echo $$ > /tmp/qr4e.pid

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
  return 1
}

arm8ks() {  # studio 400px 8k arm (same protocol as qr4)
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

# wait for the old chain to drain (they exit on the STOP file), then
# clear the STOP so this queue runs
for dep in /tmp/qr4.pid /tmp/qr4b.pid /tmp/qr4c.pid /tmp/qr4d.pid; do
  while [ -f "$dep" ] && kill -0 "$(cat $dep)" 2>/dev/null; do
    sleep 60
  done
done
rm -f "$STOPF"
echo "$QPREFIX: old chain drained, starting $(date)" >> "$Q"

# --- 1. tier_high eval of the 32.28 dB headline (cheap, headline-raising) ---
eval_stage lrc_tier_high \
  runs/synthetic_studio_flagship_studio400_lrc/synthetic_studio_flagship_studio400_lrc.th \
  runs/synthetic_studio_lrc_tier_high lrc_tier_high high \
  dataset=synthetic_studio dataset.hemisphere=true dataset.n_views=100 \
  dataset.image_size=400

# --- 2. thinning cost curve (VERDICT next #5) --------------------------------
run_stage thin_base8k runs/synthetic_studio_thin_base8k 10 3 \
  arm8ks thin_base8k
run_stage thin_budget2x8k runs/synthetic_studio_thin_budget2x8k 10 3 \
  arm8ks thin_budget2x8k "model.arch.model.brdf_ray_budget=[131072,32768]"
run_stage thin_retrace4x8k runs/synthetic_studio_thin_retrace4x8k 10 3 \
  arm8ks thin_retrace4x8k "model.arch.model.max_retrace_rays=[4096]"

# --- 3. sh_grad envmap A/B at scale (VERDICT next #4) -------------------------
run_stage shgrad8k_on runs/synthetic_shiny_shgrad8k_on 10 3 \
  arm8k shgrad8k_on model.arch.bg_module.sh_grad=True
run_stage dist8k runs/synthetic_shiny_dist8k 10 3 \
  arm8k dist8k

# --- 4. adaptive-budget quality arm (vs the static thin curve) ----------------
run_stage thin_adapt8k runs/synthetic_studio_thin_adapt8k 10 3 \
  arm8ks thin_adapt8k model.params.adapt_brdf_budget=true

# --- 5. fresh per-op trace (decides the round-5 kernel program) ---------------
plain_stage trace_r4 2 bash -c \
  'timeout 2400 python runs/run_trace.py ${NMF_TRACE_OVERRIDES:-} >> runs/trace_r4.log 2>&1'

# --- 6. batch-scaling probe (perf lever) --------------------------------------
plain_stage bscale 2 bash -c \
  'timeout 4800 python runs/run_bscale.py >> runs/bscale.log 2>&1'

# --- 7. eval-tier curve bound: ultra on the shiny fixed400 ckpt ---------------
eval_stage tier_ultra \
  runs/synthetic_shiny_flagship_fixed400/synthetic_shiny_flagship_fixed400.th \
  runs/synthetic_shiny_tier_ultra400 tier_ultra400 ultra \
  dataset=synthetic_shiny dataset.hemisphere=true dataset.n_views=100 \
  dataset.image_size=400 N_vis=30

# --- 8. dormant opt-in arms (shiny 8k) ----------------------------------------
run_stage pbright8k runs/synthetic_shiny_pbright8k 10 3 \
  arm8k pbright8k model.arch.model.percent_bright=0.2
run_stage rr8k runs/synthetic_shiny_rr8k 10 3 \
  arm8k rr8k model.arch.model.russian_roulette=true

# --- 9. studio tensorf comparison row -----------------------------------------
run_stage tensorf_studio400 runs/synthetic_studio_tensorf_studio400 55 4 \
  bash runs/run_tensorf_studio400.sh

# --- 10. bench refresh on shipped defaults ------------------------------------
plain_stage bench_refresh 2 bash -c \
  'timeout 3600 python bench.py >> runs/bench_r04.log 2>&1'

# --- 11. 800px supervision-density row LAST (resumable into round 5) ----------
# gate on the pre-generated GT cache: inline regeneration on this 1-core
# host would burn hours of queue time
CDIR=runs/.dataset_cache
have_800() {
  ls "$CDIR"/shiny_v3.*_studio_train_n100_800x800_*.npz >/dev/null 2>&1 \
    && ls "$CDIR"/shiny_v3.*_studio_test_n100_800x800_*.npz >/dev/null 2>&1
}
if have_800; then
  # migrate old-hash-key files to the current key if needed (pregen ran
  # under the pre-make_shiny_dataset-hash key; GT content is identical)
  python - <<'EOF'
import shutil, sys
from pathlib import Path
sys.path.insert(0, "/root/repo")
from nmf_tpu.data.synthetic import _gt_content_hash
key = _gt_content_hash()
cdir = Path("/root/repo/runs/.dataset_cache")
for f in cdir.glob("shiny_v3.*_studio_*_n100_800x800_*.npz"):
    parts = f.name.split("_", 1)
    want = f"shiny_v3.{key}_{f.name.split('_', 2)[2]}"
    tgt = cdir / want
    if not tgt.exists():
        shutil.copy2(f, tgt)
        print("migrated", f.name, "->", want)
EOF
  run_stage flagship_studio800 runs/synthetic_studio_flagship_studio800 55 8 \
    bash runs/run_flagship_studio800.sh
else
  echo "$QPREFIX: 800px GT cache not ready; skipping flagship_studio800 $(date)" >> "$Q"
fi

echo "QR4E DONE $(date)" >> "$Q"
