#!/bin/bash
# Round-5 leftovers chain: runs AFTER qr5d fully drains (incl. its trace +
# in-queue bench). Uses the slack before the round boundary for the arms
# qr5d's deadline gates will have skipped, with hard stop margins so the
# chip is idle again well before the driver's end-of-round bench:
#   1. tensorf_studio8k  (~25 min; the studio comparison row at the SAME 8k
#                         protocol as the microfacet arms table — better
#                         comparison design than a 30k one-off)
#   2. shgrad8k_s2 / control8k_s2 (seed-2 pair, ~50 min each) if time
# No stage starts after HARD_DL; every stage carries its own timeout.
cd /root/repo
QPREFIX=qr5h
Q=runs/tpu_queue.log
STOPF=runs/QUEUE_STOP
source runs/verify_run.sh
echo $$ > /tmp/qr5h.pid

HARD_DL=$(date -d '2026-08-20 21:50 UTC' +%s)
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

run_stage() {
  local name=$1 dir=$2 lines=$3 max=$4; shift 4
  if verify_run "$dir" "$lines"; then
    echo "$QPREFIX: skip $name (artifacts complete) $(date)" >> "$Q"
    return 0
  fi
  if past "$HARD_DL"; then
    echo "$QPREFIX: skip $name (past HARD deadline) $(date)" >> "$Q"
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

arm8ks_model() {
  local model=$1 exp=$2; shift 2
  timeout 5400 python train.py "model=$model" \
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


eval_stage() {  # <name> <ckpt> <rundir> <expname> <tier> <overrides...>
  local name=$1 ckpt=$2 d=$3 exp=$4 tier=$5; shift 5
  d="$d/imgs_render"
  if [ ! -f "$ckpt" ]; then
    echo "$QPREFIX: no ckpt at $ckpt; skip $name $(date)" >> "$Q"
    return 0
  fi
  local a
  for a in 1 2; do
    if [ -s "$d/mean.txt" ]; then
      echo "$QPREFIX: skip $name (done) $(date)" >> "$Q"
      return 0
    fi
    if past "$HARD_DL"; then
      echo "$QPREFIX: skip $name (past HARD deadline) $(date)" >> "$Q"
      return 0
    fi
    check_stop
    ensure
    echo "$QPREFIX: start $name attempt $a $(date)" >> "$Q"
    run_pg timeout 5400 python train.py render_only=True "ckpt=$ckpt" \
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

for dep in /tmp/qr5d.pid; do
  while [ -f "$dep" ] && kill -0 "$(cat $dep)" 2>/dev/null; do
    sleep 30
  done
done
echo "$QPREFIX: qr5d drained, starting $(date)" >> "$Q"


# priority tail, consolidated (qr5f/qr5g folded): the controller's
# recovered quality row first, then the tier isolation eval, then the
# tensorf studio row only if it still fits.
eval_stage adapt_ultra \
  runs/synthetic_studio_thin_adapt8k/synthetic_studio_thin_adapt8k.th \
  runs/synthetic_studio_adapt_ultra adapt_ultra ultra \
  dataset=synthetic_studio dataset.hemisphere=true dataset.n_views=100 \
  dataset.image_size=400 N_vis=20

eval_stage b2x_tier_train \
  runs/synthetic_studio_thin_budget2x8k/synthetic_studio_thin_budget2x8k.th \
  runs/synthetic_studio_b2x_tier_train b2x_tier_train train \
  dataset=synthetic_studio dataset.hemisphere=true dataset.n_views=100 \
  dataset.image_size=400 N_vis=20

TSF_DL=$(date -d '2026-08-20 21:05 UTC' +%s)
if past "$TSF_DL"; then
  echo "$QPREFIX: skip tensorf_studio8k (past its cutoff) $(date)" >> "$Q"
else
  run_stage tensorf_studio8k runs/synthetic_studio_tensorf_studio8k 10 2 \
    arm8ks_model tensorf tensorf_studio8k
fi

echo "QR5H DONE — chip drained $(date)" >> "$Q"
