#!/bin/bash
# Round-4 follow-up queue (launch after tpu_queue_r4.sh drains or during
# its gaps): adaptive-budget quality arm, a fresh xplane attribution of
# the flagship step with the round's winning perf flags, and a final
# bench refresh so BENCH_LAST.json reflects shipped defaults.
cd /root/repo
QPREFIX=qr4b
Q=runs/tpu_queue.log
STOPF=runs/QUEUE_STOP
source runs/queue_lib.sh
echo $$ > /tmp/qr4b.pid

check_stop() {
  if [ -f "$STOPF" ]; then
    echo "$QPREFIX: STOP file present, exiting $(date)" >> "$Q"
    exit 0
  fi
}

# wait until qr4 exits so the chip is single-tenant
while [ -f /tmp/qr4.pid ] && kill -0 "$(cat /tmp/qr4.pid)" 2>/dev/null; do
  check_stop
  sleep 120
done
echo "$QPREFIX: qr4 drained, starting $(date)" >> "$Q"

arm8ks() {  # same studio 8k arm as qr4 (shared log)
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

# adaptive runtime budgets vs the static thin_* arms (same 8k protocol)
run_stage thin_adapt8k runs/synthetic_studio_thin_adapt8k 10 3 \
  arm8ks thin_adapt8k model.params.adapt_brdf_budget=true

# fresh per-op attribution of the flagship step (decides the round-5
# kernel program); picks up winning A/B flags via NMF_TRACE_OVERRIDES
plain_stage trace_r4 2 bash -c \
  'timeout 2400 python runs/run_trace.py ${NMF_TRACE_OVERRIDES:-} >> runs/trace_r4.log 2>&1'

# refresh the persisted bench record on the shipped defaults
plain_stage bench_refresh 2 bash -c \
  'timeout 3600 python bench.py quick >> runs/bench_r04.log 2>&1'

echo "QR4B DONE $(date)" >> "$Q"
