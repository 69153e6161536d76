#!/bin/bash
# Follow-on queue: waits for the primary queue (runs/tpu_queue.sh) to
# drain, then (gated on a live-backend probe like the primary) runs the
# fixed_shape wall-clock A/B and the fixed-shape 400px flagship protocol.
cd /root/repo
Q=runs/tpu_queue.log

probe() {
  timeout 240 python - <<'PYEOF' >/dev/null 2>&1
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
import jax.numpy as jnp
assert float(jnp.ones(8).sum()) == 8.0
PYEOF
}

ensure() {
  until probe; do
    echo "queue2: tunnel down $(date)" >> "$Q"
    sleep 120
  done
}

stage() {
  name=$1; max=$2; shift 2
  for a in $(seq 1 "$max"); do
    ensure
    echo "queue2: start $name attempt $a $(date)" >> "$Q"
    "$@"
    rc=$?
    echo "queue2: end $name attempt $a rc=$rc $(date)" >> "$Q"
    [ "$rc" -eq 0 ] && return 0
    sleep 60
  done
  return 1
}

while ! grep -q "QUEUE DONE" "$Q" 2>/dev/null; do sleep 120; done
stage fixed_ab 2 bash -c \
  'timeout 7200 python runs/run_fixed_ab.py >> runs/fixed_ab.log 2>&1'
stage flagship_fixed400 10 bash runs/run_flagship_fixed400.sh
echo "QUEUE2 DONE $(date)" >> "$Q"
