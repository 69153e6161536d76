#!/bin/bash
# Third follow-on queue: after queue2 drains, run the layout and mlp-dtype
# perf A/Bs (each ~20-40 min incl. compiles).
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
ensure() { until probe; do echo "queue3: tunnel down $(date)" >> "$Q"; sleep 120; done; }
stage() {
  name=$1; max=$2; shift 2
  for a in $(seq 1 "$max"); do
    ensure
    echo "queue3: start $name attempt $a $(date)" >> "$Q"
    "$@"; rc=$?
    echo "queue3: end $name attempt $a rc=$rc $(date)" >> "$Q"
    [ "$rc" -eq 0 ] && return 0
    sleep 60
  done
  return 1
}
while ! grep -q "QUEUE2 DONE" "$Q" 2>/dev/null; do sleep 180; done
stage layout_ab 2 bash -c 'timeout 7200 python runs/run_layout_ab.py >> runs/layout_ab.log 2>&1'
stage mlp_ab 2 bash -c 'timeout 7200 python runs/run_mlp_ab.py >> runs/mlp_ab.log 2>&1'
echo "QUEUE3 DONE $(date)" >> "$Q"
