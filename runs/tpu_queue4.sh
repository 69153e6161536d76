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
ensure() { until probe; do echo "queue4: tunnel down $(date)" >> "$Q"; sleep 120; done; }
stage() {
  name=$1; max=$2; shift 2
  for a in $(seq 1 "$max"); do
    ensure
    echo "queue4: start $name attempt $a $(date)" >> "$Q"
    "$@"; rc=$?
    echo "queue4: end $name attempt $a rc=$rc $(date)" >> "$Q"
    [ "$rc" -eq 0 ] && return 0
    sleep 60
  done
  return 1
}
while ! grep -q "QUEUE3 DONE" "$Q" 2>/dev/null; do sleep 180; done
stage flagship_cluster400 10 bash runs/run_flagship_cluster400.sh
echo "QUEUE4 DONE $(date)" >> "$Q"
