#!/bin/bash
# Follow-on TPU queue (launch after tpu_queue.sh finishes): cluster-scene
# flagship + tensorf comparison row. Same liveness gating as tpu_queue.sh.
cd /root/repo
Q=runs/tpu_queue.log

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
    echo "tunnel down $(date)" >> "$Q"
    sleep 120
  done
  echo "tunnel live $(date)" >> "$Q"
}

stage() {
  name=$1; max=$2; shift 2
  for a in $(seq 1 "$max"); do
    ensure
    echo "start $name attempt $a $(date)" >> "$Q"
    "$@"
    rc=$?
    echo "end $name attempt $a rc=$rc $(date)" >> "$Q"
    [ "$rc" -eq 0 ] && return 0
    sleep 60
  done
  return 1
}

stage flagship_cluster400 10 bash runs/run_flagship_cluster400.sh
echo "QUEUE2 DONE $(date)" >> "$Q"
