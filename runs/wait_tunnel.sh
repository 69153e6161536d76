#!/bin/bash
# Wait until the axon TPU tunnel actually serves a backend, then exit 0.
# Probe = real jax.devices() call (the only reliable signal; the relay
# process existing does NOT imply the backend initializes -- see
# runs/binsum_ab.log for the false-positive failure record).
cd /root/repo
echo "wait_tunnel start $(date)"
while true; do
  if timeout 180 python - <<'EOF' >/dev/null 2>&1
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
EOF
  then
    echo "tunnel LIVE at $(date)"
    exit 0
  fi
  echo "probe failed $(date)"
  sleep 120
done
