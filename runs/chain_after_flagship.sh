#!/bin/bash
# Watcher: when the 200px flagship writes DONE, run the 400px protocol
# pair (flagship then tensorf) back to back on the single TPU chip.
cd /root/repo
while ! grep -q DONE runs/flagship_hemi.log 2>/dev/null; do
  sleep 60
done
bash runs/run_flagship_hemi400.sh
bash runs/run_tensorf_hemi400.sh
