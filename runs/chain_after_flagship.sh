#!/bin/bash
# Watcher: when the flagship hemisphere run writes DONE, start the tensorf
# comparison row on the same protocol. Keeps the single TPU chip busy.
cd /root/repo
while ! grep -q DONE runs/flagship_hemi.log 2>/dev/null; do
  sleep 60
done
bash runs/run_tensorf_hemi30k.sh
