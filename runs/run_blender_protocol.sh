#!/bin/bash
# One-command nerf_synthetic protocol (VERDICT r4 next-#8): the moment the
# blender dataset is mounted, this reproduces the parity table the north
# star (BASELINE.json) asks for — all 8 scenes, the SHIPPED `params=quality`
# preset, full 30k schedule, full test-split final eval, aggregated with
# scripts/tabularize (the reference's tabularize.ipynb as a CLI).
#
# Usage:
#   DATADIR=/data bash runs/run_blender_protocol.sh            # all 8 scenes
#   DATADIR=/data SCENES="lego ship" bash runs/run_blender_protocol.sh
#
# Each scene trains with the reference protocol config
# (model=microfacet_tensorf2, 30k iters, batch 4096) + the shipped preset;
# resume=True makes the script re-runnable after interruptions. Reference
# protocol: 30k iters, configs/model/microfacet_tensorf2.yaml params block;
# the reference's per-scene yamls map 1:1 onto configs/dataset/<scene>.yaml.
set -u
cd /root/repo
DATADIR=${DATADIR:-/data}
SCENES=${SCENES:-"chair drums ficus hotdog lego materials mic ship"}
OUT=${OUT:-runs/blender_protocol}

if [ ! -d "$DATADIR/nerf_synthetic" ]; then
  echo "nerf_synthetic not found under $DATADIR — mount it (or set DATADIR)" >&2
  echo "expected layout: \$DATADIR/nerf_synthetic/<scene>/transforms_*.json" >&2
  exit 2
fi

mkdir -p "$OUT"
fail=0
for scene in $SCENES; do
  if [ ! -d "$DATADIR/nerf_synthetic/$scene" ]; then
    echo "skip $scene: $DATADIR/nerf_synthetic/$scene missing" | tee -a "$OUT/protocol.log"
    continue
  fi
  echo "=== $scene $(date) ===" >> "$OUT/protocol.log"
  timeout 28800 python train.py model=microfacet_tensorf2 params=quality \
    "dataset=$scene" "datadir=$DATADIR" \
    seed=20211200 \
    model.params.max_batch_size=4096 \
    save_every=2500 resume=True \
    vis_every=5000 N_vis=2 final_N_vis=-1 \
    "basedir=$OUT" "expname=quality30k" \
    progress_refresh_rate=512 render_test=True \
    >> "$OUT/protocol.log" 2>&1 || { echo "FAILED $scene" | tee -a "$OUT/protocol.log"; fail=1; }
done

python -m nmf_tpu.scripts.tabularize "$OUT" --time-to-db 30 \
  --csv "$OUT/blender_protocol.csv" | tee "$OUT/blender_protocol.txt"
exit $fail
