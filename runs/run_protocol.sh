#!/bin/bash
# Protocol quality runs: full 30k-iter schedules on the shiny procedural
# scene (nerf_synthetic is not mounted in this environment).
# max_batch_size=4096 pins the adaptive controller for a bounded compile
# budget (one chain + one single program per grid resolution);
# progress_refresh_rate is a multiple of chain_steps so prints align with
# chain boundaries.
cd /root/repo
set -x
{
python train.py model=tensorf dataset=synthetic_shiny \
  dataset.image_size=160 dataset.n_views=40 seed=20211200 \
  vis_every=0 N_vis=10 basedir=runs expname=tensorf30k \
  progress_refresh_rate=500 render_test=True
python train.py model=microfacet_tensorf2 dataset=synthetic_shiny \
  dataset.image_size=160 dataset.n_views=40 seed=20211200 \
  model.params.max_batch_size=4096 \
  vis_every=0 N_vis=10 basedir=runs expname=flagship30k \
  progress_refresh_rate=512 render_test=True
} > /root/repo/runs/protocol.log 2>&1
echo DONE >> /root/repo/runs/protocol.log
