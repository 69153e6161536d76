#!/bin/bash
# Round-2 headline flagship protocol run: white-bg blender-parity scene,
# hemisphere view coverage, full 30k reference schedule.
cd /root/repo
python train.py model=microfacet_tensorf2 dataset=synthetic_shiny \
  dataset.hemisphere=true dataset.n_views=100 dataset.image_size=200 \
  seed=20211200 \
  model.params.max_batch_size=4096 \
  vis_every=5000 N_vis=2 basedir=runs expname=flagship_hemi30k \
  progress_refresh_rate=512 render_test=True \
  >> /root/repo/runs/flagship_hemi.log 2>&1
echo DONE >> /root/repo/runs/flagship_hemi.log
