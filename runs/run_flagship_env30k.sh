#!/bin/bash
# Secondary protocol row: "real capture" env-visible scene. The env at
# infinity admits a near-camera-fog local minimum (BASELINE.md); the
# distortion loss penalizes spread-out ray weights -- our O(N) kernel is
# live (reference exposes distortion_lambda but its warp kernel path is
# dead code, modules/tensor_nerf.py:585-596), so this row demonstrates a
# knob the reference cannot actually turn on.
cd /root/repo
python train.py model=microfacet_tensorf2 dataset=synthetic_shiny_env \
  dataset.hemisphere=true dataset.n_views=100 dataset.image_size=200 \
  seed=20211200 \
  model.params.max_batch_size=4096 \
  model.params.distortion_lambda=1e-3 \
  vis_every=5000 N_vis=2 basedir=runs expname=flagship_env30k \
  progress_refresh_rate=512 render_test=True \
  >> /root/repo/runs/flagship_env.log 2>&1
echo DONE >> /root/repo/runs/flagship_env.log
