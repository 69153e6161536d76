#!/bin/bash
# Headline protocol v2: same hemisphere white-bg scene, 400px images.
# Rationale (diagnosed on the 200px run): 100 views x 200^2 = 4M train rays
# constrain a 300^3 = 27M-voxel grid -- each ray is revisited ~30x over the
# 30k x 4096-ray schedule and the field memorizes (stripe-frequency normal
# noise, speckle halo, test PSNR flat at ~14.7 while train passes 24).
# 400px matches the reference blender protocol's rays-per-voxel regime
# (800px x 100 views) within 4x at IDENTICAL training cost: the schedule
# is 30k iters x 4096 rays regardless of how many pixels the store holds.
cd /root/repo
python train.py model=microfacet_tensorf2 dataset=synthetic_shiny \
  dataset.hemisphere=true dataset.n_views=100 dataset.image_size=400 \
  seed=20211200 \
  model.params.max_batch_size=4096 \
  vis_every=5000 N_vis=2 basedir=runs expname=flagship_hemi400 \
  progress_refresh_rate=512 render_test=True \
  >> /root/repo/runs/flagship_hemi400.log 2>&1
echo DONE >> /root/repo/runs/flagship_hemi400.log
