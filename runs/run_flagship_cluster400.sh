#!/bin/bash
# Flagship on the interreflection-dominated cluster scene (protocol v3),
# 400px hemisphere, fixed 300^3 grid (noupsample variant: one train-step
# signature for the whole run).
cd /root/repo
timeout 21600 python train.py model=microfacet_tensorf2 dataset=synthetic_cluster \
  dataset.n_views=100 dataset.image_size=400 \
  seed=20211200 \
  model.params.max_batch_size=4096 \
  field.N_voxel_init=27000000 field.N_voxel_final=27000000 \
  'field.upsamp_list=[]' \
  save_every=2500 resume=True \
  vis_every=10000 N_vis=2 basedir=runs expname=flagship_cluster400 \
  progress_refresh_rate=512 render_test=True \
  >> /root/repo/runs/flagship_cluster400.log 2>&1
rc=$?
echo "DONE rc=$rc" >> /root/repo/runs/flagship_cluster400.log
exit $rc
