#!/bin/bash
# Flagship on the interreflection-dominated cluster scene (protocol v3),
# 400px hemisphere, full coarse-to-fine schedule (128^3 -> 300^3) at one
# compile via field.fixed_shape (same schedule as the headline
# flagship_fixed400 row; supersedes the earlier noupsample variant).
cd /root/repo
timeout 21600 python train.py model=microfacet_tensorf2 dataset=synthetic_cluster \
  dataset.n_views=100 dataset.image_size=400 \
  seed=20211200 \
  model.params.max_batch_size=4096 \
  field.fixed_shape=True \
  save_every=2500 resume=True \
  vis_every=10000 N_vis=2 final_N_vis=-1 basedir=runs expname=flagship_cluster400 \
  progress_refresh_rate=512 render_test=True \
  >> /root/repo/runs/flagship_cluster400.log 2>&1
rc=$?
echo "DONE rc=$rc" >> /root/repo/runs/flagship_cluster400.log
exit $rc
