#!/bin/bash
# Headline protocol v3 variant: 400px hemisphere scene with the shipped
# coarse-to-fine schedule (128^3 -> 300^3, field=tensorf upsamp_list
# [500,1000,2000,3000,4000,5500,7000] -- the same schedule as the other
# protocol rows) restored at noupsample's compile cost: field.fixed_shape
# keeps one train-step signature for the whole run (padded grids + traced
# live resolution; see ARCHITECTURE.md "fixed_shape"). Compared to
# run_flagship_noup400.sh this recovers the coarse-to-fine regularization
# the reference's headline config relies on while still paying a single
# cold compile through the tunnel. save_every+resume for outage retries.
cd /root/repo
timeout 21600 python train.py model=microfacet_tensorf2 dataset=synthetic_shiny \
  dataset.hemisphere=true dataset.n_views=100 dataset.image_size=400 \
  seed=20211200 \
  model.params.max_batch_size=4096 \
  field.fixed_shape=True \
  save_every=2500 resume=True \
  vis_every=10000 N_vis=2 basedir=runs expname=flagship_fixed400 \
  progress_refresh_rate=512 render_test=True \
  >> /root/repo/runs/flagship_fixed400.log 2>&1
rc=$?
echo "DONE rc=$rc" >> /root/repo/runs/flagship_fixed400.log
exit $rc
