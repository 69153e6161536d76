#!/bin/bash
# tensorf comparison row on the 400px hemisphere protocol.
cd /root/repo
timeout 21600 python train.py model=tensorf dataset=synthetic_shiny \
  dataset.hemisphere=true dataset.n_views=100 dataset.image_size=400 \
  seed=20211200 \
  model.params.max_batch_size=4096 \
  save_every=2000 resume=True \
  vis_every=0 N_vis=-1 basedir=runs expname=tensorf_hemi400 \
  progress_refresh_rate=500 render_test=True \
  >> /root/repo/runs/tensorf_hemi400.log 2>&1
rc=$?
echo "DONE rc=$rc" >> /root/repo/runs/tensorf_hemi400.log
exit $rc
