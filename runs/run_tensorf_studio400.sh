#!/bin/bash
# tensorf comparison row on the studio 400px protocol (the contrast that
# shows the mirror ball needs the microfacet/retrace machinery).
cd /root/repo
timeout 21600 python train.py model=tensorf dataset=synthetic_studio \
  dataset.hemisphere=true dataset.n_views=100 dataset.image_size=400 \
  seed=20211200 \
  model.params.max_batch_size=4096 \
  save_every=2000 resume=True \
  vis_every=0 N_vis=-1 basedir=runs expname=tensorf_studio400 \
  progress_refresh_rate=500 render_test=True \
  >> /root/repo/runs/tensorf_studio400.log 2>&1
rc=$?
echo "DONE rc=$rc" >> /root/repo/runs/tensorf_studio400.log
exit $rc
