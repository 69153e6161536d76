#!/bin/bash
cd /root/repo
python train.py model=microfacet_tensorf2 dataset=synthetic_shiny \
  dataset.image_size=160 dataset.n_views=40 seed=20211200 \
  model.params.max_batch_size=4096 \
  vis_every=0 N_vis=10 basedir=runs expname=flagship30k \
  progress_refresh_rate=512 render_test=True \
  >> /root/repo/runs/flagship.log 2>&1
echo DONE >> /root/repo/runs/flagship.log
