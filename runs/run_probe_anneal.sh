#!/bin/bash
# A/B probe: annealed proposal_pad (1.0 -> 0.01 over 4k iters) vs the
# static-pad control runs/synthetic_shiny_probe_hemi8k (same seed/config).
cd /root/repo
python train.py model=microfacet_tensorf2 dataset=synthetic_shiny \
  dataset.hemisphere=true dataset.n_views=100 dataset.image_size=200 \
  seed=20211200 \
  model.params.max_batch_size=4096 model.params.n_iters=8000 \
  model.arch.proposal_pad_init=1.0 model.arch.proposal_pad_iters=4000 \
  vis_every=2000 N_vis=3 basedir=runs expname=probe_anneal8k \
  progress_refresh_rate=512 render_test=True \
  >> /root/repo/runs/probe_anneal.log 2>&1
echo DONE >> /root/repo/runs/probe_anneal.log
