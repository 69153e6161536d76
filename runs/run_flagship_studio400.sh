#!/bin/bash
# Quality-headline protocol row: the flagship on the WELL-POSED studio
# scene (bright diffuse anchors + glossy pair + one near-mirror ball; see
# configs/dataset/synthetic_studio.yaml). Same schedule/knobs as
# flagship_fixed400: 400px hemisphere, 100 views, full coarse-to-fine
# schedule at one compile via field.fixed_shape, resume across outages.
# NMF_EXTRA_OVERRIDES (optional, word-split) appends CLI overrides — the
# v7 queue uses it to flip the Pallas scatter kernels on when the binsum
# A/B verdict favors them.
cd /root/repo
timeout 21600 python train.py model=microfacet_tensorf2 dataset=synthetic_studio \
  dataset.hemisphere=true dataset.n_views=100 dataset.image_size=400 \
  seed=20211200 \
  model.params.max_batch_size=4096 \
  field.fixed_shape=True \
  save_every=2500 resume=True \
  vis_every=5000 N_vis=2 final_N_vis=-1 basedir=runs expname=flagship_studio400 \
  progress_refresh_rate=512 render_test=True \
  ${NMF_EXTRA_OVERRIDES:-} \
  >> /root/repo/runs/flagship_studio400.log 2>&1
rc=$?
echo "DONE rc=$rc" >> /root/repo/runs/flagship_studio400.log
exit $rc
