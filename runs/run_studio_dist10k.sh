#!/bin/bash
# Diagnostic arm for the studio floater halo: the 30k studio headline run
# regressed 28 -> 22 dB (train AND test) at the 5500/7000 upsample events,
# and its renders show a white density fog growing around the geometry
# after the grids get fine (runs/synthetic_studio_flagship_studio400/
# imgs_vis/004999_000.png vs 029999_000.png). The reference's own config
# hints at the fix it never shipped: microfacet_tensorf2.yaml has
# `distortion_lambda: 0 # 1e-3`. This arm trains the SAME studio schedule
# to 10k iters (fog is fully formed by iter 10k in the base run) with
# distortion_lambda=1e-3; its final 30-view eval gates a full corrected
# 30k rerun in tpu_queue_v9.sh.
cd /root/repo
timeout 10800 python train.py model=microfacet_tensorf2 dataset=synthetic_studio \
  dataset.hemisphere=true dataset.n_views=100 dataset.image_size=400 \
  seed=20211200 \
  model.params.max_batch_size=4096 \
  model.params.n_iters=10000 \
  model.params.distortion_lambda=0.001 \
  field.fixed_shape=True \
  save_every=2500 resume=True \
  vis_every=5000 N_vis=2 final_N_vis=30 basedir=runs expname=studio_dist10k \
  progress_refresh_rate=512 render_test=True \
  ${NMF_EXTRA_OVERRIDES:-} \
  >> /root/repo/runs/studio_dist10k.log 2>&1
rc=$?
echo "DONE rc=$rc" >> /root/repo/runs/studio_dist10k.log
exit $rc
