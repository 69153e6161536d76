#!/bin/bash
# Corrected quality-headline row: the full 30k studio schedule with
# distortion_lambda=1e-3 (the reference's own commented-out value in
# microfacet_tensorf2.yaml). Launched by tpu_queue_v9.sh only if the 10k
# diagnostic arm (run_studio_dist10k.sh) beats the base run's iter-10k
# plateau, i.e. the distortion loss kills the white floater fog that
# capped the base run at 21.8 dB.
cd /root/repo
timeout 21600 python train.py model=microfacet_tensorf2 dataset=synthetic_studio \
  dataset.hemisphere=true dataset.n_views=100 dataset.image_size=400 \
  seed=20211200 \
  model.params.max_batch_size=4096 \
  model.params.distortion_lambda=0.001 \
  field.fixed_shape=True \
  save_every=2500 resume=True \
  vis_every=5000 N_vis=2 final_N_vis=-1 basedir=runs expname=flagship_studio400_dist \
  progress_refresh_rate=512 render_test=True \
  ${NMF_EXTRA_OVERRIDES:-} \
  >> /root/repo/runs/flagship_studio400_dist.log 2>&1
rc=$?
echo "DONE rc=$rc" >> /root/repo/runs/flagship_studio400_dist.log
exit $rc
