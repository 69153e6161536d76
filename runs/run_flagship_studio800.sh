#!/bin/bash
# Supervision-density-matched headline row (VERDICT r3 next #7): 100 views
# at 800px = 64M train rays, the reference blender protocol's regime
# (/root/reference/dataLoader/blender.py 800^2 x 100 views) for the same
# 300^3 grid. Same training cost as the 400px rows (the schedule is
# 30k x <=4096 rays regardless of image size); isolates "scene
# conditioning" from "ray starvation" for the remaining studio gap.
# Carries the round-4 corrected settings (distortion + lr continuation).
cd /root/repo
timeout 21600 python train.py model=microfacet_tensorf2 dataset=synthetic_studio \
  dataset.hemisphere=true dataset.n_views=100 dataset.image_size=800 \
  seed=20211200 \
  model.params.max_batch_size=4096 \
  model.params.distortion_lambda=0.001 \
  model.params.lr_upsample_reset=false \
  field.fixed_shape=True \
  save_every=2500 resume=True \
  ${NMF_STOP_ITER:+stop_iter=$NMF_STOP_ITER} \
  vis_every=5000 N_vis=2 final_N_vis=-1 basedir=runs expname=flagship_studio800 \
  progress_refresh_rate=512 render_test=True \
  ${NMF_EXTRA_OVERRIDES:-} \
  >> /root/repo/runs/flagship_studio800.log 2>&1
rc=$?
echo "DONE rc=$rc" >> /root/repo/runs/flagship_studio800.log
exit $rc
