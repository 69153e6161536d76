#!/bin/bash
# Round-4 corrected quality-headline candidate. The dist (distortion-only)
# 30k rerun STILL collapsed 27.6 -> 20.8 dB across the 5500/7000 upsample
# events while the 10k diagnostic arm (identical config, n_iters=10000)
# landed 26.6 — the only difference is the lr decay: both restart the
# schedule at every upsample event (reference parity, train.py:806-813
# fresh LambdaLR), so post-upsample lr decays over n_iters and the 30k
# shape keeps the fine grids near lr_init for thousands of iterations,
# growing the white floater fog. This arm keeps distortion_lambda=1e-3 and
# sets lr_upsample_reset=false (original-TensoRF semantics: fresh Adam
# moments, decay continues from the global iteration).
#
# Launched in two queue stages sharing this script + expname:
#   NMF_STOP_ITER=10000 -> trains the first 10k, pauses resumably;
#   gate on the iter-9999 probe, then rerun (no stop) to 30k + full eval.
cd /root/repo
timeout 21600 python train.py model=microfacet_tensorf2 dataset=synthetic_studio \
  dataset.hemisphere=true dataset.n_views=100 dataset.image_size=400 \
  seed=20211200 \
  model.params.max_batch_size=4096 \
  model.params.distortion_lambda=0.001 \
  model.params.lr_upsample_reset=false \
  field.fixed_shape=True \
  save_every=2500 resume=True \
  ${NMF_STOP_ITER:+stop_iter=$NMF_STOP_ITER} \
  vis_every=5000 N_vis=2 final_N_vis=-1 basedir=runs expname=flagship_studio400_lrc \
  progress_refresh_rate=512 render_test=True \
  ${NMF_EXTRA_OVERRIDES:-} \
  >> /root/repo/runs/flagship_studio400_lrc.log 2>&1
rc=$?
echo "DONE rc=$rc" >> /root/repo/runs/flagship_studio400_lrc.log
exit $rc
