#!/bin/bash
# Round-5 headline: the exact SHIPPED preset (`params=quality`) at the full
# 30k studio protocol. VERDICT r4 "what's missing" #1: the 32.28 dB headline
# predates the x2-bounce-budget finding — the preset the repo tells users to
# run (quality.yaml: distortion 1e-3 + lr continuation + fixed_shape + x2
# budgets) has never produced its own headline number. This arm is literally
# `params=quality` plus the studio protocol flags — no other tuning
# overrides — so the headline row IS the one-flag user recipe.
#
# Protocol identical to runs/run_flagship_studio400_lrc.sh (30k iters,
# 100 hemisphere views, 400px, seed 20211200, full 100-view final eval);
# reference protocol: 30k iters, configs/model/microfacet_tensorf2.yaml.
cd /root/repo
timeout 19800 python train.py model=microfacet_tensorf2 params=quality \
  dataset=synthetic_studio \
  dataset.hemisphere=true dataset.n_views=100 dataset.image_size=400 \
  seed=20211200 \
  model.params.max_batch_size=4096 \
  save_every=2500 resume=True \
  ${NMF_STOP_ITER:+stop_iter=$NMF_STOP_ITER} \
  vis_every=5000 N_vis=2 final_N_vis=-1 basedir=runs \
  expname=flagship_quality30k \
  progress_refresh_rate=512 render_test=True \
  >> /root/repo/runs/flagship_quality30k.log 2>&1
rc=$?
echo "DONE rc=$rc" >> /root/repo/runs/flagship_quality30k.log
exit $rc
