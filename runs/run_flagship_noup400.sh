#!/bin/bash
# Headline protocol v2 (tunnel-robust variant): 400px hemisphere scene,
# fixed 300^3 grid from iter 0 (the reference README's own headline
# command trains `expname=v38_noupsample`; /root/reference/README.md:10).
# One train-step signature for the whole run -> a single cold
# compile+upload instead of 8, which matters on a tunnel that has now
# twice dropped mid-run (25 and 60+ min outages; see PROGRESS.md).
# Mask-rebuild events (update_list) keep shapes static and do not
# recompile. save_every+resume let a retry continue from the last
# checkpoint instead of restarting the 30k schedule.
cd /root/repo
timeout 21600 python train.py model=microfacet_tensorf2 dataset=synthetic_shiny \
  dataset.hemisphere=true dataset.n_views=100 dataset.image_size=400 \
  seed=20211200 \
  model.params.max_batch_size=4096 \
  field.N_voxel_init=27000000 field.N_voxel_final=27000000 \
  'field.upsamp_list=[]' \
  save_every=2500 resume=True \
  vis_every=10000 N_vis=2 final_N_vis=-1 basedir=runs expname=flagship_noup400 \
  progress_refresh_rate=512 render_test=True \
  >> /root/repo/runs/flagship_noup400.log 2>&1
rc=$?
echo "DONE rc=$rc" >> /root/repo/runs/flagship_noup400.log
exit $rc
