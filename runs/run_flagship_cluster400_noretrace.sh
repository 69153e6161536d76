#!/bin/bash
# Retrace-OFF A/B partner for run_flagship_cluster400.sh (VERDICT r2 next
# #9): identical schedule/scene, but max_retrace_rays=[] so every bounce
# ray terminates at the envmap (no recursive re-render). On the
# interreflection-dominated cluster scene this isolates what the GI
# retrace pass buys.
cd /root/repo
timeout 21600 python train.py model=microfacet_tensorf2 dataset=synthetic_cluster \
  dataset.n_views=100 dataset.image_size=400 \
  seed=20211200 \
  model.params.max_batch_size=4096 \
  field.fixed_shape=True \
  'model.arch.model.max_retrace_rays=[]' \
  save_every=2500 resume=True \
  vis_every=10000 N_vis=2 final_N_vis=-1 basedir=runs expname=cluster400_noretrace \
  progress_refresh_rate=512 render_test=True \
  >> /root/repo/runs/cluster400_noretrace.log 2>&1
rc=$?
echo "DONE rc=$rc" >> /root/repo/runs/cluster400_noretrace.log
exit $rc
