#!/usr/bin/env python
"""Flagship train-step throughput vs ray-batch size.

The driver metric is rays/s/chip; the bench pins B=4096 (the reference's
CUDA loop floor). If the step has a large B-independent share (dispatch,
fixed-size grids/envmap work, compaction sort), rays/s grows with B and
the right production setting is a bigger batch with the SAME per-step
budgets scaled (budget-per-ray held constant). Prints one JSON line per
B and a final summary.
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def cfgs(B):
    scale = B // 4096
    return [
        "model=microfacet_tensorf2",
        "model.arch.max_samples_per_ray=128",
        "model.arch.recur_samples_per_ray=64",
        "model.arch.proposal_samples_per_ray=64",
        f"model.arch.model.brdf_ray_budget=[{32768 * scale},{8192 * scale}]",
        f"model.arch.model.max_retrace_rays=[{1024 * scale}]",
        "model.arch.bg_module.bg_resolution=512",
    ]


def main():
    out = []
    for B in (4096, 8192, 16384):
        try:
            nmf = bench._build(cfgs(B))
            rps, step_s, _ = bench._time_train_step(nmf, B=B, n_iters=6)
            rec = {"B": B, "rays_per_sec": round(rps, 1),
                   "step_ms": round(step_s * 1e3, 2)}
        except Exception as e:  # OOM at the top size is a result, not a crash
            rec = {"B": B, "error": f"{type(e).__name__}: {e}"[:200]}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    ok = [r for r in out if "rays_per_sec" in r]
    if len(ok) >= 2:
        print(json.dumps({
            "metric": "bscale_flagship",
            "scaling": round(ok[-1]["rays_per_sec"] / ok[0]["rays_per_sec"],
                             3),
            "results": out,
        }), flush=True)


if __name__ == "__main__":
    main()
