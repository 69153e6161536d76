#!/usr/bin/env python
"""On-chip A/B: run-collapsed shading (model.arch.merge_runs) step time.

Flagship bench config, merge_runs in {0, 24, 16}. NOTE the bench field is
UNTRAINED (grid 128): measured fine-pass multiplicity there is only
1.45-3.4x (runs/cell_multiplicity_probe.py), so this understates the
trained-regime win (multiplicity ~11 at grid 300) — it measures the
mechanical overhead of the run machinery vs the shading-set shrink at
the least favorable multiplicity. The real verdict is the 8k studio arm
(merge16_8k, rays/s telemetry + final PSNR vs the thin_base8k control).
Prints one JSON line per arm.
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench

BASE = [
    "model=microfacet_tensorf2",
    "model.arch.max_samples_per_ray=128",
    "model.arch.recur_samples_per_ray=64",
    "model.arch.proposal_samples_per_ray=64",
    "model.arch.model.brdf_ray_budget=[32768,8192]",
    "model.arch.model.max_retrace_rays=[1024]",
    "model.arch.bg_module.bg_resolution=512",
]


def main():
    for mk in (0, 24, 16):
        nmf = bench._build(BASE + [f"model.arch.merge_runs={mk}"])
        rps, step_s, _ = bench._time_train_step(nmf, B=4096, n_iters=6)
        print(json.dumps({"merge_runs": mk, "rays_per_sec": round(rps, 1),
                          "step_ms": round(step_s * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
