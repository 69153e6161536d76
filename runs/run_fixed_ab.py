#!/usr/bin/env python
"""A/B: field.fixed_shape on vs off, wall-clock through schedule events.

Runs the SAME short flagship-style schedule (3 upsample events + 2 mask
rebuilds) twice through the real train CLI and reports total wall time and
final PSNR. The fixed run should pay one cold compile; the exact run
recompiles the step at every upsample event. Writes one JSON line at the
end (runs/fixed_ab.json).
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def run(tag, fixed, n_iters=800):
    from nmf_tpu import config as config_lib
    from nmf_tpu.train import reconstruction

    out = Path(__file__).parent / f"fixed_ab_{tag}"
    cfg = config_lib.compose([
        "model=microfacet_tensorf2", "dataset=synthetic_sphere",
        "dataset.image_size=64", "dataset.n_views=8",
        f"model.params.n_iters={n_iters}",
        "model.params.batch_size=1024",
        "model.params.min_batch_size=1024",
        "model.params.max_batch_size=1024",
        # 3 upsample events 100**3 -> 176**3
        "field.N_voxel_init=1000000", "field.N_voxel_final=5451776",
        "field.upsamp_list=[200,350,500]",
        f"field.fixed_shape={fixed}",
        "model.arch.sampler.update_list=[300,600]",
        "model.arch.max_samples_per_ray=64",
        "model.arch.recur_samples_per_ray=32",
        "model.arch.proposal_samples_per_ray=32",
        "model.arch.model.brdf_ray_budget=[4096,1024]",
        "model.arch.model.max_retrace_rays=[256]",
        "model.arch.bg_module.bg_resolution=128",
        "vis_every=0", "N_vis=0", "render_test=True",
        f"basedir={out}", f"expname=ab_{tag}", "chain_steps=8",
        "progress_refresh_rate=100",
    ])
    t0 = time.time()
    nmf, res = reconstruction(cfg)
    wall = time.time() - t0
    return {"tag": tag, "wall_s": round(wall, 1),
            "test": {k: (round(float(v), 4) if hasattr(v, "__float__")
                         else v) for k, v in (res or {}).items()
                     if k in ("psnr", "ssim")}}


def main():
    results = [run("fixed", True), run("exact", False)]
    line = {"metric": "fixed_shape_ab", "results": results,
            "speedup_wall": round(results[1]["wall_s"]
                                  / max(results[0]["wall_s"], 1e-9), 3)}
    print(json.dumps(line))
    with open(Path(__file__).parent / "fixed_ab.json", "w") as f:
        json.dump(line, f)


if __name__ == "__main__":
    main()
