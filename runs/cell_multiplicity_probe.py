#!/usr/bin/env python
"""Measure samples-per-cell multiplicity of the fine-pass quad-gather rows.

Decides the round-5 "run-combine" kernel question with data: the plane
gather/scatter family costs ~40 ms of the 90.7 ms flagship step
(runs/trace_r4.log), all of it at the per-ROW latency floor (the gather
law, ARCHITECTURE.md). If consecutive samples along a ray frequently
land in the SAME cell of a plane projection (proposal resampling
concentrates samples at surfaces), a run-combining custom VJP could
gather/scatter once per run instead of once per sample — cutting rows,
the only currency that matters, by 1 - 1/multiplicity.

Runs on CPU. Two subjects:
  1. the untrained bench config (grid 128, 4096x128 -> 64 fine) — what
     bench.py measures;
  2. the trained thin_budget2x8k checkpoint (grid 300, studio scene,
     real camera rays) if present — what a converged run does.

Prints, per plane projection (xy/xz/yz) and per pass (coarse/fine):
  adj   = fraction of consecutive valid same-ray sample pairs whose quad
          row (cell id) is identical  (run-combine exploits exactly this)
  mult  = rows / adjacent-runs        (the row-reduction factor)
  dup   = rows / unique-cells-in-batch (upper bound for ANY dedup scheme)
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from nmf_tpu.ops.grid_sample import _quad_prep  # noqa: E402
from nmf_tpu.fields.tensorf import MAT_MODE  # noqa: E402
from nmf_tpu.ops.masked import raw2alpha  # noqa: E402
from nmf_tpu.ops.resample import resample_pdf  # noqa: E402

FLAGSHIP = [
    "model=microfacet_tensorf2",
    "model.arch.max_samples_per_ray=128",
    "model.arch.recur_samples_per_ray=64",
    "model.arch.proposal_samples_per_ray=64",
    "model.arch.model.brdf_ray_budget=[32768,8192]",
    "model.arch.model.max_retrace_rays=[1024]",
    "model.arch.bg_module.bg_resolution=512",
]


def stats_for(nmf, rays, key, label):
    B = rays.shape[0]
    samp = nmf.sampler.sample(rays, key=key, is_train=True,
                              max_samples_per_ray=nmf.max_samples_per_ray,
                              focal=1.0)
    xyz, z_vals, dists, valid = (samp["xyz"], samp["z_vals"],
                                 samp["dists"], samp["valid"])
    K = xyz.shape[1]
    kf = nmf.proposal_samples_per_ray
    passes = {"coarse": (xyz, valid)}
    if 0 < kf < K:
        dkw = ({"use_gather_dtype": True}
               if hasattr(nmf.rf, "gather_dtype") else {})
        sigma_p = nmf.rf.compute_densityfeature(
            xyz.reshape(-1, 4), **dkw).reshape(B, K)
        sigma_p = jnp.where(valid, sigma_p, 0.0)
        w_p, _ = raw2alpha(sigma_p, dists * nmf.rf.distance_scale)
        z_f, d_f, _, valid_f = resample_pdf(
            jax.random.PRNGKey(1), z_vals, dists, w_p, valid, kf, True,
            nmf.proposal_pad)
        pts = rays[:, None, 0:3] + rays[:, None, 3:6] * z_f[..., None]
        xyz_f = jnp.concatenate([pts, z_f[..., None]], axis=-1)
        passes["fine"] = (xyz_f, valid_f)

    live = nmf.rf._live3() if hasattr(nmf.rf, "_live3") else None
    for pname, (x, v) in passes.items():
        coords = nmf.rf.normalize_coord(x)[..., :3]
        v_np = np.asarray(v)
        for i, (m0, m1) in enumerate(MAT_MODE):
            plane = nmf.rf.density_rf.planes[i]
            lhw = None if live is None else (live[m1], live[m0])
            c2 = jnp.stack([coords[..., m0], coords[..., m1]], axis=-1)
            ix0, iy0, _, _ = _quad_prep(plane.shape, c2, lhw)
            W = plane.shape[2]
            flat = np.asarray(iy0 * W + ix0)  # (B, K)
            pair_ok = v_np[:, 1:] & v_np[:, :-1]
            eq = (flat[:, 1:] == flat[:, :-1]) & pair_ok
            n_pairs = int(pair_ok.sum())
            adj = float(eq.sum()) / max(n_pairs, 1)
            rows = int(v_np.sum())
            runs = rows - int(eq.sum())
            mult = rows / max(runs, 1)
            uniq = len(np.unique(flat[v_np]))
            dup = rows / max(uniq, 1)
            print(f"{label:28s} {pname:6s} plane{i}({'xyz'[m0]}{'xyz'[m1]})"
                  f"  rows={rows:7d} adj={adj:.3f} mult={mult:.2f}"
                  f" dup={dup:.1f}", flush=True)


def main():
    # subject 1: the untrained bench config
    nmf = bench._build(FLAGSHIP)
    rays, _ = bench._rays(4096)
    stats_for(nmf, rays, jax.random.PRNGKey(0), "bench(grid128,untrained)")

    # subject 2: the trained x2-budget studio checkpoint, if present
    ck = Path("runs/synthetic_studio_thin_budget2x8k/"
              "synthetic_studio_thin_budget2x8k.th")
    if ck.exists():
        from nmf_tpu import ckpt as ckpt_lib
        from nmf_tpu.data.blender import load_dataset
        from nmf_tpu import config as config_lib

        nmf2, saved_cfg, _ = ckpt_lib.load(str(ck))
        cfg = config_lib.compose([
            "model=microfacet_tensorf2", "dataset=synthetic_studio",
            "dataset.hemisphere=true", "dataset.n_views=4",
            "dataset.image_size=64", "seed=20211200"])
        ds = load_dataset(cfg["dataset"], "/data", split="train")
        all_rays = np.asarray(ds["all_rays"], np.float32)
        sel = np.random.default_rng(0).choice(len(all_rays), 4096,
                                              replace=False)
        rays2 = jnp.asarray(all_rays[sel])
        stats_for(nmf2, rays2, jax.random.PRNGKey(0),
                  "ckpt(grid300,trained)")
    else:
        print("no trained ckpt found; skipped subject 2", flush=True)


if __name__ == "__main__":
    main()
