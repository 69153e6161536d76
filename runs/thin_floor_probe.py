#!/usr/bin/env python
"""Noise-floor probe for the studio plateau (CPU, final 30k checkpoint).

The studio headline run froze at train PSNR ~22 / loss ~0.0185 for 23k
iterations after the last upsample event. Hypothesis: the residual is
mostly bounce-ray MC variance — proportional thinning serves each sample
only `thin_scale` of the rays the estimator was sized for, so the
photometric loss has an irreducible variance floor the optimizer cannot
descend below.

Measures, on REAL train batches drawn like training does:
  1. the applied thin_scale / thin_scale_retrace at the trained state;
  2. photo MSE at the shipped budget vs 2x/4x budgets (same rays_per_ray
     -> same demand, higher budget -> higher thin_scale -> less variance);
  3. key-to-key spread of the loss (direct variance readout).
If photo_mse drops materially with budget, the plateau is the budget, not
the representation: the fix is bigger brdf_ray_budget (or smaller batch)
late in training.
"""
import json
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax.numpy as jnp
import yaml

from nmf_tpu import ckpt as ckpt_lib
from nmf_tpu import trainer
from nmf_tpu.config import compose
from nmf_tpu.data.blender import load_dataset

RUN = Path("runs/synthetic_studio_flagship_studio400")


def main():
    with open(RUN / "config.yaml") as f:
        cfg = yaml.safe_load(f)
    nmf, _, _ = ckpt_lib.load(RUN / "synthetic_studio_flagship_studio400.th")
    ds = load_dataset(cfg["dataset"], cfg.get("datadir", "."), split="train")
    rays = np.asarray(ds["all_rays"])
    rgba = np.asarray(ds["all_rgbs"])

    B = 4096
    rng = np.random.default_rng(0)
    ids = rng.permutation(rays.shape[0])[:B]
    bg = np.ones(3, np.float32)
    rgb_gt = rgba[ids, :3] * rgba[ids, 3:] + (1 - rgba[ids, 3:]) * bg
    batch_rays = jnp.asarray(rays[ids])
    batch_rgb = jnp.asarray(rgb_gt)
    weights = trainer.LossWeights()

    base_budget = tuple(nmf.model.brdf_ray_budget)
    base_retrace = tuple(nmf.model.max_retrace_rays)
    print("shipped budgets:", base_budget, "retrace:", base_retrace,
          flush=True)

    results = {}
    for mult in (1, 2, 4):
        budget = tuple(int(b * mult) for b in base_budget)
        m = nmf.replace(model=nmf.model.replace(brdf_ray_budget=budget))
        fn = jax.jit(lambda nmf_, key: trainer.compute_loss(
            nmf_, batch_rays, batch_rgb, key, weights, jnp.asarray(bg)))
        mses, thins, thins_r = [], [], []
        for s in range(4):
            _, metrics = fn(m, jax.random.PRNGKey(100 + s))
            mses.append(float(metrics["photo_mse"]))
            thins.append(float(metrics.get("thin_scale", -1)))
            thins_r.append(float(metrics.get("thin_scale_retrace", -1)))
        psnrs = [-10 * np.log10(max(v, 1e-10)) for v in mses]
        results[mult] = dict(budget=budget,
                             photo_mse=float(np.mean(mses)),
                             mse_sd=float(np.std(mses)),
                             psnr=float(np.mean(psnrs)),
                             thin=float(np.mean(thins)),
                             thin_retrace=float(np.mean(thins_r)))
        print(f"x{mult}: {results[mult]}", flush=True)

    out = {"batch": B, "results": {str(k): v for k, v in results.items()}}
    with open("runs/thin_floor_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
