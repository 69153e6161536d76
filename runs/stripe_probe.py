#!/usr/bin/env python
"""Diagnose the stripe artifact in chunked eval renders (CPU, no TPU).

The fixed400 flagship renders horizontal black stripes on the spheres
with period == chunk/W == 4096/400 == 10.24 rows; the GT has none. The
hypothesis: eval renders rays in SCANLINE order, so sphere-dense chunks
overflow the shared per-chunk budgets (brdf_ray_budget,
max_retrace_rays) and the tail rays of each chunk lose their specular
contribution; train batches are random, so training never sees it.

Renders a stripe-covering band of test view 0 from the shipped
checkpoint twice: (a) scanline ray order, (b) the same rays in a
strided interleave (decoded back after). If (b) kills the stripes the
starvation mechanism is confirmed.

Usage: python runs/stripe_probe.py  (forces the CPU platform itself —
the JAX_PLATFORMS env var is ignored because sitecustomize pins the
axon TPU platform before user code runs)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

CKPT = "runs/synthetic_shiny_flagship_fixed400/synthetic_shiny_flagship_fixed400.th"
ROW0, ROW1 = 140, 232   # stripe-rich band across the center sphere
W = 400
CHUNK = 4096


def main():
    import jax

    from nmf_tpu import ckpt as ckpt_lib
    from nmf_tpu import eval as nmf_eval
    from nmf_tpu.data.synthetic import make_shiny_dataset

    nmf, cfg, _ = ckpt_lib.load(CKPT)
    ds = make_shiny_dataset(n_views=100, H=400, W=400, seed=0, split="test",
                            hemisphere=True)
    rays = np.asarray(ds["all_rays"][:400 * 400]).reshape(400, 400, 6)
    gt = np.asarray(ds["all_rgbs"][:400 * 400]).reshape(400, 400, -1)
    band_rays = rays[ROW0:ROW1].reshape(-1, 6)
    gt_band = gt[ROW0:ROW1]
    gt_rgb = gt_band[..., :3] * gt_band[..., 3:] + (1 - gt_band[..., 3:])

    key = jax.random.PRNGKey(0)
    N = band_rays.shape[0]

    def run(order_name, order):
        t0 = time.time()
        out = nmf_eval.render_rays_chunked(
            nmf, band_rays[order], key, chunk=CHUNK, draw_debug=False,
            keys=("rgb_map",))
        rgb = np.zeros((N, 3), np.float32)
        rgb[order] = out["rgb_map"]
        rgb = rgb.reshape(ROW1 - ROW0, W, 3)
        mse = ((rgb - gt_rgb) ** 2).mean()
        print(f"{order_name}: band psnr {-10*np.log10(mse):.2f} dB "
              f"({time.time()-t0:.0f}s)", flush=True)
        return rgb

    scan = run("scanline", np.arange(N))
    # strided interleave: ray i of chunk c is position c + i*n_chunks
    n_chunks = (N + CHUNK - 1) // CHUNK
    order = np.argsort(np.arange(N) % n_chunks, kind="stable")
    inter = run("interleaved", order)

    from PIL import Image
    Image.fromarray((np.clip(scan, 0, 1) * 255).astype(np.uint8)).save(
        "/tmp/stripe_scan.png")
    Image.fromarray((np.clip(inter, 0, 1) * 255).astype(np.uint8)).save(
        "/tmp/stripe_inter.png")
    Image.fromarray((np.clip(gt_rgb, 0, 1) * 255).astype(np.uint8)).save(
        "/tmp/stripe_gt.png")
    # stripe metric: per-row mean abs err
    for name, im in (("scan", scan), ("inter", inter)):
        rowerr = np.abs(im - gt_rgb).mean(axis=(1, 2))
        print(f"{name} row-err p50 {np.percentile(rowerr,50):.4f} "
              f"p95 {np.percentile(rowerr,95):.4f}")


if __name__ == "__main__":
    main()
