#!/usr/bin/env python
"""Full-view A/B of the eval interleave + starved-diffuse-fallback fixes.

Renders test view 0 of the 400px shiny protocol from the completed
flagship_fixed400 checkpoint with the CURRENT code (interleave default
on, diffuse fallback in) and compares PSNR against the striped scanline
render the run dumped (imgs_test_all/000.png).

Usage: python runs/stripe_fullview.py  (forces the CPU platform itself —
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
OLD_PNG = "runs/synthetic_shiny_flagship_fixed400/imgs_test_all/000.png"
H = W = 400


def psnr(a, b):
    return float(-10 * np.log10(np.mean((a - b) ** 2) + 1e-12))


def main():
    import imageio.v2 as imageio
    import jax

    from nmf_tpu import ckpt as ckpt_lib
    from nmf_tpu import eval as nmf_eval
    from nmf_tpu.data.synthetic import make_shiny_dataset

    nmf, cfg, _ = ckpt_lib.load(CKPT)
    ds = make_shiny_dataset(n_views=100, H=H, W=W, seed=0, split="test",
                            hemisphere=True)
    rays = np.asarray(ds["all_rays"][:H * W])
    gt = np.asarray(ds["all_rgbs"][:H * W]).reshape(H, W, -1)
    gt_rgb = gt[..., :3] * gt[..., 3:] + (1 - gt[..., 3:])

    old = np.asarray(imageio.imread(OLD_PNG), np.float32) / 255.0
    print(f"old scanline render psnr {psnr(old, gt_rgb):.2f} dB", flush=True)

    t0 = time.time()
    maps = nmf_eval.render_image(nmf, rays, (H, W), jax.random.PRNGKey(0),
                                 chunk=4096, draw_debug=False)
    new = np.clip(np.asarray(maps["rgb_map"]), 0, 1)
    print(f"new interleaved render psnr {psnr(new, gt_rgb):.2f} dB "
          f"({time.time() - t0:.0f}s)", flush=True)
    imageio.imwrite("/tmp/fullview_new.png",
                    (np.clip(new, 0, 1) * 255).astype(np.uint8))


if __name__ == "__main__":
    main()
