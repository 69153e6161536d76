"""Image rendering and metric evaluation.

Mirrors reference ``renderer.py``: chunk_renderer/BundleRender (:56-170) and
evaluate (:194-534). Since the TPU sampler never drops rays (static budgets),
the render-to-completion loop disappears; a plain chunked map suffices.
"""
import math
import os
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import utils
from .render import NMF, render


def render_rays_chunked(nmf: NMF, rays, key, chunk=4096, draw_debug=True,
                        keys=("rgb_map", "acc_map", "depth", "world_normal",
                              "normal"),
                        bg_col=(1.0, 1.0, 1.0), render_fn=None):
    """Render (N, 6) rays in fixed-size chunks (padding the tail chunk)."""
    N = rays.shape[0]
    n_chunks = (N + chunk - 1) // chunk
    pad = n_chunks * chunk - N
    rays_p = np.concatenate([rays, rays[:1].repeat(pad, 0)], 0) if pad else rays
    outs = {}
    bg_cache = nmf.bg_module.prepare() if nmf.bg_module is not None else None

    if render_fn is None:
        render_fn = jax.jit(
            lambda nmf, r, k, c: render(nmf, r, k, is_train=False,
                                        bg_col=bg_col, draw_debug=draw_debug,
                                        bg_cache=c)[0])
    for i in range(n_chunks):
        r = jnp.asarray(rays_p[i * chunk:(i + 1) * chunk])
        key, sk = jax.random.split(key)
        ims = render_fn(nmf, r, sk, bg_cache)
        for k in keys:
            if k in ims:
                outs.setdefault(k, []).append(np.asarray(ims[k]))
    out = {k: np.concatenate(v, 0)[:N] for k, v in outs.items()}
    return out


def render_image(nmf: NMF, rays, hw, key, chunk=4096, draw_debug=True,
                 bg_col=(1.0, 1.0, 1.0), render_fn=None):
    H, W = hw
    maps = render_rays_chunked(nmf, rays, key, chunk=chunk,
                               draw_debug=draw_debug, bg_col=bg_col,
                               render_fn=render_fn)
    out = {}
    for k, v in maps.items():
        out[k] = v.reshape(H, W, *v.shape[1:])
    return out


def visualize_depth(depth, near_far=None):
    d = np.asarray(depth)
    lo, hi = (near_far if near_far is not None
              else (np.percentile(d, 1), np.percentile(d, 99)))
    x = np.clip((d - lo) / max(hi - lo, 1e-8), 0, 1)
    return np.stack([x, x, x], axis=-1)


def evaluate(nmf: NMF, dataset, key, save_dir: Optional[str] = None,
             n_vis: int = -1, chunk: int = 4096, prefix: str = "",
             compute_extra_metrics: bool = True):
    """Per-image PSNR (8-bit-quantized, renderer.py:399-401), SSIM, plus
    optional normal error when GT normals exist. Writes images + stats."""
    W, H = dataset["img_wh"]
    n_px = H * W
    n_images = dataset["all_rays"].shape[0] // n_px
    idxs = (range(n_images) if n_vis <= 0
            else range(0, n_images, max(n_images // n_vis, 1)))

    stats = {"psnr": [], "ssim": [], "norm_err": []}
    if save_dir is not None:
        os.makedirs(save_dir, exist_ok=True)

    render_fn = jax.jit(
        lambda nmf, r, k, c: render(nmf, r, k, is_train=False,
                                    bg_col=(1.0, 1.0, 1.0), draw_debug=True,
                                    bg_cache=c)[0])
    for img_i in idxs:
        rays = dataset["all_rays"][img_i * n_px:(img_i + 1) * n_px]
        gt = dataset["all_rgbs"][img_i * n_px:(img_i + 1) * n_px]
        gt = gt.reshape(H, W, -1)
        if gt.shape[-1] == 4:
            gt = gt[..., :3] * gt[..., 3:] + (1 - gt[..., 3:])
        key, sk = jax.random.split(key)
        maps = render_image(nmf, rays, (H, W), sk, chunk=chunk,
                            render_fn=render_fn)
        pred = np.clip(maps["rgb_map"], 0, 1)
        stats["psnr"].append(utils.rgb_psnr(pred, gt))
        if compute_extra_metrics:
            stats["ssim"].append(float(utils.rgb_ssim(pred, gt, 1.0)))
        if "all_norms" in dataset and dataset.get("all_norms") is not None:
            gtn = dataset["all_norms"][img_i * n_px:(img_i + 1) * n_px]
            gtn = gtn.reshape(H, W, 3)
            mask = np.linalg.norm(gtn, axis=-1) > 0.9
            pn = maps.get("world_normal")
            if pn is not None and mask.any():
                cos = np.clip((pn * gtn).sum(-1), -1, 1)[mask]
                stats["norm_err"].append(
                    float(np.rad2deg(np.arccos(cos)).mean()))
        if save_dir is not None:
            import imageio.v2 as imageio

            imageio.imwrite(
                Path(save_dir) / f"{prefix}{img_i:03d}.png",
                (pred * 255).astype(np.uint8))
            if "world_normal" in maps:
                nim = np.clip((maps["world_normal"] + 1) / 2, 0, 1)
                imageio.imwrite(Path(save_dir) / f"{prefix}{img_i:03d}_normal.png",
                                (nim * 255).astype(np.uint8))

    summary = {k: float(np.mean(v)) for k, v in stats.items() if len(v)}
    if save_dir is not None:
        import yaml

        with open(Path(save_dir) / f"stats{prefix}.yaml", "w") as f:
            yaml.safe_dump({k: [float(x) for x in v]
                            for k, v in stats.items() if len(v)}, f)
        with open(Path(save_dir) / "mean.txt", "w") as f:
            f.write(str(summary))
    return summary
