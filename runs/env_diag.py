"""Isolate the envmap oracle failure: forward bias vs fit bias.

A) bg_mat := log(GT in bg_mat orientation). Then:
   1. calc_envmap_metrics should be ~perfect (tests the metric alignment).
   2. query(texel-center dirs, tiny sa) vs analytic env (tests the
      forward query path: coords/orientation/SAT bias).
B) after a sharp fit (from env_oracle), query at texel centers vs analytic
   env — if A2 and B pass but the map metric fails, it's deconvolution.
"""
import jax
import jax.numpy as jnp
import numpy as np

from nmf_tpu.data.synthetic import _ShinyEnv, equirect_dirs, shiny_env_fn
from nmf_tpu.eval import calc_envmap_metrics
from nmf_tpu.modules.bg import init_integral_equirect


def psnr(a, b):
    err = np.clip(np.asarray(a) - np.asarray(b), -1, 1)
    return float(-10 * np.log10(np.mean(err ** 2) + 1e-12))


H = 64
W = 2 * H
env = _ShinyEnv(H=H)
gt_pano = np.roll(env.map, env.W // 2, axis=1)[:, ::-1].copy()  # metric orientation

bg = init_integral_equirect(jax.random.PRNGKey(0), bg_resolution=H,
                            activation="exp")
# bg_mat orientation == env.map orientation (equirect_dirs); gt_pano is the
# PRE-INVERSE-TRANSFORMED pano the metric un-does internally
bg = bg.replace(bg_mat=jnp.asarray(
    np.log(np.clip(np.transpose(env.map, (2, 0, 1)), 1e-6, None))))

m = calc_envmap_metrics(bg, gt_pano, fH=H)
print("A1 metric with perfect map:", m)

dirs = equirect_dirs(H, W).reshape(-1, 3).astype(np.float32)
tgt = shiny_env_fn(dirs)
cache = bg.prepare(with_sh=False)
pred = np.asarray(bg(jnp.asarray(dirs), jnp.full((dirs.shape[0],), -9.0),
                     cache=cache))
print("A2 query-path PSNR at texel centers:", psnr(pred, tgt))
# where is the error concentrated?
err = np.abs(pred - tgt).mean(-1).reshape(H, W)
print("row mean err (first/last 5):", err.mean(1)[:5], err.mean(1)[-5:])
print("col mean err (first/last 5):", err.mean(0)[:5], err.mean(0)[-5:])
qs = np.quantile(err, [0.5, 0.9, 0.99, 1.0])
print("err quantiles 50/90/99/100:", qs)
# try a few mip levels
for sa in [-12.0, -7.0, -5.0]:
    pred = np.asarray(bg(jnp.asarray(dirs), jnp.full((dirs.shape[0],), sa),
                         cache=cache))
    print(f"  sa={sa}: psnr {psnr(pred, tgt):.2f}")
