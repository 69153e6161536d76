"""Fit an IntegralEquirect envmap to a panorama image -> checkpoint.

Reference ``scripts/pano2cube.py`` (211 LoC): optimizes the learnable
equirect against sampled pano pixels; the resulting checkpoint is consumed
by ``train.py fixed_bg=...`` for relighting (train.py:96-138).

Usage:
    python -m nmf_tpu.scripts.pano2env input.exr output.th \
        [--resolution 1024] [--iters 1000]
"""
import argparse
import math
import sys
from pathlib import Path

import numpy as np


def fit_pano(pano, key=None, bg_resolution=1024, iters=1000, batch=65536,
             lr=0.15, log=print):
    import jax
    import jax.numpy as jnp
    import optax

    from ..modules.bg import init_integral_equirect

    key = key if key is not None else jax.random.PRNGKey(0)
    bg = init_integral_equirect(key, bg_resolution=bg_resolution,
                                init_val=float(np.log(
                                    max(pano.mean(), 1e-3))),
                                activation="exp", mipbias=0.0)

    H, W = pano.shape[:2]
    # direction for each pano pixel (equirect: row=theta from +z, col=phi)
    js, is_ = np.meshgrid(np.arange(W), np.arange(H))
    theta = (is_ + 0.5) / H * math.pi            # 0..pi from north pole
    phi = (js + 0.5) / W * 2 * math.pi - math.pi  # match coords convention
    dirs = np.stack([
        np.sin(theta) * np.cos(phi),
        np.sin(theta) * np.sin(phi),
        np.cos(theta)], -1).reshape(-1, 3).astype(np.float32)
    cols = pano.reshape(-1, 3).astype(np.float32)

    tx = optax.adam(lr, b1=0.9, b2=0.99)
    opt_state = tx.init(bg)

    @jax.jit
    def step(bg, opt_state, d, c, key):
        def loss_fn(bg):
            sa = jnp.full((d.shape[0],), -6.0)
            pred = bg(d, sa)
            return jnp.abs(pred - c).mean()

        loss, grads = jax.value_and_grad(loss_fn)(bg)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(bg, updates), opt_state, loss

    rng = np.random.default_rng(0)
    for it in range(iters):
        ids = rng.integers(0, dirs.shape[0], size=(batch,))
        key, sk = jax.random.split(key)
        bg, opt_state, loss = step(bg, opt_state, jnp.asarray(dirs[ids]),
                                   jnp.asarray(cols[ids]), sk)
        if it % 100 == 0:
            log(f"pano fit iter {it}: loss {float(loss):.5f}")
    return bg


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--resolution", type=int, default=1024)
    p.add_argument("--iters", type=int, default=1000)
    args = p.parse_args(argv)

    from .. import ckpt

    if args.input.endswith(".pfm"):
        # portable HDR input (data/ray_utils.read_pfm)
        from ..data.ray_utils import read_pfm

        pano = np.asarray(read_pfm(args.input)[0], dtype=np.float32)
    else:
        # .exr panos route through the in-repo reader (+ native OpenEXR
        # bridge for DWA/PIZ), everything else through imageio
        from ..data.exr import imread_any

        # imread_any already scales LDR formats to [0,1]; HDR exr values
        # stay linear (a bright sun legitimately exceeds any LDR bound)
        pano = np.asarray(imread_any(args.input), dtype=np.float32)
    pano = pano[..., :3]
    bg = fit_pano(pano, bg_resolution=args.resolution, iters=args.iters)
    ckpt.save(args.output, bg, {"source": args.input})
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
