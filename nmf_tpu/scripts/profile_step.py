#!/usr/bin/env python
"""Component-level timing of the flagship train step (run alone on the TPU).

Times: sampler, fused field query (fwd / fwd+bwd), envmap SAT query
(fwd / fwd+bwd), full loss fwd, full train step. Keep pytest & other
CPU-heavy jobs OFF while running (tunnel starvation inflates numbers)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parents[2] / ".jax_cache"))


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    from __graft_entry__ import _build_nmf
    from nmf_tpu import trainer

    key = jax.random.PRNGKey(0)
    nmf, cfg = _build_nmf(key, grid=128, bg_res=512, k_spr=128, recur_k=64,
                          brdf_budget=(32768, 8192), retrace=1024)

    B = 4096
    rng = np.random.default_rng(0)
    origins = np.tile(np.array([[0.0, 0.0, -4.0]], np.float32), (B, 1))
    dirs = rng.normal(size=(B, 3)).astype(np.float32)
    dirs[:, 2] = np.abs(dirs[:, 2]) + 1.0
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate([origins, dirs], -1))
    rgbs = jnp.asarray(rng.uniform(size=(B, 3)).astype(np.float32))
    bg_col = jnp.ones((3,))

    # --- sampler ---
    samp_fn = jax.jit(lambda nmf, rays, key: nmf.sampler.sample(
        rays, key=key, is_train=True, max_samples_per_ray=128))
    print(f"sampler:            {timeit(samp_fn, nmf, rays, key):8.2f} ms")
    samp = samp_fn(nmf, rays, key)
    xyz = samp["xyz"].reshape(-1, 4)

    # --- fused field query ---
    f_fwd = jax.jit(lambda nmf, xyz: nmf.rf.compute_all(xyz)[0].sum())
    print(f"field fwd:          {timeit(f_fwd, nmf, xyz):8.2f} ms")

    def f_loss(nmf, xyz):
        s, a, n = nmf.rf.compute_all(xyz)
        return s.sum() + a.sum() + n.sum()
    f_bwd = jax.jit(jax.grad(f_loss))
    print(f"field fwd+bwd:      {timeit(f_bwd, nmf, xyz):8.2f} ms")

    # --- envmap query (the bounce-ray pattern: ~41k queries) ---
    R = 32768 + 8192
    kd = jax.random.split(key, 2)[0]
    vd = jax.random.normal(kd, (R, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    mip = jax.random.uniform(kd, (R,), minval=-8.0, maxval=-2.0)

    def bg_fwd(nmf, vd, mip):
        cache = nmf.bg_module.prepare(with_sh=False)
        return nmf.bg_module(vd, mip, cache=cache).sum()
    print(f"envmap fwd:         {timeit(jax.jit(bg_fwd), nmf, vd, mip):8.2f} ms")
    bgr = jax.jit(jax.grad(bg_fwd))
    print(f"envmap fwd+bwd:     {timeit(bgr, nmf, vd, mip):8.2f} ms")

    # --- full loss fwd only ---
    weights = trainer.LossWeights()
    loss_fn = jax.jit(lambda nmf, rays, rgbs, key: trainer.compute_loss(
        nmf, rays, rgbs, key, weights, bg_col)[0])
    print(f"loss fwd:           {timeit(loss_fn, nmf, rays, rgbs, key):8.2f} ms")

    grad_fn = jax.jit(lambda nmf, rays, rgbs, key: jax.grad(
        lambda m: trainer.compute_loss(m, rays, rgbs, key, weights,
                                       bg_col)[0])(nmf))
    print(f"loss fwd+bwd:       {timeit(grad_fn, nmf, rays, rgbs, key):8.2f} ms")

    # --- full train step ---
    opt_cfg = trainer.OptimConfig(n_iters=30000)
    tx = trainer.make_optimizer(nmf, opt_cfg)
    opt_state = tx.init(nmf)
    step = trainer.make_train_step(tx, donate=False)

    def run(nmf, opt_state, key):
        _, _, m = step(nmf, opt_state, rays, rgbs, bg_col, key, weights)
        return m["loss"]
    t = timeit(run, nmf, opt_state, key)
    print(f"full step:          {t:8.2f} ms  -> {B / t * 1e3:.0f} rays/s")


if __name__ == "__main__":
    main()
