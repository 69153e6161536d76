#!/usr/bin/env python
"""Component-level timing of the flagship train step (run alone on the TPU).

Times: sampler, fused field query (fwd / fwd+bwd), envmap SAT query
(fwd / fwd+bwd), full loss fwd+bwd, full train step. Keep pytest & other
CPU-heavy jobs OFF while running (tunnel starvation inflates numbers).

NOTE on timing: the axon PJRT plugin executes lazily -- block_until_ready
does not force the queue. Every timed function takes a scalar `salt` folded
into its inputs and the timer chains call N's salt from call N-1's output,
ending with a host fetch: the only honest barrier.
"""
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
    """fn(*args, salt) -> pytree. Chained-salt timing with host-fetch barrier."""
    red = jax.jit(lambda t: jax.tree_util.tree_reduce(
        lambda s, x: s + x.astype(jnp.float32).ravel()[:1].sum() * 1e-30,
        t, jnp.zeros(())))
    salt = jnp.zeros(())
    float(red(fn(*args, salt)))
    best = float("inf")
    for _ in range(3):
        salt = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(n):
            salt = red(fn(*args, salt))
        float(salt)
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
    samp_fn = jax.jit(lambda nmf, rays, key, s: nmf.sampler.sample(
        rays + s * 1e-20, key=key, is_train=True, max_samples_per_ray=128))
    print(f"sampler:            {timeit(samp_fn, nmf, rays, key):8.2f} ms")
    samp = samp_fn(nmf, rays, key, jnp.zeros(()))
    xyz = samp["xyz"].reshape(-1, 4)

    # --- fused field query ---
    f_fwd = jax.jit(
        lambda nmf, xyz, s: nmf.rf.compute_all(xyz + s * 1e-20))
    print(f"field fwd:          {timeit(f_fwd, nmf, xyz):8.2f} ms")

    def f_loss(nmf, xyz):
        s, a, n = nmf.rf.compute_all(xyz)
        return s.sum() + a.sum() + n.sum()
    f_bwd = jax.jit(lambda nmf, xyz, s: jax.grad(f_loss)(nmf, xyz + s * 1e-20))
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
    bgf = jax.jit(lambda nmf, vd, mip, s: bg_fwd(nmf, vd + s * 1e-20, mip))
    print(f"envmap fwd:         {timeit(bgf, nmf, vd, mip):8.2f} ms")
    bgr = jax.jit(lambda nmf, vd, mip, s: jax.grad(bg_fwd)(
        nmf, vd + s * 1e-20, mip))
    print(f"envmap fwd+bwd:     {timeit(bgr, nmf, vd, mip):8.2f} ms")

    # --- full loss fwd / fwd+bwd ---
    weights = trainer.LossWeights()
    loss_fn = jax.jit(lambda nmf, rays, rgbs, key, s: trainer.compute_loss(
        nmf, rays + s * 1e-20, rgbs, key, weights, bg_col)[0])
    print(f"loss fwd:           {timeit(loss_fn, nmf, rays, rgbs, key):8.2f} ms")

    grad_fn = jax.jit(lambda nmf, rays, rgbs, key, s: jax.grad(
        lambda m: trainer.compute_loss(m, rays + s * 1e-20, rgbs, key,
                                       weights, bg_col)[0])(nmf))
    print(f"loss fwd+bwd:       {timeit(grad_fn, nmf, rays, rgbs, key):8.2f} ms")

    # --- full train step (naturally chained through nmf/opt_state) ---
    opt_cfg = trainer.OptimConfig(n_iters=30000)
    tx = trainer.make_optimizer(nmf, opt_cfg)
    opt_state = tx.init(nmf)
    step = trainer.make_train_step(tx, donate=False)
    n, o, m = step(nmf, opt_state, rays, rgbs, bg_col, key, weights)
    float(m["loss"])
    best = float("inf")
    for _ in range(3):
        n, o = nmf, opt_state
        t0 = time.perf_counter()
        for i in range(10):
            n, o, m = step(n, o, rays, rgbs, bg_col,
                           jax.random.fold_in(key, i), weights)
        float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / 10)
    t = best * 1e3
    print(f"full step:          {t:8.2f} ms  -> {B / t * 1e3:.0f} rays/s")


if __name__ == "__main__":
    main()
