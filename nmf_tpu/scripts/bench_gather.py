#!/usr/bin/env python
"""Microbenchmark: gather layout for the VM factor-plane queries.

Hypothesis: jnp.take(flat(C, HW), idx, axis=1) gathers strided *columns*
(C separate cache lines per sample); taking rows from the transposed
(HW, C) table is contiguous and should be much faster fwd+bwd on TPU.
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parents[2] / ".jax_cache"))


def timeit(fn, *args, n=20):
    """Time fn(*args, salt) honestly under the lazy axon PJRT plugin: each
    call is salted by a scalar carried from the previous call's result, so
    the n calls form one dependency chain, and the final scalar host fetch
    is the only true execution barrier."""
    red = jax.jit(lambda a: a.astype(jnp.float32).ravel()[:8].sum() * 1e-30)
    salt = jnp.zeros(())
    float(red(fn(*args, salt)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args, salt)
            salt = red(out)
        float(salt)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3  # ms


def main():
    C, H, W = 72, 300, 300
    M = 4096 * 128
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    # 3 stacked planes as in compute_all's vmap
    planes = jax.random.normal(k1, (3, C, H, W), jnp.float32)
    coords = jax.random.uniform(k2, (3, M, 2), minval=-1, maxval=1)

    def unnorm(c, size):
        return (c + 1.0) * 0.5 * (size - 1)

    def corners(coords):
        x = unnorm(coords[..., 0], W)
        y = unnorm(coords[..., 1], H)
        x0, y0 = jnp.floor(x), jnp.floor(y)
        wx, wy = x - x0, y - y0
        ix0, iy0 = x0.astype(jnp.int32), y0.astype(jnp.int32)
        return ix0, iy0, wx, wy

    def gs_cols(plane, coords):  # current: (C, HW) take axis=1
        ix0, iy0, wx, wy = corners(coords)
        flat = plane.reshape(C, H * W).astype(jnp.bfloat16)
        out = 0.0
        for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
            ix, iy = ix0 + dx, iy0 + dy
            w = (wx if dx else (1 - wx)) * (wy if dy else (1 - wy))
            valid = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
            idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
            g = jnp.take(flat, idx, axis=1).astype(jnp.float32)
            out = out + g * jnp.where(valid, w, 0.0)
        return jnp.moveaxis(out, 0, -1)

    def gs_rows(plane, coords):  # transposed: (HW, C) take axis=0
        ix0, iy0, wx, wy = corners(coords)
        flat = plane.reshape(C, H * W).T.astype(jnp.bfloat16)  # (HW, C)
        out = 0.0
        for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
            ix, iy = ix0 + dx, iy0 + dy
            w = (wx if dx else (1 - wx)) * (wy if dy else (1 - wy))
            valid = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
            idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
            g = jnp.take(flat, idx, axis=0).astype(jnp.float32)
            out = out + g * jnp.where(valid, w, 0.0)[..., None]
        return out

    for name, gs in (("cols(C,HW)", gs_cols), ("rows(HW,C)", gs_rows)):
        # materialize the full (3, M, C) output so XLA can't elide the gather
        fwd = jax.jit(lambda p, c, s, _g=gs: jax.vmap(_g)(p, c + s))
        t_f = timeit(fwd, planes, coords)

        def loss(p, c, _g=gs):
            return (jax.vmap(_g)(p, c) ** 2).sum()
        bwd = jax.jit(lambda p, c, s, _l=loss: jax.grad(_l)(p, c + s))
        t_b = timeit(bwd, planes, coords)
        by = 3 * M * 4 * C * 2 / 1e9
        print(f"{name}: fwd {t_f:.2f} ms ({by / t_f * 1e3:.0f} GB/s) "
              f"fwd+bwd {t_b:.2f} ms")


if __name__ == "__main__":
    main()
