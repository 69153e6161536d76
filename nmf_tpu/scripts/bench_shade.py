#!/usr/bin/env python
"""Microprofile the shading-block pieces of the flagship microfacet step."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parents[2] / ".jax_cache"))

from nmf_tpu.scripts.profile_step import timeit  # chained-salt timer


def main():
    from __graft_entry__ import _build_nmf
    from nmf_tpu.render import render
    from nmf_tpu.ops.masked import raw2alpha, compact_topk, gather_rows

    key = jax.random.PRNGKey(0)
    nmf, cfg = _build_nmf(key, grid=128, bg_res=512, k_spr=128, recur_k=64,
                          brdf_budget=(32768, 8192), retrace=1024)

    B, K = 4096, 128
    M = B * K
    k1, k2, k3 = jax.random.split(key, 3)

    # --- raw2alpha transmittance fwd+bwd ---
    sig = jax.random.uniform(k1, (B, K)) * 5
    dst = jnp.full((B, K), 0.01)
    f = jax.jit(lambda s, d, z: raw2alpha(s + z * 1e-20, d)[0])
    print(f"raw2alpha fwd:        {timeit(f, sig, dst):8.2f} ms")
    g = jax.jit(lambda s, d, z: jax.grad(
        lambda ss: raw2alpha(ss + z * 1e-20, d)[0].sum())(s))
    print(f"raw2alpha fwd+bwd:    {timeit(g, sig, dst):8.2f} ms")

    # --- sampler internals ---
    N = 440
    valid = jax.random.uniform(k2, (B, N)) < 0.25
    f = jax.jit(lambda v, z: compact_topk(
        jnp.logical_xor(v, z.astype(bool) & False), K))
    print(f"compact_topk:         {timeit(f, valid):8.2f} ms")
    xyz = jax.random.uniform(k3, (B, N, 4))
    f2 = jax.jit(lambda x, v, z: gather_rows(
        x + z * 1e-20, compact_topk(v, K)[0]))
    print(f"compact+gather:       {timeit(f2, xyz, valid):8.2f} ms")

    # alpha-mask lookup at sampler scale
    vol = (jax.random.uniform(key, (128, 128, 128)) < 0.2).astype(jnp.float32)
    pts = jax.random.uniform(key, (B, N, 3), minval=-1.4, maxval=1.4)
    am = nmf.sampler.alpha_mask.replace(alpha_volume=vol)
    f3 = jax.jit(lambda p, z: am.sample_alpha(p + z * 1e-20))
    print(f"alpha lookup:         {timeit(f3, pts):8.2f} ms")

    # --- shading model with stubbed reflections (isolates MLPs/alloc) ---
    xyzs = jax.random.uniform(key, (M, 4), minval=-1.0, maxval=1.0)
    feats = jax.random.normal(key, (M, nmf.rf.app_dim))
    vdirs = jax.random.normal(key, (M, 3))
    vdirs = vdirs / jnp.linalg.norm(vdirs, axis=-1, keepdims=True)
    norms = -vdirs
    w = jax.random.uniform(key, (M,)) * 0.05
    valid_m = jax.random.uniform(key, (M,)) < 0.5
    bg_cache = nmf.bg_module.prepare()

    def stub_reflection(bounce_rays, mipval, retrace, rkey):
        return jnp.ones((bounce_rays.shape[0], 3)), None

    def shade(model, feats, z):
        rgb, dbg = model.shade(
            xyzs, xyzs, feats + z * 1e-20, vdirs, norms, w, valid_m, B,
            render_reflection=stub_reflection, bg_module=nmf.bg_module,
            bg_cache=bg_cache, is_train=True, recur=0, key=key)
        return rgb
    f4 = jax.jit(shade)
    print(f"shade-stub fwd:       {timeit(f4, nmf.model, feats):8.2f} ms")
    g4 = jax.jit(lambda model, feats, z: jax.grad(
        lambda m, ff: shade(m, ff, z).sum(), argnums=(0, 1))(model, feats))
    print(f"shade-stub fwd+bwd:   {timeit(g4, nmf.model, feats):8.2f} ms")

    # --- secondary (retrace) render: 1024 rays x 64 samples ---
    T = 1024
    ro = jax.random.uniform(key, (T, 3), minval=-0.5, maxval=0.5)
    rd = jax.random.normal(key, (T, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    rrays = jnp.concatenate([ro, rd], -1)

    def secondary(nmf, rrays, z):
        ims, _ = render(nmf, rrays + z * 1e-20, key, is_train=True,
                        bg_col=None, recur=1,
                        override_near=0.05, stepmul=1.0, tonemap=False,
                        start_mipval=jnp.full((T,), -5.0), bg_cache=bg_cache)
        return ims["rgb_map"]
    f5 = jax.jit(secondary)
    print(f"secondary fwd:        {timeit(f5, nmf, rrays):8.2f} ms")
    g5 = jax.jit(lambda nmf, rrays, z: jax.grad(
        lambda m: secondary(m, rrays, z).sum())(nmf))
    print(f"secondary fwd+bwd:    {timeit(g5, nmf, rrays):8.2f} ms")

    # --- normal module ---
    if nmf.normal_module is not None:
        f6 = jax.jit(lambda nm, feats, z: nm(xyzs, feats + z * 1e-20, norms))
        print(f"normal_module fwd:    {timeit(f6, nmf.normal_module, feats):8.2f} ms")


if __name__ == "__main__":
    main()
