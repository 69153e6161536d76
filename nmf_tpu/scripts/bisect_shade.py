#!/usr/bin/env python
"""Bisect the per-bounce-ray cost inside Microfacet.shade by patching the
method with staged stubs (measurement-only; does not ship)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parents[2] / ".jax_cache"))

from nmf_tpu.scripts.profile_step import timeit


def make_staged_shade(stage):
    import math
    from nmf_tpu.models import microfacet as mf
    from nmf_tpu.ops import sh
    from nmf_tpu.ops.masked import segment_sum_to
    from nmf_tpu.ops.safemath import normalize
    sg = jax.lax.stop_gradient
    EPS = mf.EPS

    def shade(self, xyz, xyz_normed, app_features, viewdirs, normals,
              weights, valid, B, render_reflection, bg_module, bg_cache,
              is_train, recur, key):
        M = xyz.shape[0]
        keys = jax.random.split(key, 5)
        noise_app_features = app_features + jax.random.normal(
            keys[0], app_features.shape) * self.anoise
        std = self.std if is_train else 0.0
        albedo, tint, matprop = self.diffuse_module(
            xyz_normed, viewdirs, app_features, std=std, key=keys[1])
        if self.no_emitters and bg_module is not None:
            conv_coeffs = sg(bg_cache["sh_conv_coeffs"])
            evaled = sh.eval_sh_bases(conv_coeffs.shape[0], normals)
            E = sg((conv_coeffs[None] * evaled[..., None]).sum(axis=1))
            diffuse = albedo * E
        else:
            diffuse = albedo
        rays_per_ray = self.rays_per_ray
        budget = self.brdf_ray_budget[min(recur, len(self.brdf_ray_budget) - 1)]
        if stage >= 7:  # no bounce block at all
            return diffuse, {"roughness": matprop["r1"], "tint": tint,
                             "diffuse": diffuse, "spec": diffuse,
                             "albedo": albedo}
        w = jnp.where(valid, weights, 0.0)
        pt_limit = w * rays_per_ray + jax.random.uniform(keys[2], w.shape) - 0.5
        counts = jnp.clip(jnp.floor(pt_limit), 0, 400).astype(jnp.int32)
        counts = jnp.where(valid, counts, 0)
        starts = jnp.cumsum(counts) - counts
        r_idx = jnp.arange(budget)
        if stage >= 6:  # skip searchsorted
            src = (r_idx % M).astype(jnp.int32)
        else:
            src = jnp.clip(jnp.searchsorted(
                starts, r_idx, side="right").astype(jnp.int32) - 1, 0, M - 1)
        total = jnp.minimum(counts.sum(), budget)
        slot_valid = r_idx < total
        within = (r_idx - starts[src]).astype(jnp.int32)
        kept = jnp.minimum(jnp.maximum(
            jnp.minimum(starts + counts, budget)
            - jnp.minimum(starts, budget), 0), counts)
        ray_count = jnp.clip(kept.astype(jnp.float32), 1e-8)
        if stage >= 5:  # skip parent gathers
            R = budget
            bV = -viewdirs[:R]
            bN = normals[:R]
            r1 = matprop["r1"][:R, 0]
            efeatures = noise_app_features[:R]
            exyz = xyz[:R, :3]
        else:
            bV = -viewdirs[src]
            bN = normals[src]
            r1 = matprop["r1"][src, 0]
            efeatures = noise_app_features[src]
            exyz = xyz[src, :3]
        bN = bN * jnp.sign((bV * bN).sum(-1, keepdims=True))
        if is_train:
            r1 = jnp.clip(r1, self.min_rough)
        if stage >= 4:
            u1 = jnp.full(bV.shape[:1], 0.5)
            u2 = u1
        else:
            u1, u2 = mf.hammersley_draw(keys[3], within, counts[src], src)
        if stage >= 3:
            L = normalize(2 * (bV * bN).sum(-1, keepdims=True) * bN - bV)
            basis = jnp.broadcast_to(jnp.eye(3), (budget, 3, 3))
            logD = jnp.zeros(budget)
        else:
            L, basis, logD = self.brdf_sampler.sample(u1, u2, bV, bN, r1, r1)
        H = normalize((bV + L) / 2)
        local_v = jnp.einsum("rij,rj->ri", basis, bV)
        halfvec = jnp.einsum("rij,rj->ri", basis, H)
        diffvec = jnp.einsum("rij,rj->ri", basis, L)
        samp_prob = jnp.exp(logD)
        mipval = -jnp.log(jnp.clip(counts[src].astype(jnp.float32), 1)) - logD
        bounce_rays = jnp.concatenate([exyz + L * 5e-3, L], axis=-1)
        if stage >= 2:
            brdf_weight = jnp.ones((budget, 3)) * jax.nn.sigmoid(self.brdf.bias)
        else:
            brdf_weight = self.brdf(
                bV, sg(L), sg(bN), sg(H), sg(local_v), sg(halfvec),
                sg(diffvec), efeatures, sg(r1), sg(r1))
        if stage >= 1:
            incoming_light = jnp.ones((budget, 3))
        elif stage == -1:  # sg the envmap result: fwd kept, bwd killed
            il, _ = render_reflection(bounce_rays, mipval,
                                      retrace=False, rkey=keys[4])
            incoming_light = sg(il)
        elif stage == -2:  # sg inputs: coord-grad killed, bwd-to-bg kept
            incoming_light, _ = render_reflection(sg(bounce_rays), sg(mipval),
                                                  retrace=False, rkey=keys[4])
        else:
            incoming_light, _ = render_reflection(bounce_rays, mipval,
                                                  retrace=False, rkey=keys[4])
        # no retrace in this bisect (max_retrace_rays=() in config)
        erc = ray_count[src][:, None]
        spec = segment_sum_to(incoming_light / erc, src, slot_valid, M)
        brdf_rgb = segment_sum_to(brdf_weight / erc, src, slot_valid, M)
        R0 = matprop["f0"][src]
        ediffuse = diffuse[src]
        costheta = jnp.abs((-bV * H).sum(-1, keepdims=True))
        spec_reflectance = R0 + (1 - R0) * jnp.clip(1 - costheta, 0, 1) ** 5
        comb = (spec_reflectance * incoming_light * brdf_weight
                + (1 - spec_reflectance) * ediffuse)
        rgb = segment_sum_to(comb / erc, src, slot_valid, M)
        return rgb, {"roughness": matprop["r1"], "tint": tint,
                     "diffuse": diffuse, "spec": spec, "albedo": albedo}
    return shade


def main():
    from __graft_entry__ import _build_nmf
    from nmf_tpu import trainer
    from nmf_tpu.models.microfacet import Microfacet

    key = jax.random.PRNGKey(0)
    nmf, cfg = _build_nmf(key, grid=128, bg_res=512, k_spr=128, recur_k=64,
                          brdf_budget=(32768, 8192), retrace=1024)
    nmf = nmf.replace(model=nmf.model.replace(max_retrace_rays=()))
    weights = trainer.LossWeights()
    B = 4096
    rng = np.random.default_rng(0)
    origins = np.tile(np.array([[0.0, 0.0, -4.0]], np.float32), (B, 1))
    dirs = rng.normal(size=(B, 3)).astype(np.float32)
    dirs[:, 2] = np.abs(dirs[:, 2]) + 1.0
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate([origins, dirs], -1))
    rgbs = jnp.asarray(rng.uniform(size=(B, 3)).astype(np.float32))
    bg_col = jnp.ones((3,))

    orig = Microfacet.shade
    names = ["full", "-envmap", "-brdfmlp", "-ggx", "-hammersley",
             "-parentgather", "-searchsorted", "-bounceblock"]
    stages = ([int(s) for s in sys.argv[1].split(",")] if len(sys.argv) > 1
              else range(8))
    for stage in stages:
        Microfacet.shade = make_staged_shade(stage)

        def gradfn(nmf, rays, rgbs, key, s):
            return jax.grad(lambda m: trainer.compute_loss(
                m, rays + s * 1e-20, rgbs, key, weights, bg_col)[0])(nmf)
        gf = jax.jit(gradfn)
        t = timeit(gf, nmf, rays, rgbs, key, n=6)
        print(f"stage {stage} ({names[stage]:14s}): {t:7.1f} ms")
    Microfacet.shade = orig


if __name__ == "__main__":
    main()
