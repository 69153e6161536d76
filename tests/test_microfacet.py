"""Microfacet shading-model tests: render sanity, russian-roulette retrace,
ray debug logger."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))

from __graft_entry__ import _build_nmf
from nmf_tpu.render import render


def small_mf(key, retrace=32, budget=(512, 128), **kw):
    nmf, _ = _build_nmf(key, grid=16, bg_res=32, k_spr=16, recur_k=8,
                        brdf_budget=budget, retrace=retrace, **kw)
    return nmf


def rays_toward_origin(B=64, seed=0):
    rng = np.random.default_rng(seed)
    origins = np.tile(np.array([[0.0, 0.0, -4.0]], np.float32), (B, 1))
    dirs = rng.normal(size=(B, 3)).astype(np.float32)
    dirs[:, 2] = np.abs(dirs[:, 2]) + 2.0
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return jnp.asarray(np.concatenate([origins, dirs], -1))


class TestMicrofacetRender:
    def test_render_finite(self):
        key = jax.random.PRNGKey(0)
        nmf = small_mf(key)
        rays = rays_toward_origin()
        bg_cache = nmf.bg_module.prepare()
        ims, stats = render(nmf, rays, key, is_train=True, bg_col=None,
                            bg_cache=bg_cache)
        assert ims["rgb_map"].shape == (64, 3)
        assert bool(jnp.all(jnp.isfinite(ims["rgb_map"])))
        assert bool(jnp.all(jnp.isfinite(stats["ori_loss"])))


class TestRussianRoulette:
    def test_full_retrace_is_identity(self):
        """With T == budget every valid bounce ray is retraced, so russian
        roulette drops nothing and keeps the same ray counts -> the render
        must be IDENTICAL to the non-RR render (same key)."""
        key = jax.random.PRNGKey(1)
        nmf = small_mf(key, retrace=512, budget=(512, 128))
        rays = rays_toward_origin(32, seed=1)
        bg_cache = nmf.bg_module.prepare()
        rk = jax.random.PRNGKey(7)
        off, _ = render(nmf, rays, rk, is_train=True, bg_col=None,
                        bg_cache=bg_cache)
        nmf_rr = nmf.replace(model=nmf.model.replace(russian_roulette=True))
        on, _ = render(nmf_rr, rays, rk, is_train=True, bg_col=None,
                       bg_cache=bg_cache)
        np.testing.assert_allclose(np.asarray(off["rgb_map"]),
                                   np.asarray(on["rgb_map"]), atol=1e-6)

    def test_partial_retrace_runs_and_differs(self):
        key = jax.random.PRNGKey(2)
        nmf = small_mf(key, retrace=32, budget=(512, 128))
        rays = rays_toward_origin(32, seed=2)
        bg_cache = nmf.bg_module.prepare()
        rk = jax.random.PRNGKey(9)
        off, _ = render(nmf, rays, rk, is_train=True, bg_col=None,
                        bg_cache=bg_cache)
        nmf_rr = nmf.replace(model=nmf.model.replace(russian_roulette=True))
        on, _ = render(nmf_rr, rays, rk, is_train=True, bg_col=None,
                       bg_cache=bg_cache)
        assert bool(jnp.all(jnp.isfinite(on["rgb_map"])))
        # acc_map is shading-independent
        np.testing.assert_allclose(np.asarray(off["acc_map"]),
                                   np.asarray(on["acc_map"]), atol=1e-6)
        # with only a few retraced rays RR reweights the estimate
        assert float(jnp.abs(on["rgb_map"] - off["rgb_map"]).max()) > 0


class TestRayLogger:
    def test_dump(self, tmp_path):
        from nmf_tpu.modules.logger import LOGGER, RayLogger, collect_ray_debug
        from nmf_tpu import eval as eval_lib
        from tests.test_train import build_small, make_sphere_dataset

        ds = make_sphere_dataset(n_views=1, H=16, W=16)
        key = jax.random.PRNGKey(0)
        nmf = build_small(key, ds, grid=16, k_spr=16)

        LOGGER.enable = True
        LOGGER.reset()
        try:
            eval_lib.evaluate(nmf, ds, key, save_dir=str(tmp_path), n_vis=1,
                              chunk=128, compute_extra_metrics=False,
                              save_all_maps=False)
        finally:
            LOGGER.enable = False
        assert (tmp_path / "rays.pkl").exists()
        import pickle

        entries = pickle.load(open(tmp_path / "rays.pkl", "rb"))
        e = entries[0]
        assert e["xyz"].shape[-1] == 3
        assert e["rays"].shape[-1] == 6
        assert e["weights"].shape == e["valid"].shape
        assert np.isfinite(e["normals"]).all()

    def test_disabled_is_noop(self):
        from nmf_tpu.modules.logger import RayLogger

        lg = RayLogger(enable=False)
        lg.log(np.zeros((4, 6)), np.zeros((4, 8, 4)), np.zeros((4, 8)),
               np.ones((4, 8), bool))
        assert lg.entries == []


class TestBudgetStarvation:
    """When a chunk's bounce-ray demand exceeds brdf_ray_budget, the
    allocation truncates: samples with starts >= budget get zero slots.
    Fresnel mixing folds the diffuse term into the per-bounce-ray comb, so
    a starved sample used to composite to exact BLACK — the mechanism
    behind the period-(chunk/W) stripes in scanline eval renders of the
    400px flagship. Starved samples must fall back to their sample-level
    diffuse lobe instead."""

    def _shade(self, budget, M=64, rays_per_ray=128, weights=None):
        from nmf_tpu.models.microfacet import init_microfacet
        from nmf_tpu.ops.safemath import normalize

        key = jax.random.PRNGKey(0)
        model = init_microfacet(key, app_dim=16,
                                rays_per_ray=rays_per_ray,
                                test_rays_per_ray=rays_per_ray,
                                brdf_ray_budget=(budget,),
                                max_retrace_rays=(),  # skip retrace branch
                                anoise=0.0)
        ks = jax.random.split(key, 5)
        xyz = jax.random.uniform(ks[0], (M, 4), minval=-1, maxval=1)
        feat = jax.random.normal(ks[1], (M, 16)) * 0.1
        viewdirs = normalize(jax.random.normal(ks[2], (M, 3)))
        normals = normalize(jax.random.normal(ks[3], (M, 3)))
        if weights is None:
            weights = jnp.ones((M,))
        valid = jnp.ones((M,), bool)

        def render_reflection(rays, mipval, retrace, rkey):
            return jnp.ones((rays.shape[0], 3)), None

        rgb, debug = model.shade(
            xyz, xyz, feat, viewdirs, normals, weights, valid, M,
            render_reflection, bg_module=None, bg_cache=None,
            is_train=False, recur=0, key=ks[4])
        return np.asarray(rgb), debug

    def test_starved_samples_keep_diffuse(self):
        budget = 256  # demand = 64 * 128 = 8192 >> 256: most samples starve
        rgb, debug = self._shade(budget)
        assert np.isfinite(rgb).all()
        # every unit-weight sample keeps a nonzero (diffuse) color; before
        # the fallback the starved tail was exactly zero
        lum = rgb.max(axis=-1)
        assert (lum > 1e-4).all(), f"{(lum <= 1e-4).sum()} samples black"

    def test_thinned_to_zero_keeps_diffuse(self):
        # low-weight samples whose allocation the proportional thinning
        # rounds down to ZERO rays must also fall back to diffuse: with
        # half the samples at w=0.05 and scale ~0.04, their
        # w*rays_per_ray*scale ~ 0.26 floors to 0 deterministically
        w = jnp.where(jnp.arange(64) % 2 == 0, 1.0, 0.05)
        rgb, _ = self._shade(budget=256, weights=w)
        lum = rgb.max(axis=-1)
        assert (lum > 1e-4).all(), f"{(lum <= 1e-4).sum()} samples black"

    def test_thinning_serves_all_samples(self):
        # proportional thinning: demand 8192 vs budget 256 leaves every
        # sample ~4 rays instead of serving the first ~2 samples in
        # flattened order and starving the rest. spec is the per-sample
        # mean of incoming light (== 1 here), so every served sample
        # reads exactly 1.
        rgb, debug = self._shade(budget=256)
        spec = np.asarray(debug["spec"])
        assert (np.abs(spec - 1.0) < 1e-3).all(), (
            f"{(np.abs(spec - 1.0) >= 1e-3).any(axis=-1).sum()} of "
            f"{spec.shape[0]} samples not served")

    def test_unstarved_render_unchanged(self):
        # with 0.98*budget >= demand nothing is starved or thinned and the
        # fallback branch must be inert: ample-budget renders agree between
        # two budgets that both cover the full demand
        rgb_a, _ = self._shade(64 * 131)
        rgb_b, _ = self._shade(64 * 135)
        np.testing.assert_allclose(rgb_a, rgb_b, atol=1e-5)

    def test_thin_scale_telemetry(self):
        # shade reports the applied thinning factor: ~budget/demand when
        # demand overflows, exactly 1.0 when the budget covers demand
        _, debug = self._shade(budget=256)  # demand 64*128 = 8192
        thin = float(debug["__thin_scale"])
        assert abs(thin - 0.98 * 256 / 8192) < 1e-6, thin
        _, debug = self._shade(budget=64 * 131)
        assert float(debug["__thin_scale"]) == 1.0


class TestChunkInterleave:
    """render_rays_chunked(interleave=True) assigns ray i to chunk
    i % n_chunks and must return outputs in the ORIGINAL ray order."""

    def test_order_restored(self):
        import types

        from nmf_tpu.eval import render_rays_chunked

        N, chunk = 1000, 128
        rays = np.arange(N * 6, dtype=np.float32).reshape(N, 6)
        fake_nmf = types.SimpleNamespace(bg_module=None)

        def render_fn(nmf, r, k, c):
            return {"rgb_map": r[:, :3]}

        for interleave in (False, True):
            out = render_rays_chunked(fake_nmf, rays, jax.random.PRNGKey(0),
                                      chunk=chunk, keys=("rgb_map",),
                                      render_fn=render_fn,
                                      interleave=interleave)
            np.testing.assert_array_equal(out["rgb_map"], rays[:, :3])


class TestEvalTier:
    """eval_tier precompiled test-time budget tiers (VERDICT r2 next #8;
    reference analogue: test_rays_per_ray + update_n_samples,
    /root/reference/models/microfacet.py:241-268)."""

    def test_train_tier_is_identity(self):
        from nmf_tpu.eval import apply_eval_tier

        nmf = small_mf(jax.random.PRNGKey(0))
        assert apply_eval_tier(nmf, "train") is nmf

    def test_high_tier_scales_budgets(self):
        from nmf_tpu.eval import apply_eval_tier

        nmf = small_mf(jax.random.PRNGKey(0))
        m0 = nmf.model
        m2 = apply_eval_tier(nmf, "high").model
        assert m2.test_rays_per_ray == 2 * m0.test_rays_per_ray
        assert m2.brdf_ray_budget == tuple(2 * b for b in m0.brdf_ray_budget)
        assert m2.max_retrace_rays == tuple(
            2 * r for r in m0.max_retrace_rays)
        # train-time knobs untouched
        assert m2.rays_per_ray == m0.rays_per_ray

    def test_invalid_tiers_fail_fast(self):
        """Non-integral / non-positive numeric tiers must raise at startup
        (2.7 must not silently truncate to 2; -1 must not no-op)."""
        import pytest

        from nmf_tpu.eval import validate_eval_tier

        assert validate_eval_tier("high") == 2
        assert validate_eval_tier(4) == 4
        assert validate_eval_tier(2.0) == 2  # integral float is fine
        for bad in ("hgih", 2.7, 0, -1):
            with pytest.raises(ValueError):
                validate_eval_tier(bad)

    def test_non_microfacet_passthrough(self):
        from nmf_tpu import config as config_lib
        from nmf_tpu.builders import build_nmf
        from nmf_tpu.eval import apply_eval_tier

        cfg = config_lib.compose([
            "model=tensorf", "dataset=synthetic_sphere",
            "field.N_voxel_init=4096", "field.N_voxel_final=4096",
            "field.upsamp_list=[]"])
        aabb = np.array([[-1.5] * 3, [1.5] * 3], np.float32)
        nmf = build_nmf(jax.random.PRNGKey(0), cfg["model"]["arch"], aabb,
                        (2.0, 6.0))
        assert apply_eval_tier(nmf, "ultra") is nmf

    def test_tiered_render_runs(self):
        from nmf_tpu.eval import apply_eval_tier

        key = jax.random.PRNGKey(0)
        nmf = apply_eval_tier(small_mf(key), "high")
        rays = rays_toward_origin()
        bg_cache = nmf.bg_module.prepare()
        ims, _ = render(nmf, rays, key, is_train=False, bg_col=(1., 1., 1.),
                        bg_cache=bg_cache)
        assert bool(jnp.all(jnp.isfinite(ims["rgb_map"])))
