"""Fixed-shape (single-compile-signature) field mode.

``field.fixed_shape=true`` allocates the VM factor grids at the FINAL
voxel-schedule resolution with zero padding and tracks the live resolution
as a traced pytree leaf, so the whole coarse-to-fine upsample schedule runs
under ONE jitted train-step signature (the exact-shape mode recompiles the
full step at every upsamp_list event — reference semantics from
/root/reference/fields/tensor_base.py:171-243 are otherwise identical).

These tests pin the contract: the fixed-shape path is BIT-IDENTICAL to the
exact-shape path on the live region (queries, gradients, regularizers, the
upsample event itself), and a schedule event does not add a jit cache entry.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmf_tpu.fields.tensorf import init_tensorvm_split
from nmf_tpu.samplers.alphagrid import AlphaGridSampler

# Multi-minute e2e tests: excluded from the quick gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow

AABB = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], dtype=np.float32)


def pair_fields(**kw):
    """(exact, fixed) fields with identical init draws (same key)."""
    common = dict(grid_size=[17, 17, 17], N_voxel_init=17 ** 3,
                  N_voxel_final=33 ** 3, upsamp_list=(10, 20))
    common.update(kw)
    exact = init_tensorvm_split(jax.random.PRNGKey(3), AABB, **common)
    fixed = init_tensorvm_split(jax.random.PRNGKey(3), AABB,
                                fixed_shape=True, **common)
    return exact, fixed


def rand_xyz(n=257, seed=0, size_col=True):
    pts = np.random.default_rng(seed).uniform(-1.45, 1.45, (n, 3))
    if size_col:
        pts = np.concatenate([pts, np.full((n, 1), 0.01)], -1)
    return jnp.asarray(pts, dtype=jnp.float32)


class TestFixedShapeField:
    def test_padded_shapes_and_live_leaf(self):
        exact, fixed = pair_fields()
        assert fixed.grid_size == (33, 33, 33)
        assert fixed.density_rf.planes[0].shape[1:] == (33, 33)
        assert fixed.live_grid_size == (17, 17, 17)
        np.testing.assert_array_equal(np.asarray(fixed.live_reso),
                                      [17.0, 17.0, 17.0])
        # live region of the padded init == the exact init (same key)
        for i in range(3):
            np.testing.assert_array_equal(
                np.asarray(fixed.density_rf.planes[i][:, :17, :17]),
                np.asarray(exact.density_rf.planes[i]))
            np.testing.assert_array_equal(
                np.asarray(fixed.density_rf.lines[i][:, :17]),
                np.asarray(exact.density_rf.lines[i]))

    def test_query_parity_bitexact(self):
        exact, fixed = pair_fields()
        xyz = rand_xyz()
        for use_gd in (False, True):
            a = exact.compute_densityfeature(xyz, use_gather_dtype=use_gd)
            b = fixed.compute_densityfeature(xyz, use_gather_dtype=use_gd)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(
            np.asarray(exact.compute_appfeature(xyz)),
            np.asarray(fixed.compute_appfeature(xyz)))
        sa, aa, na = exact.compute_all(xyz)
        sb, ab, nb = fixed.compute_all(xyz)
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
        np.testing.assert_array_equal(np.asarray(aa), np.asarray(ab))
        np.testing.assert_array_equal(np.asarray(na), np.asarray(nb))
        np.testing.assert_array_equal(
            np.asarray(exact.compute_normals(xyz)),
            np.asarray(fixed.compute_normals(xyz)))

    def test_grad_parity_and_zero_pad_grads(self):
        exact, fixed = pair_fields()
        xyz = rand_xyz(129, seed=5)

        def loss(rf):
            sigma, app, normals = rf.compute_all(xyz)
            # include every regularizer: an unmasked |.| or TV over the
            # padded buffers would leak constant gradient into the pads
            # (JAX's abs grad at 0 is 1.0) and Adam would break the
            # zero-padding invariant mid-run
            return (sigma.sum() + (app ** 2).sum()
                    + (normals * jnp.arange(3)).sum()
                    + rf.density_L1() + rf.tv_loss_density()
                    + rf.tv_loss_app() + rf.vector_comp_diffs())

        ge = jax.grad(loss)(exact)
        gf = jax.grad(loss)(fixed)
        for i in range(3):
            pe = np.asarray(ge.density_rf.planes[i])
            pf = np.asarray(gf.density_rf.planes[i])
            np.testing.assert_allclose(pf[:, :17, :17], pe, atol=1e-4)
            # padding must receive EXACT zero gradient (else Adam would
            # grow the pads and break later upsample events)
            assert np.all(pf[:, 17:, :] == 0) and np.all(pf[:, :, 17:] == 0)
            le = np.asarray(ge.app_rf.lines[i])
            lf = np.asarray(gf.app_rf.lines[i])
            np.testing.assert_allclose(lf[:, :17], le, atol=1e-5)
            assert np.all(lf[:, 17:] == 0)

    def test_regularizer_parity(self):
        exact, fixed = pair_fields()
        for name in ("density_L1", "tv_loss_density", "tv_loss_app",
                     "vector_comp_diffs"):
            a = float(getattr(exact, name)())
            b = float(getattr(fixed, name)())
            np.testing.assert_allclose(b, a, rtol=1e-6, err_msg=name)

    def test_upsample_event_parity(self):
        exact, fixed = pair_fields()
        e2, ch_e = exact.check_schedule(10)
        f2, ch_f = fixed.check_schedule(10)
        assert ch_e and ch_f
        assert f2.grid_size == (33, 33, 33)          # static unchanged
        assert f2.live_grid_size == e2.grid_size     # live tracks exact
        g = e2.grid_size
        for i in range(3):
            np.testing.assert_allclose(
                np.asarray(f2.density_rf.planes[i][:, :g[1], :g[0]]),
                np.asarray(e2.density_rf.planes[i]), atol=1e-6)
            # padding stays exactly zero after the in-place resample
            assert np.all(np.asarray(
                f2.density_rf.planes[i][:, g[1]:, :]) == 0)
        xyz = rand_xyz(99, seed=7)
        np.testing.assert_allclose(
            np.asarray(f2.compute_densityfeature(xyz)),
            np.asarray(e2.compute_densityfeature(xyz)), atol=1e-6)

    def test_shrink_rejected(self):
        _, fixed = pair_fields()
        with pytest.raises(NotImplementedError):
            fixed.shrink(np.array([[-1, -1, -1], [1, 1, 1]], np.float32))


class TestFixedShapeSampler:
    def _samplers(self):
        exact, fixed = pair_fields()
        se = AlphaGridSampler(alpha_mask=None, aabb=AABB,
                              near_far=(1.0, 7.0)).update(exact, init=True)
        sf = AlphaGridSampler(alpha_mask=None, aabb=AABB,
                              near_far=(1.0, 7.0)).update(fixed, init=True)
        return exact, fixed, se, sf

    def test_step_scale_and_statics(self):
        exact, fixed, se, sf = self._samplers()
        # fixed statics are pinned to the FINAL resolution
        assert sf.n_samples > se.n_samples
        assert sf.stepsize < se.stepsize
        np.testing.assert_allclose(float(sf.live_stepsize), se.stepsize,
                                   rtol=1e-6)
        assert se.step_scale is None
        # the mask is born at the pinned final resolution
        assert sf.alpha_mask.alpha_volume.shape == (33, 33, 33)

    def test_march_parity(self):
        exact, fixed, se, sf = self._samplers()
        rng = np.random.default_rng(11)
        o = np.tile(np.array([[0.0, 0.0, -4.0]], np.float32), (32, 1))
        d = rng.normal(size=(32, 3)).astype(np.float32)
        d[:, 2] = np.abs(d[:, 2]) + 1.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = jnp.asarray(np.concatenate([o, d], -1))
        K = 32
        a = se.sample(rays, is_train=False, max_samples_per_ray=K)
        b = sf.sample(rays, is_train=False, max_samples_per_ray=K)
        np.testing.assert_array_equal(np.asarray(a["valid"]),
                                      np.asarray(b["valid"]))
        m = np.asarray(a["valid"])
        np.testing.assert_allclose(np.asarray(a["xyz"])[m],
                                   np.asarray(b["xyz"])[m], atol=1e-5)
        np.testing.assert_allclose(np.asarray(a["z_vals"])[m],
                                   np.asarray(b["z_vals"])[m], atol=1e-5)

    def test_mask_rebuild_keeps_shape(self):
        exact, fixed, _, sf = self._samplers()
        sf2, _ = sf.update_alpha_mask(fixed)
        assert sf2.alpha_mask.alpha_volume.shape == (33, 33, 33)
        # event refresh (upsample) keeps the leaf structure + shapes
        f2, _ = fixed.check_schedule(10)
        sf3 = sf2.update(f2, init=True)
        assert sf3.alpha_mask.alpha_volume.shape == (33, 33, 33)
        assert float(sf3.step_scale) < float(sf2.step_scale)


class TestFixedShapeSingleSignature:
    def test_one_jit_entry_across_events(self):
        """The defining property: a schedule event must NOT create a new
        jit cache entry for a function of the field pytree."""
        _, fixed = pair_fields()
        xyz = rand_xyz(65, seed=2)

        @jax.jit
        def f(rf):
            return rf.compute_densityfeature(xyz).sum()

        v0 = float(f(fixed))
        f2, changed = fixed.check_schedule(10)
        assert changed
        v1 = float(f(f2))
        assert np.isfinite(v0) and np.isfinite(v1)
        assert f._cache_size() == 1


class TestFixedShapeCLI:
    def test_train_cli_single_compile_across_events(self, tmp_path,
                                                    monkeypatch):
        """Full CLI run with upsample + mask events in fixed-shape mode:
        the device step must be built ONCE (no recompiles at events), the
        live grid must grow while the padded statics stay put, and the fit
        must actually progress."""
        import json

        from nmf_tpu import config as config_lib
        from nmf_tpu import trainer
        from nmf_tpu.train import reconstruction

        builds = []
        real = trainer.make_device_train_step

        def counting(*a, **k):
            builds.append(1)
            return real(*a, **k)

        monkeypatch.setattr(trainer, "make_device_train_step", counting)

        cfg = config_lib.compose([
            "model=tensorf", "dataset=synthetic_sphere",
            "dataset.image_size=16", "dataset.n_views=2",
            "model.params.batch_size=64", "model.params.n_iters=12",
            "field.N_voxel_init=4096", "field.N_voxel_final=8000",
            "field.upsamp_list=[4]", "field.fixed_shape=True",
            "model.arch.sampler.update_list=[8]",
            "model.arch.max_samples_per_ray=24",
            "vis_every=0", "N_vis=0", "render_test=True",
            f"basedir={tmp_path}", "expname=fix", "chain_steps=2",
            "progress_refresh_rate=2",
        ])
        nmf, _ = reconstruction(cfg, log=lambda *a, **k: None)
        assert len(builds) == 1, "fixed_shape must not rebuild the step"
        assert nmf.rf.fixed_shape
        assert tuple(nmf.rf.grid_size) == (20, 20, 20)  # padded static
        assert nmf.rf.live_grid_size == (20, 20, 20)    # upsample fired
        rundir = tmp_path / "synthetic_sphere_fix"
        recs = [json.loads(l) for l in
                (rundir / "metrics.jsonl").read_text().splitlines()]
        psnrs = [r["psnr"] for r in recs if "psnr" in r]
        assert psnrs and np.isfinite(psnrs[-1])

    def test_ckpt_roundtrip_fixed(self, tmp_path):
        from nmf_tpu import ckpt as ckpt_lib
        from nmf_tpu import config as config_lib
        from nmf_tpu.builders import build_nmf
        from nmf_tpu.render import render

        cfg = config_lib.compose([
            "model=tensorf", "dataset=synthetic_sphere",
            "field.N_voxel_init=4096", "field.N_voxel_final=8000",
            "field.upsamp_list=[5]", "field.fixed_shape=True",
            "model.arch.max_samples_per_ray=24",
        ])
        aabb = np.array([[-1.5] * 3, [1.5] * 3], np.float32)
        nmf = build_nmf(jax.random.PRNGKey(0), cfg["model"]["arch"], aabb,
                        (2.0, 6.0))
        nmf, changed = nmf.check_schedule(5, 1)  # move live off its init
        assert changed and nmf.rf.live_grid_size == (20, 20, 20)
        p = tmp_path / "fix.th"
        ckpt_lib.save(p, nmf, dict(cfg))
        nmf2, _, _ = ckpt_lib.load(p)
        assert nmf2.rf.fixed_shape
        assert nmf2.rf.live_grid_size == nmf.rf.live_grid_size
        np.testing.assert_allclose(float(nmf2.sampler.step_scale),
                                   float(nmf.sampler.step_scale))
        rng = np.random.default_rng(0)
        o = np.tile([[0.0, 0.0, -4.0]], (32, 1)).astype(np.float32)
        d = rng.normal(size=(32, 3)).astype(np.float32)
        d[:, 2] = np.abs(d[:, 2]) + 1.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = jnp.asarray(np.concatenate([o, d], -1))
        k = jax.random.PRNGKey(0)
        out1, _ = render(nmf, rays, k, is_train=False)
        out2, _ = render(nmf2, rays, k, is_train=False)
        np.testing.assert_allclose(np.asarray(out1["rgb_map"]),
                                   np.asarray(out2["rgb_map"]), atol=1e-6)


class TestFixedShapeSharded:
    def test_sharded_step_with_fixed_field(self):
        """The fixed-shape leaves (live_reso, step_scale) replicate over the
        mesh and the sharded loss matches the single-device loss — fixed
        mode composes with ray-DP multichip training."""
        from nmf_tpu import trainer
        from nmf_tpu.data.synthetic import make_sphere_dataset
        from nmf_tpu.models.tensorf import init_tensorf_shade
        from nmf_tpu.parallel import (make_mesh, make_parallel_train_step,
                                      replicate, shard_batch)
        from nmf_tpu.render import NMF

        if jax.device_count() < 8:
            pytest.skip("needs the 8-device CPU mesh (conftest)")
        ds = make_sphere_dataset(n_views=2, H=16, W=16)
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        rf = init_tensorvm_split(
            k1, ds["scene_bbox"], grid_size=[16] * 3, N_voxel_init=16 ** 3,
            N_voxel_final=24 ** 3, upsamp_list=(5,), fixed_shape=True)
        sampler = AlphaGridSampler(
            alpha_mask=None, aabb=jnp.asarray(ds["scene_bbox"]),
            near_far=tuple(ds["near_far"])).update(rf, init=True)
        model = init_tensorf_shade(k2, rf.app_dim)
        nmf = NMF(rf=rf, sampler=sampler, model=model,
                  max_samples_per_ray=16)

        cfg = trainer.OptimConfig(n_iters=10)
        tx = trainer.make_optimizer(nmf, cfg)
        opt_state = tx.init(nmf)
        weights = trainer.LossWeights(ori_lambda=0.0, pred_lambda=0.0)
        B = 64
        rays = jnp.asarray(ds["all_rays"][:B])
        rgbs = jnp.asarray(ds["all_rgbs"][:B])
        bg = jnp.ones(3)
        sk = jax.random.PRNGKey(7)

        single = trainer.make_train_step(tx, donate=False)
        _, _, m1 = single(nmf, opt_state, rays, rgbs, bg, sk, weights)

        mesh = make_mesh(8)
        par = make_parallel_train_step(tx, mesh, donate=False)
        _, _, m2 = par(replicate(mesh, nmf), replicate(mesh, opt_state),
                       *shard_batch(mesh, rays, rgbs),
                       replicate(mesh, bg), sk, weights)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-4)


class TestFixedShapeMicrofacet:
    def test_flagship_step_across_event(self):
        """The full microfacet pipeline (GGX + BRDF + retrace + envmap)
        trains through a fixed-shape upsample event with the SAME compiled
        step (the path runs/run_flagship_fixed400.sh uses)."""
        from nmf_tpu import config as config_lib
        from nmf_tpu import trainer
        from nmf_tpu.builders import build_nmf

        cfg = config_lib.compose([
            "model=microfacet_tensorf2", "dataset=synthetic_sphere",
            "field.N_voxel_init=4096", "field.N_voxel_final=8000",
            "field.upsamp_list=[2]", "field.fixed_shape=True",
            "model.arch.sampler.update_list=[3]",
            "model.arch.max_samples_per_ray=16",
            "model.arch.recur_samples_per_ray=8",
            "model.arch.proposal_samples_per_ray=8",
            "model.arch.model.brdf_ray_budget=[512,128]",
            "model.arch.model.max_retrace_rays=[32]",
            "model.arch.bg_module.bg_resolution=32",
        ])
        aabb = np.array([[-1.5] * 3, [1.5] * 3], np.float32)
        nmf = build_nmf(jax.random.PRNGKey(0), cfg["model"]["arch"], aabb,
                        (2.0, 6.0))
        tx = trainer.make_optimizer(nmf, trainer.OptimConfig(n_iters=8))
        opt_state = tx.init(nmf)
        step = trainer.make_train_step(tx, donate=False)
        weights = trainer.LossWeights()

        rng = np.random.default_rng(0)
        o = np.tile([[0.0, 0.0, -4.0]], (64, 1)).astype(np.float32)
        d = rng.normal(size=(64, 3)).astype(np.float32)
        d[:, 2] = np.abs(d[:, 2]) + 1.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = jnp.asarray(np.concatenate([o, d], -1))
        rgbs = jnp.asarray(rng.uniform(size=(64, 3)).astype(np.float32))

        key = jax.random.PRNGKey(1)
        for it in range(4):
            key, sk = jax.random.split(key)
            nmf, opt_state, metrics = step(nmf, opt_state, rays, rgbs,
                                           jnp.ones(3), sk, weights)
            assert np.isfinite(float(metrics["loss"])), it
            nmf, changed = nmf.check_schedule(it + 1, 1)
            if changed:
                opt_state = tx.init(nmf)  # fixed mode: same step reused
        assert nmf.rf.live_grid_size == (20, 20, 20)
        # one jit cache entry despite the upsample + mask events
        assert step._cache_size() == 1


class TestFixedShapeBinsumGather:
    def test_binsum_quad_gather_live_grads(self):
        """quad_gather_2d_binsum's hand-written backward must honor the live
        extents: plane cotangent zero on pads, coordinate cotangent scaled
        by the LIVE unnormalize factor (not the padded statics)."""
        from nmf_tpu.ops.grid_sample import (quad_gather_2d,
                                             quad_gather_2d_binsum)

        rng = np.random.default_rng(4)
        C, Hl, Wl, Hp, Wp = 6, 19, 19, 31, 31
        live = jnp.asarray(rng.normal(size=(C, Hl, Wl)).astype(np.float32))
        pad = jnp.zeros((C, Hp, Wp)).at[:, :Hl, :Wl].set(live)
        coords = jnp.asarray(
            rng.uniform(-0.95, 0.95, size=(150, 2)).astype(np.float32))
        lhw = (jnp.float32(Hl), jnp.float32(Wl))

        def f_exact(p, c):
            return (quad_gather_2d(p, c) ** 2).sum()

        def f_bin(p, c):
            return (quad_gather_2d_binsum(p, c, lhw) ** 2).sum()

        np.testing.assert_array_equal(
            np.asarray(quad_gather_2d_binsum(pad, coords, lhw)),
            np.asarray(quad_gather_2d(live, coords)))
        gp_e, gc_e = jax.grad(f_exact, argnums=(0, 1))(live, coords)
        gp_b, gc_b = jax.grad(f_bin, argnums=(0, 1))(pad, coords)
        np.testing.assert_allclose(np.asarray(gp_b)[:, :Hl, :Wl],
                                   np.asarray(gp_e), atol=1e-5)
        assert np.all(np.asarray(gp_b)[:, Hl:, :] == 0)
        assert np.all(np.asarray(gp_b)[:, :, Wl:] == 0)
        # coordinate cotangent must use the live (Wl-1)/2 scale
        np.testing.assert_allclose(np.asarray(gc_b), np.asarray(gc_e),
                                   rtol=1e-4, atol=1e-5)

    def test_builder_rejects_occgrid(self):
        from nmf_tpu import config as config_lib
        from nmf_tpu.builders import build_nmf

        cfg = config_lib.compose([
            "model=tensorf", "dataset=synthetic_sphere",
            "model.arch.sampler._target_=samplers.nerf_acc.NerfAccSampler",
            "model.arch.sampler.grid_size=16",
            "field.N_voxel_init=4096", "field.N_voxel_final=8000",
            "field.upsamp_list=[5]", "field.fixed_shape=True"])
        aabb = np.array([[-1.5] * 3, [1.5] * 3], np.float32)
        with pytest.raises(ValueError, match="fixed_shape requires"):
            build_nmf(jax.random.PRNGKey(0), cfg["model"]["arch"], aabb,
                      (2.0, 6.0))


class TestFixedShapeResume:
    def test_midrun_resume_fixed(self, tmp_path):
        """save_every/resume across a fixed-shape schedule: the restored
        live_reso/step_scale leaves carry the schedule position, past
        events are skipped, future ones still fire (the exact path
        runs/run_flagship_fixed400.sh retries through)."""
        from nmf_tpu import config as config_lib
        from nmf_tpu.train import reconstruction

        base = [
            "model=tensorf", "dataset=synthetic_sphere",
            "dataset.image_size=16", "dataset.n_views=2",
            "model.params.batch_size=64",
            "field.N_voxel_init=4096", "field.N_voxel_final=8000",
            "field.upsamp_list=[3,8]", "field.fixed_shape=True",
            "model.arch.sampler.update_list=[2]",
            "model.arch.max_samples_per_ray=24",
            "vis_every=0", "N_vis=0", "render_test=False",
            f"basedir={tmp_path}", "expname=rfx", "chain_steps=2",
            "progress_refresh_rate=2", "save_every=4",
        ]
        # run A: dies at iter 6 (first upsample at 3 done; latest.th @ 4)
        nmf_a, _ = reconstruction(
            config_lib.compose(base + ["model.params.n_iters=6"]),
            log=lambda *a, **k: None)
        mid_live = nmf_a.rf.live_grid_size
        assert mid_live[0] > 16  # iter-3 upsample fired pre-crash
        latest = (tmp_path / "synthetic_sphere_rfx"
                  / "synthetic_sphere_rfx_latest.th")
        assert latest.exists()
        # run B: resume to 10 -- crosses the second upsample at 8
        nmf_b, _ = reconstruction(
            config_lib.compose(base + ["model.params.n_iters=10",
                                       "resume=True"]),
            log=lambda *a, **k: None)
        assert nmf_b.rf.fixed_shape
        assert nmf_b.rf.grid_size == (20, 20, 20)       # padded static
        assert nmf_b.rf.live_grid_size == (20, 20, 20)  # second event fired
        assert float(nmf_b.sampler.step_scale) <= 1.0 + 1e-6
