"""Field (TensorVMSplit) and sampler unit tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmf_tpu.fields.tensorf import (FactorGrid, TensorVMSplit,
                                    init_tensorvm_split, upsample_factor_grid)
from nmf_tpu.samplers.alphagrid import AlphaGridMask, AlphaGridSampler

AABB = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], dtype=np.float32)


def small_field(**kw):
    return init_tensorvm_split(
        jax.random.PRNGKey(0), AABB, grid_size=[16, 16, 16],
        N_voxel_init=16 ** 3, N_voxel_final=32 ** 3, upsamp_list=(10, 20),
        **kw)


class TestTensorVMSplit:
    def test_density_shapes_and_finite(self):
        rf = small_field()
        xyz = jnp.asarray(np.random.default_rng(0).uniform(-1.4, 1.4, (100, 3)),
                          dtype=jnp.float32)
        sigma = rf.compute_densityfeature(xyz)
        assert sigma.shape == (100,)
        assert np.all(np.isfinite(sigma))
        assert np.all(np.asarray(sigma) >= 0)  # softplus

    def test_appfeature_shape(self):
        rf = small_field()
        xyz = jnp.zeros((7, 4))
        feat = rf.compute_appfeature(xyz)
        assert feat.shape == (7, 24)

    def test_density_manual_contraction(self):
        # with dbasis=False the density feature is sum over planes/components
        rf = small_field()
        xyz = jnp.asarray([[0.3, -0.2, 0.7]], dtype=jnp.float32)
        coords = rf.normalize_coord(xyz)[..., :3]
        feats = rf.density_rf.query(coords)
        manual = sum(np.asarray(f).sum(-1) for f in feats)
        got = rf.compute_densityfeature(xyz, activate=False)
        np.testing.assert_allclose(got, manual, rtol=1e-5)

    def test_upsample_preserves_node_values(self):
        rf = small_field()
        # query at exact node positions of the coarse grid
        g = rf.grid_size[0]
        pos = np.linspace(-1.5, 1.5, g)[2:-2]
        xyz = jnp.asarray(np.stack(np.meshgrid(pos[:3], pos[:3], pos[:3],
                                               indexing="ij"), -1).reshape(-1, 3),
                          dtype=jnp.float32)
        before = rf.compute_densityfeature(xyz, activate=False)
        rf2 = rf.upsample([31, 31, 31])  # odd size keeps old nodes on lattice
        after = rf2.compute_densityfeature(xyz, activate=False)
        np.testing.assert_allclose(before, after, atol=1e-4)

    def test_normals_point_down_gradient(self):
        # build a field whose density grows with +x: planes for (0,1) and
        # (0,2) constant in x... simplest: set all lines/planes constant and
        # inject a linear ramp into plane 0 along its x axis (world axis 0)
        rf = small_field(numer_grad=True)
        g = rf.grid_size[0]
        ramp = jnp.broadcast_to(jnp.linspace(0, 1, g)[None, None, :],
                                (16, g, g))  # x = last axis = matMode[0][0]=0
        planes = (ramp, jnp.zeros_like(ramp), jnp.zeros_like(ramp))
        lines = tuple(jnp.ones_like(l) for l in rf.density_rf.lines)
        rf = rf.replace(density_rf=FactorGrid(planes=planes, lines=lines))
        xyz = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (50, 3)),
                          dtype=jnp.float32)
        norms = rf.compute_normals(xyz)
        # density increases with +x -> normal should be -x
        assert np.all(np.asarray(norms[:, 0]) < -0.99)

    def test_normals_analytic_matches_smoothed_direction(self):
        # smoothed central differences only approximate analytic derivatives
        # when the field is smooth at the grid scale -> use trig init
        rf = small_field(init_mode="trig")
        xyz = jnp.asarray(np.random.default_rng(2).uniform(-0.8, 0.8, (20, 3)),
                          dtype=jnp.float32)
        n_smooth = rf.compute_normals(xyz)
        n_exact = rf.replace(numer_grad=False).compute_normals(xyz)
        # directions should roughly agree for a smooth random field
        cos = (np.asarray(n_smooth) * np.asarray(n_exact)).sum(-1)
        assert np.mean(cos) > 0.7

    def test_normals_differentiable_wrt_params(self):
        rf = small_field()
        xyz = jnp.asarray([[0.1, 0.2, -0.3], [0.5, -0.5, 0.0]],
                          dtype=jnp.float32)

        def loss(rf):
            n = rf.compute_normals(xyz)
            return (n[:, 0] ** 2).sum()

        g = jax.grad(loss)(rf)
        leaves = jax.tree_util.tree_leaves(g.density_rf)
        assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)

    def test_shrink(self):
        rf = small_field()
        new_aabb = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
        rf2 = rf.shrink(new_aabb)
        assert all(g <= 16 for g in rf2.grid_size)
        # querying inside the new box still works
        s = rf2.compute_densityfeature(jnp.zeros((3, 3)))
        assert np.all(np.isfinite(s))

    def test_check_schedule_upsamples(self):
        rf = small_field()
        rf2, changed = rf.check_schedule(10)
        assert changed and rf2.grid_size[0] > rf.grid_size[0]
        rf3, changed = rf.check_schedule(11)
        assert not changed

    def test_regularizers_finite(self):
        rf = small_field()
        for v in (rf.density_L1(), rf.tv_loss_density(), rf.tv_loss_app(),
                  rf.vector_comp_diffs()):
            assert np.isfinite(float(v))


class TestSampler:
    def make(self, rf):
        s = AlphaGridSampler(alpha_mask=None, aabb=jnp.asarray(AABB),
                             near_far=(2.0, 6.0))
        return s.update(rf, init=True)

    def test_sample_shapes(self):
        rf = small_field()
        s = self.make(rf)
        rays = jnp.concatenate([
            jnp.tile(jnp.asarray([[0.0, 0.0, -4.0]]), (8, 1)),
            jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (8, 1))], axis=-1)
        out = s.sample(rays, key=jax.random.PRNGKey(0), is_train=True)
        B, K = out["valid"].shape
        assert B == 8
        assert out["xyz"].shape == (8, K, 4)
        assert bool(out["valid"].any())
        # all valid samples must lie inside the aabb
        pts = np.asarray(out["xyz"])[..., :3][np.asarray(out["valid"])]
        assert np.all(pts >= AABB[0] - 1e-5) and np.all(pts <= AABB[1] + 1e-5)

    def test_z_vals_monotonic(self):
        rf = small_field()
        s = self.make(rf)
        rays = jnp.asarray([[0.0, 0.0, -4.0, 0.0, 0.0, 1.0]])
        out = s.sample(rays, is_train=False)
        z = np.asarray(out["z_vals"])[0]
        assert np.all(np.diff(z) >= 0)

    def test_alpha_mask_culls(self):
        rf = small_field()
        s = self.make(rf)
        # empty alpha mask: everything culled
        vol = jnp.zeros((8, 8, 8))
        s = s.replace(alpha_mask=AlphaGridMask(aabb=jnp.asarray(AABB),
                                               alpha_volume=vol))
        rays = jnp.asarray([[0.0, 0.0, -4.0, 0.0, 0.0, 1.0]])
        out = s.sample(rays, is_train=False)
        assert not bool(out["valid"].any())

    def test_update_alpha_mask(self):
        rf = small_field()
        s = self.make(rf)
        s2, new_aabb = s.update_alpha_mask(rf, (16, 16, 16))
        assert s2.alpha_mask is not None
        assert np.asarray(new_aabb).shape == (2, 3)

    def test_compaction(self):
        rf = small_field()
        s = self.make(rf)
        rays = jnp.asarray([[0.0, 0.0, -4.0, 0.0, 0.0, 1.0]] * 4)
        out = s.sample(rays, is_train=False, max_samples_per_ray=16)
        assert out["valid"].shape == (4, 16)

    def _rays(self, n=16, seed=0):
        rng = np.random.default_rng(seed)
        d = rng.normal(size=(n, 3))
        d[:, 2] = np.abs(d[:, 2]) + 1.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.tile([[0.0, 0.0, -4.0]], (n, 1))
        return jnp.asarray(np.concatenate([o, d], -1), jnp.float32)

    def test_two_level_matches_flat_with_full_mask(self):
        """All-ones mask + enough in-box candidates: the superstep march
        must pick exactly the same first-K samples as the flat march."""
        rf = small_field()
        s = self.make(rf)
        ones = jnp.ones((8, 8, 8))
        mask = AlphaGridMask(aabb=jnp.asarray(AABB), alpha_volume=ones,
                             coarse_volume=ones)
        rays = self._rays(16)
        key = jax.random.PRNGKey(3)
        a = s.replace(alpha_mask=mask, superstep=0).sample(
            rays, key=key, is_train=True, max_samples_per_ray=32)
        b = s.replace(alpha_mask=mask, superstep=4).sample(
            rays, key=key, is_train=True, max_samples_per_ray=32)
        # identical jitter -> identical kept z/dists wherever both are valid
        both = np.asarray(a["valid"]) & np.asarray(b["valid"])
        assert both.sum() > 0.9 * np.asarray(a["valid"]).sum()
        np.testing.assert_allclose(np.asarray(a["z_vals"])[both],
                                   np.asarray(b["z_vals"])[both], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(a["dists"])[both],
                                   np.asarray(b["dists"])[both], rtol=1e-5)

    def test_two_level_never_drops_valid_samples_of_flat(self):
        """Blob mask: every fine sample the flat march keeps must also be
        kept by the conservative superstep march (until budget)."""
        rf = small_field()
        s = self.make(rf)
        G = 16
        ii = np.stack(np.meshgrid(*[np.arange(G)] * 3, indexing="ij"), -1)
        blob = (np.linalg.norm(ii - G / 2, axis=-1) < 3.5).astype(np.float32)
        vol = jnp.asarray(blob)  # (z,y,x) symmetric blob
        r = s._coarse_dilate_radius((G, G, G))
        from nmf_tpu.ops.grid_sample import max_pool_3d
        mask = AlphaGridMask(aabb=jnp.asarray(AABB), alpha_volume=vol,
                             coarse_volume=max_pool_3d(vol, 2 * r + 1))
        rays = self._rays(32, seed=1)
        key = jax.random.PRNGKey(7)
        flat = s.replace(alpha_mask=mask, superstep=0).sample(
            rays, key=key, is_train=True, max_samples_per_ray=64)
        two = s.replace(alpha_mask=mask, superstep=4).sample(
            rays, key=key, is_train=True, max_samples_per_ray=64)
        for b in range(32):
            zf = np.asarray(flat["z_vals"])[b][np.asarray(flat["valid"])[b]]
            zt = np.asarray(two["z_vals"])[b][np.asarray(two["valid"])[b]]
            missing = sorted(set(np.round(zf, 5)) - set(np.round(zt, 5)))
            assert not missing, (b, missing)

    def test_two_level_in_renderer_parity(self):
        """End-to-end: rendering with the superstep sampler matches the
        flat sampler closely on a trained-ish field."""
        from nmf_tpu.render import render
        from nmf_tpu.models.tensorf import init_tensorf_shade
        from nmf_tpu.render import NMF

        rf = small_field()
        s = self.make(rf)
        s2, _ = s.update_alpha_mask(rf, (16, 16, 16))
        model = init_tensorf_shade(jax.random.PRNGKey(1), rf.app_dim)
        rays = self._rays(16, seed=2)
        outs = []
        for ss in (0, 4):
            nmf = NMF(rf=rf, sampler=s2.replace(superstep=ss), model=model,
                      max_samples_per_ray=32)
            ims, _ = render(nmf, rays, jax.random.PRNGKey(5), is_train=False)
            outs.append(np.asarray(ims["rgb_map"]))
        np.testing.assert_allclose(outs[0], outs[1], atol=5e-3)


class TestGGX:
    def test_mirror_at_low_roughness(self):
        from nmf_tpu.modules.brdf_samplers import GGXSampler
        from nmf_tpu.ops.safemath import normalize

        R = 512
        rng = np.random.default_rng(3)
        N = jnp.asarray(normalize(jnp.asarray(
            rng.normal(size=(R, 3)) + [0, 0, 3])), dtype=jnp.float32)
        V = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (R, 3))
        # ensure V.N > 0
        u1 = jnp.asarray(rng.uniform(size=(R,)), dtype=jnp.float32)
        u2 = jnp.asarray(rng.uniform(size=(R,)), dtype=jnp.float32)
        r = jnp.full((R,), 1e-3)
        L, basis, logD = GGXSampler().sample(u1, u2, V, N, r, r)
        mirror = 2 * (V * N).sum(-1, keepdims=True) * N - V
        cos = (np.asarray(L) * np.asarray(mirror)).sum(-1)
        assert np.median(cos) > 0.999 and np.mean(cos) > 0.99

    def test_pdf_consistency(self):
        from nmf_tpu.modules.brdf_samplers import GGXSampler

        R = 256
        rng = np.random.default_rng(4)
        N = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (R, 3))
        v = rng.normal(size=(R, 3)) + [0, 0, 2.0]
        V = jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True),
                        dtype=jnp.float32)
        u1 = jnp.asarray(rng.uniform(size=(R,)), dtype=jnp.float32)
        u2 = jnp.asarray(rng.uniform(size=(R,)), dtype=jnp.float32)
        r = jnp.full((R,), 0.3)
        L, basis, logD = GGXSampler().sample(u1, u2, V, N, r, r)
        assert np.all(np.isfinite(np.asarray(logD)))
        # all sampled dirs above the horizon of N
        assert np.all((np.asarray(L) * np.asarray(N)).sum(-1) > 0)

    def test_pdf_integrates_to_one(self):
        # MC check: E_uniform[pdf] * 2pi ~ 1 over the upper hemisphere
        from nmf_tpu.modules.brdf_samplers import GGXSampler

        rng = np.random.default_rng(5)
        M = 200000
        dirs = rng.normal(size=(M, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        dirs[:, 2] = np.abs(dirs[:, 2])  # upper hemisphere
        # note: compute_prob masks below-horizon L, so a little pdf mass is
        # clipped at high roughness; at r=0.1 the loss is negligible
        V_l = np.array([0.0, 0.3, 0.954])
        V_l /= np.linalg.norm(V_l)
        H = dirs + V_l
        H /= np.linalg.norm(H, axis=-1, keepdims=True)
        r = np.full((M,), 0.1, dtype=np.float32)
        pdf = GGXSampler().compute_prob(
            jnp.asarray(dirs, dtype=jnp.float32),
            jnp.asarray(np.broadcast_to(V_l, (M, 3)), dtype=jnp.float32),
            jnp.asarray(H, dtype=jnp.float32),
            jnp.asarray(r), jnp.asarray(r))
        integral = 2 * np.pi * float(np.mean(np.asarray(pdf)))
        assert integral == pytest.approx(1.0, abs=0.1)


class TestNormalAxes:
    def test_line_axis_normal_sign(self):
        # ramp along line 0 (vecMode[0] = world z): density grows with +z
        # -> normals must be -z
        import jax.numpy as jnp
        from nmf_tpu.fields.tensorf import FactorGrid

        rf = small_field(numer_grad=True)
        g = rf.grid_size[0]
        planes = tuple(jnp.ones((16, g, g)) if i == 0 else jnp.zeros((16, g, g))
                       for i in range(3))
        ramp = jnp.broadcast_to(jnp.linspace(0, 1, g)[None, :], (16, g))
        lines = (ramp, jnp.ones((16, g)), jnp.ones((16, g)))
        rf = rf.replace(density_rf=FactorGrid(planes=planes, lines=lines))
        xyz = jnp.asarray(np.random.default_rng(4).uniform(-1, 1, (50, 3)),
                          dtype=jnp.float32)
        norms = rf.compute_normals(xyz)
        assert np.all(np.asarray(norms[:, 2]) < -0.99)

    def test_plane_y_axis_normal_sign(self):
        # ramp along plane 0's second axis (matMode[0][1] = world y)
        import jax.numpy as jnp
        from nmf_tpu.fields.tensorf import FactorGrid

        rf = small_field(numer_grad=True)
        g = rf.grid_size[0]
        ramp = jnp.broadcast_to(jnp.linspace(0, 1, g)[None, :, None],
                                (16, g, g))
        planes = (ramp, jnp.zeros_like(ramp), jnp.zeros_like(ramp))
        lines = tuple(jnp.ones_like(l) for l in rf.density_rf.lines)
        rf = rf.replace(density_rf=FactorGrid(planes=planes, lines=lines))
        xyz = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, (50, 3)),
                          dtype=jnp.float32)
        norms = rf.compute_normals(xyz)
        assert np.all(np.asarray(norms[:, 1]) < -0.99)
