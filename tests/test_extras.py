"""Tests for hash-grid field, occupancy sampler, extra BRDF samplers,
distortion loss, ListRF composition, RefNeRF, mesh export."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

AABB = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], dtype=np.float32)


class TestHashGrid:
    def make(self):
        from nmf_tpu.fields.hashgrid import init_hashgrid_rf

        return init_hashgrid_rf(jax.random.PRNGKey(0), AABB, n_levels=4,
                                log2_hashmap_size=12, finest_resolution=64)

    def test_density_and_app(self):
        rf = self.make()
        xyz = jnp.asarray(np.random.default_rng(0).uniform(-1.4, 1.4, (64, 4)),
                          dtype=jnp.float32)
        sig = rf.compute_densityfeature(xyz)
        assert sig.shape == (64,) and bool(jnp.all(jnp.isfinite(sig)))
        app = rf.compute_appfeature(xyz)
        assert app.shape == (64, 24)

    def test_normals_finite(self):
        rf = self.make()
        xyz = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (16, 3)),
                          dtype=jnp.float32)
        n = rf.compute_normals(xyz)
        assert bool(jnp.all(jnp.isfinite(n)))

    def test_trains_a_bit(self):
        # hash field can fit a target density at a point cloud
        import optax

        rf = self.make()
        rng = np.random.default_rng(2)
        xyz = jnp.asarray(rng.uniform(-1, 1, (512, 3)), dtype=jnp.float32)
        target = jnp.asarray((np.linalg.norm(np.asarray(xyz), axis=-1) < 0.5)
                             .astype(np.float32) * 5)
        tx = optax.adam(1e-2)
        opt = tx.init(rf)

        @jax.jit
        def step(rf, opt):
            def loss(rf):
                return ((rf.compute_densityfeature(xyz) - target) ** 2).mean()

            l, g = jax.value_and_grad(loss)(rf)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(rf, up), opt, l

        l0 = None
        for i in range(60):
            rf, opt, l = step(rf, opt)
            if l0 is None:
                l0 = float(l)
        assert float(l) < 0.5 * l0


class TestOccGrid:
    def test_sampler(self):
        from nmf_tpu.fields.tensorf import init_tensorvm_split
        from nmf_tpu.samplers.occgrid import init_occgrid

        rf = init_tensorvm_split(jax.random.PRNGKey(0), AABB,
                                 grid_size=[16] * 3, N_voxel_init=16 ** 3,
                                 N_voxel_final=16 ** 3, upsamp_list=())
        s = init_occgrid(rf, grid_reso=32, near_far=(2.0, 6.0))
        rays = jnp.asarray([[0.0, 0.0, -4.0, 0.0, 0.0, 1.0]] * 4)
        out = s.sample(rays, key=jax.random.PRNGKey(0), is_train=True,
                       max_samples_per_ray=32)
        assert out["valid"].shape == (4, 32)
        # occupancy thresholding: zeroing the grid culls everything
        s2 = s.replace(density_grid=jnp.full_like(s.density_grid, -1.0))
        out2 = s2.sample(rays, is_train=False, max_samples_per_ray=32)
        assert not bool(out2["valid"].any())

    def test_test_multiplier_refines_eval_march(self):
        # reference nerf_acc.py:160: eval marches test_multiplier x finer
        from nmf_tpu.fields.tensorf import init_tensorvm_split
        from nmf_tpu.samplers.occgrid import init_occgrid

        rf = init_tensorvm_split(jax.random.PRNGKey(0), AABB,
                                 grid_size=[16] * 3, N_voxel_init=16 ** 3,
                                 N_voxel_final=16 ** 3, upsamp_list=())
        s = init_occgrid(rf, grid_reso=32, near_far=(2.0, 6.0))
        s = s.replace(test_multiplier=2.0)
        rays = jnp.asarray([[0.0, 0.0, -4.0, 0.0, 0.0, 1.0]] * 2)
        tr = s.sample(rays, key=jax.random.PRNGKey(0), is_train=True,
                      max_samples_per_ray=32)
        ev = s.sample(rays, is_train=False, max_samples_per_ray=32)
        # eval step size halves -> candidate depths advance half as fast
        assert float(ev["z_vals"][0, 8]) < float(tr["z_vals"][0, 8])

    def test_mark_untrained(self):
        from nmf_tpu.fields.tensorf import init_tensorvm_split
        from nmf_tpu.samplers.occgrid import init_occgrid

        rf = init_tensorvm_split(jax.random.PRNGKey(0), AABB,
                                 grid_size=[16] * 3, N_voxel_init=16 ** 3,
                                 N_voxel_final=16 ** 3, upsamp_list=())
        s = init_occgrid(rf, grid_reso=16)
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = -4.0  # camera at -z looking +z (opencv)
        intr = [[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]]
        s2 = s.mark_untrained_grid(pose[None], intr, (64, 64))
        # some cells must be marked unseen (-1)
        assert float(s2.density_grid.min()) == -1.0

    def test_occgrid_in_renderer_with_proposal(self):
        """OccGridSampler composes with render() and proposal resampling
        (the renderer is sampler-agnostic over the padded dict contract)."""
        from nmf_tpu.fields.tensorf import init_tensorvm_split
        from nmf_tpu.models.tensorf import init_tensorf_shade
        from nmf_tpu.render import NMF, render
        from nmf_tpu.samplers.occgrid import init_occgrid

        rf = init_tensorvm_split(jax.random.PRNGKey(0), AABB,
                                 grid_size=[16] * 3, N_voxel_init=16 ** 3,
                                 N_voxel_final=16 ** 3, upsamp_list=())
        s = init_occgrid(rf, grid_reso=16, near_far=(2.0, 6.0))
        model = init_tensorf_shade(jax.random.PRNGKey(1), rf.app_dim)
        nmf = NMF(rf=rf, sampler=s, model=model, max_samples_per_ray=32,
                  proposal_samples_per_ray=16)
        rays = jnp.asarray([[0.0, 0.0, -4.0, 0.0, 0.0, 1.0]] * 8)
        ims, _ = render(nmf, rays, jax.random.PRNGKey(2), is_train=True)
        rgb = np.asarray(ims["rgb_map"])
        assert rgb.shape == (8, 3) and np.isfinite(rgb).all()


class TestBRDFSamplers:
    def _dirs(self, R=256, seed=0):
        rng = np.random.default_rng(seed)
        N = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (R, 3))
        v = rng.normal(size=(R, 3)) + [0, 0, 2.0]
        V = jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True),
                        dtype=jnp.float32)
        u1 = jnp.asarray(rng.uniform(size=(R,)), dtype=jnp.float32)
        u2 = jnp.asarray(rng.uniform(size=(R,)), dtype=jnp.float32)
        return N, V, u1, u2

    def test_beckmann(self):
        from nmf_tpu.modules.brdf_samplers import BeckmannSampler

        N, V, u1, u2 = self._dirs()
        r = jnp.full((256,), 0.2)
        L, basis, logD = BeckmannSampler().sample(u1, u2, V, N, r, r)
        assert np.all(np.isfinite(np.asarray(logD)))
        assert np.all((np.asarray(L) * np.asarray(N)).sum(-1) > 0)

    def test_multisampler(self):
        from nmf_tpu.modules.brdf_samplers import (CosineLobeSampler,
                                                   GGXSampler, MultiSampler)

        N, V, u1, u2 = self._dirs(seed=1)
        r = jnp.full((256,), 0.4)
        ms = MultiSampler(sampler_a=GGXSampler(),
                          sampler_b=CosineLobeSampler())
        L, basis, logD = ms.sample(u1, u2, V, N, r, r)
        assert np.all(np.isfinite(np.asarray(logD)))

    def test_cosine_pdf_integral(self):
        from nmf_tpu.modules.brdf_samplers import CosineLobeSampler

        rng = np.random.default_rng(3)
        M = 100000
        dirs = rng.normal(size=(M, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        dirs[:, 2] = np.abs(dirs[:, 2])
        pdf = CosineLobeSampler().compute_prob(
            jnp.asarray(dirs, jnp.float32), None, None, None, None)
        integral = 2 * np.pi * float(np.mean(np.asarray(pdf)))
        assert integral == pytest.approx(1.0, abs=0.05)


class TestDistortion:
    def test_matches_n2_form(self):
        from nmf_tpu.ops.losses import distortion_loss

        rng = np.random.default_rng(4)
        B, N = 3, 16
        m = np.sort(rng.uniform(0, 4, (B, N)), axis=-1)
        w = rng.uniform(0, 0.2, (B, N))
        dt = rng.uniform(0, 0.1, (B, N))
        ours = float(distortion_loss(jnp.asarray(m, jnp.float32),
                                     jnp.asarray(w, jnp.float32),
                                     jnp.asarray(dt, jnp.float32)))
        ref = 0.0
        for b in range(B):
            ref += (w[b][:, None] * w[b][None, :]
                    * np.abs(m[b][:, None] - m[b][None, :])).sum()
            ref += (w[b] ** 2 * dt[b]).sum() / 3
        assert ours == pytest.approx(ref, rel=1e-4)


class TestListRF:
    def test_composition(self):
        from nmf_tpu.fields.listrf import make_listrf
        from nmf_tpu.fields.tensorf import init_tensorvm_split

        rfs = [init_tensorvm_split(jax.random.PRNGKey(i), AABB,
                                   grid_size=[16] * 3,
                                   N_voxel_init=16 ** 3,
                                   N_voxel_final=16 ** 3, upsamp_list=())
               for i in range(2)]
        lrf = make_listrf(rfs, offsets=[[0, 0, 0], [0.5, 0, 0]])
        xyz = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (32, 4)),
                          dtype=jnp.float32)
        sig = lrf.compute_densityfeature(xyz)
        sig0 = rfs[0].compute_densityfeature(xyz)
        assert np.all(np.asarray(sig) >= np.asarray(sig0) - 1e-5)
        app = lrf.compute_appfeature(xyz)
        assert app.shape == (32, 24)
        n = lrf.compute_normals(xyz)
        assert bool(jnp.all(jnp.isfinite(n)))


class TestRefNeRF:
    def test_shade(self):
        from nmf_tpu.models.refnerf import init_refnerf

        model = init_refnerf(jax.random.PRNGKey(0), 24)
        M = 64
        rng = np.random.default_rng(5)
        xyz = jnp.asarray(rng.uniform(-1, 1, (M, 4)), jnp.float32)
        feat = jnp.asarray(rng.normal(size=(M, 24)), jnp.float32)
        dirs = jnp.asarray(rng.normal(size=(M, 3)), jnp.float32)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        rgb, debug = model.shade(
            xyz, xyz, feat, dirs, -dirs, jnp.ones(M) / M,
            jnp.ones(M, bool), 8, None, None, None, False, 0,
            jax.random.PRNGKey(1))
        assert rgb.shape == (M, 3)
        assert bool(jnp.all(jnp.isfinite(rgb)))
        assert "spec" in debug


class TestMeshExport:
    def test_export(self, tmp_path):
        from nmf_tpu.fields.tensorf import FactorGrid, init_tensorvm_split
        from nmf_tpu.render import NMF
        from nmf_tpu.scripts.export_mesh import export_mesh

        rf = init_tensorvm_split(jax.random.PRNGKey(0), AABB,
                                 grid_size=[16] * 3, N_voxel_init=16 ** 3,
                                 N_voxel_final=16 ** 3, upsamp_list=())
        # solid ball density: ramp lines toward center... use planes=1,
        # lines shaped as bumps -> positive blob in the middle
        g = 16
        bump = jnp.exp(-((jnp.linspace(-1, 1, g)) ** 2) * 4)
        planes = tuple(jnp.ones((16, g, g)) * 0.5 for _ in range(3))
        lines = tuple(jnp.broadcast_to(bump[None], (16, g)) for _ in range(3))
        rf = rf.replace(density_rf=FactorGrid(planes=planes, lines=lines),
                        density_shift=0.0)

        class FakeNMF:
            pass

        nmf = FakeNMF()
        nmf.rf = rf
        p = tmp_path / "mesh.ply"
        verts, faces = export_mesh(nmf, str(p), reso=32, level=1.0)
        assert len(verts) > 0 and len(faces) > 0
        assert p.exists() and p.stat().st_size > 100


class TestMarchingTets:
    def test_sphere_oracle(self):
        from nmf_tpu.ops.marching import marching_tets

        n = 24
        lin = np.linspace(-1, 1, n)
        gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
        vol = 0.6 - np.sqrt(gx**2 + gy**2 + gz**2)  # inside positive
        verts, faces = marching_tets(vol, level=0.0)
        assert len(verts) > 100 and len(faces) > 100
        # vertices should lie near the radius-0.6 sphere
        scale = 2 / (n - 1)
        world = verts * scale - 1
        r = np.linalg.norm(world, axis=-1)
        assert abs(r.mean() - 0.6) < 0.03
        assert r.std() < 0.03


class TestNDC:
    def test_ndc_sampling(self):
        from nmf_tpu.fields.tensorf import init_tensorvm_split
        from nmf_tpu.samplers.alphagrid import AlphaGridSampler

        rf = init_tensorvm_split(jax.random.PRNGKey(0), AABB,
                                 grid_size=[16] * 3, N_voxel_init=16 ** 3,
                                 N_voxel_final=16 ** 3, upsamp_list=())
        s = AlphaGridSampler(alpha_mask=None, aabb=jnp.asarray(AABB),
                             near_far=(0.0, 1.0)).update(rf, init=True)
        rays = jnp.asarray([[0.0, 0.0, 0.0, 0.1, 0.0, 0.9]] * 2)
        out = s.sample(rays, key=jax.random.PRNGKey(1), is_train=True,
                       ndc_ray=True, n_samples=64)
        z = np.asarray(out["z_vals"])
        assert z.min() >= 0.0 and z.max() <= 1.1
        assert bool(out["valid"].any())

    def test_ndc_render_with_proposal(self):
        """NDC path composes with proposal resampling: linear-z samples
        feed the stop-grad density pass, fine samples stay in [near, far]."""
        from nmf_tpu.fields.tensorf import init_tensorvm_split
        from nmf_tpu.models.tensorf import init_tensorf_shade
        from nmf_tpu.render import NMF, render
        from nmf_tpu.samplers.alphagrid import AlphaGridSampler

        rf = init_tensorvm_split(jax.random.PRNGKey(0), AABB,
                                 grid_size=[16] * 3, N_voxel_init=16 ** 3,
                                 N_voxel_final=16 ** 3, upsamp_list=())
        s = AlphaGridSampler(alpha_mask=None, aabb=jnp.asarray(AABB),
                             near_far=(0.0, 1.0)).update(rf, init=True)
        model = init_tensorf_shade(jax.random.PRNGKey(1), rf.app_dim)
        nmf = NMF(rf=rf, sampler=s, model=model, max_samples_per_ray=32,
                  proposal_samples_per_ray=16)
        rays = jnp.asarray(np.concatenate([
            np.zeros((8, 3)),
            np.tile([[0.05, 0.0, 0.95]], (8, 1))], -1), jnp.float32)
        ims, _ = render(nmf, rays, jax.random.PRNGKey(2), is_train=True,
                        ndc_ray=True)
        rgb = np.asarray(ims["rgb_map"])
        assert rgb.shape == (8, 3) and np.isfinite(rgb).all()


class TestVisibility:
    def test_visibility_mlp(self):
        from nmf_tpu.modules.visibility import init_visibility_mlp

        vm = init_visibility_mlp(jax.random.PRNGKey(0), 24)
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.uniform(-1, 1, (32, 3)), jnp.float32)
        dirs = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
        feats = jnp.asarray(rng.normal(size=(32, 24)), jnp.float32)
        eterm, sigvis = vm(pts, dirs, feats)
        assert sigvis.shape == (32,)
        assert np.all((np.asarray(sigvis) >= 0) & (np.asarray(sigvis) <= 1))
        l = vm.loss(pts, dirs, feats, jnp.ones(32, bool))
        assert np.isfinite(float(l))

    def test_bright_sampler(self):
        from nmf_tpu.modules.bg import init_integral_equirect
        from nmf_tpu.modules.visibility import ERBrightSampler

        bg = init_integral_equirect(jax.random.PRNGKey(0), bg_resolution=32,
                                    init_val=-3.0, activation="exp")
        # brighten one direction band
        mat = np.asarray(bg.bg_mat).copy()
        mat[:, 16, 40:44] = 3.0
        bg = bg.replace(bg_mat=jnp.asarray(mat))
        dirs, pdf = ERBrightSampler().sample(jax.random.PRNGKey(1), bg, 512)
        assert dirs.shape == (512, 3) and np.all(np.isfinite(np.asarray(pdf)))
        # most samples should hit the bright band's azimuth range
        phi = np.arctan2(np.asarray(dirs)[:, 1], np.asarray(dirs)[:, 0])
        x = (phi % (2 * np.pi) - np.pi) / np.pi  # envmap column coordinate
        col = (x + 1) / 2 * 64
        frac = ((col > 38) & (col < 46)).mean()
        assert frac > 0.5


class TestNative:
    def test_generate_rays_matches_numpy(self):
        from nmf_tpu import native

        rng = np.random.default_rng(0)
        poses = rng.normal(size=(3, 4, 4)).astype(np.float32)
        dirs = rng.normal(size=(50, 3)).astype(np.float32)
        out = native.generate_rays(poses, dirs)
        assert out.shape == (150, 6)
        for p in range(3):
            M = poses[p, :3]
            np.testing.assert_allclose(out[p * 50:(p + 1) * 50, 0:3],
                                       np.broadcast_to(M[:, 3], (50, 3)),
                                       rtol=1e-6)
            np.testing.assert_allclose(out[p * 50:(p + 1) * 50, 3:6],
                                       dirs @ M[:, :3].T, rtol=1e-5,
                                       atol=1e-6)

    def test_gather_batch(self):
        from nmf_tpu import native

        rng = np.random.default_rng(1)
        rays = rng.normal(size=(100, 6)).astype(np.float32)
        rgbs = rng.normal(size=(100, 4)).astype(np.float32)
        ids = rng.integers(0, 100, size=(33,))
        r, c = native.gather_batch(rays, rgbs, ids)
        np.testing.assert_array_equal(r, rays[ids])
        np.testing.assert_array_equal(c, rgbs[ids])


class TestSGGX:
    def test_sample_and_pdf(self):
        from nmf_tpu.modules.brdf_samplers import SGGXSampler

        rng = np.random.default_rng(7)
        R = 256
        N = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (R, 3))
        v = rng.normal(size=(R, 3)) + [0, 0, 2.0]
        V = jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True),
                        jnp.float32)
        u1 = jnp.asarray(rng.uniform(size=(R,)), jnp.float32)
        u2 = jnp.asarray(rng.uniform(size=(R,)), jnp.float32)
        r = jnp.full((R,), 0.3)
        L, basis, logD = SGGXSampler().sample(u1, u2, V, N, r, r)
        assert np.all(np.isfinite(np.asarray(logD)))
        assert np.all((np.asarray(L) * np.asarray(N)).sum(-1) > 0)

    def test_mirror_limit(self):
        from nmf_tpu.modules.brdf_samplers import SGGXSampler

        rng = np.random.default_rng(8)
        R = 256
        N = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (R, 3))
        v = rng.normal(size=(R, 3)) + [0, 0, 3.0]
        V = jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True),
                        jnp.float32)
        u1 = jnp.asarray(rng.uniform(size=(R,)), jnp.float32)
        u2 = jnp.asarray(rng.uniform(size=(R,)), jnp.float32)
        r = jnp.full((R,), 1e-3)
        L, basis, logD = SGGXSampler().sample(u1, u2, V, N, r, r)
        mirror = 2 * (V * N).sum(-1, keepdims=True) * N - V
        cos = (np.asarray(L) * np.asarray(mirror)).sum(-1)
        # the SGGX lobe concentrates toward the mirror direction at low
        # roughness (looser than GGX: the microflake construction keeps a
        # small visible-ellipse spread)
        assert np.median(cos) > 0.95


class TestConverters:
    def test_llff2nerf(self, tmp_path):
        from nmf_tpu.scripts.llff2nerf import convert

        rng = np.random.default_rng(0)
        P = 4
        poses = np.zeros((P, 3, 5))
        poses[:, :, :4] = rng.normal(size=(P, 3, 4))
        poses[:, 0, 4] = 120  # H
        poses[:, 1, 4] = 160  # W
        poses[:, 2, 4] = 100  # focal
        pb = np.concatenate([poses.reshape(P, 15),
                             rng.uniform(1, 5, (P, 2))], -1)
        np.save(tmp_path / "poses_bounds.npy", pb)
        (tmp_path / "images").mkdir()
        import imageio.v2 as imageio

        for i in range(P):
            imageio.imwrite(tmp_path / "images" / f"{i:03d}.png",
                            np.zeros((8, 8, 3), np.uint8))
        meta = convert(tmp_path)
        assert len(meta["frames"]) == P
        assert (tmp_path / "transforms.json").exists()

    def test_colmap2nerf(self, tmp_path):
        from nmf_tpu.scripts.colmap2nerf import convert

        (tmp_path / "sparse").mkdir()
        with open(tmp_path / "sparse" / "cameras.txt", "w") as f:
            f.write("# header\n1 PINHOLE 160 120 100 100 80 60\n")
        with open(tmp_path / "sparse" / "images.txt", "w") as f:
            f.write("# header\n")
            for i in range(3):
                f.write(f"{i+1} 1 0 0 0 {0.1*i} 0.2 0.3 1 im{i}.png\n")
                f.write("0 0 0\n")
        meta = convert(tmp_path / "sparse", out_path=tmp_path / "t.json")
        assert len(meta["frames"]) == 3
        m = np.array(meta["frames"][0]["transform_matrix"])
        assert np.all(np.isfinite(m))


class TestGridRF:
    def make(self, grid=24):
        from nmf_tpu.fields.grid import init_grid_rf

        return init_grid_rf(jax.random.PRNGKey(0), AABB,
                            grid_size=(grid, grid, grid))

    def test_queries(self):
        rf = self.make()
        xyz = jnp.asarray(np.random.default_rng(0).uniform(-1.4, 1.4, (64, 4)),
                          dtype=jnp.float32)
        sig = rf.compute_densityfeature(xyz)
        assert sig.shape == (64,) and bool(jnp.all(sig >= 0))
        app = rf.compute_appfeature(xyz)
        assert app.shape == (64, 24)
        s2, a2, n2 = rf.compute_all(xyz, with_normals=True)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(sig), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(a2), np.asarray(app), rtol=1e-5)
        assert bool(jnp.all(jnp.isfinite(n2)))

    def test_upsample_preserves_values(self):
        rf = self.make(grid=9)
        xyz = jnp.asarray(np.random.default_rng(1).uniform(-1.2, 1.2, (32, 3)),
                          dtype=jnp.float32)
        before = rf.compute_densityfeature(xyz, activate=False)
        rf2 = rf.upsample((17, 17, 17))  # odd keeps old nodes on lattice
        after = rf2.compute_densityfeature(xyz, activate=False)
        np.testing.assert_allclose(np.asarray(before), np.asarray(after),
                                   atol=2e-3)

    def test_trains_in_renderer(self):
        """GridRF slots into the full train step via the duck-typed API."""
        from nmf_tpu.render import NMF
        from nmf_tpu import trainer
        from nmf_tpu.models.tensorf import init_tensorf_shade
        from nmf_tpu.samplers.alphagrid import AlphaGridSampler

        rf = self.make(grid=16)
        sampler = AlphaGridSampler(alpha_mask=None, aabb=jnp.asarray(AABB),
                                   near_far=(2.0, 6.0)).update(rf, init=True)
        model = init_tensorf_shade(jax.random.PRNGKey(1), rf.app_dim)
        nmf = NMF(rf=rf, sampler=sampler, model=model, max_samples_per_ray=16)
        tx = trainer.make_optimizer(nmf, trainer.OptimConfig(n_iters=50))
        opt = tx.init(nmf)
        step = trainer.make_train_step(tx, donate=False)
        rng = np.random.default_rng(0)
        o = np.tile(np.array([[0, 0, -4.0]], np.float32), (64, 1))
        d = rng.normal(size=(64, 3)).astype(np.float32)
        d[:, 2] = np.abs(d[:, 2]) + 2
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = jnp.asarray(np.concatenate([o, d], -1))
        rgbs = jnp.asarray(rng.uniform(size=(64, 3)).astype(np.float32))
        w = trainer.LossWeights(ori_lambda=0.0, pred_lambda=0.0)
        l0 = None
        key = jax.random.PRNGKey(2)
        for i in range(8):
            key, sk = jax.random.split(key)
            nmf, opt, m = step(nmf, opt, rays, rgbs, jnp.ones(3), sk, w)
            l0 = float(m["loss"]) if l0 is None else l0
        assert float(m["loss"]) < l0


class TestRayUtilExtras:
    def test_sample_pdf_concentrates(self):
        from nmf_tpu.data.ray_utils import sample_pdf

        bins = np.linspace(0, 1, 9)[None].repeat(4, 0)  # 8 bins
        w = np.zeros((4, 8))
        w[:, 3] = 1.0  # all mass in bin [0.375, 0.5]
        s = sample_pdf(bins, w, 64, det=True)
        assert s.shape == (4, 64)
        inside = ((s >= 0.370) & (s <= 0.505)).mean()
        assert inside > 0.95

    def test_sample_pdf_uniform(self):
        from nmf_tpu.data.ray_utils import sample_pdf

        bins = np.linspace(2, 6, 17)[None]
        w = np.ones((1, 16))
        s = sample_pdf(bins, w, 256, det=True)
        np.testing.assert_allclose(s.mean(), 4.0, atol=0.1)

    def test_pfm_roundtrip(self, tmp_path):
        from nmf_tpu.data.ray_utils import read_pfm, write_pfm

        img = np.random.default_rng(0).uniform(
            size=(7, 5, 3)).astype(np.float32)
        p = str(tmp_path / "x.pfm")
        write_pfm(p, img)
        back, scale = read_pfm(p)
        np.testing.assert_allclose(back, img, rtol=1e-6)


class TestCompositionTools:
    def test_listrf_union_aabb(self):
        from nmf_tpu.fields.grid import init_grid_rf
        from nmf_tpu.fields.listrf import make_listrf

        f1 = init_grid_rf(jax.random.PRNGKey(0), AABB, grid_size=(8, 8, 8))
        f2 = init_grid_rf(jax.random.PRNGKey(1), AABB, grid_size=(8, 8, 8))
        lrf = make_listrf([f1, f2], offsets=[[0, 0, 0], [2.0, 0, 0]])
        aabb = np.asarray(lrf.aabb)
        np.testing.assert_allclose(aabb[0], [-1.5, -1.5, -1.5])
        np.testing.assert_allclose(aabb[1], [3.5, 1.5, 1.5])

    def test_fit_field_distills_density(self):
        from nmf_tpu.fields.grid import init_grid_rf
        from nmf_tpu.fields.tensorf import init_tensorvm_split
        from nmf_tpu.scripts.fit_field import fit_field

        key = jax.random.PRNGKey(0)
        src = init_tensorvm_split(key, AABB, grid_size=[16, 16, 16],
                                  N_voxel_init=16 ** 3,
                                  N_voxel_final=16 ** 3, upsamp_list=())
        tgt = init_grid_rf(jax.random.PRNGKey(1), AABB,
                           grid_size=(24, 24, 24))
        fitted, losses = fit_field(src, tgt, jax.random.PRNGKey(2),
                                   steps=120, batch=4096, lr=2e-2,
                                   fit_app=False, log_every=1000)
        xyz = jnp.asarray(np.random.default_rng(3).uniform(-1.3, 1.3,
                                                           (256, 3)),
                          dtype=jnp.float32)
        a = np.asarray(src.compute_densityfeature(xyz, activate=False))
        b = np.asarray(fitted.compute_densityfeature(xyz, activate=False))
        before = np.asarray(tgt.compute_densityfeature(xyz, activate=False))
        err_after = np.abs(a - b).mean()
        err_before = np.abs(a - before).mean()
        assert err_after < 0.5 * err_before, (err_before, err_after)


class TestOptics:
    """snells_law / fresnel_law / refract_reflect (reference utils.py:222-273)."""

    def test_snell_bends_toward_normal(self):
        from nmf_tpu.ops.optics import snells_law

        n = jnp.array([[0.0, 0.0, 1.0]])
        l = jnp.array([[np.sin(0.5), 0.0, -np.cos(0.5)]])  # 0.5 rad incidence
        o = np.asarray(snells_law(1.0 / 1.5, n, l))[0]
        sin_t = np.sin(0.5) / 1.5
        np.testing.assert_allclose(o[0], sin_t, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(o), 1.0, atol=1e-5)
        assert o[2] < 0  # still travelling into the surface

    def test_snell_normal_incidence_unchanged(self):
        from nmf_tpu.ops.optics import snells_law

        n = jnp.array([[0.0, 0.0, 1.0]])
        l = jnp.array([[0.0, 0.0, -1.0]])
        o = np.asarray(snells_law(1.0 / 1.5, n, l))
        np.testing.assert_allclose(o, np.asarray(l), atol=1e-6)

    def test_fresnel_total_internal_reflection(self):
        from nmf_tpu.ops.optics import fresnel_law, snells_law

        # dense -> sparse at grazing angle: TIR => ratio 1
        n = jnp.array([[0.0, 0.0, 1.0]])
        ang = 1.2  # > critical angle asin(1/1.5)=0.7297
        l = jnp.array([[np.sin(ang), 0.0, -np.cos(ang)]])
        o = snells_law(1.5, -n, l)  # hitting the back face: n1=1.5, n2=1
        r = np.asarray(fresnel_law(1.5, 1.0, n, l, o))
        np.testing.assert_allclose(r, 1.0, atol=1e-6)

    def test_refract_reflect_range(self):
        from nmf_tpu.ops.optics import refract_reflect

        rng = np.random.default_rng(0)
        n = rng.normal(size=(32, 3))
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        l = rng.normal(size=(32, 3))
        l /= np.linalg.norm(l, axis=-1, keepdims=True)
        p = rng.uniform(size=(32,))
        out = np.asarray(refract_reflect(1.0, 1.5, jnp.asarray(n),
                                         jnp.asarray(l), jnp.asarray(p)))
        assert out.shape == (32, 1)
        assert (out >= -1e-5).all() and (out <= 1 + 1e-5).all()


class TestCubeBrightSampler:
    def test_inverse_index_face_centers(self):
        from nmf_tpu.modules.visibility import cube_inverse_index

        res = 8
        ij = jnp.tile(jnp.array([[3, 3]]), (6, 1))
        d = np.asarray(cube_inverse_index(jnp.arange(6), ij, res))
        signs = [(0, +1), (0, -1), (1, +1), (1, -1), (2, +1), (2, -1)]
        for row, (axis, sign) in zip(d, signs):
            assert np.argmax(np.abs(row)) == axis
            assert np.sign(row[axis]) == sign
            np.testing.assert_allclose(np.linalg.norm(row), 1.0, atol=1e-5)

    def test_update_finds_bright_direction_and_sample_masks(self):
        from nmf_tpu.modules.visibility import CubeBrightSampler

        class FakeBG:
            def __call__(self, dirs, mip):
                b = jnp.clip(dirs[:, 2:3], 0) ** 8
                return (jnp.tile(b, (1, 3)),)

        s = CubeBrightSampler(spots=jnp.zeros((8, 3)), pix_size=0.02)
        s2, pix = s.update(FakeBG(), res=16)
        top = np.asarray(s2.spots[-1])
        assert top[2] > 0.9, top
        N = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
        L, mask = s2.replace(pix_size=pix).sample(
            jax.random.PRNGKey(0), -N, N)
        assert L.shape == (4, 8, 3) and mask.shape == (4, 8)
        LdotN = np.einsum("bsk,bk->bs", np.asarray(L), np.asarray(N))
        assert (np.asarray(mask) == (LdotN > 0)).all()

    def test_check_schedule_gates_on_iteration(self):
        from nmf_tpu.modules.visibility import CubeBrightSampler

        class FakeBG:
            def __call__(self, dirs, mip):
                return (jnp.ones((dirs.shape[0], 3)),)

        s = CubeBrightSampler(spots=jnp.zeros((4, 3)),
                              cold_start_bg_iters=10, update_freq=5)
        assert s.check_schedule(3, 1, FakeBG()) is s      # too early
        assert s.check_schedule(21, 1, FakeBG()) is s     # not a multiple
        s2 = s.check_schedule(25, 1, FakeBG())
        assert s2 is not s and s2.is_initialized()


class TestNewHeads:
    def test_mlp_render_pe_shapes_and_builder(self):
        from nmf_tpu.builders import build_model

        model = build_model(jax.random.PRNGKey(0), {
            "_target_": "models.tensorf.TensoRF",
            "diffuse_module": {
                "_target_": "modules.render_modules.MLPRender_PE",
                "viewpe": 4, "pospe": 4, "featureC": 32},
        }, app_dim=12)
        rgb, _ = model.shade(
            jnp.zeros((16, 4)), jnp.zeros((16, 4)), jnp.zeros((16, 12)),
            jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (16, 1)), None,
            jnp.ones((16,)), jnp.ones((16,), bool), 16)
        assert rgb.shape == (16, 3)
        assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()

    def test_learnable_spherical_encoding_interpolates(self):
        from nmf_tpu.modules.render_modules import (
            init_learnable_spherical_encoding)

        enc = init_learnable_spherical_encoding(jax.random.PRNGKey(0), 4, 128)
        v = np.asarray(enc.sphere_pos[:, 5])
        out_sharp = np.asarray(enc(jnp.asarray(v)[None], 0.02))[0]
        # with a tight kernel the output approaches that point's weights
        np.testing.assert_allclose(out_sharp, np.asarray(enc.weights[0, 5]),
                                   atol=0.05)
        # wide kernel -> close to global mean
        out_wide = np.asarray(enc(jnp.asarray(v)[None], 10.0))[0]
        np.testing.assert_allclose(out_wide,
                                   np.asarray(enc.weights[0].mean(0)),
                                   atol=0.05)


class TestTabularize:
    def test_collect_and_table(self, tmp_path):
        import yaml

        from nmf_tpu.scripts.tabularize import collect, render_table

        run = tmp_path / "lego"
        run.mkdir()
        with open(run / "stats.yaml", "w") as f:
            yaml.safe_dump({"psnr": [30.0, 32.0], "ssim": [0.9, 0.92]}, f)
        run2 = tmp_path / "ficus"
        run2.mkdir()
        with open(run2 / "stats.yaml", "w") as f:
            yaml.safe_dump({"psnr": [28.0]}, f)
        rows = collect(tmp_path)
        assert rows["lego"]["psnr"] == 31.0
        assert rows["ficus"]["psnr"] == 28.0
        table = render_table(rows, ["psnr", "ssim"])
        assert "lego" in table and "mean" in table

    def test_time_to_db(self, tmp_path):
        import json

        from nmf_tpu.scripts.tabularize import time_to_db

        run = tmp_path / "lego"
        run.mkdir()
        recs = [{"step": 10, "t": 5.0, "psnr": 21.0},
                {"log": "not a scalar record", "t": 5.1},
                {"step": 50, "t": 25.0, "psnr": 30.2},
                {"step": 90, "t": 45.0, "psnr": 31.0}]
        (run / "metrics.jsonl").write_text(
            "\n".join(json.dumps(r) for r in recs))
        hit = time_to_db(tmp_path, 30.0)
        assert hit["lego"] == {"t_s": 25.0, "step": 50}
        assert time_to_db(tmp_path, 99.0)["lego"] is None


class TestNewEncodersAndHeads:
    def _dirs(self, n=12, seed=0):
        rng = np.random.default_rng(seed)
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        return jnp.asarray(v, jnp.float32)

    def test_ish_variants_shapes(self):
        from nmf_tpu.modules.ish import (ISH, FullISHScaled, RandISH,
                                         RandRotISH)

        v = self._dirs()
        r = jnp.full((12,), 0.3)
        for enc in [FullISHScaled(max_degree=2), ISH(max_degree=3),
                    RandISH(rand_n=5), RandRotISH(rand_n=2)]:
            out = np.asarray(enc(v, r))
            assert out.shape == (12, enc.dim())
            assert np.isfinite(out).all()

    def test_scaled_sh_attenuates_high_bands(self):
        from nmf_tpu.ops.sh import eval_sh_bases, eval_sh_bases_scaled

        v = self._dirs()
        base = np.asarray(eval_sh_bases(9, v))
        rough = np.asarray(eval_sh_bases_scaled(9, v, jnp.full((12,), 0.5)))
        sharp = np.asarray(eval_sh_bases_scaled(9, v, jnp.full((12,), 1e6)))
        np.testing.assert_allclose(sharp, base, rtol=1e-4)
        # high bands shrink more under low kappa
        assert (np.abs(rough[:, 4:]) <= np.abs(base[:, 4:]) + 1e-7).all()
        assert np.abs(rough[:, 4:]).mean() < 0.5 * np.abs(base[:, 4:]).mean()

    def test_diffuse_head_variants_through_builder(self):
        from nmf_tpu.builders import build_diffuse

        k = jax.random.PRNGKey(0)
        pts = jnp.zeros((6, 4))
        vd = jnp.zeros((6, 3))
        feat = jnp.ones((6, 16))
        for t in ["HydraMLPDiffuse", "MLPDiffuse", "PassthroughDiffuse"]:
            head = build_diffuse(
                k, {"_target_": f"modules.render_modules.{t}"}, 16)
            d, tint, mp = head(pts, vd, feat)
            assert d.shape == (6, 3) and tint.shape == (6, 3)
            for key in ("r1", "r2", "f0", "diffuse"):
                assert key in mp, (t, key)
            arr = np.concatenate([np.asarray(d), np.asarray(tint)], -1)
            assert (arr >= 0).all() and (arr <= 1).all()

    def test_calibrate_hits_target_brightness(self):
        from nmf_tpu.builders import build_diffuse

        k = jax.random.PRNGKey(1)
        pts = jnp.zeros((64, 4))
        vd = jnp.zeros((64, 3))
        feat = jnp.asarray(np.random.default_rng(0).normal(size=(64, 16)),
                           jnp.float32)
        head = build_diffuse(
            k, {"_target_": "modules.render_modules.MLPDiffuse"}, 16)
        cal = head.calibrate(0.8, True, pts, vd, feat)
        d, _, _ = cal(pts, vd, feat)
        np.testing.assert_allclose(float(d.mean()), 0.5 / 0.8, atol=0.05)

    def test_appdim_normal_unit_norm(self):
        from nmf_tpu.modules.render_modules import AppDimNormal

        feat = jnp.asarray(np.random.default_rng(2).normal(size=(9, 8)),
                           jnp.float32)
        n = np.asarray(AppDimNormal()(jnp.zeros((9, 4)), feat))
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)


class TestDualBG:
    def test_multibg_dispatch(self):
        from nmf_tpu.modules.bg import init_integral_equirect
        from nmf_tpu.modules.dual_bg import MultiBG

        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        bg1 = init_integral_equirect(k1, bg_resolution=16)
        bg2 = init_integral_equirect(k2, bg_resolution=16)
        # make them visibly different
        bg2 = bg2.replace(bg_mat=bg2.bg_mat + 2.0)
        mb = MultiBG(bgs=(bg1, bg2))
        dirs = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
        mip = jnp.full((2,), -5.0)
        a = np.asarray(mb.select(0)(dirs, mip))
        b = np.asarray(mb.select(1)(dirs, mip))
        ref0 = np.asarray(bg1(dirs, mip))
        ref1 = np.asarray(bg2(dirs, mip))
        np.testing.assert_allclose(a, ref0, rtol=1e-5)
        np.testing.assert_allclose(b, ref1, rtol=1e-5)
        assert np.abs(a - b).max() > 0.1

    def test_reconstruction_dual_smoke(self, tmp_path):
        from nmf_tpu import config as config_lib
        from nmf_tpu.train_dualbg import reconstruction_dual

        cfg = config_lib.compose([
            "model=tensorf", "dataset=synthetic_sphere",
            "dataset2=synthetic_sphere",
            "model.params.n_iters=6", "model.params.batch_size=256",
            "dataset.image_size=24", "dataset.n_views=3",
            "field.N_voxel_init=4096", "field.N_voxel_final=4096",
            "field.upsamp_list=[]", "model.arch.sampler.update_list=[]",
            "model.arch.max_samples_per_ray=32",
            "vis_every=0", "N_vis=1",
        ])
        cfg["basedir"] = str(tmp_path)
        cfg["expname"] = "smoke"
        out = reconstruction_dual(cfg, log=lambda *a, **k: None)
        assert out is None or True  # completing without raising is the test


class TestRealLoaders:
    """tankstemple / own_data loaders against synthesized on-disk scenes
    (reference dataLoader/tankstemple.py:86, your_own_data.py:13)."""

    def _write_img(self, path, w, h):
        import imageio.v2 as imageio
        rng = np.random.default_rng(0)
        imageio.imwrite(path, (rng.uniform(size=(h, w, 4)) * 255
                               ).astype(np.uint8))

    def test_tankstemple(self, tmp_path):
        from nmf_tpu.data.nsvf import load_tankstemple

        w0, h0 = 1920, 1080
        np.savetxt(tmp_path / "bbox.txt",
                   np.array([-1, -1, -1, 1, 1, 1, 0.1]).reshape(1, -1))
        K = np.array([[1000.0, 0, w0 / 2, 0], [0, 1000.0, h0 / 2, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1]])
        np.savetxt(tmp_path / "intrinsics.txt", K)
        (tmp_path / "pose").mkdir()
        (tmp_path / "rgb").mkdir()
        c2w = np.eye(4)
        for pre in ("0_000", "1_000"):
            np.savetxt(tmp_path / "pose" / f"{pre}.txt", c2w)
            self._write_img(tmp_path / "rgb" / f"{pre}.png", 64, 36)
        ds = load_tankstemple(tmp_path, split="train", downsample=30)
        assert ds["img_wh"] == (64, 36)
        assert ds["all_rays"].shape == (64 * 36, 6)
        assert ds["all_rgbs"].shape == (64 * 36, 3)  # alpha blended
        # bbox scaled by 1.2
        assert np.allclose(ds["scene_bbox"], [[-1.2] * 3, [1.2] * 3])
        # intrinsics scaled: fx 1000 / 30
        assert abs(ds["focal"] - 1000 / 30) < 1e-4
        # test split falls back to the val prefix when no 2_ files exist
        ds_t = load_tankstemple(tmp_path, split="test", downsample=30)
        assert ds_t["all_rays"].shape[0] == 64 * 36
        assert ds["near_far"] == (0.01, 6.0)

    def test_own_data(self, tmp_path):
        import json

        from nmf_tpu.data.blender import load_own_data

        w, h = 32, 24
        self._write_img(tmp_path / "im0.png", w, h)
        meta = {
            "w": w, "h": h,
            "camera_angle_x": 0.8, "camera_angle_y": 0.6,
            "cx": w / 2 + 1.0, "cy": h / 2 - 1.0,
            "frames": [{"file_path": "im0",
                        "transform_matrix": np.eye(4).tolist()}],
        }
        with open(tmp_path / "transforms_train.json", "w") as f:
            json.dump(meta, f)
        ds = load_own_data(tmp_path, split="train")
        assert ds["all_rays"].shape == (w * h, 6)
        assert ds["all_rgbs"].shape == (w * h, 3)
        assert ds["near_far"] == (0.1, 100.0)
        fx = 0.5 * w / np.tan(0.4)
        assert abs(ds["focal"] - fx) < 1e-4
        # principal point shifts the central ray off-axis (y negated by
        # the blender->opencv pose flip)
        center_dir = ds["all_rays"].reshape(h, w, 6)[h // 2, w // 2, 3:]
        assert center_dir[0] < 0 and center_dir[1] < 0

    def test_llff(self, tmp_path):
        """load_llff against a synthesized poses_bounds.npy + images/ scene
        (reference dataLoader/llff.py:171-268 layout: (N,17) rows of
        3x5 [pose | (H W focal)] + [near far], down-right-back axes)."""
        from nmf_tpu.data.llff import load_llff

        rng = np.random.default_rng(3)
        N, H0, W0, f0 = 9, 120, 160, 100.0
        poses = np.zeros((N, 3, 5))
        for i in range(N):
            # camera ring looking at origin, LLFF (down, right, back) axes
            ang = 0.3 * (i - N / 2) / N
            c, s = np.cos(ang), np.sin(ang)
            right = np.array([c, 0, -s])
            up = np.array([0.0, 1.0, 0.0])
            back = np.array([s, 0, c])
            pos = back * 4.0
            # columns: x=down, y=right, z=back (llff convention)
            poses[i, :, 0] = -up
            poses[i, :, 1] = right
            poses[i, :, 2] = back
            poses[i, :, 3] = pos
        poses[:, 0, 4] = H0
        poses[:, 1, 4] = W0
        poses[:, 2, 4] = f0
        pb = np.concatenate(
            [poses.reshape(N, 15),
             np.tile(np.array([[2.0, 8.0]]), (N, 1))], -1)
        np.save(tmp_path / "poses_bounds.npy", pb)
        (tmp_path / "images").mkdir()
        for i in range(N):
            self._write_img(tmp_path / "images" / f"{i:03d}.png", W0, H0)

        down = 4.0
        w, h = int(W0 / down), int(H0 / down)
        tr = load_llff(tmp_path, split="train", downsample=down,
                       hold_every=8)
        te = load_llff(tmp_path, split="test", downsample=down,
                       hold_every=8)
        # hold_every=8 on 9 poses -> test views {0, 8}, train the other 7
        assert te["all_rays"].shape == (2 * w * h, 6)
        assert tr["all_rays"].shape == (7 * w * h, 6)
        assert tr["all_rgbs"].shape == (7 * w * h, 3)
        assert tr["img_wh"] == (w, h)
        assert abs(tr["focal"] - f0 / down) < 1e-6
        # NDC protocol: unit cube depth range, rays finite
        assert tr["near_far"] == (0.0, 1.0) and tr["ndc_ray"]
        assert np.all(np.isfinite(tr["all_rays"]))
        # NDC origins live in the unit view frustum slab (|x|,|y| ~<= 1,
        # z in [-1, 1) up to boundary pixels)
        o = tr["all_rays"][:, :3]
        assert np.abs(o[:, 2]).max() <= 1.0 + 1e-5
        # metric (non-NDC) mode: near/far rescaled so min(near)*0.75 = 1
        m = load_llff(tmp_path, split="train", downsample=down,
                      hold_every=8, ndc_ray=False)
        assert abs(m["near_far"][0] - 1 / 0.75) < 1e-6
        # metric-mode dirs keep the pinhole z=-1 scaling (NOT normalized —
        # TensoRF/reference convention): norms run 1 .. sqrt(1+(w/2f)^2+(h/2f)^2)
        d = np.linalg.norm(m["all_rays"][:, 3:], axis=-1)
        corner = np.sqrt(1 + (w / 2 / (f0 / down)) ** 2
                         + (h / 2 / (f0 / down)) ** 2)
        assert 0.99 <= d.min() and d.max() <= corner + 1e-3


class TestExrAndVideo:
    def test_exr_roundtrip_all_modes(self, tmp_path):
        from nmf_tpu.data.exr import read_exr, write_exr

        rng = np.random.default_rng(0)
        for C in (1, 3, 4):
            for comp in ("none", "zips", "zip"):
                img = (rng.normal(size=(19, 23, C)) * 5).astype(np.float32)
                p = tmp_path / f"t{C}{comp}.exr"
                write_exr(p, img.squeeze(), compression=comp)
                back = read_exr(p)
                np.testing.assert_array_equal(back, img)

    def test_exr_zip_compresses(self, tmp_path):
        import os

        from nmf_tpu.data.exr import write_exr

        img = np.ones((64, 64, 3), np.float32)
        write_exr(tmp_path / "z.exr", img, compression="zip")
        write_exr(tmp_path / "n.exr", img, compression="none")
        assert (os.path.getsize(tmp_path / "z.exr")
                < os.path.getsize(tmp_path / "n.exr") / 10)

    def test_write_video(self, tmp_path):
        from nmf_tpu.eval import write_video

        frames = [np.full((16, 16, 3), i / 10.0, np.float32)
                  for i in range(8)]
        out = write_video(tmp_path / "v.mp4", frames, fps=10)
        assert out is not None and out.exists() and out.stat().st_size > 0


class TestNativeExr:
    def test_dwab_reference_background_reads(self):
        """The reference's DWAB panoramas decode via the OpenEXR bridge
        (pure-python reader covers NONE/ZIPS/ZIP only)."""
        import os

        from nmf_tpu.data.exr import read_exr

        p = "/root/reference/backgrounds/forest.exr"
        if not os.path.exists(p):
            pytest.skip("reference backgrounds not present")
        im = read_exr(p)
        assert im.shape == (512, 1024, 4)
        assert im[..., :3].max() > 10  # HDR sun

    def test_python_reader_matches_openexr_written_file(self, tmp_path):
        """Cross-validation: a file written by the real OpenEXR library
        (half + ZIP) decodes bit-identically in the pure-python reader."""
        from nmf_tpu.data.exr import _read_exr_py
        from nmf_tpu.native import exr_read_native, exr_write_native

        rng = np.random.default_rng(1)
        img = rng.normal(size=(21, 34, 3)).astype(np.float32)
        p = tmp_path / "n.exr"
        if not exr_write_native(p, img, compression=3):
            pytest.skip("native EXR bridge unavailable")
        a = exr_read_native(p)
        b = _read_exr_py(p)
        np.testing.assert_array_equal(a[..., :3], b[..., :3])
        assert np.abs(a[..., :3] - img).max() < 2e-3  # half quantization


class TestOfflineToolCLIs:
    """Smoke coverage for the user-facing offline scripts (SURVEY L10)."""

    def test_pano2env_fit_and_use_as_fixed_bg(self, tmp_path):
        """pano2env fits an IntegralEquirect to a small HDR pano and the
        saved checkpoint loads as a bg module (the relighting input path,
        reference scripts/pano2cube.py -> train.py fixed_bg)."""
        import imageio.v2 as imageio

        from nmf_tpu import ckpt
        from nmf_tpu.scripts.pano2env import main as pano2env_main

        rng = np.random.default_rng(0)
        pano = rng.uniform(0.0, 1.0, size=(16, 32, 3)).astype(np.float32)
        src = tmp_path / "pano.png"
        imageio.imwrite(src, (pano * 255).astype(np.uint8))
        out = tmp_path / "env.th"
        pano2env_main([str(src), str(out), "--resolution", "16",
                       "--iters", "40"])
        bg, meta, _ = ckpt.load(out)
        dirs = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        cols = bg(dirs, jnp.full((64, 1), -3.0))
        assert np.isfinite(np.asarray(cols)).all()

    def test_compose_scenes_renders_listrf_union(self, tmp_path):
        """compose_scenes unions two checkpoints via ListRF and renders an
        orbit (reference scripts/toaster_on_car.py / sphere_render.py)."""
        from nmf_tpu import ckpt
        from nmf_tpu.data.synthetic import make_sphere_dataset
        from nmf_tpu.fields.tensorf import init_tensorvm_split
        from nmf_tpu.models.tensorf import init_tensorf_shade
        from nmf_tpu.render import NMF
        from nmf_tpu.samplers.alphagrid import AlphaGridSampler
        from nmf_tpu.scripts.compose_scenes import main as compose_main

        ds = make_sphere_dataset(n_views=1, H=8, W=8)
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        rf = init_tensorvm_split(k1, ds["scene_bbox"], grid_size=[16] * 3,
                                 N_voxel_init=16 ** 3,
                                 N_voxel_final=16 ** 3, upsamp_list=())
        sampler = AlphaGridSampler(
            alpha_mask=None, aabb=jnp.asarray(ds["scene_bbox"]),
            near_far=tuple(ds["near_far"])).update(rf, init=True)
        nmf = NMF(rf=rf, sampler=sampler,
                  model=init_tensorf_shade(k2, rf.app_dim),
                  max_samples_per_ray=16)
        p1 = tmp_path / "a.th"
        ckpt.save(p1, nmf, {})
        outdir = tmp_path / "out"
        compose_main(["--ckpt", str(p1), "--ckpt", str(p1),
                      "--offset", "0,0,0", "--offset", "0.5,0,0",
                      "--out", str(outdir), "--frames", "2",
                      "--image-size", "16", "--chunk", "256"])
        import glob

        # render_path writes per-frame pngs under <out>/path/
        assert len(glob.glob(str(outdir / "path" / "*.png"))) >= 2

    def test_collect_env_runs(self, capsys):
        from nmf_tpu.scripts.collect_env import main as collect_main

        collect_main()
        out = capsys.readouterr().out
        assert "jax" in out.lower()


class TestMlpDtype:
    def test_mlp_bf16_close_to_f32(self):
        from nmf_tpu.modules.mlp import create_mlp

        mlp = create_mlp(jax.random.PRNGKey(0), 16, 8, 3, hidden_w=64)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(128, 16)),
                        jnp.float32)
        y32 = mlp(x)
        y16 = mlp.replace(compute_dtype="bf16")(x)
        assert y16.dtype == jnp.float32  # f32 accumulation preserved
        err = float(jnp.abs(y16 - y32).max())
        scale = float(jnp.abs(y32).max())
        assert err < 0.02 * max(scale, 1.0), (err, scale)

    def test_knob_through_config_surface(self):
        from nmf_tpu import config as config_lib
        from nmf_tpu.builders import build_nmf
        from nmf_tpu.render import render

        cfg = config_lib.compose([
            "model=microfacet_tensorf2", "dataset=synthetic_sphere",
            "model.arch.mlp_dtype=bf16",
            "field.N_voxel_init=4096", "field.N_voxel_final=4096",
            "field.upsamp_list=[]",
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
        assert nmf.model.diffuse_module.diffuse_mlp.compute_dtype == "bf16"
        assert nmf.model.brdf.mlp.compute_dtype == "bf16"
        rng = np.random.default_rng(0)
        o = np.tile([[0.0, 0.0, -4.0]], (64, 1)).astype(np.float32)
        d = rng.normal(size=(64, 3)).astype(np.float32)
        d[:, 2] = np.abs(d[:, 2]) + 1.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = jnp.asarray(np.concatenate([o, d], -1))
        ims, _ = render(nmf, rays, jax.random.PRNGKey(1), is_train=False)
        assert np.all(np.isfinite(np.asarray(ims["rgb_map"])))
