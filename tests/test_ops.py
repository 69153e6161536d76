"""Unit tests for core math ops against closed forms and torch oracles."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmf_tpu.ops import safemath, sh, tonemap, grid_sample, masked
from nmf_tpu import utils


class TestSafemath:
    def test_normalize(self):
        v = jnp.array([[3.0, 4.0, 0.0]])
        out = safemath.normalize(v)
        np.testing.assert_allclose(out, [[0.6, 0.8, 0.0]], atol=1e-6)

    def test_normalize_zero_safe(self):
        v = jnp.zeros((2, 3))
        out = safemath.normalize(v)
        assert np.all(np.isfinite(out))

    def test_safe_atan2_grad_finite_at_origin(self):
        g = jax.grad(lambda x: safemath.safe_atan2(x, 0.0))(0.0)
        assert np.isfinite(g)

    def test_expected_sin_zero_var(self):
        x = jnp.linspace(-3, 3, 16)
        y, y_var = safemath.expected_sin(x, jnp.zeros_like(x))
        np.testing.assert_allclose(y, jnp.sin(x), atol=1e-4)
        np.testing.assert_allclose(y_var, 0.0, atol=1e-4)

    def test_ipe_matches_pe_at_zero_var(self):
        # with zero covariance, IPE collapses to sin of scaled coords
        x = jnp.array([[0.3, -0.2, 0.1]])
        out = safemath.integrated_pos_enc((x, jnp.zeros_like(x)), 0, 4)
        scales = jnp.array([2 ** (i - 1) for i in range(0, 4)])
        y = (x[..., None, :] * scales[:, None]).reshape(1, -1)
        expect = jnp.concatenate([jnp.sin(y), jnp.sin(y + 0.5 * jnp.pi)], -1)
        np.testing.assert_allclose(out, expect, atol=1e-4)

    def test_trunc_exp_clamps(self):
        assert float(safemath.trunc_exp(jnp.array(100.0))) == pytest.approx(
            math.exp(10.0), rel=1e-5)
        g = jax.grad(lambda x: safemath.trunc_exp(x))(jnp.array(100.0))
        assert np.isfinite(g)

    def test_positional_encoding_shape(self):
        x = jnp.ones((5, 3))
        assert safemath.positional_encoding(x, 6).shape == (5, 36)


class TestSH:
    def test_constant_band(self):
        dirs = safemath.normalize(jnp.array([[1.0, 2.0, -0.5]]))
        out = sh.eval_sh_bases(9, dirs)
        assert out.shape == (1, 9)
        np.testing.assert_allclose(out[0, 0], 0.28209479, atol=1e-6)

    def test_orthonormality_mc(self):
        # MC integral over the sphere of b_i b_j approx identity
        rng = np.random.default_rng(0)
        v = rng.normal(size=(200000, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        basis = np.asarray(sh.eval_sh_bases(9, jnp.asarray(v)))
        gram = 4 * np.pi * basis.T @ basis / v.shape[0]
        np.testing.assert_allclose(gram, np.eye(9), atol=0.05)

    def test_sh_roundtrip_projection(self):
        # project a low-frequency function onto SH and evaluate back
        rng = np.random.default_rng(1)
        v = rng.normal(size=(100000, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        vj = jnp.asarray(v)
        basis = sh.eval_sh_bases(9, vj)
        coeffs = jnp.array([0.5, 0.1, -0.2, 0.3, 0.0, 0.05, -0.1, 0.2, 0.15])
        f = basis @ coeffs
        # recover coefficients by MC projection
        rec = 4 * np.pi * np.mean(np.asarray(basis) * np.asarray(f)[:, None], axis=0)
        np.testing.assert_allclose(rec, coeffs, atol=0.03)

    def test_al2_lambertian(self):
        assert sh.Al2(0) == pytest.approx(math.pi)
        assert sh.Al2(1) == pytest.approx(2 * math.pi / 3)
        assert sh.Al2(3) == 0.0
        assert sh.Al2(2) == pytest.approx(math.pi / 4)

    def test_sh_basis_list_dims(self):
        dirs = safemath.normalize(jnp.ones((7, 3)))
        out = sh.sh_basis([0, 1, 2, 4], dirs, kappa=jnp.full((7,), 10.0))
        assert out.shape == (7, sh.sh_basis_dim([0, 1, 2, 4]))
        assert np.all(np.isfinite(out))


class TestTonemap:
    def test_srgb_roundtrip(self):
        x = jnp.linspace(0.001, 1.0, 64)
        y = tonemap.srgb_tonemap(x)
        back = tonemap.srgb_inverse(y)
        np.testing.assert_allclose(back, x, atol=1e-5)

    def test_hdr_roundtrip(self):
        x = jnp.linspace(0.01, 5.0, 64)
        y = tonemap.hdr_tonemap(x, noclip=True)
        back = tonemap.hdr_inverse(y)
        np.testing.assert_allclose(back, x, rtol=1e-4)


class TestGridSample:
    def _torch_grid_sample_2d(self, plane, coords):
        import torch
        import torch.nn.functional as F

        p = torch.from_numpy(np.asarray(plane))[None]
        g = torch.from_numpy(np.asarray(coords)).reshape(1, -1, 1, 2)
        out = F.grid_sample(p, g, mode="bilinear", padding_mode="zeros",
                            align_corners=True)
        return out.squeeze(0).squeeze(-1).T.numpy()

    def test_matches_torch_2d(self):
        rng = np.random.default_rng(2)
        plane = rng.normal(size=(4, 9, 13)).astype(np.float32)
        coords = (rng.uniform(-1.3, 1.3, size=(257, 2))).astype(np.float32)
        ours = np.asarray(grid_sample.grid_sample_2d(jnp.asarray(plane),
                                                     jnp.asarray(coords)))
        ref = self._torch_grid_sample_2d(plane, coords)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_matches_torch_3d(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(3)
        vol = rng.normal(size=(2, 5, 6, 7)).astype(np.float32)
        coords = rng.uniform(-1.2, 1.2, size=(100, 3)).astype(np.float32)
        ours = np.asarray(grid_sample.grid_sample_3d(jnp.asarray(vol),
                                                     jnp.asarray(coords)))
        p = torch.from_numpy(vol)[None]
        g = torch.from_numpy(coords).reshape(1, -1, 1, 1, 3)
        ref = (F.grid_sample(p, g, mode="bilinear", padding_mode="zeros",
                             align_corners=True)
               .reshape(2, -1).T.numpy())
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_1d_line(self):
        line = jnp.array([[0.0, 1.0, 2.0]])
        out = grid_sample.grid_sample_1d(line, jnp.array([-1.0, 0.0, 1.0, 0.5]))
        np.testing.assert_allclose(out[:, 0], [0.0, 1.0, 2.0, 1.5], atol=1e-6)

    def test_grad_wrt_coords(self):
        plane = jnp.arange(12.0).reshape(1, 3, 4)
        f = lambda c: grid_sample.grid_sample_2d(plane, c).sum()
        g = jax.grad(f)(jnp.array([[0.1, 0.2]]))
        assert np.all(np.isfinite(g))

    def test_resize_align_corners(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(4)
        plane = rng.normal(size=(3, 8, 8)).astype(np.float32)
        ours = np.asarray(grid_sample.resize_align_corners_2d(
            jnp.asarray(plane), (17, 13)))
        ref = F.interpolate(torch.from_numpy(plane)[None], size=(17, 13),
                            mode="bilinear", align_corners=True)[0].numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_max_pool3d(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(5)
        vol = rng.normal(size=(6, 7, 8)).astype(np.float32)
        ours = np.asarray(grid_sample.max_pool_3d(jnp.asarray(vol), 3))
        ref = F.max_pool3d(torch.from_numpy(vol)[None, None], kernel_size=3,
                           padding=1, stride=1)[0, 0].numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestMasked:
    def test_raw2alpha_matches_torch_semantics(self):
        rng = np.random.default_rng(6)
        sigma = jnp.asarray(rng.uniform(0, 3, size=(4, 10)).astype(np.float32))
        dist = jnp.asarray(rng.uniform(0, 0.1, size=(4, 10)).astype(np.float32))
        w, tail = masked.raw2alpha(sigma, dist)
        alpha = 1 - np.exp(-np.asarray(sigma) * np.asarray(dist))
        T = np.cumprod(np.concatenate([np.ones((4, 1)), 1 - alpha + 1e-10], -1), -1)
        np.testing.assert_allclose(w, alpha * T[:, :-1], rtol=1e-4, atol=1e-5)
        assert np.all(np.asarray(w).sum(-1) <= 1.0 + 1e-5)

    def test_row_mask_sum_equals_dense_masked(self):
        rng = np.random.default_rng(7)
        vals = jnp.asarray(rng.normal(size=(5, 8, 3)).astype(np.float32))
        mask = jnp.asarray(rng.uniform(size=(5, 8)) > 0.5)
        out = masked.row_mask_sum(vals, mask)
        expect = (np.asarray(vals) * np.asarray(mask)[..., None]).sum(1)
        np.testing.assert_allclose(out, expect, rtol=1e-6)

    def test_compact_topk_ordering(self):
        valid = jnp.array([[False, True, False, True, True],
                           [True, False, False, False, False]])
        idx, keep = masked.compact_topk(valid, 3)
        np.testing.assert_array_equal(idx[0], [1, 3, 4])
        np.testing.assert_array_equal(keep[0], [True, True, True])
        assert idx[1][0] == 0
        np.testing.assert_array_equal(keep[1], [True, False, False])

    def test_gather_scatter_roundtrip(self):
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.normal(size=(3, 6, 2)).astype(np.float32))
        valid = jnp.asarray(rng.uniform(size=(3, 6)) > 0.4)
        idx, keep = masked.compact_topk(valid, 6)
        g = masked.gather_rows(x, idx)
        back = masked.scatter_rows(jnp.zeros_like(x), idx, g, keep)
        expect = np.where(np.asarray(valid)[..., None], np.asarray(x), 0.0)
        np.testing.assert_allclose(back, expect, atol=1e-6)

    def test_flat_compact_budget(self):
        counts = jnp.array([2, 0, 3, 1])
        src, valid, kept = masked.flat_compact(counts, 5)
        np.testing.assert_array_equal(np.asarray(src)[np.asarray(valid)],
                                      [0, 0, 2, 2, 2])
        np.testing.assert_array_equal(kept, [2, 0, 3, 0])

    def test_flat_compact_under_budget(self):
        counts = jnp.array([1, 2])
        src, valid, kept = masked.flat_compact(counts, 8)
        assert int(valid.sum()) == 3
        np.testing.assert_array_equal(kept, [1, 2])

    def test_segment_sum(self):
        vals = jnp.array([[1.0], [2.0], [3.0]])
        seg = jnp.array([0, 0, 2])
        out = masked.segment_sum_to(vals, seg, jnp.array([True, True, True]), 3)
        np.testing.assert_allclose(out[:, 0], [3.0, 0.0, 3.0])


class TestUtils:
    def test_n_to_reso(self):
        reso = utils.n_to_reso(128 ** 3, np.array([[-1.5] * 3, [1.5] * 3]))
        assert reso == [128, 128, 128]

    def test_lr_decay_endpoints(self):
        assert utils.learning_rate_decay(0, 1.0, 1e-3, 100, 0) == pytest.approx(1.0)
        assert utils.learning_rate_decay(100, 1.0, 1e-3, 100, 0) == pytest.approx(1e-3)

    def test_lr_decay_delay(self):
        v = utils.learning_rate_decay(0, 1.0, 1e-3, 100, lr_delay_steps=10,
                                      lr_delay_mult=0.1)
        assert v == pytest.approx(0.1)

    def test_psnr_quantized(self):
        img = np.random.default_rng(0).uniform(size=(8, 8, 3))
        assert utils.rgb_psnr(img, img) > 50

    def test_ssim_identity(self):
        img = np.random.default_rng(1).uniform(size=(16, 16, 3))
        assert utils.rgb_ssim(img, img) == pytest.approx(1.0, abs=1e-6)


class TestResamplePdf:
    def _setup(self, B=16, K=64):
        z = jnp.broadcast_to(2.0 + 4.0 * jnp.arange(K) / K, (B, K))
        dists = jnp.full((B, K), 4.0 / K)
        return z, dists

    def test_concentrates_on_heavy_segments(self):
        from nmf_tpu.ops.resample import resample_pdf

        B, K = 16, 64
        z, dists = self._setup(B, K)
        w = jnp.zeros((B, K)).at[:, 20:24].set(1.0)
        valid = jnp.ones((B, K), bool)
        z_f, d_f, src, v_f = resample_pdf(
            jax.random.PRNGKey(0), z, dists, w, valid, 32, True, pad=0.01)
        frac_in = ((src >= 20) & (src < 24)).mean()
        assert frac_in > 0.8, frac_in
        assert bool(v_f.all())
        assert np.all(np.diff(np.asarray(z_f), axis=1) >= -1e-6)

    def test_intervals_partition_occupied_length(self):
        """Fine dists must sum to the total valid segment length: the
        quadrature covers every occupied region (no silent absorption
        loss), gaps excluded."""
        from nmf_tpu.ops.resample import resample_pdf

        B, K = 8, 32
        z, dists = self._setup(B, K)
        w = jax.random.uniform(jax.random.PRNGKey(1), (B, K))
        valid = jax.random.uniform(jax.random.PRNGKey(2), (B, K)) > 0.4
        z_f, d_f, src, v_f = resample_pdf(
            jax.random.PRNGKey(3), z, dists, w, valid, 64, False)
        total = np.asarray(jnp.where(valid, dists, 0.0).sum(-1))
        np.testing.assert_allclose(np.asarray(d_f).sum(-1), total, rtol=1e-4)

    def test_fine_positions_inside_valid_segments(self):
        from nmf_tpu.ops.resample import resample_pdf

        B, K = 8, 32
        z, dists = self._setup(B, K)
        w = jax.random.uniform(jax.random.PRNGKey(3), (B, K))
        valid = jax.random.uniform(jax.random.PRNGKey(4), (B, K)) > 0.5
        z_f, d_f, src, v_f = resample_pdf(
            jax.random.PRNGKey(5), z, dists, w, valid, 48, False)
        zl = np.take_along_axis(np.asarray(z), np.asarray(src), 1)
        assert np.all(np.asarray(z_f) >= zl - 1e-5)
        assert np.all(np.asarray(z_f) <= zl + 4.0 / K + 1e-5)
        # midpoints only land in valid segments
        vs = np.take_along_axis(np.asarray(valid), np.asarray(src), 1)
        assert vs.all()

    def test_degenerate_ray_flagged_invalid(self):
        from nmf_tpu.ops.resample import resample_pdf

        B, K = 2, 16
        z, dists = self._setup(B, K)
        w = jnp.zeros((B, K))
        valid = jnp.zeros((B, K), bool)
        _, _, _, v_f = resample_pdf(
            jax.random.PRNGKey(0), z, dists, w, valid, 8, False)
        assert not bool(v_f.any())

    def test_eval_is_deterministic(self):
        from nmf_tpu.ops.resample import resample_pdf

        B, K = 4, 32
        z, dists = self._setup(B, K)
        w = jax.random.uniform(jax.random.PRNGKey(6), (B, K))
        valid = jnp.ones((B, K), bool)
        a = resample_pdf(jax.random.PRNGKey(0), z, dists, w, valid, 16, False)
        b = resample_pdf(jax.random.PRNGKey(9), z, dists, w, valid, 16, False)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


class TestQuadTableLayout:
    def test_row_major_table_bit_identical(self, monkeypatch):
        """NMF_QUAD_ROWMAJOR builds the corner table channel-minor; values
        must be bit-identical to the transpose form (it exists purely to
        steer XLA layout assignment off the big gathered rows)."""
        from nmf_tpu.ops import grid_sample as gs

        rng = np.random.default_rng(0)
        plane = jnp.asarray(rng.normal(size=(7, 11, 13)).astype(np.float32))
        coords = jnp.asarray(
            rng.uniform(-1.2, 1.2, size=(200, 2)).astype(np.float32))
        monkeypatch.setattr(gs, "_QUAD_ROW_MAJOR", False)
        t0 = np.asarray(gs._quad_table(plane))
        a = np.asarray(gs.quad_gather_2d(plane, coords))
        monkeypatch.setattr(gs, "_QUAD_ROW_MAJOR", True)
        t1 = np.asarray(gs._quad_table(plane))
        b = np.asarray(gs.quad_gather_2d(plane, coords))
        np.testing.assert_array_equal(t0, t1)
        np.testing.assert_array_equal(a, b)
