"""Environment map (IntegralEquirect) tests."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmf_tpu.modules.bg import init_integral_equirect
from nmf_tpu.ops.safemath import normalize


def make_bg(res=32, init_val=0.0, activation="identity"):
    return init_integral_equirect(jax.random.PRNGKey(0), bg_resolution=res,
                                  init_val=init_val, activation=activation,
                                  mipbias=0.0)


class TestIntegralEquirect:
    def test_constant_map_query(self):
        # a constant map must return the constant regardless of direction/mip
        bg = make_bg(init_val=0.7, res=64)
        h, w = bg.hw()
        # align-corners SAT carries an inherent (w-1)(h-1)/(wh) scale (the
        # reference has the same bias; the learnable brightness absorbs it)
        expect = 0.7 * (w - 1) * (h - 1) / (w * h)
        rng = np.random.default_rng(0)
        dirs = rng.normal(size=(200, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        for mip in (-5.0, -2.0, 0.0):
            vals = bg(jnp.asarray(dirs, jnp.float32),
                      jnp.full((200,), mip))
            np.testing.assert_allclose(np.asarray(vals), expect, atol=0.03)

    def test_direction_mapping(self):
        # paint one texel bright and confirm the right direction sees it
        bg = make_bg(res=64, init_val=0.0)
        h, w = bg.hw()
        mat = np.zeros((3, h, w), np.float32)
        # equator, phi=pi (-x direction) -> coords x = 0 -> center column
        mat[:, h // 2, w // 2] = 10.0
        bg = bg.replace(bg_mat=jnp.asarray(mat))
        d = jnp.asarray([[-1.0, 0.0, 0.0]])  # phi=pi, theta=0
        v_hit = bg(d, jnp.full((1,), -2.0))
        d2 = jnp.asarray([[1.0, 0.0, 0.0]])  # opposite azimuth
        v_miss = bg(d2, jnp.full((1,), -2.0))
        assert float(v_hit[0, 0]) > float(v_miss[0, 0]) + 0.1

    def test_sat_matches_brute_force_box(self):
        # mid-latitude, small footprint: SAT box integral == direct average
        rng = np.random.default_rng(1)
        res = 64
        bg = make_bg(res=res, init_val=0.0)
        mat = rng.uniform(size=(3, res, 2 * res)).astype(np.float32)
        bg = bg.replace(bg_mat=jnp.asarray(mat))
        cache = bg.prepare()

        dirs = np.array([[0.3, 0.8, 0.1], [-0.5, 0.4, -0.2]], np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        sa = np.full((2,), -1.0, np.float32)
        ours = np.asarray(bg(jnp.asarray(dirs), jnp.asarray(sa), cache=cache))

        # brute force: average activated texels inside the same box
        h, w = res, 2 * res
        mip_w, mip_h = bg.sa2mip(jnp.asarray(dirs), jnp.asarray(sa))
        act = np.asarray(bg.activation_fn(bg.bg_mat))
        for i in range(2):
            a, b, c = dirs[i]
            phi = math.atan2(b, a)
            theta = math.atan2(c, math.sqrt(a * a + b * b))
            cx = (phi % (2 * math.pi) - math.pi) / math.pi
            cy = -theta / math.pi * 2
            sw = 2 ** float(mip_w[i]) / h / 2
            sh = 2 ** float(mip_h[i]) / h
            # box in pixel space (align_corners grid)
            x0 = (cx - sw / 2 + 1) / 2 * (w - 1)
            x1 = (cx + sw / 2 + 1) / 2 * (w - 1)
            y0 = (cy - sh / 2 + 1) / 2 * (h - 1)
            y1 = (cy + sh / 2 + 1) / 2 * (h - 1)
            # dense numeric integral via bilinear samples
            xs = np.linspace(x0, x1, 40)
            ys = np.linspace(y0, y1, 40)
            tot = np.zeros(3)
            for yy in ys:
                iy0 = int(np.floor(yy)); fy = yy - iy0
                for xx in xs:
                    ix0 = int(np.floor(xx)); fx = xx - ix0
                    v = (act[:, iy0, ix0] * (1 - fx) * (1 - fy)
                         + act[:, iy0, ix0 + 1] * fx * (1 - fy)
                         + act[:, iy0 + 1, ix0] * (1 - fx) * fy
                         + act[:, iy0 + 1, ix0 + 1] * fx * fy)
                    tot += v
            brute = tot / (len(xs) * len(ys))
            np.testing.assert_allclose(ours[i], brute, rtol=0.12, atol=0.02)

    def test_sh_projection_constant(self):
        bg = make_bg(res=32, init_val=0.5)
        coeffs, conv = bg.get_spherical_harmonics(60)
        # constant function: only the DC band is non-trivial
        c = np.asarray(coeffs)
        assert abs(c[0, 0] - 0.5 * math.sqrt(4 * math.pi)) < 0.25
        assert np.abs(c[1:]).max() < 0.1

    def test_sh_irradiance_of_constant_env(self):
        # E for a constant envmap L0 is L0 (Lambertian convolution identity)
        from nmf_tpu.ops import sh

        bg = make_bg(res=32, init_val=0.8)
        _, conv = bg.get_spherical_harmonics(80)
        dirs = normalize(jnp.asarray(np.random.default_rng(2).normal(
            size=(50, 3)), jnp.float32))
        evaled = sh.eval_sh_bases(9, dirs)
        E = np.asarray((np.asarray(conv)[None] * np.asarray(evaled)[..., None]
                        ).sum(axis=1))
        np.testing.assert_allclose(E, 0.8, atol=0.12)

    def test_grad_flows_to_map(self):
        bg = make_bg(res=16, init_val=0.2)
        dirs = normalize(jnp.asarray([[0.5, 0.5, 0.2]]))

        def loss(bg):
            return bg(dirs, jnp.full((1,), -2.0)).sum()

        g = jax.grad(loss)(bg)
        assert float(jnp.abs(g.bg_mat).sum()) > 0

    def test_tv_loss(self):
        bg = make_bg(res=16)
        assert float(bg.tv_loss()) >= 0


class TestEnvmapMetrics:
    def test_perfect_recovery_scores_high(self):
        # GT pano generated FROM the bg_mat through the eval transform's
        # inverse must score near-perfect psnr/ssim and ~zero smape
        from nmf_tpu.eval import calc_envmap_metrics

        bg = make_bg(res=32, init_val=0.0)
        h, w = bg.hw()
        rng = np.random.default_rng(3)
        mat = rng.uniform(0.1, 0.9, size=(3, h, w)).astype(np.float32)
        bg = bg.replace(bg_mat=jnp.asarray(mat))
        pano = np.transpose(mat, (1, 2, 0))
        # invert eval's flip+roll: gt_im = roll(pano, w//2)[:, ::-1]
        gt_im = np.roll(pano, w // 2, axis=1)[:, ::-1].copy()
        m = calc_envmap_metrics(bg, gt_im, fH=h)
        assert m["envmap_psnr_top"] > 30
        assert m["envmap_psnr"] > 30
        assert m["envmap_smape_top"] < 0.1
        assert m["envmap_ssim_top"] > 0.9

    def test_wrong_map_scores_low(self):
        from nmf_tpu.eval import calc_envmap_metrics

        bg = make_bg(res=32, init_val=0.0)
        h, w = bg.hw()
        rng = np.random.default_rng(4)
        bg = bg.replace(bg_mat=jnp.asarray(
            rng.uniform(0, 1, size=(3, h, w)).astype(np.float32)))
        gt_im = rng.uniform(0, 1, size=(h, 2 * h, 3)).astype(np.float32)
        m = calc_envmap_metrics(bg, gt_im, fH=h)
        assert m["envmap_psnr_top"] < 25
        assert m["envmap_smape_top"] > 0.1


class TestEnvmapIdentifiabilityOracle:
    """Fitting-capacity oracle for the full sa2mip+SAT query path
    (VERDICT r2 next #4; runs/env_oracle.py + env_fit3.py findings).

    Root cause of the flagship's low envmap_psnr_top (10.9 dB @200px):
    NOT a query-path bug. The metric and orientation are clean (a perfect
    map scores >110 dB through calc_envmap_metrics), and supervising the
    map THROUGH the query path at mixed footprints with scale-consistent
    targets recovers the raw texels to >20 dB in 800 steps. Under
    single-scale (sharp-only) supervision the raw-map metric has a
    deconvolution null space — exactly the training signal a shiny scene
    provides (all mirror rays carry the same tiny footprint), so envmap
    recovery quality is a property of the scene's roughness spectrum,
    matching the reference's behavior on glossy-only scenes
    (/root/reference/modules/integral_equirect.py:290-322 exists because
    real NMF scenes carry mixed roughness)."""

    def _setup(self, H=64):
        from nmf_tpu.data.synthetic import _ShinyEnv
        from nmf_tpu.eval import calc_envmap_metrics

        key = jax.random.PRNGKey(0)
        bg = init_integral_equirect(key, bg_resolution=H, activation="exp")
        env = _ShinyEnv(H=H)
        gt_pano = np.roll(env.map, env.W // 2, axis=1)[:, ::-1].copy()
        perfect = bg.replace(bg_mat=jnp.asarray(np.log(np.clip(
            np.transpose(env.map, (2, 0, 1)), 1e-6, None))))
        return bg, perfect, gt_pano, calc_envmap_metrics

    def test_metric_and_orientation_clean(self):
        """A perfect map must score near-losslessly through the eval
        metric (rules out flip/roll/convention bugs)."""
        _, perfect, gt_pano, metrics = self._setup()
        m = metrics(perfect, gt_pano, fH=64)
        assert m["envmap_psnr_top"] > 60
        assert m["envmap_ssim_top"] > 0.99

    def test_query_path_recovers_map_under_mixed_footprints(self):
        """Scale-consistent supervision through the FULL query path
        (sa2mip -> SAT box-filter integral) must recover the raw texels:
        proves the SAT/mip machinery is invertible and unbiased enough
        to learn through."""
        import optax

        bg, perfect, gt_pano, metrics = self._setup()
        cache_p = perfect.prepare(with_sh=False)
        opt = optax.adam(0.05)
        params = bg.bg_mat
        opt_state = opt.init(params)

        def step(p, s, d, sa):
            tgt = jax.lax.stop_gradient(perfect(d, sa, cache=cache_p))

            def lf(p):
                b = bg.replace(bg_mat=p)
                pred = b(d, sa, cache=b.prepare(with_sh=False))
                return (jnp.clip(pred - tgt, -1, 1) ** 2).mean()

            l, g = jax.value_and_grad(lf)(p)
            up, s = opt.update(g, s)
            return optax.apply_updates(p, up), s, l

        step = jax.jit(step)
        rng = np.random.default_rng(0)
        for _ in range(800):
            d = rng.normal(size=(4096, 3)).astype(np.float32)
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            sa = rng.uniform(-9.0, -2.0, size=(4096,)).astype(np.float32)
            params, opt_state, _ = step(params, opt_state, jnp.asarray(d),
                                        jnp.asarray(sa))
        m = metrics(bg.replace(bg_mat=params), gt_pano, fH=64)
        assert m["envmap_psnr_top"] > 20, m


class TestShGradKnob:
    """bg sh_grad=true (opt-in extension): diffuse shading backpropagates
    into the envmap's SH projection, giving the map the coarse-scale
    signal the oracle shows is missing on glossy-only scenes. Default
    false matches the reference's full detach (microfacet.py:305-316)."""

    def _diffuse_grad_norm(self, sh_grad):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).parent))
        from test_microfacet import rays_toward_origin, small_mf

        from nmf_tpu.render import render

        key = jax.random.PRNGKey(0)
        nmf = small_mf(key)
        nmf = nmf.replace(bg_module=nmf.bg_module.replace(sh_grad=sh_grad))
        rays = rays_toward_origin(32)

        def loss(bg_mat):
            n = nmf.replace(bg_module=nmf.bg_module.replace(bg_mat=bg_mat))
            bg_cache = n.bg_module.prepare()
            # constant bg_col: debug maps blend the background into escape
            # pixels, which would be a bg_mat grad path of its own
            ims, _ = render(n, rays, key, is_train=True, bg_col=(1., 1., 1.),
                            bg_cache=bg_cache, draw_debug=True)
            return ims["diffuse"].sum()

        g = jax.grad(loss)(nmf.bg_module.bg_mat)
        return float(jnp.abs(g).sum())

    def test_default_detached(self):
        assert self._diffuse_grad_norm(False) == 0.0

    def test_sh_grad_flows(self):
        assert self._diffuse_grad_norm(True) > 0.0

    def test_config_surface(self):
        from nmf_tpu import config as config_lib
        from nmf_tpu.builders import build_bg

        cfg = config_lib.compose([
            "model=microfacet_tensorf2", "dataset=synthetic_sphere",
            "model.arch.bg_module.bg_resolution=32",
            "model.arch.bg_module.sh_grad=True"])
        bg = build_bg(jax.random.PRNGKey(0),
                      cfg["model"]["arch"]["bg_module"])
        assert bg.sh_grad is True
