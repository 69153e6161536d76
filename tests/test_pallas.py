"""Pallas kernel tests (interpret mode on CPU; parity + gradients)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmf_tpu.ops.pallas import composite


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run pallas_call in interpreter mode on CPU."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setattr(composite.pl, "pallas_call", patched)
    yield


def _random_inputs(B=37, K=16, seed=0):
    rng = np.random.default_rng(seed)
    sigma = jnp.asarray(rng.uniform(0, 5, (B, K)), jnp.float32)
    dists = jnp.asarray(rng.uniform(0, 0.2, (B, K)), jnp.float32)
    rgb = jnp.asarray(rng.uniform(0, 1, (B, K, 3)), jnp.float32)
    z = jnp.asarray(np.sort(rng.uniform(2, 6, (B, K)), -1), jnp.float32)
    return sigma, dists, rgb, z


class TestCompositeKernel:
    def test_forward_parity(self):
        args = _random_inputs()
        w1, r1, a1, d1 = composite.composite_rays(*args)
        w2, r2, a2, d2 = composite.composite_rays_reference(*args)
        np.testing.assert_allclose(w1, w2, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(r1, r2, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(a1, a2, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(d1, d2, rtol=1e-4, atol=1e-5)

    def test_backward_parity(self):
        args = _random_inputs(B=19, K=8, seed=1)

        def loss_k(sigma, rgb):
            w, rm, a, d = composite.composite_rays(sigma, args[1], rgb,
                                                   args[3])
            return ((w * 0.3).sum() + (rm ** 2).sum() + (a * 0.7).sum()
                    + (d * 0.1).sum())

        def loss_r(sigma, rgb):
            w, rm, a, d = composite.composite_rays_reference(
                sigma, args[1], rgb, args[3])
            return ((w * 0.3).sum() + (rm ** 2).sum() + (a * 0.7).sum()
                    + (d * 0.1).sum())

        gk = jax.grad(loss_k, argnums=(0, 1))(args[0], args[2])
        gr = jax.grad(loss_r, argnums=(0, 1))(args[0], args[2])
        np.testing.assert_allclose(gk[0], gr[0], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(gk[1], gr[1], rtol=1e-4, atol=1e-5)

    def test_nonmultiple_batch(self):
        # B not a multiple of the 128-lane block
        args = _random_inputs(B=5, K=4, seed=2)
        w1, r1, a1, d1 = composite.composite_rays(*args)
        w2, r2, a2, d2 = composite.composite_rays_reference(*args)
        np.testing.assert_allclose(w1, w2, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(r1, r2, rtol=1e-5, atol=1e-6)


class TestBinsumKernel:
    def test_scatter_parity(self):
        from nmf_tpu.ops.pallas.binsum import binsum_rows

        rng = np.random.default_rng(0)
        N, C, R = 5000, 24, 3000
        idx = rng.integers(0, R, N).astype(np.int32)
        vals = rng.normal(size=(N, C)).astype(np.float32)
        ref = np.zeros((R, C), np.float32)
        np.add.at(ref, idx, vals)
        out = np.asarray(binsum_rows(jnp.asarray(idx), jnp.asarray(vals), R))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_collisions_and_oob(self):
        from nmf_tpu.ops.pallas.binsum import binsum_rows

        rng = np.random.default_rng(1)
        N, C, R = 4000, 8, 1500
        # everything piles into 7 rows; 100 rows out of range must drop
        idx = rng.integers(0, 7, N).astype(np.int32)
        idx[:100] = R + 999
        vals = rng.normal(size=(N, C)).astype(np.float32)
        ref = np.zeros((R, C), np.float32)
        np.add.at(ref, idx[100:], vals[100:])
        out = np.asarray(binsum_rows(jnp.asarray(idx), jnp.asarray(vals), R))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


class TestQuadGatherBinsum:
    def test_forward_and_grads_match_autodiff(self):
        from nmf_tpu.ops.grid_sample import (quad_gather_2d,
                                             quad_gather_2d_binsum)

        rng = np.random.default_rng(1)
        C, H, W, N = 8, 17, 23, 512
        plane = jnp.asarray(rng.normal(size=(C, H, W)).astype(np.float32))
        coords = jnp.asarray(
            rng.uniform(-1.1, 1.1, size=(N, 2)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))

        np.testing.assert_array_equal(
            np.asarray(quad_gather_2d(plane, coords)),
            np.asarray(quad_gather_2d_binsum(plane, coords)))

        ga = jax.grad(lambda p, c: (quad_gather_2d(p, c) * g).sum(),
                      argnums=(0, 1))(plane, coords)
        gb = jax.grad(lambda p, c: (quad_gather_2d_binsum(p, c) * g).sum(),
                      argnums=(0, 1))(plane, coords)
        np.testing.assert_allclose(gb[0], ga[0], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(gb[1], ga[1], rtol=1e-4, atol=1e-3)

    def test_batched_coords(self):
        # the SAT callsite passes (4, N, 2) corner stacks
        from nmf_tpu.ops.grid_sample import (quad_gather_2d,
                                             quad_gather_2d_binsum)

        rng = np.random.default_rng(2)
        plane = jnp.asarray(rng.normal(size=(3, 11, 19)).astype(np.float32))
        c4 = jnp.asarray(
            rng.uniform(-1, 1, size=(4, 64, 2)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(quad_gather_2d(plane, c4)),
            np.asarray(quad_gather_2d_binsum(plane, c4)))
        ga = jax.grad(lambda p: (quad_gather_2d(p, c4) ** 2).sum())(plane)
        gb = jax.grad(
            lambda p: (quad_gather_2d_binsum(p, c4) ** 2).sum())(plane)
        np.testing.assert_allclose(gb, ga, rtol=1e-4, atol=1e-5)


class TestBinsumEndToEnd:
    def test_flagship_train_step_trajectory_parity(self):
        """field.scatter_kernel + bg scatter_kernel through the FULL
        microfacet train step: the kernel is an exact regrouping of the
        same sums, so short loss trajectories must agree to accumulation
        noise (on-chip A/B: runs/run_binsum_ab.py)."""
        from nmf_tpu import config as config_lib, trainer
        from nmf_tpu.builders import build_nmf

        def run(on):
            o = ["model=microfacet_tensorf2", "dataset=synthetic_sphere",
                 "field.N_voxel_init=4096", "field.N_voxel_final=4096",
                 "field.upsamp_list=[]",
                 "model.arch.max_samples_per_ray=16",
                 "model.arch.recur_samples_per_ray=8",
                 "model.arch.model.brdf_ray_budget=[512,128]",
                 "model.arch.model.max_retrace_rays=[64]",
                 "model.arch.bg_module.bg_resolution=32"]
            if on:
                o += ["field.scatter_kernel=true",
                      "model.arch.bg_module.scatter_kernel=true"]
            cfg = config_lib.compose(o)
            aabb = np.array([[-1.5] * 3, [1.5] * 3], np.float32)
            nmf = build_nmf(jax.random.PRNGKey(0), cfg["model"]["arch"],
                            aabb, (2.0, 6.0))
            tx = trainer.make_optimizer(nmf, trainer.OptimConfig(n_iters=10))
            st = tx.init(nmf)
            step = trainer.make_train_step(tx)
            w = trainer.LossWeights()
            rng = np.random.default_rng(0)
            rays = np.concatenate(
                [np.tile([[0, 0, -4.0]], (128, 1)),
                 rng.normal(size=(128, 3))], -1).astype(np.float32)
            rays[:, 3:] /= np.linalg.norm(rays[:, 3:], axis=-1,
                                          keepdims=True)
            rgbs = rng.uniform(size=(128, 3)).astype(np.float32)
            key = jax.random.PRNGKey(0)
            losses = []
            for _ in range(3):
                key, sk = jax.random.split(key)
                nmf, st, m = step(nmf, st, jnp.asarray(rays),
                                  jnp.asarray(rgbs), jnp.ones(3), sk, w)
                losses.append(float(m["loss"]))
            return np.asarray(losses)

        a, b = run(False), run(True)
        np.testing.assert_allclose(b, a, rtol=2e-4)


class TestModelScatterKernel:
    def test_unit_parity(self):
        """take_rows_binsum / segment_sum_to(binsum=True) == XLA exactly
        (interpret mode)."""
        from nmf_tpu.ops.masked import segment_sum_to, take_rows_binsum

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(50, 7)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 50, size=(200,)).astype(np.int32))
        np.testing.assert_array_equal(
            np.asarray(take_rows_binsum(x, idx)), np.asarray(x[idx]))
        ga = jax.grad(lambda x: (x[idx] ** 2).sum())(x)
        gb = jax.grad(lambda x: (take_rows_binsum(x, idx) ** 2).sum())(x)
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))

        v = jnp.asarray(rng.normal(size=(200, 5)).astype(np.float32))
        valid = jnp.asarray(rng.integers(0, 2, size=(200,)).astype(bool))
        a = segment_sum_to(v, idx, valid, 50)
        b = segment_sum_to(v, idx, valid, 50, binsum=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        ga = jax.grad(
            lambda v: (segment_sum_to(v, idx, valid, 50) ** 3).sum())(v)
        gb = jax.grad(lambda v: (
            segment_sum_to(v, idx, valid, 50, binsum=True) ** 3).sum())(v)
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))

    def test_flagship_trajectory_parity(self):
        """model.arch.model.scatter_kernel (bounce parent-gather backward +
        composite segment sums through the bin-sum kernel) is an exact
        regrouping: short flagship loss trajectories must agree."""
        from nmf_tpu import config as config_lib, trainer
        from nmf_tpu.builders import build_nmf

        def run(on):
            o = ["model=microfacet_tensorf2", "dataset=synthetic_sphere",
                 "field.N_voxel_init=4096", "field.N_voxel_final=4096",
                 "field.upsamp_list=[]",
                 "model.arch.max_samples_per_ray=16",
                 "model.arch.recur_samples_per_ray=8",
                 "model.arch.model.brdf_ray_budget=[512,128]",
                 "model.arch.model.max_retrace_rays=[64]",
                 "model.arch.bg_module.bg_resolution=32"]
            if on:
                o += ["model.arch.model.scatter_kernel=true"]
            cfg = config_lib.compose(o)
            aabb = np.array([[-1.5] * 3, [1.5] * 3], np.float32)
            nmf = build_nmf(jax.random.PRNGKey(0), cfg["model"]["arch"],
                            aabb, (2.0, 6.0))
            assert nmf.model.scatter_kernel == on
            tx = trainer.make_optimizer(nmf, trainer.OptimConfig(n_iters=10))
            st = tx.init(nmf)
            step = trainer.make_train_step(tx)
            w = trainer.LossWeights()
            rng = np.random.default_rng(0)
            rays = np.concatenate(
                [np.tile([[0, 0, -4.0]], (128, 1)),
                 rng.normal(size=(128, 3))], -1).astype(np.float32)
            rays[:, 3:] /= np.linalg.norm(rays[:, 3:], axis=-1,
                                          keepdims=True)
            rgbs = rng.uniform(size=(128, 3)).astype(np.float32)
            key = jax.random.PRNGKey(0)
            losses = []
            for _ in range(3):
                key, sk = jax.random.split(key)
                nmf, st, m = step(nmf, st, jnp.asarray(rays),
                                  jnp.asarray(rgbs), jnp.ones(3), sk, w)
                losses.append(float(m["loss"]))
            return np.asarray(losses)

        a, b = run(False), run(True)
        np.testing.assert_allclose(b, a, rtol=2e-4)
