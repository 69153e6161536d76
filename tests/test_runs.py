"""Run-collapsed shading (ops/runs.py + render merge_runs).

The collapse machinery must be exact (per-run aggregates, ordering,
padding, invalid handling) because everything downstream of it — shading,
bounce allocation, losses — consumes its outputs as if they were plain
samples. The render-level approximation (shading once per cell run) is
checked for mass conservation and closeness on a smooth field; its
quality at scale is an on-chip A/B (round-5 program, ARCHITECTURE.md).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmf_tpu.ops.runs import cell_indices, merge_sample_runs


def ref_merge(cells, z, d, w, valid, S):
    """Brute-force python reference of merge_sample_runs."""
    B, K = w.shape
    z_m = np.zeros((B, S))
    d_m = np.zeros((B, S))
    w_m = np.zeros((B, S))
    v_m = np.zeros((B, S), bool)
    for b in range(B):
        runs = []
        for k in range(K):
            new = (k == 0 or not (
                np.array_equal(cells[b, k], cells[b, k - 1])
                and valid[b, k] and valid[b, k - 1]))
            if new:
                runs.append([])
            runs[-1].append(k)
        agg = []
        for j, r in enumerate(runs):
            ks = [k for k in r if valid[b, k]]
            W = sum(float(w[b, k]) for k in ks)
            D = sum(float(d[b, k]) for k in ks)
            V = len(ks)
            if W > 1e-12:
                Z = sum(float(w[b, k]) * float(z[b, k]) for k in ks) / W
            elif V:
                Z = sum(float(z[b, k]) for k in ks) / V
            else:
                Z = 0.0
            agg.append((j, W, D, V, Z))
        # top-S by weight (stable: lower run index wins ties), then
        # restored to along-ray order
        agg.sort(key=lambda t: (-t[1], t[0]))
        kept = sorted(agg[:S], key=lambda t: t[0])
        for s, (j, W, D, V, Z) in enumerate(kept):
            w_m[b, s] = W
            d_m[b, s] = D
            v_m[b, s] = V > 0
            z_m[b, s] = Z
    return z_m, d_m, w_m, v_m


class TestMergeMachinery:
    def test_hand_built_runs(self):
        # ray 0: runs [0,1,2 | 3 | 4,5 | 6,7]; ray 1: invalid break
        cells = np.zeros((2, 8, 3), np.int32)
        cells[0, :, 0] = [0, 0, 0, 1, 2, 2, 3, 3]
        cells[1, :, 0] = [5, 5, 5, 5, 5, 5, 5, 5]
        valid = np.ones((2, 8), bool)
        valid[1, 3] = False  # splits ray 1 into [0..2], [3], [4..7]
        z = np.arange(16, dtype=np.float32).reshape(2, 8)
        d = np.full((2, 8), 0.5, np.float32)
        w = np.array([[4, 2, 2, 1, 3, 1, 0.5, 0.5],
                      [1, 1, 1, 9, 2, 2, 2, 2]], np.float32)

        out = merge_sample_runs(jnp.asarray(cells), jnp.asarray(z),
                                jnp.asarray(d), jnp.asarray(w),
                                jnp.asarray(valid), 4)
        z_m, d_m, w_m, v_m = [np.asarray(x) for x in out]
        # ray 0 keeps all 4 runs in order
        np.testing.assert_allclose(w_m[0], [8, 1, 4, 1])
        np.testing.assert_allclose(d_m[0], [1.5, 0.5, 1.0, 1.0])
        np.testing.assert_allclose(
            z_m[0], [(0 * 4 + 1 * 2 + 2 * 2) / 8, 3,
                     (4 * 3 + 5 * 1) / 4, 6.5])
        assert v_m[0].all()
        # ray 1: the invalid sample forms its own zero-weight run; the
        # three real runs [8,9,10], [12..15] survive, invalid run dropped
        np.testing.assert_allclose(sorted(w_m[1], reverse=True),
                                   [8, 3, 0, 0])
        assert v_m[1].sum() == 2

    def test_matches_bruteforce(self):
        rng = np.random.default_rng(3)
        B, K, S = 16, 24, 8
        # few distinct cells -> long runs; random invalids
        cells = rng.integers(0, 3, size=(B, K, 1)).repeat(3, -1).astype(
            np.int32)
        cells = np.sort(cells, axis=1)  # monotone -> realistic runs
        valid = rng.uniform(size=(B, K)) > 0.15
        z = np.sort(rng.uniform(1, 5, size=(B, K)).astype(np.float32), 1)
        d = rng.uniform(0.01, 0.1, size=(B, K)).astype(np.float32)
        w = rng.uniform(0, 1, size=(B, K)).astype(np.float32)

        got = merge_sample_runs(jnp.asarray(cells), jnp.asarray(z),
                                jnp.asarray(d), jnp.asarray(w),
                                jnp.asarray(valid), S)
        want = ref_merge(cells, z, d, w, valid, S)
        for g, r, name in zip(got, want, "zdwv"):
            np.testing.assert_allclose(np.asarray(g, np.float64), r,
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f"channel {name}")

    def test_weight_mass_preserved_when_slots_cover(self):
        rng = np.random.default_rng(0)
        B, K = 8, 16
        cells = np.cumsum(rng.uniform(size=(B, K, 1)) > 0.7, axis=1
                          ).repeat(3, -1).astype(np.int32)
        valid = np.ones((B, K), bool)
        z = np.sort(rng.uniform(1, 5, (B, K)).astype(np.float32), 1)
        d = np.full((B, K), 0.1, np.float32)
        w = rng.uniform(0, 1, (B, K)).astype(np.float32)
        z_m, d_m, w_m, v_m = merge_sample_runs(
            jnp.asarray(cells), jnp.asarray(z), jnp.asarray(d),
            jnp.asarray(w), jnp.asarray(valid), K)  # slots = K covers all
        np.testing.assert_allclose(np.asarray(w_m).sum(1), w.sum(1),
                                   rtol=1e-5)
        # depth integral preserved exactly (z_m is weight-averaged)
        np.testing.assert_allclose((np.asarray(w_m) * np.asarray(z_m)).sum(1),
                                   (w * z).sum(1), rtol=1e-5)


class TestCellIndices:
    def test_matches_quad_rows(self):
        """cell_indices equality must coincide with the plane quad rows'
        equality (ops/grid_sample._quad_prep index math)."""
        from nmf_tpu import config as config_lib
        from nmf_tpu.builders import build_nmf
        from nmf_tpu.ops.grid_sample import _quad_prep

        cfg = config_lib.compose([
            "model=tensorf", "dataset=synthetic_sphere",
            "field.N_voxel_init=4096", "field.N_voxel_final=4096",
            "field.upsamp_list=[]"])
        aabb = np.array([[-1.5] * 3, [1.5] * 3], np.float32)
        nmf = build_nmf(jax.random.PRNGKey(0), cfg["model"]["arch"], aabb,
                        (2.0, 6.0))
        rf = nmf.rf
        rng = np.random.default_rng(1)
        xyz = jnp.asarray(np.concatenate(
            [rng.uniform(-1.4, 1.4, (256, 3)), np.zeros((256, 1))],
            axis=1).astype(np.float32))
        cells = np.asarray(cell_indices(rf, xyz))
        coords = rf.normalize_coord(xyz)[..., :3]
        from nmf_tpu.fields.tensorf import MAT_MODE
        for i, (m0, m1) in enumerate(MAT_MODE):
            plane = rf.density_rf.planes[i]
            c2 = jnp.stack([coords[..., m0], coords[..., m1]], axis=-1)
            ix0, iy0, _, _ = _quad_prep(plane.shape, c2, None)
            np.testing.assert_array_equal(cells[:, m0], np.asarray(ix0))
            np.testing.assert_array_equal(cells[:, m1], np.asarray(iy0))


class TestRenderMerge:
    def _render(self, merge_runs, key=0):
        from nmf_tpu import config as config_lib
        from nmf_tpu.builders import build_nmf
        from nmf_tpu.render import render

        cfg = config_lib.compose([
            "model=tensorf", "dataset=synthetic_sphere",
            "field.N_voxel_init=4096", "field.N_voxel_final=4096",
            "field.upsamp_list=[]",
            "model.arch.max_samples_per_ray=48",
            f"model.arch.merge_runs={merge_runs}"])
        aabb = np.array([[-1.5] * 3, [1.5] * 3], np.float32)
        nmf = build_nmf(jax.random.PRNGKey(3), cfg["model"]["arch"], aabb,
                        (2.0, 6.0))
        rng = np.random.default_rng(7)
        o = np.tile([[0.0, 0.0, -4.0]], (64, 1)).astype(np.float32)
        d = rng.normal(size=(64, 3)).astype(np.float32)
        d[:, 2] = np.abs(d[:, 2]) + 2.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = jnp.asarray(np.concatenate([o, d], -1))
        ims, stats = render(nmf, rays, jax.random.PRNGKey(key),
                            is_train=True)
        return nmf, rays, ims, stats

    def test_merge_builds_and_runs(self):
        nmf, _, ims, stats = self._render(merge_runs=12)
        assert nmf.merge_runs == 12
        assert np.isfinite(np.asarray(ims["rgb_map"])).all()

    def test_acc_and_density_quadrature_unchanged(self):
        """acc_map, distortion loss, and the sample telemetry integrate the
        FULL budget — merging coarsens shading only."""
        _, _, ims0, st0 = self._render(merge_runs=0)
        _, _, ims1, st1 = self._render(merge_runs=12)
        np.testing.assert_allclose(np.asarray(ims1["acc_map"]),
                                   np.asarray(ims0["acc_map"]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(st1["distortion_loss"]),
                                   float(st0["distortion_loss"]),
                                   rtol=1e-4)
        assert int(st1["n_valid_samples"]) == int(st0["n_valid_samples"])

    def test_rgb_close_on_smooth_field(self):
        """A randomly-initialized smooth field: run-collapsed rgb within a
        loose tolerance of the exact per-sample render.

        merge_runs=32 < K=48 so the merge branch actually engages
        (render.py gates on merge_k < K); on the coarse test grid the
        per-ray run count stays well under 32, so every run keeps a slot
        and only the within-run collapse is being tested."""
        _, _, ims0, _ = self._render(merge_runs=0)
        _, _, ims1, _ = self._render(merge_runs=32)
        a = np.asarray(ims0["rgb_map"])
        b = np.asarray(ims1["rgb_map"])
        # the merge branch engaged: the collapsed render is a different
        # quadrature, not a bit-identical replay of the exact one
        assert np.abs(a - b).max() > 0
        assert np.abs(a - b).max() < 0.15
        assert np.abs(a - b).mean() < 0.02

    def test_grads_flow_through_merge(self):
        from nmf_tpu.render import render

        nmf, rays, _, _ = self._render(merge_runs=12)

        def loss(planes):
            rf = nmf.rf.replace(
                app_rf=nmf.rf.app_rf.replace(planes=planes))
            m = nmf.replace(rf=rf)
            ims, _ = render(m, rays, jax.random.PRNGKey(0), is_train=True)
            return (ims["rgb_map"] ** 2).sum()

        g = jax.grad(loss)(nmf.rf.app_rf.planes)
        total = sum(float(jnp.abs(x).sum()) for x in
                    jax.tree_util.tree_leaves(g))
        assert np.isfinite(total) and total > 0


class TestMergePrecedenceWarning:
    def test_warns_when_merge_and_two_stage_both_set(self):
        """merge_runs takes precedence over app_samples_per_ray (ADVICE r4
        low): a config setting both gets a warning at trace time instead
        of silently ignoring the two-stage knob."""
        import warnings

        from nmf_tpu import config as config_lib
        from nmf_tpu.builders import build_nmf
        from nmf_tpu.render import render

        cfg = config_lib.compose([
            "model=tensorf", "dataset=synthetic_sphere",
            "field.N_voxel_init=4096", "field.N_voxel_final=4096",
            "field.upsamp_list=[]",
            "model.arch.max_samples_per_ray=48",
            "model.arch.app_samples_per_ray=24",
            "model.arch.merge_runs=16"])
        aabb = np.array([[-1.5] * 3, [1.5] * 3], np.float32)
        nmf = build_nmf(jax.random.PRNGKey(3), cfg["model"]["arch"], aabb,
                        (2.0, 6.0))
        o = np.tile([[0.0, 0.0, -4.0]], (8, 1)).astype(np.float32)
        d = np.tile([[0.0, 0.0, 1.0]], (8, 1)).astype(np.float32)
        rays = jnp.asarray(np.concatenate([o, d], -1))
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            render(nmf, rays, jax.random.PRNGKey(0), is_train=True)
        assert any("merge_runs takes precedence" in str(w.message)
                   for w in rec), [str(w.message) for w in rec]
