"""Protocol-scene GT physical consistency (interreflection correction).

The analytic base GT treats the env as unoccluded; a physically based
renderer sees neighbors in reflections. These oracles pin the MC
correction's sign, locality, and convergence."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

# Multi-minute e2e tests: excluded from the quick gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow

from nmf_tpu.data.synthetic import (_SHINY_SPHERES, _ShinyEnv, _sphere_hit,
                                    _shiny_first_hit, render_shiny_scene)


def _view_rays(H=64, W=64, radius=3.2, theta=30.0, phi=-25.0):
    from nmf_tpu.data.ray_utils import (get_ray_directions_blender, get_rays,
                                        pose_spherical)

    focal = 0.5 * W / np.tan(0.5 * np.deg2rad(55.0))
    dirs = get_ray_directions_blender(H, W, [focal, focal])
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    return get_rays(dirs, pose_spherical(theta, phi, radius))


class TestInterreflection:
    def setup_method(self):
        self.env = _ShinyEnv()
        self.o, self.d = _view_rays()

    def test_correction_localized_to_blocked_pixels(self):
        """Pixels whose mirror ray misses every neighbor must be (nearly)
        unchanged; changed pixels must be foreground."""
        base, alpha, _, _ = render_shiny_scene(self.o, self.d, self.env,
                                               interreflect=False)
        rng = np.random.default_rng(3)
        corr, _, _, _ = render_shiny_scene(self.o, self.d, self.env,
                                           interreflect=True, rng=rng,
                                           n_gi_samples=32)
        diff = np.abs(corr - base).max(-1)
        fg = alpha > 0
        assert diff[~fg].max() == 0.0  # background untouched
        # mirror-blocked pixels: where does the specular ray hit a neighbor
        idx, t = _shiny_first_hit(self.o, self.d)
        m = fg.copy()
        p = self.o[m] + t[m][:, None] * self.d[m]
        centers = np.stack([s[0] for s in _SHINY_SPHERES])
        radii = np.asarray([s[1] for s in _SHINY_SPHERES])
        n = (p - centers[idx[m]]) / radii[idx[m]][:, None]
        cos = np.clip((n * -self.d[m]).sum(-1), 0, 1)[:, None]
        refl = self.d[m] + 2 * cos * n
        hi, _ = _shiny_first_hit(p + 1e-4 * refl, refl, exclude=idx[m])
        blocked = hi >= 0
        assert blocked.any()
        # the strongly changed pixels should be dominated by blocked ones
        changed = diff[m] > 0.05
        if changed.any():
            assert blocked[changed].mean() > 0.5
        # and the mean |delta| on blocked pixels far exceeds unblocked ones
        assert diff[m][blocked].mean() > 4 * diff[m][~blocked].mean()

    def test_mc_converges(self):
        """Two independent sample sets agree (noise << signal)."""
        r1, _, _, _ = render_shiny_scene(
            self.o, self.d, self.env, interreflect=True,
            rng=np.random.default_rng(1), n_gi_samples=64)
        r2, _, _, _ = render_shiny_scene(
            self.o, self.d, self.env, interreflect=True,
            rng=np.random.default_rng(2), n_gi_samples=64)
        base, _, _, _ = render_shiny_scene(self.o, self.d, self.env,
                                           interreflect=False)
        noise = np.abs(r1 - r2).mean()
        signal = np.abs((r1 + r2) / 2 - base).mean()
        assert noise < 0.35 * signal, (noise, signal)

    def test_far_spheres_zero_correction(self):
        """Widely separated spheres -> no occlusion -> corrected == base."""
        import nmf_tpu.data.synthetic as syn

        saved = syn._SHINY_SPHERES
        try:
            syn._SHINY_SPHERES = [
                (np.array([-50.0, 0.0, 0.0]), 0.4, np.array([0.2, 0.1, 0.1]),
                 np.array([0.9, 0.7, 0.3]), 0.1),
                (np.array([50.0, 0.0, 0.0]), 0.4, np.array([0.1, 0.1, 0.3]),
                 np.array([0.04, 0.04, 0.04]), 0.4),
            ]
            o, d = _view_rays(radius=60.0)
            base, _, _, _ = render_shiny_scene(o, d, self.env,
                                               interreflect=False)
            corr, _, _, _ = render_shiny_scene(
                o, d, self.env, interreflect=True,
                rng=np.random.default_rng(0), n_gi_samples=16)
            np.testing.assert_allclose(corr, base, atol=1e-6)
        finally:
            syn._SHINY_SPHERES = saved

    def test_cluster_scene(self):
        """The cluster scene composes through the config surface, keeps all
        four spheres in frame, and its mirror ball sees strong
        interreflections (the point of the scene)."""
        from nmf_tpu import config as config_lib
        from nmf_tpu.data.blender import load_dataset
        from nmf_tpu.data.synthetic import _CLUSTER_SPHERES

        cfg = config_lib.compose(["dataset=synthetic_cluster",
                                  "dataset.image_size=48",
                                  "dataset.n_views=4"])["dataset"]
        ds = load_dataset(cfg, "/tmp", split="train")
        alpha = ds["all_rgbs"][:, 3]
        assert 0.1 < alpha.mean() < 0.8
        # interreflection correction fires much more than on the shiny scene
        cfg_off = dict(cfg, interreflect=False)
        ds_off = load_dataset(cfg_off, "/tmp", split="train")
        changed = (np.abs(ds["all_rgbs"][:, :3]
                          - ds_off["all_rgbs"][:, :3]).max(-1) > 0.02)
        assert changed.mean() > 0.02, changed.mean()
        assert len(_CLUSTER_SPHERES) == 4

    def test_dataset_flag_plumbed(self):
        from nmf_tpu.data.blender import load_dataset

        cfg = {"dataset_name": "synthetic_shiny", "image_size": 24,
               "n_views": 2, "scenedir": "shiny", "hemisphere": True,
               "interreflect": True, "n_gi_samples": 8}
        ds = load_dataset(cfg, "/tmp", split="train")
        cfg2 = dict(cfg, interreflect=False)
        ds2 = load_dataset(cfg2, "/tmp", split="train")
        assert not np.allclose(ds["all_rgbs"], ds2["all_rgbs"])
        # rays/alpha/normals identical -- only radiance changes
        np.testing.assert_allclose(ds["all_rays"], ds2["all_rays"])
        np.testing.assert_allclose(ds["all_rgbs"][:, 3], ds2["all_rgbs"][:, 3])
        np.testing.assert_allclose(ds["all_norms"], ds2["all_norms"])


class TestDatasetCache:
    def test_roundtrip_and_key_separation(self, tmp_path, monkeypatch):
        """The npz memo returns the exact dataset and distinct params miss."""
        from nmf_tpu.data.synthetic import make_shiny_dataset

        monkeypatch.setenv("NMF_DATASET_CACHE", str(tmp_path))
        kw = dict(n_views=2, H=16, W=16, hemisphere=True, interreflect=True,
                  n_gi_samples=4)
        a = make_shiny_dataset(**kw)
        files = list(tmp_path.glob("*.npz"))
        assert len(files) == 1, files
        b = make_shiny_dataset(**kw)  # cache hit
        for k in ("all_rays", "all_rgbs", "all_norms", "all_tints",
                  "poses", "scene_bbox", "gt_bg_im"):
            np.testing.assert_array_equal(a[k], b[k])
        assert a["img_wh"] == b["img_wh"] and a["near_far"] == b["near_far"]
        assert a["white_bg"] == b["white_bg"]
        assert isinstance(b["focal"], float)
        # different split/params produce new entries, not collisions
        make_shiny_dataset(split="test", **kw)
        make_shiny_dataset(**{**kw, "n_gi_samples": 8})
        assert len(list(tmp_path.glob("*.npz"))) == 3

    def test_disabled_by_empty_env(self, monkeypatch):
        from nmf_tpu.data import synthetic

        monkeypatch.setenv("NMF_DATASET_CACHE", "")
        # the opt-out must short-circuit cache-dir resolution entirely
        assert synthetic._cache_dir() is None
        default_dir = (Path(synthetic.__file__).parents[2]
                       / "runs" / ".dataset_cache")
        before = set(default_dir.glob("*.npz")) if default_dir.exists() else set()
        synthetic.make_shiny_dataset(n_views=1, H=8, W=8, interreflect=False)
        after = set(default_dir.glob("*.npz")) if default_dir.exists() else set()
        assert after == before  # nothing written to the default location
