"""The studio protocol scene: a WELL-POSED inverse-rendering arrangement.

The shiny/cluster scenes are intentionally adversarial (dark near-pure
specular content); studio pins the properties that make the NMF
decomposition identifiable -- bright diffuse anchors, a full roughness
spectrum, and one near-mirror ball -- so the quality-headline run rests
on a scene where quality is achievable."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

# Multi-minute e2e tests: excluded from the quick gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow

from nmf_tpu.data.synthetic import _STUDIO_SPHERES, _shiny_first_hit


class TestStudioScene:
    def test_geometry_well_formed(self):
        for i in range(len(_STUDIO_SPHERES)):
            c1, r1 = _STUDIO_SPHERES[i][0], _STUDIO_SPHERES[i][1]
            assert (np.abs(c1) + r1 <= 1.5).all()
            for j in range(i + 1, len(_STUDIO_SPHERES)):
                c2, r2 = _STUDIO_SPHERES[j][0], _STUDIO_SPHERES[j][1]
                assert np.linalg.norm(c1 - c2) > r1 + r2

    def test_roughness_spectrum_and_anchors(self):
        rough = np.array([s[4] for s in _STUDIO_SPHERES])
        albedo = np.stack([s[2] for s in _STUDIO_SPHERES])
        assert rough.min() < 0.1          # a near-mirror ball
        assert (rough >= 0.85).sum() >= 2  # >=2 diffuse anchors
        assert ((rough > 0.15) & (rough < 0.6)).sum() >= 2  # glossy middle
        # the anchors are bright (diffuse multiview consistency pins
        # geometry + the envmap's coarse scales)
        assert albedo[rough >= 0.85].max(-1).min() > 0.4

    def test_composes_and_renders(self):
        from nmf_tpu import config as config_lib
        from nmf_tpu.data.blender import load_dataset

        cfg = config_lib.compose(["dataset=synthetic_studio",
                                  "dataset.image_size=64",
                                  "dataset.n_views=4"])["dataset"]
        ds = load_dataset(cfg, "/tmp", split="train")
        alpha = ds["all_rgbs"][:, 3]
        assert 0.1 < alpha.mean() < 0.5
        # every sphere visible across the 4 views
        rays = ds["all_rays"]
        idx, _ = _shiny_first_hit(rays[:, :3], rays[:, 3:6],
                                  spheres=_STUDIO_SPHERES)
        for i in range(len(_STUDIO_SPHERES)):
            assert (idx == i).mean() > 0.005, i
        # diffuse anchors dominate enough of the foreground to anchor
        fg = idx >= 0
        diffuse_share = np.isin(idx[fg], [1, 2]).mean()
        assert diffuse_share > 0.2, diffuse_share
        # LDR clipping stays bounded on the anchors (metric headroom)
        rgb = ds["all_rgbs"][:, :3]
        anchor = np.isin(idx, [1, 2])
        clip_frac = (rgb[anchor].max(-1) > 0.995).mean()
        assert clip_frac < 0.3, clip_frac
