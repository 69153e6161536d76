"""Tint-metric identifiability oracle (VERDICT r4 "what's weak" #6).

Every studio protocol row reports tint_psnr in the mid-teens; unlike the
envmap (runs/env_oracle.py + tests/test_bg.py oracle) there was no oracle
separating (a) metric/alignment convention, (b) the model's OUTPUT
convention, and (c) genuine recovery failure.

The dataset's GT tint is f0 — the Fresnel reflectance at NORMAL incidence
(data/synthetic.py:render_shiny_scene stores `tints[hit] = f0`). The
model's `tint` debug map is the view-integrated BRDF color
(models/microfacet.py: `debug["tint"] = brdf_rgb * lam`), i.e. Fresnel
evaluated at the ACTUAL view angles: f0 + (1-f0)(1-cos θ)^5 under
Schlick — brighter and whiter toward grazing angles. The eval aligns the
two with a single per-channel linear regression per image
(eval.py:regression_aligned_psnr; reference renderer.py:338-348), which
cannot remove a per-pixel angular modulation. These tests measure the
ceiling that convention gap imposes on a PERFECT reconstruction, so the
protocol rows' ~14-16 dB can be read against it.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nmf_tpu.eval import regression_aligned_psnr


def _studio_views(image_size=64, n_views=6):
    from nmf_tpu import config as config_lib
    from nmf_tpu.data.blender import load_dataset

    cfg = config_lib.compose(["dataset=synthetic_studio",
                              "dataset.hemisphere=true",
                              f"dataset.image_size={image_size}",
                              f"dataset.n_views={n_views}"])["dataset"]
    ds = load_dataset(cfg, "/tmp", split="test")
    n_px = image_size * image_size
    return ds, n_px


def _per_view_psnr(pred, gt, n_px):
    """Mean per-image regression-aligned PSNR, exactly like the eval loop
    (eval.py: per-image slices of all_tints)."""
    out = []
    for i in range(pred.shape[0] // n_px):
        out.append(regression_aligned_psnr(
            pred[i * n_px:(i + 1) * n_px], gt[i * n_px:(i + 1) * n_px]))
    return float(np.mean(out))


class TestTintOracle:
    def test_metric_identity_clean(self):
        """A pixel-perfect tint map scores near-losslessly: the metric,
        slicing, and alignment have no convention bug of their own."""
        ds, n_px = _studio_views()
        gt = np.asarray(ds["all_tints"])
        assert _per_view_psnr(gt, gt, n_px) > 60

    def test_fresnel_convention_ceiling(self):
        """A PERFECT physically-based reconstruction reported in the
        model's own convention — Fresnel at the actual view angle instead
        of f0 — still scores ~33 dB (measured at 64 and 128 px; the
        lam-modulated variant ~40 dB). The per-pixel Schlick modulation
        (1-cos θ)^5 is not in the span of the global per-channel linear
        alignment, so the convention does cost tens of dB off a clean
        metric — but the ceiling sits FAR above the ~14-16 dB protocol
        rows.

        Verdict for BASELINE.md: the mid-teens tint_psnr is dominated by
        genuine tint recovery error (soft edges, lam/albedo entanglement,
        residual color error), NOT by the f0-vs-view-angle metric
        convention."""
        ds, n_px = _studio_views()
        gt = np.asarray(ds["all_tints"])
        rays = np.asarray(ds["all_rays"])          # (N, 6) o+d
        normals = np.asarray(ds["all_norms"])[..., :3]
        v = -rays[:, 3:6]
        v /= np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-8)
        fg = np.linalg.norm(normals, axis=-1) > 0.5
        cos = np.clip((normals * v).sum(-1), 0.0, 1.0)
        pred = np.zeros_like(gt)
        f = (1.0 - cos[fg]) ** 5
        pred[fg] = gt[fg] + (1.0 - gt[fg]) * f[:, None]

        ceiling = _per_view_psnr(pred, gt, n_px)
        identity = _per_view_psnr(gt, gt, n_px)
        # the convention alone must cost tens of dB off a clean metric...
        assert ceiling < identity - 30
        # ...but still sit clearly ABOVE the ~14-16 dB protocol rows:
        # the measured rows are convention ceiling minus model error.
        assert 15.0 < ceiling < 45.0
