"""Ray/point-cloud debug logger for interactive 3D inspection.

TPU-native counterpart of the reference ``modules/logger.py`` (Logger
:8-126): collects sample positions, normals and transmittance weights for a
rendered ray batch, pickles them (the reference's ``rays.pkl`` dumped by
BundleRender, renderer.py:129-143), and can emit a plotly figure/html when
plotly is installed (it is optional here: the dump format is plain numpy so
the pickle is inspectable anywhere).

Differences from the reference: the logger consumes the padded (B, K)
sample layout directly (masked by validity) instead of ragged streams, and
is an explicit object passed to the eval path rather than a mutated global
-- though a module-level ``LOGGER`` with the reference's enable flag is
provided for drop-in parity.
"""
import pickle
from typing import Optional

import numpy as np


class RayLogger:
    """Collects per-render debug geometry. Disabled by default (zero cost)."""

    def __init__(self, enable: bool = False, max_rays: int = 512):
        self.enable = enable
        self.max_rays = max_rays
        self.reset()

    def reset(self):
        self.entries = []

    def log(self, rays, xyz, weights, valid, normals=None, rgb=None):
        """rays (B, 6); xyz (B, K, 3/4); weights/valid (B, K);
        normals/rgb optional (B, K, 3). Stores at most max_rays rays."""
        if not self.enable:
            return
        n = min(self.max_rays, np.asarray(rays).shape[0])
        ent = {
            "rays": np.asarray(rays)[:n],
            "xyz": np.asarray(xyz)[:n, :, :3],
            "weights": np.asarray(weights)[:n],
            "valid": np.asarray(valid)[:n],
        }
        if normals is not None:
            ent["normals"] = np.asarray(normals)[:n]
        if rgb is not None:
            ent["rgb"] = np.asarray(rgb)[:n]
        self.entries.append(ent)

    def save(self, path: str):
        """Pickle the collected geometry (reference rays.pkl)."""
        if not self.entries:
            return None
        with open(path, "wb") as f:
            pickle.dump(self.entries, f)
        return path

    def to_plotly(self, entry_idx: int = 0, weight_thresh: float = 1e-3):
        """Build a plotly Figure: ray lines + weighted sample cloud
        (+ normal quivers). Returns None when plotly is unavailable."""
        try:
            import plotly.graph_objects as go
        except ImportError:
            return None
        if not self.entries:
            return None
        e = self.entries[entry_idx]
        rays, xyz = e["rays"], e["xyz"]
        w = np.where(e["valid"], e["weights"], 0.0)
        traces = []
        # ray segments: origin -> farthest valid sample
        xs, ys, zs = [], [], []
        for i in range(rays.shape[0]):
            o = rays[i, :3]
            vm = e["valid"][i]
            end = xyz[i, vm.argmax() if vm.any() else 0] if vm.any() else (
                o + rays[i, 3:6])
            xs += [o[0], end[0], None]
            ys += [o[1], end[1], None]
            zs += [o[2], end[2], None]
        traces.append(go.Scatter3d(x=xs, y=ys, z=zs, mode="lines",
                                   line=dict(width=1), name="rays"))
        m = w > weight_thresh
        pts = xyz[m]
        traces.append(go.Scatter3d(
            x=pts[:, 0], y=pts[:, 1], z=pts[:, 2], mode="markers",
            marker=dict(size=2, color=w[m], colorscale="Viridis"),
            name="samples"))
        if "normals" in e:
            nm = e["normals"][m]
            qx, qy, qz = [], [], []
            for p, v in zip(pts, nm):
                q = p + 0.05 * v
                qx += [p[0], q[0], None]
                qy += [p[1], q[1], None]
                qz += [p[2], q[2], None]
            traces.append(go.Scatter3d(x=qx, y=qy, z=qz, mode="lines",
                                       line=dict(width=1, color="red"),
                                       name="normals"))
        return go.Figure(data=traces)

    def save_html(self, path: str, entry_idx: int = 0):
        fig = self.to_plotly(entry_idx)
        if fig is None:
            return None
        fig.write_html(path)
        return path


def collect_ray_debug(nmf, rays, key, max_samples_per_ray: int = -1):
    """Run the sampler + field for a ray batch and return the debug
    geometry (positions, transmittance weights, normals) the reference's
    Logger captures inside TensorNeRF.forward. Under jit a traced global
    can't be mutated, so this is an explicit side pass over a small batch.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.masked import raw2alpha

    samp = nmf.sampler.sample(rays, key=key, is_train=False,
                              max_samples_per_ray=max_samples_per_ray)
    xyz, valid = samp["xyz"], samp["valid"]
    B, K = valid.shape
    sigma = nmf.rf.compute_densityfeature(xyz.reshape(-1, 4)).reshape(B, K)
    sigma = jnp.where(valid, sigma, 0.0)
    weight, _ = raw2alpha(sigma, samp["dists"] * nmf.rf.distance_scale)
    normals = nmf.rf.compute_normals(xyz.reshape(-1, 4)).reshape(B, K, 3)
    return {"rays": rays, "xyz": xyz, "weights": weight, "valid": valid,
            "normals": normals}


# module-level instance matching the reference's global LOGGER
# (modules/tensor_nerf.py:14, enable=False)
LOGGER = RayLogger(enable=False)
