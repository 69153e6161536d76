"""Dense 3D voxel radiance field.

TPU-native equivalent of the reference ``fields/grid.py`` (Grid :10-124;
note the reference module carries stale imports and is import-broken as-is,
SURVEY.md 2.4 -- this is the working re-design): plain (C, D, H, W) density
and appearance volumes queried with trilinear interpolation, the simplest
field in the family and a useful oracle against the factorized ones.
"""
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import safemath
from ..ops.grid_sample import grid_sample_3d


@struct.dataclass
class GridRF:
    density_grid: Any  # (1, D, H, W)
    app_grid: Any      # (C_app, D, H, W)
    aabb: Any

    app_dim: int = struct.field(pytree_node=False, default=24)
    activation: str = struct.field(pytree_node=False, default="softplus")
    density_shift: float = struct.field(pytree_node=False, default=-4.0)
    distance_scale: float = struct.field(pytree_node=False, default=25.0)
    contract_space: bool = struct.field(pytree_node=False, default=False)
    step_ratio: float = struct.field(pytree_node=False, default=0.5)
    numer_grad: bool = struct.field(pytree_node=False, default=False)
    grid_size: Tuple[int, int, int] = struct.field(
        pytree_node=False, default=(128, 128, 128))
    lr: float = struct.field(pytree_node=False, default=0.02)
    lr_net: float = struct.field(pytree_node=False, default=1e-3)
    separate_appgrid: bool = struct.field(pytree_node=False, default=False)

    @property
    def fused_normals_ok(self) -> bool:
        return True

    @property
    def aabb_size(self):
        return self.aabb[1] - self.aabb[0]

    @property
    def stepsize(self) -> float:
        units = np.asarray(self.aabb[1] - self.aabb[0], np.float64) / (
            np.asarray(self.grid_size, np.float64) - 1)
        return float(units.min() * self.step_ratio)

    @property
    def n_samples(self) -> int:
        diag = float(np.linalg.norm(np.asarray(self.aabb[1] - self.aabb[0])))
        return int(diag / self.stepsize) + 1

    def normalize_coord(self, xyz):
        coords = (xyz[..., :3] - self.aabb[0]) * (2.0 / self.aabb_size) - 1
        return jnp.concatenate([coords, xyz[..., 3:]], axis=-1)

    def feature2density(self, feat):
        if self.activation == "softplus":
            return jax.nn.softplus(jnp.clip(feat, -15, 1e3)
                                   + self.density_shift)
        if self.activation == "exp":
            return safemath.trunc_exp(feat + self.density_shift)
        return jax.nn.relu(feat + self.density_shift)

    def _coords3(self, xyz):
        # grid_sample_3d convention: (x, y, z) with x indexing W
        return self.normalize_coord(xyz)[..., :3]

    def compute_densityfeature(self, xyz, activate=True):
        sig = grid_sample_3d(self.density_grid, self._coords3(xyz))[..., 0]
        return self.feature2density(sig) if activate else sig

    def compute_appfeature(self, xyz):
        return grid_sample_3d(self.app_grid, self._coords3(xyz))

    def compute_feature(self, xyz):
        return self.compute_densityfeature(xyz), self.compute_appfeature(xyz)

    def compute_all(self, xyz, with_normals=False):
        # one stacked gather serves density + appearance at shared coords
        stacked = jnp.concatenate([self.density_grid, self.app_grid], axis=0)
        feats = grid_sample_3d(stacked, self._coords3(xyz))
        sigma = self.feature2density(feats[..., 0])
        app = feats[..., 1:1 + self.app_dim]
        normals = self.compute_normals(xyz) if with_normals else None
        return sigma, app, normals

    def compute_normals(self, xyz):
        def sig_fn(pts3):
            c = (pts3 - self.aabb[0]) * (2.0 / self.aabb_size) - 1
            return grid_sample_3d(self.density_grid, c)[..., 0].sum()

        g = jax.grad(sig_fn)(xyz[..., :3])
        return safemath.normalize(-g)

    def check_schedule(self, iteration, batch_mul=1):
        return self, False

    def upsample(self, res_target):
        """Trilinear align-corners resize of both volumes."""
        def resize(vol, tgt):
            C = vol.shape[0]
            lin = [jnp.linspace(-1.0, 1.0, int(t)) for t in tgt]
            gz, gy, gx = jnp.meshgrid(*lin, indexing="ij")
            coords = jnp.stack([gx, gy, gz], axis=-1)
            return jnp.moveaxis(grid_sample_3d(vol, coords), -1, 0)

        return self.replace(
            density_grid=resize(self.density_grid, res_target),
            app_grid=resize(self.app_grid, res_target),
            grid_size=tuple(int(t) for t in res_target))

    def density_L1(self):
        return jnp.abs(self.density_grid).mean()

    def _tv3(self, vol):
        d = jnp.abs(vol[:, 1:] - vol[:, :-1]).mean()
        h = jnp.abs(vol[:, :, 1:] - vol[:, :, :-1]).mean()
        w = jnp.abs(vol[..., 1:] - vol[..., :-1]).mean()
        return d + h + w

    def tv_loss_density(self):
        return self._tv3(self.density_grid)

    def tv_loss_app(self):
        return self._tv3(self.app_grid)

    def vector_comp_diffs(self):
        return jnp.zeros(())


def init_grid_rf(key, aabb, grid_size=(128, 128, 128), app_dim=24,
                 init_scale=0.1, **kwargs):
    k1, k2 = jax.random.split(key)
    gs = tuple(int(g) for g in grid_size)
    density = init_scale * jax.random.uniform(k1, (1, gs[2], gs[1], gs[0]))
    app = init_scale * jax.random.uniform(
        k2, (app_dim, gs[2], gs[1], gs[0]))
    statics = {k: v for k, v in kwargs.items()
               if k in GridRF.__dataclass_fields__
               and k not in ("density_grid", "app_grid", "aabb")}
    return GridRF(density_grid=density, app_grid=app,
                  aabb=jnp.asarray(aabb, jnp.float32), app_dim=app_dim,
                  grid_size=gs, **statics)
