"""Occupancy-grid sampler with EMA density updates (instant-ngp style).

TPU-native re-design of reference ``samplers/continuous_alphagrid.py`` and
``samplers/raymarch.py`` / ``samplers/nerf_acc.py`` (which wrap CUDA kernels
``march_rays_train`` / nerfacc). The Morton-coded bitfield of the CUDA path
(raymarching.cu:56-90, 268-306) is a GPU memory-op optimization with no TPU
benefit -- a plain dense (G, G, G) occupancy array indexed by (x, y, z) is
the natural layout here, and `packbits` becomes a simple threshold.

Per-step sampling is identical machinery to the alpha-grid sampler (static
padded (B, N) steps + mask + top-K compaction) with two differences matching
ContinuousAlphagrid:
- validity comes from a nearest-neighbor occupancy lookup;
- the per-sample footprint channel uses the conical-frustum Gaussian radius
  (mip-NeRF; samplers/util.py:18-73) instead of z/focal alone.
"""
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.masked import compact_topk, gather_rows


def conical_frustum_radius(z0, z1, base_radius):
    """Mean-projected Gaussian radius of a conical frustum segment
    (mip-NeRF eq. 7, reference samplers/util.py:18-73). Returns r at the
    frustum, already scaled by base_radius."""
    mu = (z0 + z1) / 2
    hw = (z1 - z0) / 2
    denom = jnp.clip(3 * mu ** 2 + hw ** 2, 1e-10)
    r_var = base_radius ** 2 * (
        (mu ** 2) / 4 + (5 / 12) * hw ** 2 - (4 / 15) * hw ** 4 / denom)
    return jnp.sqrt(jnp.clip(r_var, 1e-12))


@struct.dataclass
class OccGridSampler:
    density_grid: Any  # (G, G, G) EMA density estimate
    aabb: Any          # (2, 3)

    grid_reso: int = struct.field(pytree_node=False, default=128)
    near_far: Tuple[float, float] = struct.field(
        pytree_node=False, default=(2.0, 6.0))
    update_freq: int = struct.field(pytree_node=False, default=16)
    ema_decay: float = struct.field(pytree_node=False, default=0.95)
    density_thresh: float = struct.field(pytree_node=False, default=0.01)
    max_samples: int = struct.field(pytree_node=False, default=200000)
    multiplier: int = struct.field(pytree_node=False, default=1)
    stepsize: float = struct.field(pytree_node=False, default=0.01)

    @property
    def live_stepsize(self):
        """Uniform samplers have no fixed-shape mode; alias for the
        render-layer interface shared with AlphaGridSampler."""
        return self.stepsize
    n_samples: int = struct.field(pytree_node=False, default=440)
    shrink_iters: Tuple[int, ...] = struct.field(pytree_node=False,
                                                 default=())
    cumrand: bool = struct.field(pytree_node=False, default=False)
    # finer march at eval time (reference nerf_acc.py:160 stepmul)
    test_multiplier: float = struct.field(pytree_node=False, default=1.0)

    # ------------------------------------------------------------------
    def update(self, rf, init: bool = False):
        new = self.replace(
            aabb=jnp.array(rf.aabb),
            n_samples=rf.n_samples * self.multiplier,
            stepsize=rf.stepsize / self.multiplier,
        )
        if init and new.density_grid.shape[0] != new.grid_reso:
            new = new.replace(density_grid=jnp.zeros(
                (new.grid_reso,) * 3, jnp.float32))
        return new.update_density(rf)

    def check_schedule(self, iteration: int, batch_mul: int, rf):
        if iteration % (self.update_freq * batch_mul) == 0 and iteration > 0:
            return self.update_density(rf), False
        return self, False

    def update_density(self, rf):
        """EMA density update (continuous_alphagrid.py:485-557; the
        reference's occupied-cell resampling is unnecessary on TPU -- the
        sweep is one jit, slabbed along x to bound gather intermediates)."""
        G = self.density_grid.shape[0]
        lin = (jnp.arange(G) + 0.5) / G
        gx, gy, gz = jnp.meshgrid(lin, lin, lin, indexing="ij")
        unit = jnp.stack([gx, gy, gz], -1)
        xyz = self.aabb[0] * (1 - unit) + self.aabb[1] * unit
        # x-slab sweep: one-shot queries of big grids OOM (alphagrid.py
        # compute_dense_alpha note)
        sigma = jax.lax.map(
            lambda pts: rf.compute_densityfeature(pts.reshape(-1, 3)),
            xyz).reshape((G,) * 3)
        new_grid = jnp.maximum(self.density_grid * self.ema_decay, sigma)
        return self.replace(density_grid=new_grid)

    def occupancy(self):
        thresh = jnp.minimum(self.density_grid.mean(), self.density_thresh)
        return self.density_grid > thresh

    def get_bounds(self):
        """AABB of occupied cells, padded by one cell (reference
        ContinuousAlphagrid.get_bounds, continuous_alphagrid.py:457-473;
        the randomize-within-cell there is a one-cell margin here).
        Host-side numpy: runs only at shrink_iters schedule events."""
        G = self.density_grid.shape[0]
        occ = np.asarray(self.occupancy())
        aabb = np.asarray(self.aabb)
        if not occ.any():
            return aabb
        idx = np.stack(np.nonzero(occ), -1)  # (M, 3) cell coords
        cell = (aabb[1] - aabb[0]) / G
        lo = aabb[0] + (idx.min(0)) * cell - 0.5 * cell
        hi = aabb[0] + (idx.max(0) + 1) * cell + 0.5 * cell
        return np.stack([np.maximum(lo, aabb[0]), np.minimum(hi, aabb[1])])

    def occupied_at(self, xyz):
        """Nearest-cell occupancy lookup for world points (..., 3)."""
        G = self.density_grid.shape[0]
        unit = (xyz - self.aabb[0]) / (self.aabb[1] - self.aabb[0])
        idx = jnp.clip((unit * G).astype(jnp.int32), 0, G - 1)
        occ = self.occupancy()
        return occ[idx[..., 0], idx[..., 1], idx[..., 2]]

    # ------------------------------------------------------------------
    def sample_ndc(self, rays, key=None, is_train=False, n_samples: int = -1,
                   max_samples_per_ray: int = -1, focal: float = 1.0):
        """NDC sampling: linear z steps in [near, far] with occupancy cull
        (reference ContinuousAlphagrid.sample_ray_ndc,
        continuous_alphagrid.py:138-155; that path only bbox-masks, the
        occupancy test here is a strict superset cull)."""
        N = n_samples if n_samples > 0 else self.n_samples
        near, far = self.near_far
        rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
        B = rays.shape[0]
        z_vals = jnp.linspace(near, far, N)[None].repeat(B, 0)
        if is_train and key is not None:
            z_vals = z_vals + jax.random.uniform(key, (B, N)) * (
                (far - near) / N)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        in_bbox = jnp.all((pts >= self.aabb[0]) & (pts <= self.aabb[1]),
                          axis=-1)
        valid = in_bbox & self.occupied_at(pts)
        norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        dists = jnp.concatenate(
            [z_vals[:, 1:] - z_vals[:, :-1], jnp.zeros((B, 1))], -1) * norm
        size = z_vals[..., None] / focal
        xyz = jnp.concatenate([pts, size], axis=-1)
        K = max_samples_per_ray
        if K > 0 and K < N:
            packed = jnp.concatenate(
                [xyz, z_vals[..., None], dists[..., None],
                 valid[..., None].astype(jnp.float32)], axis=-1)
            idx, keep = compact_topk(valid, K)
            packed = gather_rows(packed, idx)
            xyz = packed[..., 0:4]
            z_vals = packed[..., 4]
            dists = packed[..., 5]
            valid = (packed[..., 6] > 0.5) & keep
        return {"xyz": xyz, "z_vals": z_vals, "dists": dists, "valid": valid}

    def sample(self, rays, key=None, is_train=False, override_near=None,
               stepmul: float = 1.0, n_samples: int = -1,
               max_samples_per_ray: int = -1, focal: float = 1.0,
               ndc_ray: bool = False):
        if not is_train:
            stepmul *= self.test_multiplier
        if ndc_ray:
            return self.sample_ndc(rays, key=key, is_train=is_train,
                                   n_samples=n_samples,
                                   max_samples_per_ray=max_samples_per_ray,
                                   focal=focal)
        N = int((n_samples if n_samples > 0 else self.n_samples) * stepmul)
        near, far = self.near_far
        if override_near is not None:
            near = override_near
        rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
        B = rays.shape[0]

        vec = jnp.where(rays_d == 0, 1e-6, rays_d)
        rate_a = (self.aabb[1] - rays_o) / vec
        rate_b = (self.aabb[0] - rays_o) / vec
        t_min = jnp.clip(jnp.minimum(rate_a, rate_b).max(-1), near, far)

        stepsize = self.stepsize / stepmul
        if is_train and key is not None:
            r = jax.random.uniform(key, (B, N))
            step = stepsize * (jnp.arange(N, dtype=jnp.float32)[None] + r)
        else:
            step = stepsize * jnp.arange(N, dtype=jnp.float32)[None].repeat(
                B, 0)
        z_vals = t_min[:, None] + step
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        in_bbox = jnp.all((pts >= self.aabb[0]) & (pts <= self.aabb[1]),
                          axis=-1)
        valid = in_bbox & self.occupied_at(pts)

        # conical-frustum footprint (continuous_alphagrid.py:206-223)
        base_radius = 1.0 / focal / math.sqrt(3.0)
        z0 = z_vals
        z1 = z_vals + stepsize
        size = conical_frustum_radius(z0, z1, base_radius)[..., None]
        xyz = jnp.concatenate([pts, size], axis=-1)
        dists = jnp.concatenate(
            [z_vals[:, 1:] - z_vals[:, :-1], jnp.zeros((B, 1))], axis=-1)

        K = max_samples_per_ray
        if K > 0 and K < N:
            # one packed 7-channel row gather (TPU gathers are per-row
            # latency-bound; see samplers/alphagrid.py)
            packed = jnp.concatenate(
                [xyz, z_vals[..., None], dists[..., None],
                 valid[..., None].astype(jnp.float32)], axis=-1)
            idx, keep = compact_topk(valid, K)
            packed = gather_rows(packed, idx)
            xyz = packed[..., 0:4]
            z_vals = packed[..., 4]
            dists = packed[..., 5]
            valid = (packed[..., 6] > 0.5) & keep
        return {"xyz": xyz, "z_vals": z_vals, "dists": dists, "valid": valid}

    def mark_untrained_grid(self, poses, intrinsic, img_wh):
        """Zero out cells never seen by any training camera
        (continuous_alphagrid.py:359-425). poses: (P, 3/4, 4) c2w."""
        G = self.density_grid.shape[0]
        lin = (np.arange(G) + 0.5) / G
        gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
        unit = np.stack([gx, gy, gz], -1).reshape(-1, 3)
        aabb = np.asarray(self.aabb)
        xyz = aabb[0] * (1 - unit) + aabb[1] * unit  # (M, 3)
        fx, fy = intrinsic[0][0], intrinsic[1][1]
        W, H = img_wh
        seen = np.zeros(xyz.shape[0], bool)
        for pose in np.asarray(poses):
            R, t = pose[:3, :3], pose[:3, 3]
            cam = (xyz - t) @ R  # world->cam (OpenCV: +z forward)
            z = cam[:, 2]
            with np.errstate(divide="ignore", invalid="ignore"):
                u = cam[:, 0] / z * fx + W / 2
                v = cam[:, 1] / z * fy + H / 2
            vis = (z > 0) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
            seen |= vis
        mask = jnp.asarray(seen.reshape((G,) * 3), jnp.float32)
        return self.replace(
            density_grid=jnp.where(mask > 0, self.density_grid, -1.0))


def init_occgrid(rf, grid_reso=128, **kwargs):
    s = OccGridSampler(
        density_grid=jnp.zeros((grid_reso,) * 3, jnp.float32),
        aabb=jnp.array(rf.aabb), grid_reso=grid_reso, **kwargs)
    return s.update(rf, init=True)
