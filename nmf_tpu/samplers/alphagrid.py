"""Uniform-stepping ray sampler with dense alpha-mask culling.

TPU-native re-design of the reference ``samplers/alphagrid.py`` (AlphaGridMask
:6-60, AlphaGridSampler :63-370). Differences forced by XLA:

- Output is a fully padded, static-shape ``(B, N)`` grid of samples with a
  validity mask, optionally compacted to the first K valid samples per ray via
  a stable-sort gather (``ops.masked.compact_topk``). The reference instead
  boolean-indexes to a ragged (M, 4) stream and clamps a global cumsum budget
  (alphagrid.py:353-367); the per-ray K cap plays that role here with static
  shapes.
- The dense alpha-volume rebuild (updateAlphaMask, :249-276) evaluates the
  field over the whole grid in one batched call -- no python chunk loop; on
  TPU a 200^3 batch is a single large gather+matmul workload.
"""
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.grid_sample import grid_sample_3d, max_pool_3d
from ..ops.masked import compact_topk, gather_rows


@struct.dataclass
class AlphaGridMask:
    """Dense binarized alpha volume lookup (reference AlphaGridMask)."""
    aabb: Any          # (2, 3)
    alpha_volume: Any  # (D, H, W) float {0,1}; indexed [z, y, x]
    # alpha_volume dilated by an extra maxpool so ONE lookup at a superstep
    # midpoint conservatively covers the superstep's whole ray extent
    # (two-level march; None when superstepping is off)
    coarse_volume: Any = None

    def sample_alpha(self, xyz, nearest=True):
        """xyz: (..., 3/4) world -> alpha (...).

        nearest=True uses a single-gather nearest-cell lookup: the volume is
        binary and already dilated by the 3x3x3 maxpool (alphagrid.py:256),
        so nearest matches the trilinear > 0 test to within one texel at an
        eighth of the gather cost."""
        if nearest:
            D, H, W = self.alpha_volume.shape
            unit = (xyz[..., :3] - self.aabb[0]) / (
                self.aabb[1] - self.aabb[0])
            # align_corners grid: cell centers at i/(S-1)
            iz = jnp.clip(jnp.round(unit[..., 2] * (D - 1)).astype(jnp.int32),
                          0, D - 1)
            iy = jnp.clip(jnp.round(unit[..., 1] * (H - 1)).astype(jnp.int32),
                          0, H - 1)
            ix = jnp.clip(jnp.round(unit[..., 0] * (W - 1)).astype(jnp.int32),
                          0, W - 1)
            return self.alpha_volume[iz, iy, ix]
        coords = (xyz[..., :3] - self.aabb[0]) * (
            2.0 / (self.aabb[1] - self.aabb[0])) - 1
        return grid_sample_3d(self.alpha_volume[None], coords)[..., 0]

    def sample_coarse(self, xyz):
        """Nearest-cell lookup of the extra-dilated coarse volume."""
        vol = (self.coarse_volume if self.coarse_volume is not None
               else self.alpha_volume)
        D, H, W = vol.shape
        unit = (xyz[..., :3] - self.aabb[0]) / (self.aabb[1] - self.aabb[0])
        unit = jnp.clip(unit, 0.0, 1.0)
        iz = jnp.round(unit[..., 2] * (D - 1)).astype(jnp.int32)
        iy = jnp.round(unit[..., 1] * (H - 1)).astype(jnp.int32)
        ix = jnp.round(unit[..., 0] * (W - 1)).astype(jnp.int32)
        return vol[iz, iy, ix]


@struct.dataclass
class AlphaGridSampler:
    """Stateless-config sampler; alpha mask is the only array state."""
    alpha_mask: Optional[AlphaGridMask]
    aabb: Any  # (2, 3)

    near_far: Tuple[float, float] = struct.field(
        pytree_node=False, default=(2.0, 6.0))
    enable_alpha_mask: bool = struct.field(pytree_node=False, default=True)
    update_list: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    max_samples: int = struct.field(pytree_node=False, default=200000)
    alpha_mask_thres: float = struct.field(pytree_node=False, default=0.001)
    multiplier: int = struct.field(pytree_node=False, default=1)
    # geometry copied from the field at update() time
    stepsize: float = struct.field(pytree_node=False, default=0.01)
    n_samples: int = struct.field(pytree_node=False, default=440)
    single_jitter: bool = struct.field(pytree_node=False, default=False)
    cumrand: bool = struct.field(pytree_node=False, default=True)
    grid_size: Tuple[int, int, int] = struct.field(
        pytree_node=False, default=(200, 200, 200))
    # two-level march: test ONE extra-dilated alpha lookup per superstep of
    # this many fine steps, compact supersteps, then expand. Cuts the alpha
    # gather (the sampler's dominant cost: ~10.5 ns per gathered row no
    # matter how narrow) by ~superstep x. 0/1 disables.
    superstep: int = struct.field(pytree_node=False, default=4)
    # apply the fine-resolution alpha test to the expanded samples (exact
    # reference culling parity); off leaves validity to the coarse test and
    # saves one (B*K)-row gather
    fine_alpha_test: bool = struct.field(pytree_node=False, default=True)
    # fixed-shape fields (rf.fixed_shape): ``stepsize``/``n_samples`` are
    # pinned to the FINAL schedule resolution and this traced leaf scales
    # the march step to the field's live resolution, so upsample events
    # never change the jitted step signature. None = 1.0 (exact-shape rf).
    step_scale: Any = None

    @property
    def live_stepsize(self):
        """stepsize at the field's live resolution (traced when fixed)."""
        if self.step_scale is None:
            return self.stepsize
        return self.stepsize * self.step_scale

    # ------------------------------------------------------------------
    def update(self, rf, init: bool = False):
        """Adopt field geometry; on non-init also rebuild the alpha mask
        (reference AlphaGridSampler.update, alphagrid.py:96-111)."""
        fixed = bool(getattr(rf, "fixed_shape", False))
        new = self.replace(
            # copy so the sampler never aliases the field's buffer (jit
            # donation requires distinct buffers per pytree leaf)
            aabb=jnp.array(rf.aabb),
            n_samples=rf.n_samples * self.multiplier,
            stepsize=rf.stepsize / self.multiplier,
            step_scale=(jnp.asarray(rf.live_step_scale(), jnp.float32)
                        if fixed else None),
        )
        if not init:
            new, _ = new.update_alpha_mask(rf)
        elif new.alpha_mask is None:
            # keep the pytree structure stable from step 0 (an optimizer
            # label tree is built once over the model): start with an
            # everything-occupied mask instead of None
            # distinct buffers per leaf (jit donation forbids aliasing)
            # fixed-shape fields pin the mask to the final grid resolution
            # so rebuild events never change leaf shapes
            init_gs = tuple(rf.grid_size) if fixed else (32, 32, 32)
            new = new.replace(alpha_mask=AlphaGridMask(
                aabb=jnp.array(rf.aabb),
                alpha_volume=jnp.ones(init_gs[::-1], jnp.float32),
                coarse_volume=(jnp.ones(init_gs[::-1], jnp.float32)
                               if new.superstep > 1 else None)))
        return new

    def _coarse_dilate_radius(self, gs) -> int:
        """Cells of extra dilation so one lookup at a superstep midpoint
        covers the superstep's ray extent: half-extent is up to
        0.75 * superstep * stepsize (cumrand jitter draws steps up to
        1.5 * stepsize), plus half a cell of nearest-rounding error."""
        extent = np.asarray(self.aabb[1] - self.aabb[0], np.float64)
        unit_min = float((extent / (np.asarray(gs, np.float64) - 1)).min())
        scale = 1.0 if self.step_scale is None else float(self.step_scale)
        return int(np.ceil(0.75 * self.superstep * self.stepsize * scale
                           / unit_min + 0.5))

    def check_schedule(self, iteration: int, batch_mul: int, rf):
        if iteration in [i * batch_mul for i in self.update_list]:
            # the alpha volume changes shape with the field grid, so
            # optimizer state must be rebuilt (in shipped configs these
            # events coincide with voxel upsampling anyway)
            return self.update(rf), True
        return self, False

    # ------------------------------------------------------------------
    def compute_dense_alpha(self, rf, grid_size=None):
        """Alpha of every cell of a dense grid.

        Swept as a lax.map over x-slabs: a single batched query of a 300^3
        upsampled grid is 27M points whose (M, C) gather intermediates
        exhaust HBM (observed RESOURCE_EXHAUSTED on v5e); per-slab the
        working set stays a few MB while the whole sweep remains one jit.
        """
        gs = grid_size or self.grid_size
        lin = [jnp.linspace(0.0, 1.0, g) for g in gs]
        gx, gy, gz = jnp.meshgrid(*lin, indexing="ij")
        samples = jnp.stack([gx, gy, gz], axis=-1)
        xyz = self.aabb[0] * (1 - samples) + self.aabb[1] * samples  # (X,Y,Z,3)

        def slab(pts):
            return rf.compute_densityfeature(pts.reshape(-1, 3))

        sigma = jax.lax.map(slab, xyz).reshape(gs)
        scale = 1.0 if self.step_scale is None else float(self.step_scale)
        alpha = 1 - jnp.exp(-sigma * self.stepsize * scale)
        return alpha, xyz

    def update_alpha_mask(self, rf, grid_size=None):
        """Dense render + maxpool + binarize -> new mask and shrunk AABB
        (reference updateAlphaMask, alphagrid.py:249-276)."""
        gs = grid_size or tuple(rf.grid_size)
        alpha, dense_xyz = self.compute_dense_alpha(rf, gs)
        # reference stores volume transposed so grid_sample's (x,y,z) indexing
        # hits [z_axis=dim0]; replicate by transposing world-x to the last axis
        alpha_t = jnp.clip(alpha, 0, 1).transpose(2, 1, 0)  # (Z, Y, X)
        # reference dilation is 1 cell at the CURRENT field resolution
        # (alphagrid.py:256); with a fixed-shape field the mask lives at the
        # pinned final resolution, so scale the radius to the live-cell
        # world extent (step_scale == reso ratio for cubic grids)
        scale = 1.0 if self.step_scale is None else float(self.step_scale)
        alpha_t = max_pool_3d(alpha_t, 2 * int(np.ceil(scale)) + 1)
        alpha_bin = (alpha_t >= self.alpha_mask_thres).astype(jnp.float32)
        coarse = None
        if self.superstep > 1:
            r = self._coarse_dilate_radius(gs)
            coarse = max_pool_3d(alpha_bin, 2 * r + 1)
        # copy aabb: leaves must not alias (jit buffer donation)
        mask = AlphaGridMask(aabb=jnp.array(self.aabb), alpha_volume=alpha_bin,
                             coarse_volume=coarse)

        occupied = np.asarray(alpha_bin.transpose(2, 1, 0)) > 0.5  # (X, Y, Z)
        xyz_np = np.asarray(dense_xyz)
        if occupied.any():
            valid_xyz = xyz_np[occupied]
            new_aabb = np.stack([valid_xyz.min(0), valid_xyz.max(0)])
        else:
            new_aabb = np.asarray(self.aabb)
        return self.replace(alpha_mask=mask), jnp.asarray(new_aabb)

    # ------------------------------------------------------------------
    def sample_ndc(self, rays, key=None, is_train=False, n_samples: int = -1,
                   max_samples_per_ray: int = -1, focal: float = 1.0):
        """NDC sampling: linear steps in z in [near, far] (reference
        sample_ray_ndc, alphagrid.py:113-129). Used by LLFF scenes."""
        N = n_samples if n_samples > 0 else self.n_samples
        near, far = self.near_far
        rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
        B = rays.shape[0]
        interp = jnp.linspace(near, far, N)[None].repeat(B, 0)
        if is_train and key is not None:
            interp = interp + jax.random.uniform(key, (B, N)) * (
                (far - near) / N)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * interp[..., None]
        valid = jnp.all((pts >= self.aabb[0]) & (pts <= self.aabb[1]),
                        axis=-1)
        norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        dists = jnp.concatenate(
            [interp[:, 1:] - interp[:, :-1], jnp.zeros((B, 1))], -1) * norm
        size = interp[..., None] / focal
        K = max_samples_per_ray
        if K > 0 and K < N:
            packed = jnp.concatenate(
                [pts, size, interp[..., None], dists[..., None],
                 valid[..., None].astype(jnp.float32)], axis=-1)
            idx, keep = compact_topk(valid, K)
            packed = gather_rows(packed, idx)
            xyz = packed[..., 0:4]
            interp = packed[..., 4]
            dists = packed[..., 5]
            valid = (packed[..., 6] > 0.5) & keep
        else:
            xyz = jnp.concatenate([pts, size], axis=-1)
        return {"xyz": xyz, "z_vals": interp, "dists": dists, "valid": valid}

    def sample(self, rays, key=None, is_train=False, override_near=None,
               stepmul: float = 1.0, n_samples: int = -1,
               max_samples_per_ray: int = -1, focal: float = 1.0,
               ndc_ray: bool = False):
        if ndc_ray:
            return self.sample_ndc(rays, key=key, is_train=is_train,
                                   n_samples=n_samples,
                                   max_samples_per_ray=max_samples_per_ray,
                                   focal=focal)
        """rays: (B, 6) -> padded samples.

        Returns dict with:
          xyz      (B, K, 4) world positions + footprint size (z/focal)
          z_vals   (B, K)
          dists    (B, K)
          valid    (B, K) bool
        K = max_samples_per_ray if > 0 else the full step count N.
        """
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

        # stepmul < 1 (recursive bounce pass) trades step count for step size
        # so ray coverage stays constant at lower cost
        stepsize = self.live_stepsize / stepmul
        if is_train and key is not None:
            if self.cumrand:
                steps = jax.random.uniform(key, (B, N)) * stepsize + stepsize / 2
                step = jnp.cumsum(steps, axis=1)
            else:
                rng = jnp.arange(N, dtype=jnp.float32)[None]
                if self.single_jitter:
                    r = jax.random.uniform(key, (B, 1))
                else:
                    r = jax.random.uniform(key, (B, N))
                step = stepsize * (rng + r)
        else:
            step = stepsize * jnp.arange(N, dtype=jnp.float32)[None].repeat(B, 0)

        z_vals = t_min[:, None] + step  # (B, N)

        K = max_samples_per_ray
        S = self.superstep
        use_two_level = (S > 1 and 0 < K < N and K % S == 0
                         and self.alpha_mask is not None
                         and self.enable_alpha_mask
                         # getattr: tolerate checkpoints pickled before the
                         # coarse volume existed
                         and getattr(self.alpha_mask, "coarse_volume", None)
                         is not None)
        if use_two_level:
            return self._sample_two_level(rays_o, rays_d, z_vals, K, focal)

        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        in_bbox = jnp.all((pts >= self.aabb[0]) & (pts <= self.aabb[1]), axis=-1)
        valid = in_bbox

        if self.alpha_mask is not None and self.enable_alpha_mask:
            alphas = self.alpha_mask.sample_alpha(pts)
            valid = valid & (alphas > 0)

        size = z_vals[..., None] / focal
        dists = jnp.concatenate(
            [z_vals[:, 1:] - z_vals[:, :-1], jnp.zeros((B, 1))], axis=-1)

        K = max_samples_per_ray
        if K > 0 and K < N:
            # pack everything to compact into ONE row gather: TPU gathers
            # are latency-bound per row, so 4 separate take_along_axis calls
            # (xyz, z, dist, valid) cost 4x one 7-channel gather
            packed = jnp.concatenate(
                [pts, size, z_vals[..., None], dists[..., None],
                 valid[..., None].astype(jnp.float32)], axis=-1)
            idx, keep = compact_topk(valid, K)
            packed = gather_rows(packed, idx)
            xyz = packed[..., 0:4]
            z_vals = packed[..., 4]
            dists = packed[..., 5]
            valid = (packed[..., 6] > 0.5) & keep
        else:
            xyz = jnp.concatenate([pts, size], axis=-1)

        return {"xyz": xyz, "z_vals": z_vals, "dists": dists, "valid": valid}

    def _sample_two_level(self, rays_o, rays_d, z_vals, K: int, focal):
        """Two-level march: one coarse-mask lookup per superstep of S fine
        steps, compact the passing supersteps to K//S, then expand.

        The coarse volume is the alpha mask dilated by the superstep's ray
        half-extent, so the midpoint test is conservative: no fine sample an
        exact march would keep tests negative here. The only semantic
        difference from the flat march is truncation granularity: budget is
        allocated per superstep rather than per sample.
        """
        B, N = z_vals.shape
        S = self.superstep
        NS = N // S
        Ks = K // S
        z = z_vals[:, :NS * S]
        # per-candidate spacing BEFORE selection (the reference computes
        # dists on the full step set; a kept sample keeps its distance to
        # the next candidate, not to the next kept sample)
        dists_full = jnp.concatenate(
            [z[:, 1:] - z[:, :-1], jnp.zeros((B, 1))], axis=-1)
        zs = z.reshape(B, NS, S)
        ds = dists_full.reshape(B, NS, S)

        def in_box(p):
            return jnp.all((p >= self.aabb[0]) & (p <= self.aabb[1]), axis=-1)

        def at(zv):
            return rays_o[:, None, :] + rays_d[:, None, :] * zv[..., None]

        z_mid = 0.5 * (zs[:, :, 0] + zs[:, :, -1])
        sup_valid = in_box(at(zs[:, :, 0])) | in_box(at(zs[:, :, -1]))
        sup_valid &= self.alpha_mask.sample_coarse(at(z_mid)) > 0

        idx_s, keep_s = compact_topk(sup_valid, Ks)
        packed = jnp.concatenate([zs, ds], axis=-1)      # (B, NS, 2S)
        sel = gather_rows(packed, idx_s)                 # (B, Ks, 2S)
        z_f = sel[..., :S].reshape(B, K)
        d_f = sel[..., S:].reshape(B, K)
        pts = at(z_f)
        valid = in_box(pts) & jnp.repeat(keep_s, S, axis=1)
        if self.fine_alpha_test:
            valid &= self.alpha_mask.sample_alpha(pts) > 0
        size = z_f[..., None] / focal
        xyz = jnp.concatenate([pts, size], axis=-1)
        return {"xyz": xyz, "z_vals": z_f, "dists": d_f, "valid": valid}
