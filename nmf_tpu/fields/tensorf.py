"""TensoRF vector-matrix factorized radiance field, TPU-native.

Re-implements the semantics of the reference ``fields/tensoRF.py`` (TensoRF
factor grids :25-243, TensorVMSplit :246-445) and ``fields/tensor_base.py``
(normalize_coord :66-81, feature2density :83-93, compute_normals :107-129,
voxel upsample schedule :171-243) as functional JAX pytrees.

Key TPU-first departures from the reference:

- The query path is 6 bilinear gathers + one feature contraction, written so
  XLA fuses them; there is no grid_sample kernel boundary.
- Smoothed density normals (the reference's grid_sample_Cinf double-backward,
  modules/grid_sample_Cinf.py:83-191) are expressed *forward*: derivative
  planes are pre-convolved from the current parameters each step and normals
  are direct samples of them -- ordinary autodiff then differentiates the
  whole thing w.r.t. parameters, which is what create_graph=True achieved in
  torch.
- Shape-changing schedule events (upsample/shrink) return a new field pytree;
  they happen between jit boundaries.
"""
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import safemath
from ..ops.grid_sample import (
    conv1d_same,
    conv2d_same,
    grid_sample_1d,
    grid_sample_2d,
    line_interp_matmul,
    quad_gather_2d,
    quad_gather_2d_binsum,
    resize_align_corners_1d,
    resize_align_corners_2d,
    smoothed_derivative_kernels_2d,
)


def _mask_live_2d(plane, live_hw):
    """Zero a padded plane beyond the live region (fixed_shape mode).

    Forward no-op while the padding invariant holds (pads are zero), but
    REQUIRED around convolutions: without it the conv transpose deposits
    cotangent into pad rows within kernel reach of the live edge, Adam then
    grows the pads, and the next forward conv reads the garbage back into
    the live derivative planes."""
    if live_hw is None:
        return plane
    Hl, Wl = live_hw
    H, W = plane.shape[-2], plane.shape[-1]
    m = ((jnp.arange(H, dtype=jnp.float32)[:, None] < Hl)
         & (jnp.arange(W, dtype=jnp.float32)[None, :] < Wl))
    return plane * m


def _mask_live_1d(line, live_l):
    if live_l is None:
        return line
    L = line.shape[-1]
    return line * (jnp.arange(L, dtype=jnp.float32) < live_l)


# plane i holds axes MAT_MODE[i]; line i holds axis VEC_MODE[i]
MAT_MODE = ((0, 1), (0, 2), (1, 2))
VEC_MODE = (2, 1, 0)


@struct.dataclass
class FactorGrid:
    """One plane+line factor set (reference ``TensoRF``, fields/tensoRF.py:25)."""
    planes: Any  # tuple of 3 arrays (C, H, W)
    lines: Any   # tuple of 3 arrays (C, L)

    @property
    def n_comp(self) -> int:
        return self.planes[0].shape[0]

    def dim(self) -> int:
        return 3 * self.n_comp

    def _uniform_shapes(self) -> bool:
        return (len({p.shape for p in self.planes}) == 1
                and len({l.shape for l in self.lines}) == 1)

    def query(self, coords, dtype=None, binsum=False, live=None):
        """coords: (..., 3) normalized in [-1,1] -> list of 3 (..., C).

        When all three planes share a shape (cubic grids, the common case)
        the three queries are batched into a single gather via vmap --
        one-third the kernel count of the naive per-plane loop.

        dtype: optional gather dtype (e.g. jnp.bfloat16) -- tables are cast
        before the gather and products accumulate in f32, matching the fused
        compute_all path bit-for-bit so mixed call sites stay consistent.

        live: optional per-world-axis logical resolutions (3 traced f32
        scalars) for fixed-shape padded grids (TensorVMSplit.fixed_shape).
        """
        cast = (lambda x: x.astype(dtype)) if dtype is not None else (lambda x: x)
        feats = []
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            v = VEC_MODE[i]
            # torch grid_sample convention: plane sampled at (x=xyz[m0]
            # indexing W, y=xyz[m1] indexing H). quad_gather_2d /
            # line_interp_matmul are the row-count-optimal forms (one
            # gathered row per plane sample, zero gathers for lines) and
            # bit-match the fused compute_all path.
            qg = quad_gather_2d_binsum if binsum else quad_gather_2d
            lhw = None if live is None else (live[m1], live[m0])
            ll = None if live is None else live[v]
            pc = qg(
                cast(self.planes[i]),
                jnp.stack([coords[..., m0], coords[..., m1]], axis=-1),
                lhw,
            )
            lc = line_interp_matmul(cast(self.lines[i]), coords[..., v],
                                    live_l=ll)
            feats.append(pc * lc)
        return feats

    def query_with_derivs(self, coords, dkernels, live=None):
        """Returns (feats, dfeats) where dfeats[j] matches the smoothed
        coordinate-derivative semantics of grid_sample_Cinf: derivative of
        each factor product w.r.t. normalized coordinate j, using blurred
        central-difference filtered planes/lines."""
        kx, ky, k1 = dkernels
        feats = []
        dfeats = [[], [], []]  # per world axis j
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            v = VEC_MODE[i]
            pcoord = jnp.stack([coords[..., m0], coords[..., m1]], axis=-1)
            plane = self.planes[i]
            line = self.lines[i]
            lhw = None if live is None else (live[m1], live[m0])
            ll = None if live is None else live[v]
            pc = grid_sample_2d(plane, pcoord, live_hw=lhw)
            lc = grid_sample_1d(line, coords[..., v], live_l=ll)
            feats.append(pc * lc)
            # derivative w.r.t. m0 (x of the plane) and m1 (y of the plane)
            mplane = _mask_live_2d(plane, lhw)
            mline = _mask_live_1d(line, ll)
            dpx = grid_sample_2d(conv2d_same(mplane, kx), pcoord, live_hw=lhw)
            dpy = grid_sample_2d(conv2d_same(mplane, ky), pcoord, live_hw=lhw)
            dl = grid_sample_1d(conv1d_same(mline, k1), coords[..., v],
                                live_l=ll)
            dfeats[m0].append(dpx * lc)
            dfeats[m1].append(dpy * lc)
            dfeats[v].append(pc * dl)
        return feats, dfeats


def init_factor_grid(key, grid_size: int, n_comp: int, init_mode: str,
                     init_val: float):
    """Reference init_one_svd modes (fields/tensoRF.py:65-159)."""
    planes, lines = [], []
    keys = jax.random.split(key, 6)
    for i in range(3):
        pk, lk = keys[2 * i], keys[2 * i + 1]
        if init_mode == "trig":
            pos = jnp.linspace(-1, 1, grid_size)
            xy = pos[:, None] + pos[None, :]
            n_degs = n_comp // 2
            freqs = 2.0 ** jnp.arange(n_degs - 1)
            freqs = jnp.concatenate([jnp.zeros((1,)), freqs])
            scales = init_val * jnp.exp(-freqs)
            ang_p = freqs[:, None, None] * xy[None] * math.pi
            plane = jnp.concatenate([
                scales[:, None, None] * jnp.sin(ang_p),
                scales[:, None, None] * jnp.cos(ang_p),
            ], axis=0)
            ang_l = freqs[:, None] * pos[None] * math.pi
            line = jnp.concatenate([
                scales[:, None] * jnp.sin(ang_l),
                scales[:, None] * jnp.cos(ang_l),
            ], axis=0)
        elif init_mode == "unif":
            plane = init_val ** 0.5 * (
                2 * jax.random.uniform(pk, (n_comp, grid_size, grid_size)) - 1)
            line = init_val ** 0.5 * (
                2 * jax.random.uniform(lk, (n_comp, grid_size)) - 1)
        elif init_mode == "unifplane":
            plane = init_val ** 0.5 * (
                2 * jax.random.uniform(pk, (n_comp, grid_size, grid_size)) - 1)
            line = init_val ** 0.5 * jnp.ones((n_comp, grid_size))
        elif init_mode == "randplane":
            plane = init_val ** 0.5 * jax.random.normal(
                pk, (n_comp, grid_size, grid_size))
            line = init_val ** 0.5 * jnp.ones((n_comp, grid_size))
        else:  # 'rand' default
            plane = init_val * jax.random.normal(pk, (n_comp, grid_size, grid_size))
            line = init_val * jax.random.normal(lk, (n_comp, grid_size))
        planes.append(plane)
        lines.append(line)
    return FactorGrid(planes=tuple(planes), lines=tuple(lines))


def upsample_factor_grid(fg: FactorGrid, res_target) -> FactorGrid:
    """F.interpolate align_corners upsample (fields/tensoRF.py:207-227)."""
    planes, lines = [], []
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        v = VEC_MODE[i]
        planes.append(resize_align_corners_2d(
            fg.planes[i], (int(res_target[m1]), int(res_target[m0]))))
        lines.append(resize_align_corners_1d(fg.lines[i], int(res_target[v])))
    return FactorGrid(planes=tuple(planes), lines=tuple(lines))


def upsample_factor_grid_fixed(fg: FactorGrid, old_gs, new_gs) -> FactorGrid:
    """Fixed-shape upsample: resample the live [0:old] region to [0:new]
    inside the same padded buffers (host-side, between jit boundaries).
    The live content is bit-identical to upsample_factor_grid on
    exact-shape grids of the same resolutions."""
    planes, lines = [], []
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        v = VEC_MODE[i]
        p = fg.planes[i]
        h_o, w_o = int(old_gs[m1]), int(old_gs[m0])
        h_n, w_n = int(new_gs[m1]), int(new_gs[m0])
        resized = resize_align_corners_2d(p[:, :h_o, :w_o], (h_n, w_n))
        planes.append(jnp.zeros_like(p).at[:, :h_n, :w_n].set(resized))
        ln = fg.lines[i]
        l_o, l_n = int(old_gs[v]), int(new_gs[v])
        rline = resize_align_corners_1d(ln[:, :l_o], l_n)
        lines.append(jnp.zeros_like(ln).at[:, :l_n].set(rline))
    return FactorGrid(planes=tuple(planes), lines=tuple(lines))


def pad_factor_grid(fg: FactorGrid, pad_gs) -> FactorGrid:
    """Zero-pad an exact-shape FactorGrid into fixed-shape padded buffers."""
    planes, lines = [], []
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        v = VEC_MODE[i]
        p = fg.planes[i]
        buf = jnp.zeros((p.shape[0], int(pad_gs[m1]), int(pad_gs[m0])),
                        p.dtype)
        planes.append(buf.at[:, :p.shape[1], :p.shape[2]].set(p))
        ln = fg.lines[i]
        lbuf = jnp.zeros((ln.shape[0], int(pad_gs[v])), ln.dtype)
        lines.append(lbuf.at[:, :ln.shape[1]].set(ln))
    return FactorGrid(planes=tuple(planes), lines=tuple(lines))


def shrink_factor_grid(fg: FactorGrid, t_l, b_r) -> FactorGrid:
    planes, lines = [], []
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        v = VEC_MODE[i]
        lines.append(fg.lines[i][:, int(t_l[v]):int(b_r[v])])
        planes.append(fg.planes[i][:, int(t_l[m1]):int(b_r[m1]),
                                   int(t_l[m0]):int(b_r[m0])])
    return FactorGrid(planes=tuple(planes), lines=tuple(lines))


@struct.dataclass
class TensorVMSplit:
    """Split density/appearance VM field (fields/tensoRF.py:246-445)."""
    density_rf: FactorGrid
    app_rf: FactorGrid
    basis_mat: Any    # (app_rf.dim(), app_dim)
    dbasis_mat: Any   # (density_rf.dim(), 1)
    aabb: Any         # (2, 3)

    # static configuration
    app_dim: int = struct.field(pytree_node=False, default=24)
    activation: str = struct.field(pytree_node=False, default="softplus")
    density_shift: float = struct.field(pytree_node=False, default=-4.0)
    distance_scale: float = struct.field(pytree_node=False, default=25.0)
    contract_space: bool = struct.field(pytree_node=False, default=False)
    dbasis: bool = struct.field(pytree_node=False, default=False)
    step_ratio: float = struct.field(pytree_node=False, default=0.5)
    density_res_multi: float = struct.field(pytree_node=False, default=1.0)
    smoothing: float = struct.field(pytree_node=False, default=1.0)
    numer_grad: bool = struct.field(pytree_node=False, default=True)
    # dtype used for the fused gather path ('bf16' halves gather bandwidth;
    # parameters and accumulation stay f32)
    gather_dtype: str = struct.field(pytree_node=False, default="bf16")
    # route plane-gradient scatter-adds through the Pallas bin-sum kernel
    # (ops/pallas/binsum.py) instead of XLA's serialized row scatter
    scatter_kernel: bool = struct.field(pytree_node=False, default=False)
    interp_mode: str = struct.field(pytree_node=False, default="bilinear")
    grid_size: Tuple[int, int, int] = struct.field(
        pytree_node=False, default=(128, 128, 128))
    # fixed-shape mode: planes/lines are allocated at the FINAL voxel
    # schedule resolution and zero-padded; the logical (live) resolution is
    # the traced leaf ``live_reso`` (f32 (3,)). Upsample events then change
    # only leaf VALUES -- the jitted train step keeps one signature for the
    # whole 30k coarse-to-fine schedule instead of recompiling at every
    # upsamp_list event (reference recompiles are free on CUDA; on XLA each
    # costs minutes of compile through the remote tunnel).
    fixed_shape: bool = struct.field(pytree_node=False, default=False)
    live_reso: Any = None  # f32 (3,) leaf; None unless fixed_shape
    # voxel schedule (static; drives host-side check_schedule)
    n_voxel_list: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    upsamp_list: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    lr: float = struct.field(pytree_node=False, default=0.02)
    lr_net: float = struct.field(pytree_node=False, default=1e-3)
    separate_appgrid: bool = struct.field(pytree_node=False, default=True)
    num_pretrain: int = struct.field(pytree_node=False, default=0)
    calibrate: bool = struct.field(pytree_node=False, default=False)

    # ---- derived geometry (host-side helpers, python floats) ----
    @property
    def fused_normals_ok(self) -> bool:
        """compute_all can produce normals only on the smoothed path; the
        analytic (numer_grad=False) variant must go through autodiff."""
        return self.numer_grad and not self.dbasis

    @property
    def aabb_size(self):
        return self.aabb[1] - self.aabb[0]

    @property
    def units(self):
        gs = jnp.asarray(self.grid_size, dtype=jnp.float32)
        return self.aabb_size / (gs - 1)

    @property
    def stepsize(self) -> float:
        units = np.asarray(self.aabb[1] - self.aabb[0], dtype=np.float64) / (
            np.asarray(self.grid_size, dtype=np.float64) - 1)
        return float(units.min() * self.step_ratio)

    @property
    def aabb_diag(self) -> float:
        return float(np.linalg.norm(np.asarray(self.aabb[1] - self.aabb[0])))

    @property
    def n_samples(self) -> int:
        return int(self.aabb_diag / self.stepsize) + 1

    def _live3(self):
        """None, or the three per-world-axis live resolutions (f32 leaves)."""
        if not self.fixed_shape or self.live_reso is None:
            return None
        return (self.live_reso[0], self.live_reso[1], self.live_reso[2])

    @property
    def live_grid_size(self) -> Tuple[int, int, int]:
        """Concrete live resolution (host side)."""
        if not self.fixed_shape or self.live_reso is None:
            return tuple(self.grid_size)
        return tuple(int(v) for v in np.asarray(self.live_reso))

    def live_step_scale(self) -> float:
        """stepsize(live) / stepsize(static grid_size); 1.0 unless fixed."""
        if not self.fixed_shape or self.live_reso is None:
            return 1.0
        extent = np.asarray(self.aabb[1] - self.aabb[0], np.float64)
        live = np.asarray(self.live_reso, np.float64)
        s_live = float((extent / (live - 1)).min() * self.step_ratio)
        return s_live / self.stepsize

    # ---- coordinate handling ----
    def normalize_coord(self, xyz):
        """World xyz (..., 3 or 4, trailing channel = footprint size) ->
        normalized [-1,1] (tensor_base.py:66-81)."""
        coords = (xyz[..., :3] - self.aabb[0]) * (2.0 / self.aabb_size) - 1
        rest = xyz[..., 3:]
        normed = jnp.concatenate([coords, rest], axis=-1)
        if self.contract_space:
            d = 3
            dist = jnp.linalg.norm(xyz[..., :d], axis=-1, keepdims=True) + 1e-8
            direction = xyz[..., :d] / dist
            contracted = jnp.where(dist > 1, (dist - 1) / 4 + 1, dist) / 2
            return jnp.concatenate([contracted * direction, xyz[..., d:]], axis=-1)
        return normed

    def feature2density(self, feat):
        if self.activation == "softplus":
            return jax.nn.softplus(jnp.clip(feat, -15, 1e3) + self.density_shift)
        if self.activation == "relu":
            return jax.nn.relu(feat + self.density_shift)
        if self.activation == "exp":
            return safemath.trunc_exp(feat + self.density_shift)
        if self.activation == "identity":
            return feat
        raise ValueError(f"Unknown activation {self.activation}")

    # ---- queries (coords normalized) ----
    def _contract_density(self, feats):
        """feats: list of 3 (..., C) -> (...,). dbasis matmul or plain sum."""
        if self.dbasis:
            cat = jnp.concatenate(feats, axis=-1)
            return jnp.dot(cat, self.dbasis_mat,
                           preferred_element_type=jnp.float32)[..., 0]
        return sum(f.sum(axis=-1) for f in feats)

    def compute_densityfeature(self, xyz, activate=True, use_gather_dtype=False):
        """World xyz (..., 3/4) -> density (...,).

        use_gather_dtype=True gathers in self.gather_dtype (bf16 by default)
        so results are bit-identical to the fused compute_all path -- the
        renderer's two-stage shading relies on this for a consistent acc_map.
        """
        coords = self.normalize_coord(xyz)[..., :3]
        gd = (jnp.bfloat16 if use_gather_dtype and self.gather_dtype == "bf16"
              else None)
        feats = self.density_rf.query(coords, dtype=gd,
                                      binsum=self.scatter_kernel,
                                      live=self._live3())
        sig = self._contract_density(feats)
        return self.feature2density(sig) if activate else sig

    def compute_all(self, xyz, with_normals=True):
        """Fused field query: (density, app_features[, normals]) from ONE
        stacked gather per factor.

        The renderer queries density, appearance, and (for NMF) smoothed
        density derivatives at the *same* coordinates. The reference issues
        them as separate grid_sample calls (tensoRF.py:181-205 x3 call
        sites); here the per-factor tables are concatenated channel-wise so
        each corner lookup is a single gather -- ~3x fewer gathers forward
        and ~3x fewer scatters backward, which dominate TPU cost.
        """
        coords = self.normalize_coord(xyz)[..., :3]
        d_rf, a_rf = self.density_rf, self.app_rf
        Cd = d_rf.n_comp
        Ca = a_rf.n_comp
        if with_normals:
            kx, ky, k1 = self._dkernels()

        planes, lines = [], []
        for i in range(3):
            dp = d_rf.planes[i]
            parts_p = [dp, a_rf.planes[i]]
            parts_l = [d_rf.lines[i], a_rf.lines[i]]
            if with_normals:
                live = self._live3()
                m0, m1 = MAT_MODE[i]
                lhw = None if live is None else (live[m1], live[m0])
                ll = None if live is None else live[VEC_MODE[i]]
                mdp = _mask_live_2d(dp, lhw)
                parts_p += [conv2d_same(mdp, kx), conv2d_same(mdp, ky)]
                parts_l += [conv1d_same(
                    _mask_live_1d(d_rf.lines[i], ll), k1)]
            planes.append(jnp.concatenate(parts_p, axis=0))
            lines.append(jnp.concatenate(parts_l, axis=0))

        uniform = False  # per-plane quad gathers avoid (3,...) layout copies
        # gather in bf16 (halves HBM bytes moved by the gathers; the
        # reference likewise keeps its grids in half precision,
        # tensor_base.py:188). Products/contractions accumulate in f32.
        gd = jnp.bfloat16 if self.gather_dtype == "bf16" else jnp.float32
        pcs, lcs = [], []
        if uniform:
            pcoords = jnp.stack([
                jnp.stack([coords[..., m0], coords[..., m1]], axis=-1)
                for (m0, m1) in MAT_MODE])
            lcoords = jnp.stack([coords[..., v] for v in VEC_MODE])
            # quad gather: ONE gathered row per (sample, plane) carries the
            # full 2x2 corner neighborhood; lines go through a 2-hot MXU
            # matmul with zero gathers (TPU gathers are latency-bound per
            # row, so row count -- not bytes -- is the cost driver)
            pc_all = jax.vmap(quad_gather_2d)(
                jnp.stack(planes).astype(gd), pcoords)
            lc_all = jax.vmap(line_interp_matmul)(
                jnp.stack(lines).astype(gd), lcoords)
            pcs = [pc_all[i] for i in range(3)]
            lcs = [lc_all[i] for i in range(3)]
        else:
            qg = quad_gather_2d_binsum if self.scatter_kernel \
                else quad_gather_2d
            live = self._live3()
            for i in range(3):
                m0, m1 = MAT_MODE[i]
                v = VEC_MODE[i]
                lhw = None if live is None else (live[m1], live[m0])
                ll = None if live is None else live[v]
                pcs.append(qg(planes[i].astype(gd), jnp.stack(
                    [coords[..., m0], coords[..., m1]], axis=-1), lhw))
                lcs.append(line_interp_matmul(lines[i].astype(gd),
                                              coords[..., v], live_l=ll))

        d_feats, a_feats = [], []
        dgrads = [[], [], []]
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            v = VEC_MODE[i]
            pc, lc = pcs[i], lcs[i]
            p_d, l_d = pc[..., :Cd], lc[..., :Cd]
            p_a, l_a = pc[..., Cd:Cd + Ca], lc[..., Cd:Cd + Ca]
            d_feats.append(p_d * l_d)
            a_feats.append(p_a * l_a)
            if with_normals:
                p_dx = pc[..., Cd + Ca:2 * Cd + Ca]
                p_dy = pc[..., 2 * Cd + Ca:3 * Cd + Ca]
                l_dl = lc[..., Cd + Ca:2 * Cd + Ca]
                dgrads[m0].append(p_dx * l_d)
                dgrads[m1].append(p_dy * l_d)
                dgrads[v].append(p_d * l_dl)

        sigma = self.feature2density(self._contract_density(d_feats))
        app = jnp.dot(jnp.concatenate(a_feats, axis=-1), self.basis_mat,
                      preferred_element_type=jnp.float32)
        if not with_normals:
            return sigma, app, None
        g = jnp.stack([self._contract_density_grad(dgrads[j])
                       for j in range(3)], axis=-1)
        normals = safemath.normalize(-g)
        return sigma, app, normals

    def compute_appfeature(self, xyz):
        coords = self.normalize_coord(xyz)[..., :3]
        feats = self.app_rf.query(coords, binsum=self.scatter_kernel,
                                  live=self._live3())
        cat = jnp.concatenate(feats, axis=-1)
        return jnp.dot(cat, self.basis_mat, preferred_element_type=jnp.float32)

    def _dkernels(self):
        kx, ky = smoothed_derivative_kernels_2d(self.smoothing)
        # 1D line derivative: central difference (correlation kernel
        # [-1/2, 0, 1/2] gives d/d(index); validated by the axis-oracle
        # normal tests)
        k1 = np.array([-0.5, 0.0, 0.5])
        return jnp.asarray(kx), jnp.asarray(ky), jnp.asarray(k1)

    def compute_normals(self, xyz):
        """World-space density normals: normalize(-grad sigma_feat).

        numer_grad=True: the smoothed-filter gradient (grid_sample_Cinf
        semantics); otherwise plain autodiff through the bilinear gather.
        Differentiable w.r.t. field parameters in both cases (reference
        tensor_base.py:107-129 with create_graph=True).
        """
        if self.numer_grad:
            coords = self.normalize_coord(xyz)[..., :3]
            _, dfeats = self.density_rf.query_with_derivs(
                coords, self._dkernels(), live=self._live3())
            grads = []
            for j in range(3):
                grads.append(self._contract_density_grad(dfeats[j]))
            g = jnp.stack(grads, axis=-1)
        else:
            def sig_fn(pts3):
                feats = self.density_rf.query(
                    self.normalize_coord(pts3)[..., :3],
                    binsum=self.scatter_kernel, live=self._live3())
                return self._contract_density(feats).sum()
            g = jax.grad(sig_fn)(xyz[..., :3])
        return safemath.normalize(-g)

    def _contract_density_grad(self, dfeat_list):
        """Contract derivative features the same way density is contracted.

        dfeat_list: contributions to axis j, each (..., C) from specific
        planes. With dbasis the weights of the corresponding blocks apply."""
        if not self.dbasis:
            return sum(f.sum(axis=-1) for f in dfeat_list)
        # dbasis: need block-aligned weighting. query_with_derivs appends
        # exactly 2 entries per world axis (one per plane touching it) in
        # plane order; rebuild the full 3-block layout with zeros.
        raise NotImplementedError(
            "dbasis=True with smoothed normals is not used by shipped configs"
        )

    # ---- regularizers (train.py:669-707 / tensoRF.py:315-360) ----
    # In fixed_shape mode sums are taken over the live region only and
    # normalized by live counts, so values match the exact-shape grids
    # bit-for-bit (the zero padding contributes nothing to sums; only the
    # mean denominators and the live/pad boundary pairs need masking).
    def density_L1(self):
        live = self._live3()
        total = 0.0
        for i in range(3):
            pl = self.density_rf.planes[i]
            ln = self.density_rf.lines[i]
            if live is None:
                total = total + jnp.abs(pl).mean() + jnp.abs(ln).mean()
            else:
                # mask BEFORE abs: |0| contributes nothing to the value but
                # JAX's abs gradient at 0 is 1.0 -- an unmasked sum would
                # leak constant gradient into every pad cell and Adam would
                # break the zero-padding invariant
                m0, m1 = MAT_MODE[i]
                v = VEC_MODE[i]
                np_live = pl.shape[0] * live[m1] * live[m0]
                nl_live = ln.shape[0] * live[v]
                total = total \
                    + jnp.abs(_mask_live_2d(pl, (live[m1], live[m0]))).sum() \
                    / np_live \
                    + jnp.abs(_mask_live_1d(ln, live[v])).sum() / nl_live
        return total

    def _tv(self, x2d, live_hw=None):
        h_tv = x2d[..., 1:, :-1] - x2d[..., :-1, :-1]
        w_tv = x2d[..., :-1, 1:] - x2d[..., :-1, :-1]
        val = jnp.sqrt(w_tv ** 2 + h_tv ** 2 + 1e-5)
        if live_hw is None:
            return val.mean()
        lh, lw = live_hw
        C, H1, W1 = val.shape
        m = ((jnp.arange(H1, dtype=jnp.float32)[:, None] < lh - 1)
             & (jnp.arange(W1, dtype=jnp.float32)[None, :] < lw - 1))
        return (val * m).sum() / (C * (lh - 1) * (lw - 1))

    def _tv_line(self, line, live_l=None):
        val = jnp.abs(line[..., 1:] - line[..., :-1])
        if live_l is None:
            return val.mean()
        C, L1 = val.shape
        m = jnp.arange(L1, dtype=jnp.float32) < live_l - 1
        return (val * m).sum() / (C * (live_l - 1))

    def _tv_lives(self, i):
        live = self._live3()
        if live is None:
            return None, None
        m0, m1 = MAT_MODE[i]
        v = VEC_MODE[i]
        return (live[m1], live[m0]), live[v]

    def tv_loss_density(self):
        total = 0.0
        for i in range(3):
            lhw, ll = self._tv_lives(i)
            total = total + self._tv(self.density_rf.planes[i], lhw) * 1e-2 \
                + self._tv_line(self.density_rf.lines[i], ll) * 1e-3
        return total

    def tv_loss_app(self):
        total = 0.0
        for i in range(3):
            lhw, ll = self._tv_lives(i)
            total = total + self._tv(self.app_rf.planes[i], lhw) * 1e-2 \
                + self._tv_line(self.app_rf.lines[i], ll) * 1e-3
        return total

    def vector_comp_diffs(self):
        """Orthogonality regularizer over line components (tensoRF.py:315-330)."""
        total = 0.0
        for fg in (self.density_rf, self.app_rf):
            for i in range(3):
                vec = fg.lines[i]  # (C, L)
                dotp = vec @ vec.T
                n_comp = vec.shape[0]
                off_diag = dotp - jnp.diag(jnp.diag(dotp))
                total = total + jnp.abs(off_diag).sum() / max(
                    n_comp * (n_comp - 1), 1)
        return total

    # ---- schedule events (host side; return new pytrees) ----
    def check_schedule(self, iteration: int, batch_mul: int = 1):
        upsamp = [i * batch_mul for i in self.upsamp_list]
        if iteration in upsamp:
            i = upsamp.index(iteration)
            n_voxels = self.n_voxel_list[i]
            from ..utils import n_to_reso

            reso = n_to_reso(n_voxels, np.asarray(self.aabb))
            return self.upsample(reso), True
        return self, False

    def upsample(self, res_target):
        if self.fixed_shape:
            # host-side in-place resample of the live region; only the
            # live_reso leaf VALUE changes -> no new jit signature
            old = self.live_grid_size
            new = tuple(int(r) for r in res_target)
            new = tuple(min(n, g) for n, g in zip(new, self.grid_size))
            return self.replace(
                density_rf=upsample_factor_grid_fixed(
                    self.density_rf, old, new),
                app_rf=upsample_factor_grid_fixed(self.app_rf, old, new),
                live_reso=jnp.asarray(new, dtype=jnp.float32),
            )
        return self.replace(
            density_rf=upsample_factor_grid(self.density_rf, res_target),
            app_rf=upsample_factor_grid(self.app_rf, res_target),
            grid_size=tuple(int(r) for r in res_target),
        )

    def shrink(self, new_aabb):
        """Crop grids to a new AABB (tensoRF.py:415-445), aligning the aabb
        to the voxel lattice."""
        if self.fixed_shape:
            raise NotImplementedError(
                "field.fixed_shape does not support rf.shrink (occgrid "
                "shrink_iters); use the default exact-shape mode for "
                "shrinking configs")
        aabb = np.asarray(self.aabb)
        units = (aabb[1] - aabb[0]) / (np.asarray(self.grid_size) - 1)
        t_l = np.round((np.asarray(new_aabb[0]) - aabb[0]) / units).astype(int)
        b_r = np.round((np.asarray(new_aabb[1]) - aabb[0]) / units).astype(int) + 1
        b_r = np.minimum(b_r, np.asarray(self.grid_size))
        t_l = np.clip(t_l, 0, None)
        t_l_r = t_l / (np.asarray(self.grid_size) - 1)
        b_r_r = (b_r - 1) / (np.asarray(self.grid_size) - 1)
        correct_aabb = np.stack([
            (1 - t_l_r) * aabb[0] + t_l_r * aabb[1],
            (1 - b_r_r) * aabb[0] + b_r_r * aabb[1],
        ])
        if np.array_equal(correct_aabb, aabb):
            return self
        new_size = b_r - t_l
        return self.replace(
            density_rf=shrink_factor_grid(self.density_rf, t_l, b_r),
            app_rf=shrink_factor_grid(self.app_rf, t_l, b_r),
            aabb=jnp.asarray(correct_aabb, dtype=jnp.float32),
            grid_size=tuple(int(s) for s in new_size),
        )


def init_tensorvm_split(
    key,
    aabb,
    density_n_comp=16,
    appearance_n_comp=24,
    app_dim=24,
    grid_size=None,
    N_voxel_init=128 ** 3,
    N_voxel_final=300 ** 3,
    upsamp_list=(500, 1000, 2000, 3000, 4000, 5500, 7000),
    init_mode="rand",
    d_init_val=0.1,
    app_init_val=0.1,
    **kwargs,
):
    """Build a TensorVMSplit (reference TensorVMSplit.__init__ +
    TensorVoxelBase.__init__, tensor_base.py:171-231)."""
    from ..utils import n_to_reso

    aabb = jnp.asarray(aabb, dtype=jnp.float32)
    if grid_size is None:
        grid_size = n_to_reso(N_voxel_init, np.asarray(aabb))
    gsize = int(grid_size[0])
    kd, ka, kb, kdb = jax.random.split(key, 4)
    density_rf = init_factor_grid(kd, gsize, density_n_comp, init_mode, d_init_val)
    app_rf = init_factor_grid(ka, gsize, appearance_n_comp, init_mode, app_init_val)

    fixed_shape = bool(kwargs.pop("fixed_shape", False))
    live_reso = None
    if fixed_shape:
        # allocate at the final schedule resolution; the init draws above
        # are made at the live (initial) resolution so the live region is
        # bit-identical to an exact-shape init with the same key
        pad_gs = n_to_reso(N_voxel_final, np.asarray(aabb))
        pad_gs = tuple(max(int(p), int(g))
                       for p, g in zip(pad_gs, grid_size))
        live_reso = jnp.asarray([float(g) for g in grid_size], jnp.float32)
        density_rf = pad_factor_grid(density_rf, pad_gs)
        app_rf = pad_factor_grid(app_rf, pad_gs)
        grid_size = pad_gs
    # torch Linear default init, no bias
    bound_b = 1.0 / math.sqrt(3 * appearance_n_comp)
    basis_mat = jax.random.uniform(
        kb, (3 * appearance_n_comp, app_dim), minval=-bound_b, maxval=bound_b)
    bound_d = 1.0 / math.sqrt(3 * density_n_comp)
    dbasis_mat = jax.random.uniform(
        kdb, (3 * density_n_comp, 1), minval=-bound_d, maxval=bound_d)

    n_voxel_list = tuple(
        int(round(v))
        for v in (np.round(np.linspace(N_voxel_init ** (1 / 3),
                                       N_voxel_final ** (1 / 3),
                                       len(upsamp_list) + 1) ** 3)).tolist()[1:]
    )
    return TensorVMSplit(
        density_rf=density_rf,
        app_rf=app_rf,
        basis_mat=basis_mat,
        dbasis_mat=dbasis_mat,
        aabb=aabb,
        app_dim=app_dim,
        grid_size=tuple(int(g) for g in grid_size),
        n_voxel_list=n_voxel_list,
        upsamp_list=tuple(upsamp_list),
        fixed_shape=fixed_shape,
        live_reso=live_reso,
        **kwargs,
    )
