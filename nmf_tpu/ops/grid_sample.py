"""Bilinear grid sampling on TPU (gather-based, XLA-fusable).

Replaces torch ``F.grid_sample`` with ``align_corners=True`` / zeros padding
(the convention used throughout the reference: fields/tensoRF.py:44-46,
modules/grid_sample3d.py, modules/grid_sample_Cinf.py). Coordinates follow the
torch convention: last axis is (x, y[, z]) where x indexes the *last* array
dimension, in [-1, 1].

The reference's smoothed-coordinate-gradient sampler (grid_sample_Cinf.py:
83-191) hand-writes a double-backward that samples Gaussian-blurred
central-difference-filtered planes. Here the same math is expressed
*forward*: ``derivative_planes`` pre-convolves the feature planes once per
step, and normals are computed by directly sampling those planes -- plain JAX
autodiff then handles all higher-order terms. No custom VJP machinery needed.
"""
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _unnormalize(coord, size):
    """[-1,1] -> [0, size-1] with align_corners=True."""
    return (coord + 1.0) * 0.5 * (size - 1)


def grid_sample_1d(line, coords, live_l=None):
    """line: (C, L); coords: (..., ) in [-1,1] -> (..., C).

    live_l: optional (traced) logical length for fixed-shape padded lines
    (fields/tensorf.py fixed_shape mode): coordinates map onto the first
    ``live_l`` entries; the padded tail never receives nonzero weight.
    """
    C, L = line.shape
    Ll = L if live_l is None else live_l
    x = _unnormalize(coords, Ll)
    x0 = jnp.floor(x)
    w1 = x - x0
    i0 = x0.astype(jnp.int32)
    i1 = i0 + 1
    v0 = jnp.where((i0 >= 0) & (i0 <= Ll - 1), 1.0, 0.0)
    v1 = jnp.where((i1 >= 0) & (i1 <= Ll - 1), 1.0, 0.0)
    g0 = jnp.take(line, jnp.clip(i0, 0, L - 1), axis=1)  # (C, ...)
    g1 = jnp.take(line, jnp.clip(i1, 0, L - 1), axis=1)
    out = g0 * (v0 * (1 - w1)) + g1 * (v1 * w1)
    return jnp.moveaxis(out, 0, -1)


def grid_sample_2d(plane, coords, live_hw=None):
    """plane: (C, H, W); coords: (..., 2) as (x, y) in [-1,1] -> (..., C).

    live_hw: optional (traced) logical (H, W) for fixed-shape padded planes;
    index math uses the live extents, strides stay the padded statics.
    """
    C, H, W = plane.shape
    Hl, Wl = (H, W) if live_hw is None else live_hw
    x = _unnormalize(coords[..., 0], Wl)
    y = _unnormalize(coords[..., 1], Hl)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)

    flat = plane.reshape(C, H * W)
    out = 0.0
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        ix = ix0 + dx
        iy = iy0 + dy
        w = (wx if dx else (1 - wx)) * (wy if dy else (1 - wy))
        valid = (ix >= 0) & (ix <= Wl - 1) & (iy >= 0) & (iy <= Hl - 1)
        idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
        g = jnp.take(flat, idx, axis=1)  # (C, ...)
        out = out + g * jnp.where(valid, w, 0.0)
    return jnp.moveaxis(out, 0, -1)


def grid_sample_3d(vol, coords):
    """vol: (C, D, H, W); coords: (..., 3) as (x, y, z) in [-1,1] -> (..., C).

    torch convention: x indexes W, y indexes H, z indexes D.
    """
    C, D, H, W = vol.shape
    x = _unnormalize(coords[..., 0], W)
    y = _unnormalize(coords[..., 1], H)
    z = _unnormalize(coords[..., 2], D)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    wx, wy, wz = x - x0, y - y0, z - z0
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    iz0 = z0.astype(jnp.int32)

    flat = vol.reshape(C, D * H * W)
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ix, iy, iz = ix0 + dx, iy0 + dy, iz0 + dz
                w = ((wx if dx else (1 - wx))
                     * (wy if dy else (1 - wy))
                     * (wz if dz else (1 - wz)))
                valid = ((ix >= 0) & (ix <= W - 1)
                         & (iy >= 0) & (iy <= H - 1)
                         & (iz >= 0) & (iz <= D - 1))
                idx = ((jnp.clip(iz, 0, D - 1) * H + jnp.clip(iy, 0, H - 1)) * W
                       + jnp.clip(ix, 0, W - 1))
                g = jnp.take(flat, idx, axis=1)
                out = out + g * jnp.where(valid, w, 0.0)
    return jnp.moveaxis(out, 0, -1)


def quad_gather_2d(plane, coords, live_hw=None):
    """Bilinear 2D sample with ONE row-gather per sample.

    TPU gathers are latency-bound per *row*, independent of row width
    (measured ~8 ns/row for 8..256 channels). The naive bilinear sample
    costs 4 corner gathers; here the plane is concatenated channel-wise with
    its x/y/xy-rolled copies, so a single row fetch returns the whole 2x2
    neighborhood -- 4x fewer gather rows forward and 4x fewer scatter rows
    backward. Matches grid_sample_2d (align_corners=True) for coords in
    [-1, 1]; the rolled wrap rows only ever appear with weight exactly 0.

    plane: (C, H, W); coords: (..., 2) as (x, y) -> (..., C) float32.
    live_hw: optional (traced) logical (H, W) for fixed-shape padded planes.
    """
    C, H, W = plane.shape
    ix0, iy0, wx, wy = _quad_prep(plane.shape, coords, live_hw)
    # rows ordered (0,0),(1,0),(0,1),(1,1) in (dx,dy)
    rows = jnp.take(_quad_table(plane), iy0 * W + ix0, axis=0)
    r = rows.astype(jnp.float32)
    w00 = (1 - wx) * (1 - wy)
    w10 = wx * (1 - wy)
    w01 = (1 - wx) * wy
    w11 = wx * wy
    return (r[..., 0 * C:1 * C] * w00[..., None]
            + r[..., 1 * C:2 * C] * w10[..., None]
            + r[..., 2 * C:3 * C] * w01[..., None]
            + r[..., 3 * C:4 * C] * w11[..., None])


def _quad_prep(plane_shape, coords, live_hw=None):
    """Shared coordinate math of quad_gather_2d: flat corner index and
    bilinear weights (+ the unnormalize scale for coordinate grads).

    live_hw: optional (traced) logical (H, W) of a fixed-shape padded plane.
    The gather stride stays the padded static W; coordinates unnormalize and
    clip against the live extents, so the padded tail only ever appears as
    the zero-weight far corner of the last live texel."""
    C, H, W = plane_shape
    Hl, Wl = (H, W) if live_hw is None else live_hw
    cx = jnp.clip(coords[..., 0], -1, 1)
    cy = jnp.clip(coords[..., 1], -1, 1)
    x = _unnormalize(cx, Wl)
    y = _unnormalize(cy, Hl)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    # clip in f32 against the (possibly traced) live bound, then once more
    # against the static bound for index safety
    ix0 = jnp.clip(jnp.clip(x0f, 0, Wl - 1).astype(jnp.int32), 0, W - 1)
    iy0 = jnp.clip(jnp.clip(y0f, 0, Hl - 1).astype(jnp.int32), 0, H - 1)
    return ix0, iy0, wx, wy


# Experiment flag (on-chip A/B via runs/run_layout_ab.py): build the quad
# table with the channel axis minor from the start. The default transpose
# form makes XLA lay the (N, 4C) GATHER OUTPUT out column-major and pay
# layout copies on the big gathered rows (observed 262144x288 bf16 copies
# + converts ~7 ms/step in the flagship xplane trace); the row-major form
# moves the transpose onto the small table instead. Values are
# bit-identical (tested); default flips after an on-chip win.
import os

_QUAD_ROW_MAJOR = os.environ.get("NMF_QUAD_ROWMAJOR", "0") == "1"


def _quad_table(plane):
    """(C, H, W) -> row-gatherable (H*W, 4C) corner table (quad layout)."""
    C, H, W = plane.shape
    if _QUAD_ROW_MAJOR:
        p = jnp.moveaxis(plane, 0, -1)  # (H, W, C)
        q = jnp.concatenate([
            p,
            jnp.roll(p, -1, axis=1),
            jnp.roll(p, -1, axis=0),
            jnp.roll(jnp.roll(p, -1, axis=0), -1, axis=1),
        ], axis=-1)  # (H, W, 4C), channel-minor
        return q.reshape(H * W, 4 * C)
    quad = jnp.concatenate([
        plane,
        jnp.roll(plane, -1, axis=2),
        jnp.roll(plane, -1, axis=1),
        jnp.roll(jnp.roll(plane, -1, axis=1), -1, axis=2),
    ], axis=0)
    return quad.reshape(4 * C, H * W).T


def _quad_combine(rows, wx, wy, C):
    r = rows.astype(jnp.float32)
    w00 = (1 - wx) * (1 - wy)
    w10 = wx * (1 - wy)
    w01 = (1 - wx) * wy
    w11 = wx * wy
    return (r[..., 0 * C:1 * C] * w00[..., None]
            + r[..., 1 * C:2 * C] * w10[..., None]
            + r[..., 2 * C:3 * C] * w01[..., None]
            + r[..., 3 * C:4 * C] * w11[..., None])


@jax.custom_vjp
def quad_gather_2d_binsum(plane, coords, live_hw=None):
    """quad_gather_2d with a hand-written backward that routes the plane
    scatter-add through the Pallas bin-sum kernel (ops/pallas/binsum.py).

    Forward is bit-identical to quad_gather_2d. Backward replaces XLA's
    serialized row scatter (~18 ns/row, collision-bound) with
    sort + segment-tiled one-hot-matmul accumulation, and computes the
    coordinate cotangent analytically (re-gathering the corner rows; XLA
    DCEs that gather whenever coords are stop_gradient, so the common
    fine-pass case pays nothing for it).

    live_hw: optional (traced) logical (H, W) for fixed-shape padded planes
    (zero cotangent is returned for it; index math only)."""
    C, H, W = plane.shape
    ix0, iy0, wx, wy = _quad_prep(plane.shape, coords, live_hw)
    rows = jnp.take(_quad_table(plane), iy0 * W + ix0, axis=0)
    return _quad_combine(rows, wx, wy, C)


def _qg_fwd(plane, coords, live_hw=None):
    return quad_gather_2d_binsum(plane, coords, live_hw), (
        plane, coords, live_hw)


def _qg_bwd(res, g):
    from .pallas.binsum import binsum_rows

    plane, coords, live_hw = res
    C, H, W = plane.shape
    Hl, Wl = (H, W) if live_hw is None else live_hw
    ix0, iy0, wx, wy = _quad_prep(plane.shape, coords, live_hw)
    flat = (iy0 * W + ix0).reshape(-1)
    gN = g.reshape(-1, C).astype(jnp.float32)
    wxf = wx.reshape(-1)[:, None]
    wyf = wy.reshape(-1)[:, None]
    w00 = (1 - wxf) * (1 - wyf)
    w10 = wxf * (1 - wyf)
    w01 = (1 - wxf) * wyf
    w11 = wxf * wyf
    grows = jnp.concatenate(
        [gN * w00, gN * w10, gN * w01, gN * w11], axis=-1)
    dquad_t = binsum_rows(flat, grows, H * W)          # (HW, 4C)
    dq = dquad_t.T.reshape(4 * C, H, W)
    d0 = dq[0 * C:1 * C]
    d1 = jnp.roll(dq[1 * C:2 * C], 1, axis=2)
    d2 = jnp.roll(dq[2 * C:3 * C], 1, axis=1)
    d3 = jnp.roll(jnp.roll(dq[3 * C:4 * C], 1, axis=1), 1, axis=2)
    dplane = (d0 + d1 + d2 + d3).astype(plane.dtype)

    # coordinate cotangent (dead -> DCE'd when coords are stop_gradient)
    rows = jnp.take(_quad_table(plane), flat, axis=0).astype(jnp.float32)
    r00 = rows[:, 0 * C:1 * C]
    r10 = rows[:, 1 * C:2 * C]
    r01 = rows[:, 2 * C:3 * C]
    r11 = rows[:, 3 * C:4 * C]
    dwx = ((r10 - r00) * (1 - wyf) + (r11 - r01) * wyf)
    dwy = ((r01 - r00) * (1 - wxf) + (r11 - r10) * wxf)
    gx = (gN * dwx).sum(-1) * (0.5 * (Wl - 1))
    gy = (gN * dwy).sum(-1) * (0.5 * (Hl - 1))
    cx = coords[..., 0].reshape(-1)
    cy = coords[..., 1].reshape(-1)
    gx = jnp.where((cx >= -1) & (cx <= 1), gx, 0.0)
    gy = jnp.where((cy >= -1) & (cy <= 1), gy, 0.0)
    dcoords = jnp.stack([gx, gy], axis=-1).reshape(coords.shape) \
        .astype(coords.dtype)
    if live_hw is None:
        dlive = None
    else:
        dlive = tuple(jnp.zeros_like(jnp.asarray(b, jnp.float32))
                      for b in live_hw)
    return dplane, dcoords, dlive


quad_gather_2d_binsum.defvjp(_qg_fwd, _qg_bwd)


def line_interp_matmul(line, coords, live_l=None):
    """Linear 1D sample as a 2-hot MXU matmul (zero gathers).

    A row-gather costs ~8 ns/row on TPU regardless of width; for the short
    factor lines (L <= ~500) building the 2-hot interpolation matrix
    A (N, L) and hitting the MXU is far cheaper than two gathers per sample.

    line: (C, L); coords: (...,) in [-1, 1] -> (..., C) float32.
    live_l: optional (traced) logical length for fixed-shape padded lines
    (padded entries are zero AND only ever hit with weight 0).
    """
    C, L = line.shape
    Ll = L if live_l is None else live_l
    x = _unnormalize(jnp.clip(coords, -1, 1), Ll)
    x0f = jnp.floor(x)
    w1 = x - x0f
    i0 = jnp.clip(jnp.clip(x0f, 0, Ll - 1).astype(jnp.int32), 0, L - 1)
    iota = jnp.arange(L, dtype=jnp.int32)
    A = (jnp.where(iota == i0[..., None], (1 - w1)[..., None], 0.0)
         + jnp.where(iota == i0[..., None] + 1, w1[..., None], 0.0))
    out = jnp.dot(A.reshape(-1, L).astype(line.dtype), line.T,
                  preferred_element_type=jnp.float32)
    return out.reshape(*x.shape, C)


def resize_align_corners_2d(plane, new_hw):
    """Bilinear resize of (C, H, W) -> (C, H', W') with align_corners=True.

    Equivalent to torch F.interpolate(mode='bilinear', align_corners=True),
    used for the voxel-grid upsample schedule (fields/tensoRF.py:207-227).
    """
    Hn, Wn = new_hw
    ys = jnp.linspace(-1.0, 1.0, Hn)
    xs = jnp.linspace(-1.0, 1.0, Wn)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    coords = jnp.stack([gx, gy], axis=-1)  # (Hn, Wn, 2)
    out = grid_sample_2d(plane, coords)  # (Hn, Wn, C)
    return jnp.moveaxis(out, -1, 0)


def resize_align_corners_1d(line, new_l):
    xs = jnp.linspace(-1.0, 1.0, new_l)
    out = grid_sample_1d(line, xs)  # (new_l, C)
    return jnp.moveaxis(out, -1, 0)


def _gaussian_1d(kernlen: int, std: float):
    n = np.arange(kernlen) - (kernlen - 1.0) / 2.0
    w = np.exp(-(n ** 2) / (2 * std * std))
    return w


def smoothed_derivative_kernels_2d(smoothing: float = 1.0):
    """The grid_sample_Cinf filter bank for 2D planes.

    Returns (kx, ky): each (k, k) numpy kernels = gaussian blur composed with
    central difference along one axis (grid_sample_Cinf.py:117-139 semantics;
    f_edge = -[1,0,-1]/2, gaussian std=smoothing, kernlen 3, combined via
    correlation with an extra sign flip -- net effect: d/dcoord in the
    align_corners grid parameterization, smoothed).
    """
    f_blur = np.array([0.0, 1.0, 0.0])
    f_edge = -np.array([1.0, 0.0, -1.0]) / 2.0
    # derivative along x (last axis): rows blur, cols edge
    dx = np.outer(f_blur, f_edge)  # (3, 3): [row, col]
    dy = np.outer(f_edge, f_blur)
    g1 = _gaussian_1d(3, smoothing + 1e-8)
    g2 = np.outer(g1, g1)
    g2 = g2 / g2.sum()
    # full correlation of blur with edge (3 + 3 - 1 = 5 taps), sign per
    # reference combine_kernels2d (conv of the flipped kernel with a minus,
    # equal to correlation)
    from scipy.signal import convolve2d

    kx = convolve2d(g2, dx, mode="full")
    ky = convolve2d(g2, dy, mode="full")
    return kx, ky


def conv2d_same(plane, kern):
    """Depthwise 'same' 2D correlation of (C, H, W) with (k, k)."""
    C, H, W = plane.shape
    k = kern.shape[0]
    kern = jnp.asarray(kern, dtype=plane.dtype).reshape(1, 1, k, k)
    out = jax.lax.conv_general_dilated(
        plane[:, None],  # (C, 1, H, W)
        kern,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[:, 0]


def conv1d_same(line, kern):
    C, L = line.shape
    k = kern.shape[0]
    kern = jnp.asarray(kern, dtype=line.dtype).reshape(1, 1, k)
    out = jax.lax.conv_general_dilated(
        line[:, None],
        kern,
        window_strides=(1,),
        padding="SAME",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out[:, 0]


def max_pool_3d(vol, ks: int = 3):
    """3D max pool, stride 1, 'same' padding (alphagrid.py:256-258)."""
    pad = ks // 2
    return jax.lax.reduce_window(
        vol,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(ks, ks, ks),
        window_strides=(1, 1, 1),
        padding=((pad, pad), (pad, pad), (pad, pad)),
    )
