"""Learnable equirectangular environment map with integral (SAT) filtering.

Re-implements the reference ``modules/integral_equirect.py`` (IntegralEquirect
:176-504, integrate_area* :18-173) in JAX:

- The summed-area table is built once per training step in ``prepare()`` and
  threaded through every query (the reference rebuilds it inside *every*
  forward call, integral_equirect.py:431-433 -- SURVEY.md flags this as a
  prime fusion target; hoisting it is the single biggest envmap win).
- The wrap/pole handling of integrate_area_wrap (:96-173) is rewritten
  branch-free: wrapped-rectangle contributions are always computed and
  masked, instead of boolean-indexed subsets.
"""
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import sh
from ..ops.grid_sample import quad_gather_2d, quad_gather_2d_binsum
from ..ops.safemath import safe_atan2

EPS = float(jnp.finfo(jnp.float32).eps)
SAT_SCALE = 1000.0


# columns of periodic padding on each side of the SAT; covers the widest
# box half-width the mip clip allows (2^7/h/2 normalized -> ~64 px) plus
# slack, so seam-crossing boxes never need a second rectangle
SAT_PAD = 72
# rows of pole-mirror padding above/below: the equirect continuation across
# a pole is the map flipped vertically and rotated 180 deg in azimuth, so a
# pole-crossing box is ALSO a single rectangle in the extended domain
# (the reference instead adds explicit overhang rectangles,
# integral_equirect.py:96-173). Max pole overhang = 2^7/h/2 normalized
# -> 32 rows at h=512.
SAT_VPAD = 40


def _integrate_box(bl, br, tl, tr, size, cum_mat, W, H, binsum=False):
    """SAT box integral over the wrap/pole-extended table: ONE rectangle,
    4 corner lookups, each a single quad-gathered row.

    The reference evaluates up to 9 rectangles x 4 grid_sample corners
    (36 bilinear lookups = 144 gather rows) per query
    (integral_equirect.py:42-173); the extended-domain SAT needs 4.

    Corner coords are normalized to the ORIGINAL (H, W) grid; cum_mat is
    (C, H + 2*V, W + 2*E).
    """
    He, We = cum_mat.shape[-2], cum_mat.shape[-1]
    E = (We - W) // 2
    V = (He - H) // 2
    emax = 2 * E / max(W - 1, 1)
    vmax = 2 * V / max(H - 1, 1)

    def to_ext(c):
        col = (jnp.clip(c[..., 0], -1 - emax, 1 + emax) + 1) * 0.5 * (W - 1) + E
        row = (jnp.clip(c[..., 1], -1 - vmax, 1 + vmax) + 1) * 0.5 * (H - 1) + V
        return jnp.stack([2 * col / (We - 1) - 1, 2 * row / (He - 1) - 1],
                         axis=-1)

    corners = jnp.stack([to_ext(bl), to_ext(br), to_ext(tl), to_ext(tr)])
    qg = quad_gather_2d_binsum if binsum else quad_gather_2d
    vals = qg(cum_mat, corners)  # (4, N, C)
    return (vals[3] + vals[0] - vals[2] - vals[1]) / size[..., None]


@struct.dataclass
class IntegralEquirect:
    bg_mat: Any       # (3, H, 2H)
    mipbias: Any      # learnable scalar
    brightness: Any   # learnable scalar
    mul: Any          # learnable scalar

    activation: str = struct.field(pytree_node=False, default="exp")
    mipnoise: float = struct.field(pytree_node=False, default=0.0)
    # Pallas bin-sum scatter for the SAT backward (collision-heavy:
    # concentrated reflections pile gradient rows onto few texels)
    scatter_kernel: bool = struct.field(pytree_node=False, default=False)
    # Opt-in EXTENSION (not in the reference, which detaches the SH
    # irradiance entirely: torch.no_grad + .detach at microfacet.py:305-316).
    # With sh_grad=true the diffuse shading term backpropagates into the
    # envmap's SH projection, giving the map a coarse-scale training signal.
    # Closes the deconvolution null space on glossy-only scenes where every
    # escape ray carries a sharp footprint (BASELINE.md envmap root-cause;
    # tests/test_bg.py::TestEnvmapIdentifiabilityOracle).
    sh_grad: bool = struct.field(pytree_node=False, default=False)
    lr: float = struct.field(pytree_node=False, default=0.02)
    mipbias_lr: float = struct.field(pytree_node=False, default=1e-4)
    brightness_lr: float = struct.field(pytree_node=False, default=0.0)
    mul_lr: float = struct.field(pytree_node=False, default=0.0)
    betas: Tuple[float, float] = struct.field(
        pytree_node=False, default=(0.9, 0.99))
    mul_betas: Tuple[float, float] = struct.field(
        pytree_node=False, default=(0.9, 0.9))

    # ------------------------------------------------------------------
    def hw(self):
        return self.bg_mat.shape[-2], self.bg_mat.shape[-1]

    def activation_fn(self, x):
        x = self.brightness + self.mul * x
        if self.activation == "softplus":
            return jax.nn.softplus(6.0 * x) / 6.0
        if self.activation == "clip":
            return jnp.clip(x, 1e-3)
        if self.activation == "identity":
            return x
        return jnp.exp(jnp.clip(x, None, 20))

    def mean_color(self):
        return self.activation_fn(self.bg_mat).reshape(3, -1).mean(axis=-1)

    def tv_loss(self):
        img = self.bg_mat
        tv_h = jnp.abs(img[:, 1:, :-1] - img[:, :-1, :-1])
        tv_w = jnp.abs(img[:, :-1, 1:] - img[:, :-1, :-1])
        return (tv_h + tv_w + 1e-8).mean()

    def prepare(self, with_sh: bool = True):
        """Per-step cache: activated map + SAT + pole rows (+ SH irradiance
        coefficients, so shading passes don't re-project the envmap -- the
        reference recomputes both the SAT and the SH projection inside every
        forward, integral_equirect.py:431-433 / microfacet.py:304-318)."""
        activated = self.activation_fn(self.bg_mat)  # (3, H, W)
        H, W = activated.shape[-2], activated.shape[-1]
        # pole-mirror row padding: ext row -s == row s rotated 180deg in
        # azimuth; ext row (H-1)+s == row (H-1)-s rotated. Makes every
        # pole-crossing box a single rectangle.
        V = min(SAT_VPAD, H - 1)
        shifted = jnp.roll(activated, W // 2, axis=-1)
        top = shifted[:, 1:V + 1][:, ::-1]
        bot = shifted[:, H - 1 - V:H - 1][:, ::-1]
        vert = jnp.concatenate([top, activated, bot], axis=1)
        # periodic column padding so seam-crossing boxes are one rectangle
        E = min(SAT_PAD, W)
        ext = jnp.concatenate([vert[..., -E:], vert, vert[..., :E]], axis=-1)
        cum = jnp.cumsum(jnp.cumsum(ext / SAT_SCALE, axis=1), axis=2)
        cache = {
            "cum_mat": cum,
            "top_row": activated[:, 0, :].mean(axis=-1),
            "bot_row": activated[:, -1, :].mean(axis=-1),
        }
        if with_sh:
            _, conv = self.get_spherical_harmonics(100, cache=cache)
            cache["sh_conv_coeffs"] = (
                conv if self.sh_grad else jax.lax.stop_gradient(conv))
        return cache

    def sa2mip(self, u, sa_sample):
        """Solid angle -> (mip_w, mip_h) footprint levels
        (integral_equirect.py:373-397)."""
        h, w = self.hw()
        sa = sa_sample.reshape(-1)
        cos = jnp.sqrt(jnp.clip(1 - u[:, 2] ** 2, EPS))
        d = h * w / jnp.clip(2 * math.pi ** 2 * cos, EPS)
        area = jnp.exp(jnp.log(d / 2) + sa)
        fh = jnp.clip(jnp.sqrt(jnp.clip(area, EPS)) * cos, EPS)
        fw = area / fh
        mip_w = jnp.log(fw) / math.log(2) + self.mipbias
        mip_h = jnp.log(fh) / math.log(2) + self.mipbias
        return jnp.clip(mip_w, 0, 7), jnp.clip(mip_h, 0, 7)

    def __call__(self, viewdirs, sa_sample, cache=None, key=None):
        """viewdirs: (N, 3); sa_sample: (N,) log-solid-angle. -> (N, 3)."""
        if cache is None:
            cache = self.prepare()
        h, w = self.hw()
        sa_sample = sa_sample.reshape(-1)
        mip_w, mip_h = self.sa2mip(viewdirs, sa_sample)
        if self.mipnoise > 0 and key is not None:
            kw, kh = jax.random.split(key)
            mip_w = jnp.clip(
                mip_w + self.mipnoise * jax.random.uniform(kw, mip_w.shape), 0, 7)
            mip_h = jnp.clip(
                mip_h + self.mipnoise * jax.random.uniform(kh, mip_h.shape), 0, 7)
        sw = 2.0 ** mip_w / h / 2
        shh = 2.0 ** mip_h / h
        offset = jnp.stack([sw, shh], axis=-1)  # (N, 2)
        size = (offset / 2 * jnp.asarray([w, h])).prod(axis=-1)

        a, b, c = viewdirs[:, 0], viewdirs[:, 1], viewdirs[:, 2]
        norm2d = jnp.sqrt(a ** 2 + b ** 2)
        phi = safe_atan2(b, a)
        theta = safe_atan2(c, norm2d)
        coords = jnp.stack([
            (phi % (2 * math.pi) - math.pi) / math.pi,
            -theta / math.pi * 2,
        ], axis=-1)  # (N, 2)

        half = offset / 2
        bl = coords - half
        tr = coords + half
        br = coords + jnp.stack([sw, -shh], -1) / 2
        tl = coords + jnp.stack([-sw, shh], -1) / 2
        bg_vals = _integrate_box(bl, br, tl, tr, size,
                                 cache["cum_mat"], w, h,
                                 binsum=self.scatter_kernel) * SAT_SCALE

        # pole rows: within 3 texels of a pole use the averaged edge row
        cutoff = 1 - 2 / h * 3
        bg_vals = jnp.where(coords[:, 1:2] > cutoff, cache["bot_row"][None],
                            bg_vals)
        bg_vals = jnp.where(coords[:, 1:2] < -cutoff, cache["top_row"][None],
                            bg_vals)
        return bg_vals

    def get_spherical_harmonics(self, G: int = 100, mipval: float = -5.0,
                                cache=None):
        """Project the envmap onto SH bases; returns (coeffs (9,3),
        lambertian-convolved coeffs / pi) (integral_equirect.py:324-360)."""
        theta = jnp.linspace(0, jnp.pi, G // 2)
        phi = jnp.linspace(0, 2 * jnp.pi, G)
        th, ph = jnp.meshgrid(theta, phi, indexing="ij")
        dirs = jnp.stack([
            jnp.sin(th) * jnp.cos(ph),
            jnp.sin(th) * jnp.sin(ph),
            jnp.cos(th),
        ], axis=-1).reshape(-1, 3)
        SB = dirs.shape[0]
        bg = self(dirs, jnp.full((SB,), mipval), cache=cache)
        evaled = sh.eval_sh_bases(9, dirs)
        coeffs = 2 * jnp.pi ** 2 * (
            bg.reshape(SB, 1, 3) * evaled.reshape(SB, -1, 1)
            * jnp.sin(th).reshape(SB, 1, 1)).mean(axis=0)
        sh_A = sh.lambertian_coeffs(16)[:coeffs.shape[0]]
        conv = sh_A.reshape(-1, 1) * coeffs
        return coeffs, conv / jnp.pi


def init_integral_equirect(key, bg_resolution=512, init_val=-0.6,
                           activation="exp", mipbias=1.0, mipnoise=0.0,
                           lr=0.02, mipbias_lr=1e-4, brightness_lr=0.0,
                           mul_lr=0.0, betas=(0.9, 0.99),
                           mul_betas=(0.9, 0.9), scatter_kernel=False,
                           sh_grad=False, **_):
    data = init_val * jnp.ones((3, bg_resolution, 2 * bg_resolution))
    return IntegralEquirect(
        bg_mat=data,
        mipbias=jnp.asarray(float(mipbias)),
        brightness=jnp.asarray(0.0),
        mul=jnp.asarray(1.0),
        activation=activation, mipnoise=mipnoise, lr=lr,
        mipbias_lr=mipbias_lr, brightness_lr=brightness_lr, mul_lr=mul_lr,
        betas=tuple(betas), mul_betas=tuple(mul_betas),
        scatter_kernel=bool(scatter_kernel), sh_grad=bool(sh_grad))
