"""Learned visibility cache (optional; disabled in shipped configs).

Reference ``modules/render_modules.py:117-198`` (VisibilityMLP): predicts
expected termination and sigmoid visibility from (origin, direction,
features); used by the microfacet model to damp retrace selection for
occluded directions (microfacet.py:497-505).
"""
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.safemath import positional_encoding
from .mlp import MLP, create_mlp


@struct.dataclass
class VisibilityMLP:
    mlp: MLP
    feape: int = struct.field(pytree_node=False, default=2)
    lr: float = struct.field(pytree_node=False, default=1e-3)

    def __call__(self, pts, viewdirs, features):
        indata = [viewdirs]
        if self.feape > -1:
            indata.append(features)
        if self.feape > 0:
            indata.append(positional_encoding(features, self.feape))
        out = self.mlp(jnp.concatenate(indata, axis=-1))
        sigvis = jax.nn.sigmoid(out[..., 0])
        eterm = jnp.exp(jnp.clip(out[..., 1], -10, 10))
        return eterm, sigvis

    def loss(self, pts, viewdirs, features, bg_visible):
        """Fit sigvis to reach-background labels (render_modules.py:169-176)."""
        _, sigvis = self(pts, viewdirs, features)
        return ((sigvis - (1.0 - bg_visible.astype(jnp.float32))) ** 2).mean()


def init_visibility_mlp(key, in_channels, feape=2, featureC=128,
                        num_layers=4, lr=1e-3, **_):
    in_w = 3
    if feape > -1:
        in_w += 2 * feape * in_channels + in_channels
    mlp = create_mlp(key, in_w, 2, num_layers=num_layers, hidden_w=featureC,
                     initializer="xavier")
    return VisibilityMLP(mlp=mlp, feape=feape, lr=lr)


@struct.dataclass
class ERBrightSampler:
    """Envmap brightness importance sampler (brdf_samplers/
    equirect_bright_sampler.py:51-99): inverse-CDF sampling of bright
    texels. The warp inv_cdf kernel (:10-44) is jnp.searchsorted here."""

    def sample(self, key, bg_module, n_rays: int, cache=None):
        """Draw n_rays directions proportional to envmap brightness.
        Returns (dirs (n,3), pdf (n,))."""
        brightness = bg_module.activation_fn(bg_module.bg_mat).mean(axis=0)
        h, w = brightness.shape
        # solid-angle weighting per row
        theta = (jnp.arange(h) + 0.5) / h * jnp.pi
        weights = brightness * jnp.sin(theta)[:, None]
        flat = weights.reshape(-1)
        cdf = jnp.cumsum(flat)
        cdf = cdf / cdf[-1]
        k1, k2, k3 = jax.random.split(key, 3)
        u = jax.random.uniform(k1, (n_rays,))
        idx = jnp.searchsorted(cdf, u)
        iy = idx // w
        ix = idx % w
        # jitter within the texel
        jy = (iy + jax.random.uniform(k2, (n_rays,))) / h
        jx = (ix + jax.random.uniform(k3, (n_rays,))) / w
        th = jy * jnp.pi
        # invert the envmap's column mapping: x = (phi mod 2pi - pi)/pi with
        # x = 2*jx - 1  =>  phi = 2*pi*jx
        ph = 2 * jnp.pi * jx
        dirs = jnp.stack([
            jnp.sin(th) * jnp.cos(ph),
            jnp.sin(th) * jnp.sin(ph),
            jnp.cos(th)], axis=-1)
        pdf_texel = flat[idx] / flat.sum()
        sa_texel = (2 * jnp.pi / w) * (jnp.pi / h) * jnp.clip(
            jnp.sin(th), 1e-6)
        return dirs, pdf_texel / sa_texel


def _make_side_basis(i, j, v1, v2, v3):
    import numpy as np
    k = list({0, 1, 2}.difference({i, j}))[0]
    b = np.zeros((3, 3), np.float32)
    b[i, 0] = v1
    b[j, 1] = v2
    b[k, 2] = v3
    return b


# Cube-face bases (reference brdf_samplers/cube_bright_sampler.py:108-120)
_CUBEMAP_BASIS = jnp.asarray(jnp.stack([
    jnp.asarray(_make_side_basis(1, 2, -1, -1, 1)),   # +x
    jnp.asarray(_make_side_basis(1, 2, -1, 1, -1)),   # -x
    jnp.asarray(_make_side_basis(2, 0, 1, 1, 1)),     # +y
    jnp.asarray(_make_side_basis(2, 0, -1, 1, -1)),   # -y
    jnp.asarray(_make_side_basis(1, 0, -1, 1, 1)),    # +z
    jnp.asarray(_make_side_basis(1, 0, -1, -1, -1)),  # -z
]))


def cube_inverse_index(face_ind, ij, res):
    """Cube texel (face, i, j) -> unit direction (cube_bright_sampler.py:78-88)."""
    ij = ij.astype(jnp.float32)
    xy1 = jnp.trunc(res / 2 - (res / 2 - 0.5 - ij))
    xy = -(res - 2 * xy1 - 1) / res
    ones = jnp.ones_like(xy[:, :1])
    xyz = jnp.einsum("nij,nj->ni", _CUBEMAP_BASIS[face_ind],
                     jnp.concatenate([xy, ones], axis=1))
    return xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)


@struct.dataclass
class CubeBrightSampler:
    """Bright-spot importance sampler (brdf_samplers/cube_bright_sampler.py).

    The reference finds the brightest texels of a cubemap background and, per
    shading point, emits Gaussian-jittered rays at those spots (a warp
    scatter kernel, :9-47). Here the spots come from querying ANY background
    module on a cube-face direction lattice (the reference's cubemap bg
    module is dead code), and the jitter/mask step is one vectorized op with
    a static (B, S) spot budget.
    """
    spots: jnp.ndarray      # (S, 3) bright directions, dimmest..brightest
    pix_size: float = struct.field(pytree_node=False, default=0.05)
    scale: int = struct.field(pytree_node=False, default=1)
    cold_start_bg_iters: int = struct.field(pytree_node=False, default=1000)
    update_freq: int = struct.field(pytree_node=False, default=1000)

    def is_initialized(self):
        return bool(jnp.any(self.spots != 0))

    def update(self, bg_module, res=32):
        """Re-rank bright spots from the current background."""
        S = self.spots.shape[0]
        ii, jj = jnp.meshgrid(jnp.arange(res), jnp.arange(res), indexing="ij")
        ij = jnp.stack([ii, jj], -1).reshape(-1, 2)
        ij6 = jnp.tile(ij, (6, 1))
        face = jnp.repeat(jnp.arange(6), res * res)
        dirs = cube_inverse_index(face, ij6, res)
        bright = bg_module(dirs, jnp.full((dirs.shape[0], 1), -100.0)
                           )[0].mean(-1)
        top = jnp.argsort(bright)[-S:]           # ascending: dim..bright
        pix_size = float(2.0 / res)              # texel angular extent (rad)
        return self.replace(spots=dirs[top]), pix_size

    def check_schedule(self, it, batch_mul, bg_module):
        if it % (self.update_freq * batch_mul) == 0 and \
                it > self.cold_start_bg_iters * 2:
            new, pix = self.update(bg_module)
            return new.replace(pix_size=pix)
        return self

    def sample(self, key, V, N):
        """Jittered bright rays per shading point.

        V, N: (B, 3) view dirs / normals. Returns (L (B, S, 3), mask (B, S))
        where mask is LdotN > 0 (the warp kernel's horizon test, :42-47).
        """
        B = V.shape[0]
        S = self.spots.shape[0]
        eps = self.pix_size * jax.random.normal(key, (B, S, 3))
        L = self.spots[None] + eps
        L = L / jnp.clip(jnp.linalg.norm(L, axis=-1, keepdims=True), 1e-8)
        mask = jnp.einsum("bsk,bk->bs", L, N) > 0
        return L, mask
