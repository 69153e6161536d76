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
