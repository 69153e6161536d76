"""Multiresolution hash-grid radiance field (instant-ngp style).

TPU-native equivalent of both reference hash fields: the pure-torch
``fields/hashgrid.py:82-229`` (HashEmbedder + HashGridRF; note the reference
module is import-broken as-is, SURVEY.md 2.4) and the tinycudann-backed
``fields/tcnn.py:16-103`` (TCNNRF). The encoding is gathers + trilinear
lerp -- exactly the math tinycudann's CUDA kernels implement, expressed so
XLA fuses it.
"""
import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..modules.mlp import MLP, create_mlp
from ..ops import safemath

PRIMES = (1, 2654435761, 805459861)


def _hash_cell(coords, log2_size):
    """coords: (..., 3) int -> (...,) int32 hash index (uint32 wraparound
    arithmetic, instant-ngp spatial hash)."""
    c = coords.astype(jnp.uint32)
    h = c[..., 0] * jnp.uint32(PRIMES[0])
    h = h ^ (c[..., 1] * jnp.uint32(PRIMES[1]))
    h = h ^ (c[..., 2] * jnp.uint32(PRIMES[2]))
    return (h & jnp.uint32(2 ** log2_size - 1)).astype(jnp.int32)


@struct.dataclass
class HashEncoding:
    tables: Any  # (L, T, F)
    base_resolution: int = struct.field(pytree_node=False, default=16)
    finest_resolution: int = struct.field(pytree_node=False, default=512)
    log2_hashmap_size: int = struct.field(pytree_node=False, default=19)

    @property
    def n_levels(self):
        return self.tables.shape[0]

    @property
    def n_features(self):
        return self.tables.shape[2]

    def dim(self):
        return self.n_levels * self.n_features

    def __call__(self, x_unit):
        """x_unit: (..., 3) in [0, 1] -> (..., L*F)."""
        L = self.n_levels
        b = math.exp((math.log(self.finest_resolution)
                      - math.log(self.base_resolution)) / max(L - 1, 1))
        outs = []
        for l in range(L):
            reso = int(math.floor(self.base_resolution * b ** l))
            xs = x_unit * reso
            x0 = jnp.floor(xs).astype(jnp.int32)
            f = xs - x0
            acc = 0.0
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        corner = x0 + jnp.asarray([dx, dy, dz])
                        idx = _hash_cell(corner, self.log2_hashmap_size)
                        w = ((f[..., 0] if dx else 1 - f[..., 0])
                             * (f[..., 1] if dy else 1 - f[..., 1])
                             * (f[..., 2] if dz else 1 - f[..., 2]))
                        acc = acc + self.tables[l][idx] * w[..., None]
            outs.append(acc)
        return jnp.concatenate(outs, axis=-1)


@struct.dataclass
class HashGridRF:
    """Hash-encoded field with separate density/appearance heads
    (fields/tcnn.py:16-103 shape: encoding -> small MLP, density branch +
    app branch)."""
    encoding: HashEncoding
    density_mlp: MLP
    app_mlp: MLP
    aabb: Any

    app_dim: int = struct.field(pytree_node=False, default=24)
    activation: str = struct.field(pytree_node=False, default="exp")
    density_shift: float = struct.field(pytree_node=False, default=-1.0)
    distance_scale: float = struct.field(pytree_node=False, default=25.0)
    contract_space: bool = struct.field(pytree_node=False, default=False)
    step_ratio: float = struct.field(pytree_node=False, default=0.5)
    numer_grad: bool = struct.field(pytree_node=False, default=False)
    grid_size: Tuple[int, int, int] = struct.field(
        pytree_node=False, default=(512, 512, 512))
    lr: float = struct.field(pytree_node=False, default=1e-2)
    lr_net: float = struct.field(pytree_node=False, default=1e-3)
    separate_appgrid: bool = struct.field(pytree_node=False, default=False)

    @property
    def fused_normals_ok(self) -> bool:
        return True  # compute_all falls back to autodiff normals internally

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

    def _unit(self, xyz):
        return jnp.clip((xyz[..., :3] - self.aabb[0]) / self.aabb_size, 0, 1)

    def feature2density(self, feat):
        if self.activation == "exp":
            return safemath.trunc_exp(feat + self.density_shift)
        if self.activation == "softplus":
            return jax.nn.softplus(jnp.clip(feat, -15, 1e3)
                                   + self.density_shift)
        return jax.nn.relu(feat + self.density_shift)

    def _features(self, xyz):
        return self.encoding(self._unit(xyz))

    def compute_densityfeature(self, xyz, activate=True):
        feat = self._features(xyz)
        sig = self.density_mlp(feat)[..., 0]
        return self.feature2density(sig) if activate else sig

    def compute_appfeature(self, xyz):
        feat = self._features(xyz)
        return self.app_mlp(feat)

    def compute_feature(self, xyz):
        feat = self._features(xyz)
        sig = self.feature2density(self.density_mlp(feat)[..., 0])
        return sig, self.app_mlp(feat)

    def compute_all(self, xyz, with_normals=False):
        """Fused query: one hash-encoding pass feeds both heads (the
        renderer's fused path; normals fall back to autodiff)."""
        feat = self._features(xyz)
        sigma = self.feature2density(self.density_mlp(feat)[..., 0])
        app = self.app_mlp(feat)
        normals = self.compute_normals(xyz) if with_normals else None
        return sigma, app, normals

    def compute_normals(self, xyz):
        def sig_fn(pts3):
            feat = self.encoding(
                jnp.clip((pts3 - self.aabb[0]) / self.aabb_size, 0, 1))
            return self.density_mlp(feat)[..., 0].sum()

        g = jax.grad(sig_fn)(xyz[..., :3])
        return safemath.normalize(-g)

    def check_schedule(self, iteration, batch_mul=1):
        return self, False

    def density_L1(self):
        return jnp.abs(self.encoding.tables).mean()

    def tv_loss_density(self):
        return jnp.zeros(())

    def tv_loss_app(self):
        return jnp.zeros(())

    def vector_comp_diffs(self):
        return jnp.zeros(())


def init_hashgrid_rf(key, aabb, n_levels=16, n_features=2,
                     log2_hashmap_size=19, base_resolution=16,
                     finest_resolution=512, app_dim=24, hidden_w=64,
                     **kwargs):
    k1, k2, k3 = jax.random.split(key, 3)
    tables = 1e-4 * (2 * jax.random.uniform(
        k1, (n_levels, 2 ** log2_hashmap_size, n_features)) - 1)
    enc = HashEncoding(tables=tables, base_resolution=base_resolution,
                       finest_resolution=finest_resolution,
                       log2_hashmap_size=log2_hashmap_size)
    density_mlp = create_mlp(k2, enc.dim(), 1, num_layers=2,
                             hidden_w=hidden_w)
    app_mlp = create_mlp(k3, enc.dim(), app_dim, num_layers=2,
                         hidden_w=hidden_w)
    statics = {k: v for k, v in kwargs.items()
               if k in HashGridRF.__dataclass_fields__}
    return HashGridRF(encoding=enc, density_mlp=density_mlp,
                      app_mlp=app_mlp, aabb=jnp.asarray(aabb, jnp.float32),
                      app_dim=app_dim, **statics)
