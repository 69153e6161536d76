"""Scene composition: union of multiple trained fields.

Reference ``fields/listrf.py:1-87`` (ListRF): per-field rigid offset +
rotation, density = max over fields, appearance taken from the field with
the largest density at each point. Used by the composition/relighting demos
(scripts/toaster_on_car.py:51-54).
"""
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.safemath import normalize


@struct.dataclass
class ListRF:
    fields: Tuple[Any, ...]
    offsets: Any    # (F, 3)
    rotations: Any  # (F, 3, 3) world->field
    # union of the shifted per-field AABBs (the reference demo intends the
    # same union at toaster_on_car.py:45-49 but unions aabb1 with itself);
    # None -> field 0's box
    aabb_union: Any = None

    @property
    def app_dim(self):
        return self.fields[0].app_dim

    @property
    def aabb(self):
        return (self.aabb_union if self.aabb_union is not None
                else self.fields[0].aabb)

    @property
    def distance_scale(self):
        return self.fields[0].distance_scale

    @property
    def grid_size(self):
        return self.fields[0].grid_size

    @property
    def stepsize(self):
        return min(f.stepsize for f in self.fields)

    @property
    def n_samples(self):
        return max(f.n_samples for f in self.fields)

    @property
    def separate_appgrid(self):
        return True

    def _local(self, i, xyz):
        p = (xyz[..., :3] - self.offsets[i]) @ self.rotations[i].T
        return jnp.concatenate([p, xyz[..., 3:]], axis=-1)

    def normalize_coord(self, xyz):
        return self.fields[0].normalize_coord(xyz)

    def compute_densityfeature(self, xyz, activate=True):
        sigmas = jnp.stack([
            f.compute_densityfeature(self._local(i, xyz), activate=activate)
            for i, f in enumerate(self.fields)])
        return sigmas.max(axis=0)

    def _argmax_field(self, xyz):
        sigmas = jnp.stack([
            f.compute_densityfeature(self._local(i, xyz))
            for i, f in enumerate(self.fields)])
        return jnp.argmax(sigmas, axis=0)

    def compute_appfeature(self, xyz):
        which = self._argmax_field(xyz)
        feats = jnp.stack([
            f.compute_appfeature(self._local(i, xyz))
            for i, f in enumerate(self.fields)])
        return jnp.take_along_axis(
            feats, which[None, :, None], axis=0)[0]

    def compute_normals(self, xyz):
        which = self._argmax_field(xyz)
        norms = jnp.stack([
            f.compute_normals(self._local(i, xyz)) @ self.rotations[i]
            for i, f in enumerate(self.fields)])
        out = jnp.take_along_axis(norms, which[None, :, None], axis=0)[0]
        return normalize(out)

    def feature2density(self, feat):
        return self.fields[0].feature2density(feat)

    def check_schedule(self, iteration, batch_mul=1):
        return self, False

    def density_L1(self):
        return sum(f.density_L1() for f in self.fields)

    def tv_loss_density(self):
        return sum(f.tv_loss_density() for f in self.fields)

    def tv_loss_app(self):
        return sum(f.tv_loss_app() for f in self.fields)

    def vector_comp_diffs(self):
        return sum(f.vector_comp_diffs() for f in self.fields)

    # schedule-related statics proxied from field 0
    @property
    def lr(self):
        return self.fields[0].lr

    @property
    def lr_net(self):
        return self.fields[0].lr_net


def make_listrf(fields, offsets=None, rotations=None):
    F = len(fields)
    if offsets is None:
        offsets = jnp.zeros((F, 3))
    if rotations is None:
        rotations = jnp.broadcast_to(jnp.eye(3), (F, 3, 3))
    offsets = jnp.asarray(offsets, jnp.float32)
    lo = jnp.stack([jnp.asarray(f.aabb[0]) + offsets[i]
                    for i, f in enumerate(fields)]).min(axis=0)
    hi = jnp.stack([jnp.asarray(f.aabb[1]) + offsets[i]
                    for i, f in enumerate(fields)]).max(axis=0)
    return ListRF(fields=tuple(fields), offsets=offsets,
                  rotations=jnp.asarray(rotations, jnp.float32),
                  aabb_union=jnp.stack([lo, hi]))
