"""Integrated spherical harmonic direction encoders.

Reference ``modules/ish.py``: ListISH (:94-105, the encoder used by the NMF
BRDF with degs [0,1,2,4]), FullISH (:107-117), FullISHScaled (:119-130).
"""
from typing import Tuple

import jax.numpy as jnp
from flax import struct

from ..ops import sh


@struct.dataclass
class ListISH:
    degs: Tuple[int, ...] = struct.field(pytree_node=False,
                                         default=(0, 1, 2, 4))

    def dim(self) -> int:
        return sh.sh_basis_dim(self.degs)

    def __call__(self, vecs, roughness=None):
        kappa = 1.0 / (roughness + 1e-3) if roughness is not None else None
        return sh.sh_basis(self.degs, vecs, kappa)


@struct.dataclass
class FullISH:
    max_degree: int = struct.field(pytree_node=False, default=1)

    def dim(self) -> int:
        return (self.max_degree + 1) ** 2

    def __call__(self, vecs, roughness=None):
        return sh.eval_sh_bases(self.dim(), vecs)


ENCODERS = {"ListISH": ListISH, "FullISH": FullISH}
