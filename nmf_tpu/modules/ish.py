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


@struct.dataclass
class FullISHScaled:
    """FullISH with vMF band attenuation from roughness (ish.py:119-130)."""
    max_degree: int = struct.field(pytree_node=False, default=1)

    def dim(self) -> int:
        return (self.max_degree + 1) ** 2

    def __call__(self, vecs, roughness):
        kappa = 1.0 / (roughness + 1e-8)
        return sh.eval_sh_bases_scaled(self.dim(), vecs, kappa.reshape(-1))


def _legendre_coeffs(l: int) -> Tuple[float, ...]:
    from scipy.special import legendre as legendrecoeffs

    return tuple(float(c) for c in legendrecoeffs(l).c[::-1])


@struct.dataclass
class SHBasis:
    """Single-degree attenuated basis [Y_l^0, Re Y_l^l, Im Y_l^l]
    (reference ish.py:37-60). Static coefficients; no parameters."""
    deg: int = struct.field(pytree_node=False, default=1)

    def dim(self) -> int:
        return 3

    def __call__(self, theta, phi, kappa):
        import math

        l = self.deg
        c = jnp.asarray(_legendre_coeffs(l))
        x = jnp.cos(theta)
        xpow = x[..., None] ** jnp.arange(len(c))
        v = (xpow * c).sum(-1)
        y0 = math.sqrt((2 * l + 1) / 4 / math.pi) * v
        logcoeff = (-2 * math.log(max(l, 1)) - math.lgamma(l + 1)
                    + 0.5 * (math.lgamma(2 * l + 2) - math.log(4 * math.pi)))
        coeff = (-1) ** l * math.exp(logcoeff)
        sl = jnp.sin(theta) ** l
        yl1 = coeff * sl * jnp.cos(l * phi)
        yl2 = coeff * sl * jnp.sin(l * phi)
        a = sh.Al(l, kappa)
        return a * jnp.concatenate([y0, yl1, yl2], axis=-1)


def _dirs_to_angles(vec):
    from ..ops.safemath import safe_atan2

    a, b, c = vec[:, 0:1], vec[:, 1:2], vec[:, 2:3]
    norm2d = jnp.sqrt(a ** 2 + b ** 2)
    phi = safe_atan2(b, a)
    theta = safe_atan2(c, norm2d) - jnp.pi / 2
    return theta, phi


@struct.dataclass
class ISH:
    """Power-of-two degree stack of SHBasis (reference ish.py:139-157)."""
    max_degree: int = struct.field(pytree_node=False, default=1)

    def dim(self) -> int:
        return 3 * self.max_degree

    def __call__(self, vec, roughness):
        kappa = 1.0 / (roughness + 1e-8)
        theta, phi = _dirs_to_angles(vec)
        outs = [SHBasis(deg=int(2 ** i))(theta, phi, kappa[..., None])
                for i in range(self.max_degree)]
        return jnp.concatenate(outs, axis=-1)


def _random_rotations(n: int, seed: int) -> Tuple[Tuple[float, ...], ...]:
    import numpy as np
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(seed)
    angs = rng.uniform(0, 2 * np.pi, (n, 3))
    mats = [Rotation.from_euler("xyz", a).as_matrix() for a in angs]
    return tuple(tuple(float(v) for v in m.reshape(-1)) for m in mats)


@struct.dataclass
class RandISH:
    """rand_n randomly rotated single-degree bases, 2 channels each
    (reference ish.py:203-264)."""
    rand_n: int = struct.field(pytree_node=False, default=8)
    std: float = struct.field(pytree_node=False, default=10.0)
    seed: int = struct.field(pytree_node=False, default=0)

    def _setup(self):
        import numpy as np

        rng = np.random.default_rng(self.seed + 1)
        degs = np.clip(rng.normal(0, self.std, (self.rand_n,)), 1, 9
                       ).astype(int)
        return _random_rotations(self.rand_n, self.seed), degs

    def dim(self) -> int:
        return self.rand_n * 2

    def __call__(self, vec, roughness):
        kappa = (1.0 / (roughness + 1e-8)).reshape(-1, 1)
        mats, degs = self._setup()
        outs = []
        for m, deg in zip(mats, degs):
            mat = jnp.asarray(m).reshape(3, 3)
            rvec = vec @ mat
            theta, phi = _dirs_to_angles(rvec)
            basis = SHBasis(deg=int(deg))(theta, phi, kappa)
            ind = 1 if deg > 0 else 2
            outs.append(jnp.stack([basis[:, 0], basis[:, ind]], axis=1))
        return jnp.concatenate(outs, axis=1)


@struct.dataclass
class RandRotISH:
    """Core ListISH plus rand_n rotated high-degree ListISH copies
    (reference ish.py:174-201)."""
    rand_n: int = struct.field(pytree_node=False, default=4)
    core_degs: Tuple[int, ...] = struct.field(pytree_node=False,
                                              default=(1, 2, 4, 8))
    rand_degs: Tuple[int, ...] = struct.field(pytree_node=False, default=(8,))
    seed: int = struct.field(pytree_node=False, default=0)

    def dim(self) -> int:
        return (self.rand_n * sh.sh_basis_dim(self.rand_degs)
                + sh.sh_basis_dim(self.core_degs))

    def __call__(self, vec, roughness):
        B = vec.shape[0]
        core = ListISH(degs=self.core_degs)(vec, roughness)
        mats = jnp.asarray(_random_rotations(self.rand_n, self.seed)
                           ).reshape(self.rand_n, 3, 3)
        rvecs = jnp.einsum("bk,nkj->bnj", vec, mats).reshape(-1, 3)
        rrough = jnp.repeat(roughness.reshape(B, 1), self.rand_n, 1
                            ).reshape(-1)
        rbasis = ListISH(degs=self.rand_degs)(rvecs, rrough).reshape(B, -1)
        return jnp.concatenate([core, rbasis], axis=-1)


@struct.dataclass
class LHyperGeom:
    """Truncated generalized hypergeometric series (reference ish.py:63-95);
    used by the fractional-degree Y0 experiments."""
    upper: Tuple[float, ...] = struct.field(pytree_node=False, default=())
    lower: Tuple[float, ...] = struct.field(pytree_node=False, default=())
    N: int = struct.field(pytree_node=False, default=20)

    def _coeffs(self):
        import functools
        import math
        import operator

        def rising(z, m):
            if m == 0:
                return 1.0
            if z < 0 and z % 1 == 0:
                return 0.0
            return math.gamma(z + m) / math.gamma(z)

        up = [functools.reduce(operator.mul,
                               [rising(a, k) for a in self.upper], 1.0)
              / math.factorial(k) for k in range(self.N)]
        lo = [functools.reduce(operator.mul,
                               [rising(a, k) for a in self.lower], 1.0)
              for k in range(self.N)]
        return jnp.asarray(up), jnp.asarray(lo)

    def __call__(self, x):
        up, lo = self._coeffs()
        expx = x[..., None] ** jnp.arange(self.N)
        return (up * expx / lo).sum(axis=-1)


ENCODERS.update({"FullISHScaled": FullISHScaled, "SHBasis": SHBasis,
                 "ISH": ISH, "RandISH": RandISH, "RandRotISH": RandRotISH})
