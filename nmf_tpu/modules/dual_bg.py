"""Multi-environment background for dual-scene training.

Reference ``modules/dual_bg.py:3-57`` (MultiBG): a list of bg modules with a
selector index set per-dataset by the dual training driver
(train_dualbg.py:267-268). The index is a static field so each dataset's
step compiles against its own envmap."""
from typing import Any, Tuple

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class MultiBG:
    bgs: Tuple[Any, ...]
    bg_index: int = struct.field(pytree_node=False, default=0)

    @property
    def active(self):
        return self.bgs[self.bg_index]

    # pass-throughs used by the renderer / trainer
    @property
    def lr(self):
        return self.active.lr

    @property
    def mipbias_lr(self):
        return self.active.mipbias_lr

    @property
    def brightness_lr(self):
        return self.active.brightness_lr

    @property
    def mul_lr(self):
        return self.active.mul_lr

    @property
    def betas(self):
        return self.active.betas

    @property
    def mul_betas(self):
        return self.active.mul_betas

    def prepare(self, with_sh=True):
        return self.active.prepare(with_sh=with_sh)

    def mean_color(self):
        return self.active.mean_color()

    def tv_loss(self):
        return self.active.tv_loss()

    def get_spherical_harmonics(self, G=100, mipval=-5.0, cache=None):
        return self.active.get_spherical_harmonics(G, mipval, cache=cache)

    def __call__(self, viewdirs, sa_sample, cache=None, key=None):
        return self.active(viewdirs, sa_sample, cache=cache, key=key)

    def select(self, idx: int):
        return self.replace(bg_index=idx)
