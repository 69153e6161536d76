"""Plain TensoRF shading: a single view-dependent diffuse head.

Reference ``models/tensorf.py:12-97`` -- the model used by the
``model=tensorf`` config (the minimum end-to-end slice)."""
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..modules.render_modules import MLPRenderFea, init_mlp_render_fea


@struct.dataclass
class TensoRFShade:
    diffuse_module: Any  # MLPRenderFea or MLPRenderPE

    def needs_normals(self, recur: int) -> bool:
        return False

    def check_schedule(self, iteration: int, batch_mul: int = 1):
        return self, False

    def calibrate(self, *args, **kwargs):
        return self

    def update_n_samples(self, n_samples):
        return self

    @property
    def outputs(self):
        return {}

    def shade(self, xyz, xyz_normed, app_features, viewdirs, normals,
              weights, valid, B, **kwargs):
        rgb = self.diffuse_module(xyz_normed, viewdirs, app_features)
        return rgb, {}


def init_tensorf_shade(key, app_dim, viewpe=6, feape=6, pospe=6,
                       featureC=128, lr=1e-3, head="fea", **_):
    """head='fea' -> MLPRender_Fea (render_modules.py:201), head='pe' ->
    MLPRender_PE (:912, positionally encoded sample position)."""
    if head == "pe":
        from ..modules.render_modules import init_mlp_render_pe

        dm = init_mlp_render_pe(key, app_dim, viewpe=viewpe, pospe=pospe,
                                featureC=featureC, lr=lr)
    else:
        dm = init_mlp_render_fea(key, app_dim, viewpe=viewpe, feape=feape,
                                 featureC=featureC, lr=lr)
    return TensoRFShade(diffuse_module=dm)
