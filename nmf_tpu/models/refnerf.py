"""Ref-NeRF shading: reflected-direction MLP + diffuse, no ray retracing.

Reference ``models/refnerf.py:8-198``: predicts diffuse/tint/roughness from
the diffuse head, queries a reflection MLP (MLPRender_FP with an ISH/IPE
encoder of the reflected direction) and combines ``diffuse + tint * spec``.
"""
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..modules.mlp import MLP, create_mlp
from ..ops.safemath import normalize, positional_encoding


@struct.dataclass
class RefMLP:
    """MLPRender_FP (render_modules.py:238-299): spec color from reflected
    direction + features + viewdotnorm."""
    mlp: MLP
    ref_encoder: Optional[Any] = None
    feape: int = struct.field(pytree_node=False, default=-1)
    activation: str = struct.field(pytree_node=False, default="softplus")
    offset: float = struct.field(pytree_node=False, default=0.0)
    lr: float = struct.field(pytree_node=False, default=1e-3)

    def __call__(self, pts, viewdirs, features, refdirs, roughness,
                 viewdotnorm):
        indata = [refdirs, viewdotnorm]
        if self.feape > -1:
            indata.append(features)
        if self.feape > 0:
            indata.append(positional_encoding(features, self.feape))
        if self.ref_encoder is not None:
            B = pts.shape[0]
            indata.append(self.ref_encoder(refdirs, roughness).reshape(B, -1))
        out = self.mlp(jnp.concatenate(indata, axis=-1)) + self.offset
        if self.activation == "softplus":
            return jax.nn.softplus(out)
        if self.activation == "sigmoid":
            return jax.nn.sigmoid(out)
        if self.activation == "exp":
            return jnp.exp(jnp.clip(out, None, 10))
        return out


@struct.dataclass
class RefNeRF:
    diffuse_module: Any
    ref_module: RefMLP

    def needs_normals(self, recur: int) -> bool:
        return True

    @property
    def outputs(self):
        return {"diffuse": 3, "roughness": 1, "tint": 3, "spec": 3}

    def check_schedule(self, iteration: int, batch_mul: int = 1):
        return self, False

    def update_n_samples(self, n_samples):
        return self

    def calibrate(self, key, xyz, feat, bg_brightness):
        return self

    def shade(self, xyz, xyz_normed, app_features, viewdirs, normals,
              weights, valid, B, render_reflection, bg_module, bg_cache,
              is_train, recur, key):
        diffuse, tint, matprop = self.diffuse_module(
            xyz_normed, viewdirs, app_features, std=0.0)
        # reflect view about the normal
        VdotN = (-viewdirs * normals).sum(-1, keepdims=True)
        refdirs = 2 * VdotN * normals + viewdirs
        roughness = matprop["r1"][..., 0]
        spec = self.ref_module(xyz_normed, viewdirs, app_features, refdirs,
                               roughness, VdotN)
        rgb = diffuse + tint * spec
        debug = {"diffuse": diffuse, "tint": tint,
                 "roughness": matprop["r1"], "spec": spec}
        return rgb, debug


def init_refnerf(key, app_dim, diffuse_module=None, ref_module_cfg=None,
                 **kwargs):
    from ..modules.ish import ListISH
    from ..modules.render_modules import init_rand_hydra_diffuse

    k1, k2 = jax.random.split(key)
    if diffuse_module is None:
        diffuse_module = init_rand_hydra_diffuse(k1, app_dim)
    cfg = ref_module_cfg or {}
    feape = cfg.get("feape", -1)
    ref_encoder = cfg.get("ref_encoder", ListISH((0, 1, 2, 4)))
    in_w = 3 + 1
    if feape > -1:
        in_w += 2 * max(feape, 0) * app_dim + app_dim
    if ref_encoder is not None:
        in_w += ref_encoder.dim()
    mlp = create_mlp(k2, in_w, 3, num_layers=cfg.get("num_layers", 3),
                     hidden_w=cfg.get("hidden_w", 128),
                     initializer=cfg.get("initializer", "kaiming"))
    ref_module = RefMLP(mlp=mlp, ref_encoder=ref_encoder, feape=feape,
                        activation=cfg.get("activation", "softplus"),
                        offset=cfg.get("offset", 0.0),
                        lr=cfg.get("lr", 1e-3))
    return RefNeRF(diffuse_module=diffuse_module, ref_module=ref_module)


@struct.dataclass
class DualModel:
    """Warmup/recursion model switching (models/dual_model.py:5-62):
    model1 handles recursive passes and early iterations, model2 after."""
    model1: Any
    model2: Any
    switch_iter: int = struct.field(pytree_node=False, default=0)
    use_model2: bool = struct.field(pytree_node=False, default=False)

    def needs_normals(self, recur: int) -> bool:
        return self.model1.needs_normals(recur) or self.model2.needs_normals(recur)

    @property
    def outputs(self):
        return self.model2.outputs if self.use_model2 else self.model1.outputs

    def check_schedule(self, iteration: int, batch_mul: int = 1):
        m1, c1 = self.model1.check_schedule(iteration, batch_mul)
        m2, c2 = self.model2.check_schedule(iteration, batch_mul)
        new = self.replace(model1=m1, model2=m2)
        if not self.use_model2 and iteration >= self.switch_iter * batch_mul:
            return new.replace(use_model2=True), True
        return new, c1 or c2

    def update_n_samples(self, n_samples):
        return self

    def calibrate(self, key, xyz, feat, bg_brightness):
        k1, k2 = jax.random.split(key)
        return self.replace(
            model1=self.model1.calibrate(k1, xyz, feat, bg_brightness),
            model2=self.model2.calibrate(k2, xyz, feat, bg_brightness))

    def shade(self, *args, recur=0, **kwargs):
        active = (self.model1 if (recur > 0 or not self.use_model2)
                  else self.model2)
        return active.shade(*args, recur=recur, **kwargs)
