"""Appearance / material / normal MLP heads.

Functional JAX ports of the reference ``modules/render_modules.py``:
- MLPRender_Fea (:201-235): TensoRF view-dependent color head
- RandHydraMLPDiffuse (:447-574): the NMF default material head with separate
  diffuse/tint/f0/roughness MLPs, calibration biases, and train-time noise
- MLPNormal (:826-892): predicted normals with IPE and near-zero final init
- PE / IPE encoders (:90-114)
"""
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..ops import safemath
from ..ops.safemath import integrated_pos_enc, normalize, positional_encoding
from .mlp import MLP, create_mlp, scale_final_layer


@struct.dataclass
class PE:
    max_degree: int = struct.field(pytree_node=False, default=8)
    in_dim: int = struct.field(pytree_node=False, default=3)

    def dim(self):
        return 2 * self.in_dim * self.max_degree

    def __call__(self, x, roughness=None):
        return positional_encoding(x, self.max_degree)


@struct.dataclass
class IPE:
    max_degree: int = struct.field(pytree_node=False, default=8)
    in_dim: int = struct.field(pytree_node=False, default=3)

    def dim(self):
        return 2 * self.in_dim * self.max_degree

    def __call__(self, viewdirs, roughness):
        size = jnp.broadcast_to(roughness.reshape(-1, 1), viewdirs.shape)
        return integrated_pos_enc((viewdirs, size), 0, self.max_degree)


@struct.dataclass
class MLPRenderFea:
    """View-dependent color head (MLPRender_Fea)."""
    mlp: MLP
    viewpe: int = struct.field(pytree_node=False, default=6)
    feape: int = struct.field(pytree_node=False, default=6)
    lr: float = struct.field(pytree_node=False, default=1e-3)

    def __call__(self, pts, viewdirs, features, **kwargs):
        indata = [features, viewdirs]
        if self.feape > 0:
            indata.append(positional_encoding(features, self.feape))
        if self.viewpe > 0:
            indata.append(positional_encoding(viewdirs, self.viewpe))
        return jax.nn.sigmoid(self.mlp(jnp.concatenate(indata, axis=-1)))


def init_mlp_render_fea(key, in_channels, viewpe=6, feape=6, featureC=128,
                        lr=1e-3, **_):
    in_mlpC = 2 * viewpe * 3 + 2 * feape * in_channels + 3 + in_channels
    mlp = create_mlp(key, in_mlpC, 3, num_layers=3, hidden_w=featureC)
    # final bias zero (reference render_modules.py:220)
    layers = list(mlp.layers)
    layers[-1] = {"w": layers[-1]["w"], "b": jnp.zeros_like(layers[-1]["b"])}
    return MLPRenderFea(mlp=mlp.replace(layers=tuple(layers)),
                        viewpe=viewpe, feape=feape, lr=lr)


@struct.dataclass
class RandHydraMLPDiffuse:
    """NMF material head: albedo/tint/f0/roughness (render_modules.py:447)."""
    diffuse_mlp: MLP
    tint_mlp: MLP
    f0_mlp: MLP
    roughness_mlp: MLP
    # calibration biases live as (non-trainable) leaves so calibrate() can
    # update them without recompilation
    diffuse_bias: Any
    roughness_bias: Any
    # optional view-direction encoders (render_modules.py:493-502,541-557):
    # view_encoder feeds every head, roughness_view_encoder additionally
    # feeds the roughness head only. Shipped configs set both to NULL.
    view_encoder: Optional[Any] = None
    roughness_view_encoder: Optional[Any] = None
    tint_bias: float = struct.field(pytree_node=False, default=0.0)
    f0_bias: float = struct.field(pytree_node=False, default=0.0)
    diffuse_mul: float = struct.field(pytree_node=False, default=1.0)
    pospe: int = struct.field(pytree_node=False, default=-1)
    feape: int = struct.field(pytree_node=False, default=0)
    start_roughness: float = struct.field(pytree_node=False, default=0.35)
    lr: float = struct.field(pytree_node=False, default=1e-3)

    def _inputs(self, pts, features, viewdirs=None):
        size = jnp.broadcast_to(pts[..., 3:4], pts[..., :3].shape)
        p3 = pts[..., :3]
        indata = []
        if self.pospe >= 0:
            indata.append(p3)
        if self.pospe > 0:
            indata.append(integrated_pos_enc((p3, size), 0, self.pospe))
        if self.feape >= 0:
            indata.append(features)
        if self.feape > 0:
            indata.append(positional_encoding(features, self.feape))
        if self.view_encoder is not None:
            B = p3.shape[0]
            rough = jnp.full((B,), 1e-3)
            indata += [self.view_encoder(viewdirs, rough).reshape(B, -1),
                       viewdirs]
        return indata

    def __call__(self, pts, viewdirs, features, std=0.0, key=None, **kwargs):
        indata = self._inputs(pts, features, viewdirs)
        mlp_in = jnp.concatenate(indata, axis=-1)
        if self.roughness_view_encoder is not None:
            B = pts.shape[0]
            rough = jnp.full((B,), 1e-3)
            indata += [self.roughness_view_encoder(viewdirs, rough
                                                   ).reshape(B, -1), viewdirs]
        rough_in = jnp.concatenate(indata, axis=-1)
        diffuse = jax.nn.sigmoid(
            self.diffuse_mul * self.diffuse_mlp(mlp_in) + self.diffuse_bias)
        r = jax.nn.sigmoid(self.roughness_mlp(rough_in)
                           + self.roughness_bias) / 2
        # std may be a traced schedule scalar -> apply unconditionally
        if key is not None:
            kd, kr = jax.random.split(key)
            diffuse = jnp.clip(
                diffuse + jax.random.normal(kd, diffuse.shape) * std, 0, 1)
            r = r + jax.random.normal(kr, r.shape) * std / 2
        r = jnp.clip(r, 1e-2, 1.0)
        tint = jax.nn.sigmoid(self.tint_mlp(mlp_in) + self.tint_bias)
        f0 = jax.nn.sigmoid(self.f0_mlp(mlp_in) + self.f0_bias)
        matprop = {"diffuse": diffuse, "r1": r[..., 0:1], "r2": r[..., 1:2],
                   "f0": f0, "tint": tint}
        return diffuse, tint, matprop

    def calibrate(self, mean_brightness, conserve_energy, pts, viewdirs,
                  features):
        """Shift diffuse/roughness biases to hit target initial brightness
        (render_modules.py:505-517). Returns an updated module."""
        diffuse, tint, extra = self(pts, viewdirs, features)
        diffuse_v = float(safemath.inv_sigmoid(diffuse).mean())
        v = (0.25 if not conserve_energy else 0.5) / float(mean_brightness)
        v = min(max(v, 1e-4), 1 - 1e-4)
        new_diffuse_bias = self.diffuse_bias + (
            math.log(v / (1 - v)) - diffuse_v)
        roughness = (extra["r1"] + extra["r2"]) / 2 / 2
        roughness_v = float(safemath.inv_sigmoid(roughness).mean())
        sr = self.start_roughness
        new_roughness_bias = self.roughness_bias + (
            math.log(sr / (1 - sr)) - roughness_v)
        return self.replace(diffuse_bias=new_diffuse_bias,
                            roughness_bias=new_roughness_bias)


def init_rand_hydra_diffuse(key, in_channels, pospe=-1, feape=0, hidden_w=64,
                            num_layers=1, initializer="xavier_sigmoid",
                            lr=1e-3, start_roughness=0.35, tint_bias=0.0,
                            diffuse_bias=-0.619, diffuse_mul=1.5,
                            roughness_bias=-1.0, f0_bias=0.0,
                            roughness_cfg=None, view_encoder=None,
                            roughness_view_encoder=None, **_):
    in_mlpC = (2 * max(feape, 0) * in_channels + in_channels) if feape >= 0 else 0
    if pospe >= 0:
        in_mlpC += 2 * pospe * 3 + 3
    if view_encoder is not None:
        in_mlpC += view_encoder.dim() + 3
    rough_in = in_mlpC
    if roughness_view_encoder is not None:
        rough_in += roughness_view_encoder.dim() + 3
    keys = jax.random.split(key, 4)
    rc = roughness_cfg or {"hidden_w": hidden_w, "num_layers": num_layers}
    mk = lambda k, out, cfg: create_mlp(
        k, in_mlpC, out, num_layers=cfg["num_layers"],
        hidden_w=cfg["hidden_w"], initializer=initializer)
    cfg = {"hidden_w": hidden_w, "num_layers": num_layers}
    return RandHydraMLPDiffuse(
        diffuse_mlp=mk(keys[0], 3, cfg),
        tint_mlp=mk(keys[1], 3, cfg),
        f0_mlp=mk(keys[2], 3, cfg),
        roughness_mlp=create_mlp(keys[3], rough_in, 2,
                                 num_layers=rc["num_layers"],
                                 hidden_w=rc["hidden_w"],
                                 initializer=initializer),
        diffuse_bias=jnp.asarray(diffuse_bias, jnp.float32),
        roughness_bias=jnp.asarray(roughness_bias, jnp.float32),
        view_encoder=view_encoder,
        roughness_view_encoder=roughness_view_encoder,
        tint_bias=tint_bias, f0_bias=f0_bias, diffuse_mul=diffuse_mul,
        pospe=pospe, feape=feape, start_roughness=start_roughness, lr=lr)


@struct.dataclass
class MLPNormal:
    """Predicted-normal head (render_modules.py:826-892)."""
    mlp: MLP
    pospe: int = struct.field(pytree_node=False, default=12)
    feape: int = struct.field(pytree_node=False, default=-1)
    size_multi: float = struct.field(pytree_node=False, default=2.5e-3)
    lr: float = struct.field(pytree_node=False, default=1e-3)

    def __call__(self, pts, features, geo_norms=None, **kwargs):
        size = jnp.broadcast_to(pts[..., 3:4], pts[..., :3].shape)
        p3 = pts[..., :3]
        indata = []
        if self.pospe >= 0:
            indata.append(p3)
        if self.feape >= 0:
            indata.append(features)
        if self.pospe > 0:
            indata.append(
                integrated_pos_enc((p3, self.size_multi * size), 0, self.pospe))
        if self.feape > 0:
            indata.append(positional_encoding(features, self.feape))
        out = self.mlp(jnp.concatenate(indata, axis=-1))
        return normalize(out)


def init_mlp_normal(key, in_channels, pospe=12, feape=-1, hidden_w=128,
                    num_layers=4, initializer="kaiming", size_multi=2.5e-3,
                    lr=1e-3, **_):
    in_mlpC = 0
    if pospe >= 0:
        in_mlpC += 2 * pospe * 3 + 3
    if feape >= 0:
        in_mlpC += 2 * max(feape, 0) * in_channels + in_channels
    k1, k2 = jax.random.split(key)
    mlp = create_mlp(k1, in_mlpC, 3, num_layers=num_layers, hidden_w=hidden_w,
                     initializer=initializer, bias=False)
    mlp = scale_final_layer(mlp, uniform_range=1e-5, key=k2)
    return MLPNormal(mlp=mlp, pospe=pospe, feape=feape,
                     size_multi=size_multi, lr=lr)


@struct.dataclass
class MLPRenderPE:
    """Positionally-encoded color head (reference render_modules.py:912-942):
    like MLPRenderFea but encodes the sample position instead of features.
    The reference sizes its MLP for the raw position but forgets to
    concatenate it (its forward would crash); we include it."""
    mlp: MLP
    viewpe: int = struct.field(pytree_node=False, default=6)
    pospe: int = struct.field(pytree_node=False, default=6)
    lr: float = struct.field(pytree_node=False, default=1e-3)

    def __call__(self, pts, viewdirs, features, **kwargs):
        indata = [features, viewdirs, pts[..., :3]]
        if self.pospe > 0:
            indata.append(positional_encoding(pts[..., :3], self.pospe))
        if self.viewpe > 0:
            indata.append(positional_encoding(viewdirs, self.viewpe))
        return jax.nn.sigmoid(self.mlp(jnp.concatenate(indata, axis=-1)))


def init_mlp_render_pe(key, in_channels, viewpe=6, pospe=6, featureC=128,
                       lr=1e-3, **_):
    in_mlpC = (3 + 2 * viewpe * 3) + (3 + 2 * pospe * 3) + in_channels
    mlp = create_mlp(key, in_mlpC, 3, num_layers=3, hidden_w=featureC)
    layers = list(mlp.layers)
    layers[-1] = {"w": layers[-1]["w"], "b": jnp.zeros_like(layers[-1]["b"])}
    return MLPRenderPE(mlp=mlp.replace(layers=tuple(layers)),
                       viewpe=viewpe, pospe=pospe, lr=lr)


def _fibonacci_sphere(n: int, eps: float):
    """Evenly distributed sphere points (offset Fibonacci lattice)."""
    import numpy as np
    indices = np.arange(n, dtype=np.float64)
    golden = (1 + 5 ** 0.5) / 2
    phi = np.arccos(1 - 2 * (indices + eps) / (n - 1 + 2 * eps))
    theta = 2 * np.pi * indices / golden
    xyz = np.stack([np.cos(theta) * np.sin(phi),
                    np.sin(theta) * np.sin(phi),
                    np.cos(phi)], axis=0)
    return jnp.asarray(xyz, jnp.float32)


@struct.dataclass
class LearnableSphericalEncoding:
    """Learned features on a Fibonacci sphere lattice, queried by a Gaussian
    kernel over angular distance (reference render_modules.py:945-997)."""
    weights: jnp.ndarray        # (1, M, C)
    sphere_pos: jnp.ndarray     # (3, M), non-learned buffer
    lr: float = struct.field(pytree_node=False, default=1e-3)

    def dim(self):
        return self.weights.shape[-1]

    def __call__(self, vec, sigma):
        # vec: (N, 3); sigma: scalar or (N, 1) angular stddev
        cos_dist = jnp.clip(vec @ jax.lax.stop_gradient(self.sphere_pos),
                            -1 + 1e-5, 1 - 1e-5)
        ang = jnp.arccos(cos_dist)
        prob = jnp.exp(-((ang / sigma) ** 2) / 2)
        prob = prob / (prob.sum(axis=1, keepdims=True) + 1e-8)
        return jnp.einsum("nm,mc->nc", prob, self.weights[0])


def init_learnable_spherical_encoding(key, out_channels, out_res, lr=1e-3):
    eps = 0.33 if out_res < 24 else (1.33 if out_res < 177 else 3.33)
    weights = jax.random.uniform(key, (1, out_res, out_channels))
    return LearnableSphericalEncoding(
        weights=weights, sphere_pos=_fibonacci_sphere(out_res, eps), lr=lr)


@struct.dataclass
class PassthroughDiffuse:
    """Material head that slices raw field features (render_modules.py:
    302-329): no parameters, used to give appearance features direct
    material meaning."""
    lr: float = struct.field(pytree_node=False, default=0.0)

    def __call__(self, pts, viewdirs, features, **kwargs):
        diffuse = jax.nn.sigmoid(features[..., 0:3] - 3)
        roughness = jnp.clip(jax.nn.sigmoid(features[..., 3:4] + 2),
                             1e-2) / 2
        ambient = jax.nn.sigmoid(features[..., 4:5] - 2)
        tint = jax.nn.sigmoid(features[..., 5:8])
        return diffuse, tint, dict(
            ambient=ambient, diffuse=diffuse, roughness=roughness,
            r1=roughness, r2=roughness,
            f0=jnp.full_like(diffuse, 0.04))

    def calibrate(self, *args, **kwargs):
        return self


@struct.dataclass
class MLPDiffuse:
    """Single 10-output MLP material head (render_modules.py:698-803):
    [diffuse(3), tint(3), ambient(1), r1, r2, f0]."""
    mlp: MLP
    diffuse_bias: Any = -2.0
    tint_bias: float = struct.field(pytree_node=False, default=-1.0)
    roughness_bias: Any = 1.0
    diffuse_mul: float = struct.field(pytree_node=False, default=1.0)
    pospe: int = struct.field(pytree_node=False, default=12)
    feape: int = struct.field(pytree_node=False, default=6)
    lr: float = struct.field(pytree_node=False, default=1e-4)

    def _inputs(self, pts, features):
        size = jnp.broadcast_to(pts[..., 3:4], pts[..., :3].shape)
        p3 = pts[..., :3]
        indata = []
        if self.pospe >= 0:
            indata.append(p3)
        if self.pospe > 0:
            indata.append(integrated_pos_enc((p3, size), 0, self.pospe))
        if self.feape >= 0:
            indata.append(features)
        if self.feape > 0:
            indata.append(positional_encoding(features, self.feape))
        return jnp.concatenate(indata, axis=-1)

    def __call__(self, pts, viewdirs, features, **kwargs):
        out = self.mlp(self._inputs(pts, features))
        ambient = jax.nn.sigmoid(out[..., 6:7] - 2)
        r1 = jax.nn.sigmoid(out[..., 7:8] + self.roughness_bias) \
            * (1 - 1e-3) + 1e-3
        r2 = jax.nn.sigmoid(out[..., 8:9] + self.roughness_bias) \
            * (1 - 1e-3) + 1e-3
        tint = jax.nn.sigmoid(out[..., 3:6] + self.tint_bias)
        f0 = jax.nn.sigmoid(out[..., 9:10] + 3) * (1 - 0.001) + 0.001
        diffuse = jax.nn.sigmoid(
            self.diffuse_mul * out[..., 0:3] + self.diffuse_bias)
        return diffuse, tint, dict(ambient=ambient, r1=r1, r2=r2, f0=f0,
                                   tint=tint, diffuse=diffuse)

    def calibrate(self, mean_brightness, conserve_energy, pts, viewdirs,
                  features, start_roughness=0.35):
        diffuse, _, extra = self(pts, viewdirs, features)
        v = (0.5 if conserve_energy else 0.25) / float(mean_brightness)
        dbias = self.diffuse_bias + float(
            safemath.inv_sigmoid(jnp.clip(v, 1e-4, 1 - 1e-4))
            - safemath.inv_sigmoid(jnp.clip(diffuse, 1e-6, 1 - 1e-6)).mean())
        rough = (extra["r1"] + extra["r2"]) / 4
        rbias = self.roughness_bias + float(
            safemath.inv_sigmoid(jnp.asarray(start_roughness))
            - safemath.inv_sigmoid(jnp.clip(rough, 1e-6, 1 - 1e-6)).mean())
        return self.replace(diffuse_bias=dbias, roughness_bias=rbias)


def init_mlp_diffuse(key, in_channels, pospe=12, feape=6, featureC=128,
                     num_layers=4, lr=1e-4, **_):
    in_w = 0
    if pospe >= 0:
        in_w += 3
    if pospe > 0:
        in_w += 2 * pospe * 3
    if feape >= 0:
        in_w += in_channels
    if feape > 0:
        in_w += 2 * feape * in_channels
    mlp = create_mlp(key, in_w, 10, num_layers=num_layers, hidden_w=featureC)
    return MLPDiffuse(mlp=mlp, pospe=pospe, feape=feape, lr=lr)


@struct.dataclass
class HydraMLPDiffuse:
    """Hydra material head without train-time noise (render_modules.py:
    577-695): separate diffuse/tint/roughness MLPs. The reference variant
    emits no f0; a Schlick dielectric default rides along so fresnel mixing
    modes stay usable."""
    diffuse_mlp: MLP
    tint_mlp: MLP
    roughness_mlp: MLP
    diffuse_bias: Any = -2.0
    roughness_bias: Any = 1.0
    tint_bias: float = struct.field(pytree_node=False, default=-1.0)
    diffuse_mul: float = struct.field(pytree_node=False, default=1.0)
    pospe: int = struct.field(pytree_node=False, default=12)
    feape: int = struct.field(pytree_node=False, default=6)
    lr: float = struct.field(pytree_node=False, default=1e-4)

    def _inputs(self, pts, features):
        size = jnp.broadcast_to(pts[..., 3:4], pts[..., :3].shape)
        p3 = pts[..., :3]
        indata = []
        if self.pospe >= 0:
            indata.append(p3)
        if self.pospe > 0:
            indata.append(integrated_pos_enc((p3, size), 0, self.pospe))
        if self.feape >= 0:
            indata.append(features)
        if self.feape > 0:
            indata.append(positional_encoding(features, self.feape))
        return jnp.concatenate(indata, axis=-1)

    def __call__(self, pts, viewdirs, features, **kwargs):
        x = self._inputs(pts, features)
        diffuse = jax.nn.sigmoid(
            self.diffuse_mul * self.diffuse_mlp(x) + self.diffuse_bias)
        r = jax.nn.sigmoid(self.roughness_mlp(x) + self.roughness_bias) / 2
        tint = jax.nn.sigmoid(self.tint_mlp(x) + self.tint_bias)
        return diffuse, tint, dict(
            diffuse=diffuse, r1=r[..., 0:1], r2=r[..., 1:2], tint=tint,
            f0=jnp.full_like(diffuse, 0.04))

    def calibrate(self, mean_brightness, conserve_energy, pts, viewdirs,
                  features, start_roughness=0.35):
        diffuse, _, extra = self(pts, viewdirs, features)
        v = (0.5 if conserve_energy else 0.25) / float(mean_brightness)
        dbias = self.diffuse_bias + float(
            safemath.inv_sigmoid(jnp.clip(v, 1e-4, 1 - 1e-4))
            - safemath.inv_sigmoid(jnp.clip(diffuse, 1e-6, 1 - 1e-6)).mean())
        rough = (extra["r1"] + extra["r2"]) / 4
        rbias = self.roughness_bias + float(
            safemath.inv_sigmoid(jnp.asarray(start_roughness))
            - safemath.inv_sigmoid(jnp.clip(rough, 1e-6, 1 - 1e-6)).mean())
        return self.replace(diffuse_bias=dbias, roughness_bias=rbias)


def init_hydra_diffuse(key, in_channels, pospe=12, feape=6, featureC=128,
                       num_layers=4, lr=1e-4, **_):
    in_w = 0
    if pospe >= 0:
        in_w += 3
    if pospe > 0:
        in_w += 2 * pospe * 3
    if feape >= 0:
        in_w += in_channels
    if feape > 0:
        in_w += 2 * feape * in_channels
    ks = jax.random.split(key, 3)
    return HydraMLPDiffuse(
        diffuse_mlp=create_mlp(ks[0], in_w, 3, num_layers=num_layers,
                               hidden_w=featureC),
        tint_mlp=create_mlp(ks[1], in_w, 3, num_layers=num_layers,
                            hidden_w=featureC),
        roughness_mlp=create_mlp(ks[2], in_w, 2, num_layers=num_layers,
                                 hidden_w=featureC),
        pospe=pospe, feape=feape, lr=lr)


@struct.dataclass
class AppDimNormal:
    """Normals read directly from appearance-feature channels
    (render_modules.py:895-909)."""
    lr: float = struct.field(pytree_node=False, default=1.0)

    def __call__(self, pts, features, geo_norms=None, **kwargs):
        raw = features[..., 0:3]
        return raw / (jnp.linalg.norm(raw, axis=-1, keepdims=True) + 1e-8)
