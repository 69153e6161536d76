"""BRDF heads: learned MLP BRDF and analytic Fresnel/Smith specular.

Reference ``modules/brdf.py``: schlick/ggx_dist/aniso_smith helpers (:19-41),
Specular (:44-69), MLPBRDF (:72-261).
"""
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..ops import safemath
from ..ops.safemath import (integrated_pos_enc, inv_activation, normalize,
                            positional_encoding, signed_clip)
from .ish import ListISH
from .mlp import MLP, create_mlp

EPS = float(jnp.finfo(jnp.float32).eps)


def schlick(f0, n, l):
    return f0 + (1 - f0) * (
        1 - jnp.clip((n * l).sum(-1, keepdims=True), 1e-20)) ** 5


def ggx_dist(NdotH, roughness):
    a2 = roughness ** 2
    return jnp.clip(
        (a2 / (jnp.clip(NdotH, 0, 1) ** 2 * (a2 - 1) + 1)) ** 2, 0, 1)


def aniso_smith_masking_gtr2(v_local, ax, ay, eps=EPS):
    v2 = v_local * v_local
    Lambda = (-1 + jnp.sqrt(jnp.clip(
        1 + (v2[..., 0] * ax * ax + v2[..., 1] * ay * ay)
        / signed_clip(v2[..., 2]), eps))) / 2
    return 1 / (1 + Lambda)


@struct.dataclass
class MLPBRDF:
    """Learned residual BRDF weight (modules/brdf.py:72-261)."""
    mlp: MLP
    bias: Any  # calibrated scalar
    h_encoder: Optional[ListISH] = None
    d_encoder: Optional[ListISH] = None
    feape: int = struct.field(pytree_node=False, default=0)
    dotpe: int = struct.field(pytree_node=False, default=-1)
    activation: str = struct.field(pytree_node=False, default="sigmoid")
    mul_LdotN: bool = struct.field(pytree_node=False, default=False)
    lr: float = struct.field(pytree_node=False, default=1e-3)
    init_val: float = struct.field(pytree_node=False, default=0.5)

    def _activation(self, x):
        if self.activation == "sigexp":
            col = jax.nn.sigmoid(x[..., :3])
            brightness = jnp.exp(jnp.clip(x[..., 3:4], -10, 10) - 1)
            return col * brightness
        if self.activation == "sigmoid":
            return jax.nn.sigmoid(x[..., :3] + self.bias)
        if self.activation == "exp":
            return jnp.exp(x[..., :3] + self.bias)
        if self.activation == "softplus":
            return jax.nn.softplus(x[..., :3] + self.bias)
        raise ValueError(self.activation)

    def __call__(self, V, L, N, H, local_v, half_vec, diff_vec, efeatures,
                 eax, eay):
        """All directional args (R, 3); efeatures (R, D); eax/eay (R,)."""
        LdotN = (L * N).sum(-1, keepdims=True)
        indata = []
        if self.dotpe >= 0:
            LdotH = (L * H).sum(-1, keepdims=True)
            VdotN = (V * N).sum(-1, keepdims=True)
            NdotH = half_vec[..., 2:3]
            sin_ln = jnp.sqrt(jnp.clip(1 - LdotN ** 2, 1e-8, 1))
            sin_nh = jnp.sqrt(jnp.clip(1 - NdotH ** 2, 1e-8, 1))
            indata += [LdotH, sin_ln, VdotN, sin_ln, NdotH, sin_nh]
            if self.dotpe > 0:
                dotvals = jnp.concatenate(indata, axis=-1)
                indata.append(integrated_pos_enc(
                    (dotvals * jnp.pi, 0.20 * jnp.ones_like(dotvals)),
                    0, self.dotpe))
        indata.append(efeatures)
        R = V.shape[0]
        if self.h_encoder is not None:
            indata += [self.h_encoder(half_vec, eax).reshape(R, -1), half_vec]
        if self.d_encoder is not None:
            indata += [self.d_encoder(diff_vec, eax).reshape(R, -1), diff_vec]
        if self.feape > 0:
            indata.append(positional_encoding(efeatures, self.feape))
        raw = self.mlp(jnp.concatenate(indata, axis=-1))
        ref_weight = self._activation(raw[..., :4])
        if self.mul_LdotN:
            return ref_weight * jax.lax.stop_gradient(jnp.clip(LdotN, 0))
        return ref_weight

    def calibrate(self, key, efeatures, bg_brightness):
        """Solve bias for target initial reflectance (brdf.py:141-175)."""
        N = efeatures.shape[0]
        ks = jax.random.split(key, 7)

        def rand_vecs(k):
            return normalize(2 * jax.random.uniform(k, (N, 3)) - 1)

        L = rand_vecs(ks[0])
        norms = rand_vecs(ks[1])
        LdotN = (L * norms).sum(-1, keepdims=True)
        norms = LdotN * norms
        weight = self(rand_vecs(ks[2]), L, norms, rand_vecs(ks[3]),
                      rand_vecs(ks[4]), rand_vecs(ks[5]), rand_vecs(ks[6]),
                      efeatures,
                      jax.random.uniform(ks[0], (N,)),
                      jax.random.uniform(ks[1], (N,)))
        target_val = self.init_val / float(bg_brightness)
        target_val = min(max(target_val, 1e-4), 1 - 1e-4)
        new_bias = self.bias + (
            inv_activation(target_val, self.activation if self.activation != "sigexp" else "sigmoid")
            - float(inv_activation(jnp.clip(weight, 1e-4, 1 - 1e-4),
                                   self.activation if self.activation != "sigexp" else "sigmoid").mean()))
        return self.replace(bias=new_bias)


def init_mlp_brdf(key, in_channels, h_encoder=None, d_encoder=None, feape=0,
                  dotpe=-1, activation="sigmoid", mul_LdotN=False, bias=0.0,
                  lr=1e-3, hidden_w=64, num_layers=3, initializer="kaiming",
                  **_):
    in_mlpC = 2 * feape * in_channels + in_channels
    if dotpe >= 0:
        in_mlpC += 6 + 2 * dotpe * 6
    if h_encoder is not None:
        in_mlpC += h_encoder.dim() + 3
    if d_encoder is not None:
        in_mlpC += d_encoder.dim() + 3
    mlp = create_mlp(key, in_mlpC, 4, num_layers=num_layers, hidden_w=hidden_w,
                     initializer=initializer)
    return MLPBRDF(mlp=mlp, bias=float(bias), h_encoder=h_encoder,
                   d_encoder=d_encoder, feape=feape, dotpe=dotpe,
                   activation=activation, mul_LdotN=mul_LdotN, lr=lr)


@struct.dataclass
class Specular:
    """Analytic Fresnel-Schlick x Smith masking with learned C0
    (modules/brdf.py:44-69)."""
    c0_mlp: MLP
    bias: float = struct.field(pytree_node=False, default=0.0)
    lr: float = struct.field(pytree_node=False, default=1e-3)

    def __call__(self, V, L, N, H, local_v, half_vec, diff_vec, efeatures,
                 ax, ay):
        VdotH = (local_v * half_vec).sum(-1, keepdims=True)
        C0 = jax.nn.sigmoid(self.c0_mlp(efeatures) + self.bias)
        Fm = C0 + (1 - C0) * VdotH ** 5
        Gm = (aniso_smith_masking_gtr2(diff_vec, ax, ay)
              * aniso_smith_masking_gtr2(local_v, ax, ay))
        return Fm * Gm.reshape(-1, 1) / 4

    def calibrate(self, key, efeatures, bg_brightness):
        return self


def init_specular(key, in_channels, lr=1e-3, bias=0.0, hidden_w=64,
                  num_layers=0, **_):
    mlp = create_mlp(key, in_channels, 3, num_layers=num_layers,
                     hidden_w=hidden_w)
    return Specular(c0_mlp=mlp, bias=bias, lr=lr)
