"""Numerically-armored math primitives.

TPU-native port of the semantics of the reference's ``modules/safemath.py``
(safe_atan2 modules/safemath.py:8-32, safe trig :34-46, expected_sin :48-55,
integrated_pos_enc :57-91) and ``mutils.py`` helpers. The reference code's own
comments note that raw sin/cos "on a TPU may NaN out for large values" --
here we apply the same modulo-range trick natively.
"""
import math
from functools import partial

import jax
import jax.numpy as jnp

EPS = float(jnp.finfo(jnp.float32).eps)
SAFE_TRIG_T = 100.0 * math.pi


def normalize(v, eps=EPS):
    """L2-normalize along the last axis (mutils.py:8-12 semantics)."""
    return v * jax.lax.rsqrt(jnp.clip(jnp.sum(v * v, axis=-1, keepdims=True), eps))


def signed_clip(v, eps=EPS):
    return jnp.sign(v) * jnp.clip(jnp.abs(v), eps)


def inv_sigmoid(v):
    return jnp.log(v / (1.0 - v))


def inv_activation(a, activation: str):
    if activation == "exp":
        return jnp.log(a) if not isinstance(a, float) else math.log(a)
    elif activation == "sigmoid":
        return inv_sigmoid(a) if not isinstance(a, float) else math.log(a / (1 - a))
    raise ValueError(f"inv_activation does not support {activation}")


def arccos(x):
    return jnp.arccos(jnp.clip(x, -1 + 1e-8, 1 - 1e-8))


@jax.custom_vjp
def safe_atan2(x, y):
    return jnp.arctan2(x, y)


def _safe_atan2_fwd(x, y):
    return jnp.arctan2(x, y), (x, y)


def _safe_atan2_bwd(res, g):
    # Clamped-denominator gradient; matches the reference custom backward
    # (modules/safemath.py:17-30) which regularizes d/dx atan2 near the origin.
    x, y = res
    eps = 1e-5
    denom = x * x + y * y + eps
    return g * y / denom, g * (-x) / denom


safe_atan2.defvjp(_safe_atan2_fwd, _safe_atan2_bwd)
atan2 = safe_atan2


def safe_cos(x, t=SAFE_TRIG_T):
    return jnp.cos(x % t)


def safe_sin(x, t=SAFE_TRIG_T):
    return jnp.sin(x % t)


def expected_sin(x, x_var, t=SAFE_TRIG_T):
    """Mean and variance of sin(z), z ~ N(x, x_var) (mip-NeRF eq. 7)."""
    y = jnp.exp(-0.5 * x_var) * jnp.sin(x % t)
    y_var = 0.5 * (1 - jnp.exp(-2 * x_var) * jnp.cos((2 * x) % t)) - y**2
    return y, jnp.clip(y_var, 0)


def integrated_pos_enc(x_coord, min_deg: int, max_deg: int):
    """Diagonal-covariance integrated positional encoding.

    x_coord: tuple (x, x_cov_diag), each (..., D). Returns (..., 2*D*(max_deg-min_deg)).
    Matches reference modules/safemath.py:57-91 (diag branch), including the
    2**(i-1) scale convention.
    """
    x, x_cov_diag = x_coord
    scales = jnp.asarray([2 ** (i - 1) for i in range(min_deg, max_deg)], dtype=x.dtype)
    shape = x.shape[:-1] + (-1,)
    y = jnp.reshape(x[..., None, :] * scales[:, None], shape)
    y_var = jnp.reshape(x_cov_diag[..., None, :] * scales[:, None] ** 2, shape)
    out, _ = expected_sin(
        jnp.concatenate([y, y + 0.5 * jnp.pi], axis=-1),
        jnp.concatenate([y_var, y_var], axis=-1),
    )
    return out


def positional_encoding(positions, freqs: int):
    """Classic NeRF PE (reference modules/render_modules.py:38-44)."""
    freq_bands = 2.0 ** jnp.arange(freqs, dtype=positions.dtype)
    pts = (positions[..., None] * freq_bands).reshape(
        positions.shape[:-1] + (freqs * positions.shape[-1],)
    )
    return jnp.concatenate([jnp.sin(pts), jnp.cos(pts)], axis=-1)


def spherical_encoding(refdirs, roughness, pe: int, ind_order=(0, 1, 2)):
    """IPE of the spherical angles of a direction (render_modules.py:47-60)."""
    i, j, k = ind_order
    norm2d = jnp.sqrt(refdirs[..., i] ** 2 + refdirs[..., j] ** 2)
    ang0 = safe_atan2(refdirs[..., j], refdirs[..., i]) * norm2d
    ang1 = safe_atan2(refdirs[..., k], norm2d)
    return [
        integrated_pos_enc((ang0[..., None], roughness), 0, pe),
        integrated_pos_enc((ang1[..., None], roughness), 0, pe),
    ]


def trunc_exp(x):
    """Clamped exponential with straight-through-style gradient
    (reference fields/tensor_base.py:11-22 TruncExp)."""
    return _trunc_exp(x)


@jax.custom_vjp
def _trunc_exp(x):
    return jnp.exp(jnp.clip(x, -15, 10))


def _trunc_exp_fwd(x):
    return _trunc_exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15, 10)),)


_trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
