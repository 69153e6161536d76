"""Refraction / Fresnel optics helpers.

Functional JAX equivalents of the reference's ``utils.py:222-273``
(``snells_law``, ``fresnel_law``, ``refract_reflect``). The reference
computes in float64 for stability; TPUs are fp32-native, so we clamp the
refraction discriminant instead (same clip the reference applies).
"""
import jax.numpy as jnp


def snells_law(r, n, l):
    """Refract directions ``l`` through surfaces with outward normals ``n``.

    r: scalar ratio of refraction indices n1/n2 (n1 = incident medium).
    n: (..., 3) outward surface normals.
    l: (..., 3) light directions pointing towards the surface.
    Returns the refracted directions (..., 3). Mirrors utils.py:222-244,
    including the two-sided handling (rays hitting the back face use 1/r and
    the flipped normal).
    """
    cosi = jnp.sum(n * l, axis=-1, keepdims=True)
    nsign = jnp.sign(cosi)
    N = jnp.where(cosi < 0, n, -n)
    cosi = cosi * nsign
    R = jnp.where(cosi < 0, 1.0 / r, r)
    k = 1.0 - R * R * (1.0 - cosi * cosi)
    return R * l + (R * cosi - jnp.sqrt(jnp.clip(k, 0.0))) * N


def fresnel_law(ior1, ior2, n, l, o):
    """Fraction of light reflected at an interface (utils.py:246-263).

    n: (..., 3) outward normals; l: (..., 3) incident directions towards the
    surface; o: (..., 3) refracted directions from :func:`snells_law`.
    Returns (..., 1) reflected ratio; total internal reflection maps to 1.
    """
    cos_i = jnp.sum(n * l, axis=-1, keepdims=True)
    cos_t = jnp.sum(n * o, axis=-1, keepdims=True)
    sin_t = jnp.sqrt(jnp.clip(1.0 - cos_t ** 2, 0.0))
    s_polar = (ior2 * cos_i - ior1 * cos_t) / (ior2 * cos_i + ior1 * cos_t)
    p_polar = (ior2 * cos_t - ior1 * cos_i) / (ior2 * cos_t + ior1 * cos_i)
    ratio_reflected = (s_polar + p_polar) / 2
    return jnp.where(sin_t >= 1, jnp.ones_like(ratio_reflected),
                     ratio_reflected)


def refract_reflect(ior1, ior2, n, l, p):
    """Combined reflectivity of a partially reflective dielectric
    (utils.py:265-273). ``p``: (...,) base material reflectivity in [0,1]."""
    ratio = ior2 / ior1
    o = snells_law(ratio, n, l)
    ratio_reflected = fresnel_law(ior1, ior2, n, l, o)
    ratio_refracted = 1.0 - ratio_reflected
    return 1.0 - p[..., None] * ratio_refracted
