"""Tonemapping curves (reference modules/tonemap.py)."""
import jax.numpy as jnp


def srgb_tonemap(img, noclip=False):
    """Linear -> sRGB (reference SRGBTonemap, tonemap.py:34-49)."""
    limit = 0.0031308
    out = jnp.where(
        img > limit,
        1.055 * (jnp.clip(img, limit) ** (1.0 / 2.4)) - 0.055,
        12.92 * img,
    )
    return out if noclip else jnp.clip(out, 0.0, 1.0)


def srgb_inverse(img):
    limit = 0.04045
    return jnp.where(img > limit, ((img + 0.055) / 1.055) ** 2.4, img / 12.92)


def hdr_tonemap(img, noclip=False):
    """Reinhard + gamma (reference HDRTonemap, tonemap.py:57-67)."""
    out = (img / (jnp.clip(img, 0) + 1)) ** (1 / 2.2)
    return out if noclip else jnp.clip(out, 0.0, 1.0)


def hdr_inverse(img):
    img = img ** 2.2
    return -img / (img - 1)


def linear_tonemap(img, noclip=False):
    return img if noclip else jnp.clip(img, 0.0, 1.0)


def linear_inverse(img):
    return img


TONEMAPS = {
    "srgb": (srgb_tonemap, srgb_inverse),
    # the reference's Filmic (modules/tonemap.py:11-32) is line-for-line
    # identical to its SRGBTonemap (:34-55), so the alias IS exact parity
    "filmic": (srgb_tonemap, srgb_inverse),
    "hdr": (hdr_tonemap, hdr_inverse),
    "linear": (linear_tonemap, linear_inverse),
}


def get_tonemap(name: str):
    if name not in TONEMAPS:
        raise ValueError(f"unknown tonemap {name}")
    return TONEMAPS[name]
