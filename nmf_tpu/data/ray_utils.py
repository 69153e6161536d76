"""Camera ray generation (host-side numpy).

Reference ``dataLoader/ray_utils.py``: get_ray_directions (:23-41),
get_ray_directions_blender (:44-62), get_rays (:65-86), ndc_rays_blender
(:89-106).
"""
import numpy as np


def get_ray_directions(H, W, focal, center=None):
    """OpenCV-convention camera ray directions, normalized later by caller.

    focal: (fx, fy). Returns (H, W, 3) with +z forward.
    """
    j, i = np.mgrid[0:H, 0:W].astype(np.float32)
    i = i + 0.5
    j = j + 0.5
    cent = center if center is not None else [W / 2, H / 2]
    directions = np.stack(
        [(i - cent[0]) / focal[0], (j - cent[1]) / focal[1], np.ones_like(i)],
        axis=-1)
    return directions


def get_ray_directions_blender(H, W, focal, center=None):
    """Blender convention: -z forward, +y up. Returns (H, W, 3)."""
    j, i = np.mgrid[0:H, 0:W].astype(np.float32)
    i = i + 0.5
    j = j + 0.5
    cent = center if center is not None else [W / 2, H / 2]
    directions = np.stack(
        [(i - cent[0]) / focal[0], -(j - cent[1]) / focal[1],
         -np.ones_like(i)], axis=-1)
    return directions


def get_rays(directions, c2w):
    """directions: (H, W, 3) camera-frame; c2w: (3/4, 4).
    Returns (rays_o (HW, 3), rays_d (HW, 3))."""
    rays_d = directions @ np.asarray(c2w[:3, :3]).T
    rays_o = np.broadcast_to(np.asarray(c2w[:3, 3]), rays_d.shape)
    return rays_o.reshape(-1, 3).astype(np.float32), \
        rays_d.reshape(-1, 3).astype(np.float32)


def ndc_rays_blender(H, W, focal, near, rays_o, rays_d):
    """Shift to near plane and project (dataLoader/ray_utils.py:89-106)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d
    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]
    d0 = -1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    d1 = -1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    d2 = -2.0 * near / rays_o[..., 2]
    return (np.stack([o0, o1, o2], -1).astype(np.float32),
            np.stack([d0, d1, d2], -1).astype(np.float32))


def pose_spherical(theta_deg, phi_deg, radius):
    """Camera-to-world for a camera on a sphere looking at the origin
    (blender convention, -z forward)."""
    th = np.deg2rad(theta_deg)
    phi = np.deg2rad(phi_deg)

    trans = np.eye(4)
    trans[2, 3] = radius
    rot_phi = np.eye(4)
    rot_phi[1, 1] = np.cos(phi)
    rot_phi[1, 2] = -np.sin(phi)
    rot_phi[2, 1] = np.sin(phi)
    rot_phi[2, 2] = np.cos(phi)
    rot_th = np.eye(4)
    rot_th[0, 0] = np.cos(th)
    rot_th[0, 2] = -np.sin(th)
    rot_th[2, 0] = np.sin(th)
    rot_th[2, 2] = np.cos(th)
    c2w = rot_th @ rot_phi @ trans
    flip = np.array([[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
                    dtype=np.float64)
    return (flip @ c2w).astype(np.float32)


def sample_pdf(bins, weights, n_samples, det=False, rng=None):
    """Hierarchical inverse-CDF resampling (dataLoader/ray_utils.py:128-170).

    bins: (..., M+1) bin edges; weights: (..., M). Returns (..., n_samples)
    samples distributed proportionally to weights. Pure numpy (host-side
    data utility, like the rest of this module).
    """
    weights = np.asarray(weights, np.float64) + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)  # (..., M+1)

    if det:
        u = np.linspace(0.0, 1.0, n_samples)
        u = np.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        rng = rng or np.random.default_rng()
        u = rng.random(cdf.shape[:-1] + (n_samples,))

    inds = np.stack([np.searchsorted(c, uu, side="right")
                     for c, uu in zip(cdf.reshape(-1, cdf.shape[-1]),
                                      u.reshape(-1, n_samples))])
    inds = inds.reshape(u.shape)
    below = np.maximum(inds - 1, 0)
    above = np.minimum(inds, cdf.shape[-1] - 1)

    cdf_g0 = np.take_along_axis(cdf, below, -1)
    cdf_g1 = np.take_along_axis(cdf, above, -1)
    bins = np.asarray(bins, np.float64)
    bins_g0 = np.take_along_axis(bins, below, -1)
    bins_g1 = np.take_along_axis(bins, above, -1)

    denom = np.where(cdf_g1 - cdf_g0 < 1e-5, 1.0, cdf_g1 - cdf_g0)
    t = (u - cdf_g0) / denom
    return (bins_g0 + t * (bins_g1 - bins_g0)).astype(np.float32)


def read_pfm(filename):
    """Read a PFM image -> (data, scale) (dataLoader/ray_utils.py:230-262)."""
    import re

    with open(filename, "rb") as f:
        header = f.readline().decode("utf-8").rstrip()
        if header == "PF":
            color = True
        elif header == "Pf":
            color = False
        else:
            raise ValueError("Not a PFM file.")
        dim_match = re.match(r"^(\d+)\s(\d+)\s$", f.readline().decode("utf-8"))
        if not dim_match:
            raise ValueError("Malformed PFM header.")
        width, height = map(int, dim_match.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        scale = abs(scale)
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    # PFM stores rows bottom-to-top
    return np.flipud(data.reshape(shape)), scale


def write_pfm(filename, image, scale=1.0):
    """Write a PFM image (counterpart of read_pfm, used by tests)."""
    image = np.asarray(image, np.float32)
    color = image.ndim == 3 and image.shape[2] == 3
    with open(filename, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{image.shape[1]} {image.shape[0]}\n".encode())
        endian = image.dtype.byteorder
        if endian == "<" or (endian == "=" and np.little_endian):
            scale = -scale
        f.write(f"{scale}\n".encode())
        np.flipud(image).tofile(f)
