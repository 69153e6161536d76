"""Shared utilities: resolution math, LR schedule, image metrics.

Mirrors reference ``utils.py`` (N_to_reso :55-58, cal_n_samples :60,
learning_rate_decay :327-359, rgb_ssim :90-136) with JAX/numpy implementations.
"""
import math

import numpy as np
import jax.numpy as jnp


def n_to_reso(n_voxels, aabb):
    """Voxel count -> per-axis resolution (utils.py:55-58)."""
    xyz_min, xyz_max = np.asarray(aabb[0]), np.asarray(aabb[1])
    voxel_size = ((xyz_max - xyz_min).prod() / n_voxels) ** (1 / 3)
    # small epsilon absorbs float error so exact cube counts stay exact
    return [int(v + 1e-4) for v in ((xyz_max - xyz_min) / voxel_size)]


def cal_n_samples(reso, step_ratio=0.5):
    return int(np.linalg.norm(reso) / step_ratio)


def log_lerp(t, v0, v1):
    """Interpolate log-linearly from v0 (t=0) to v1 (t=1)."""
    if v0 <= 0 or v1 <= 0:
        raise ValueError(f"Interpolants {v0} and {v1} must be positive.")
    lv0 = math.log(v0)
    lv1 = math.log(v1)
    return math.exp(np.clip(t, 0, 1) * (lv1 - lv0) + lv0)


def learning_rate_decay(step, lr_init, lr_final, max_steps,
                        lr_delay_steps=0, lr_delay_mult=1):
    """mip-NeRF continuous LR decay (utils.py:327-359)."""
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * math.sin(
            0.5 * math.pi * float(np.clip(step / lr_delay_steps, 0, 1))
        )
    else:
        delay_rate = 1.0
    return delay_rate * log_lerp(step / max_steps, lr_init, lr_final)


def psnr_from_mse(mse):
    return -10.0 * np.log(mse) / np.log(10.0)


def rgb_psnr(img0, img1, quantize=True):
    """PSNR with the reference's 8-bit quantization convention
    (renderer.py:399-401)."""
    img0 = np.asarray(img0)
    img1 = np.asarray(img1)
    if quantize:
        img0 = (np.clip(img0, 0, 1) * 255).astype(np.uint8).astype(np.float64) / 255
        img1 = (np.clip(img1, 0, 1) * 255).astype(np.uint8).astype(np.float64) / 255
    mse = np.mean((img0 - img1) ** 2)
    return psnr_from_mse(mse)


def rgb_ssim(img0, img1, max_val=1.0, filter_size=11, filter_sigma=1.5,
             k1=0.01, k2=0.03, return_map=False):
    """mip-NeRF Gaussian-filter SSIM (reference utils.py:90-136).

    Transcribed from google/mipnerf internal/math.py (Apache-2.0) -- the
    same upstream the reference credits; bit-identical SSIM is required for
    metric parity with its stats pipeline."""
    import scipy.signal

    img0 = np.asarray(img0)
    img1 = np.asarray(img1)
    assert img0.ndim == 3 and img0.shape[-1] == 3 and img0.shape == img1.shape
    hw = filter_size // 2
    shift = (2 * hw - filter_size + 1) / 2
    f_i = ((np.arange(filter_size) - hw + shift) / filter_sigma) ** 2
    filt = np.exp(-0.5 * f_i)
    filt /= np.sum(filt)

    def convolve2d(z, f):
        return scipy.signal.convolve2d(z, f, mode="valid")

    def filt_fn(z):
        return np.stack(
            [convolve2d(convolve2d(z[..., i], filt[:, None]), filt[None, :])
             for i in range(z.shape[-1])], -1)

    mu0 = filt_fn(img0)
    mu1 = filt_fn(img1)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    sigma00 = np.maximum(0.0, filt_fn(img0 ** 2) - mu00)
    sigma11 = np.maximum(0.0, filt_fn(img1 ** 2) - mu11)
    sigma01 = filt_fn(img0 * img1) - mu01
    sigma01 = np.sign(sigma01) * np.minimum(
        np.sqrt(sigma00 * sigma11), np.abs(sigma01))
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu01 + c1) * (2 * sigma01 + c2)
    denom = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
    ssim_map = numer / denom
    return ssim_map if return_map else np.mean(ssim_map)


def tv_loss_2d(x):
    """Isotropic TV over trailing (H, W) axes of (..., H, W) (utils.py TVLoss)."""
    if x.shape[-1] == 1:
        h_tv = x[..., 1:, :] - x[..., :-1, :]
        return jnp.abs(h_tv).mean()
    h_tv = x[..., 1:, :-1] - x[..., :-1, :-1]
    w_tv = x[..., :-1, 1:] - x[..., :-1, :-1]
    return jnp.sqrt(w_tv ** 2 + h_tv ** 2 + 1e-5).mean()
