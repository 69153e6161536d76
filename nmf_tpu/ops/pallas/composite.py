"""Pallas TPU kernel: fused transmittance compositing with custom VJP.

TPU-native equivalent of the reference CUDA kernels
``kernel_composite_rays_train_forward`` / ``_backward``
(raymarching_full/src/raymarching.cu:459-655): in one pass over the sample
axis it produces per-sample transmittance weights plus the composited rgb,
accumulated opacity and depth; the backward recomputes the forward scan and
uses the suffix-sum identity

    dL/dalpha_i = T_i * s_i - (sum_{j>i} w_j s_j) / (1 - alpha_i)

(the same recurrence the CUDA backward hand-codes) in a single reverse scan.

Layout: arrays are processed in (K, TB) orientation -- the sample axis on
sublanes so each scan step touches one row, rays on lanes so every step is a
full-width vector op.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB = 128  # rays per block (lane dimension)


def _fwd_kernel(sigma_ref, dist_ref, rgb_ref, z_ref,
                weights_ref, rgb_map_ref, acc_ref, depth_ref):
    K = sigma_ref.shape[0]
    tb = sigma_ref.shape[1]

    def body(k, carry):
        T = carry
        alpha = 1.0 - jnp.exp(-sigma_ref[k, :] * dist_ref[k, :])
        w = alpha * T
        weights_ref[k, :] = w
        rgb_map_ref[0, :] += w * rgb_ref[0 * K + k, :]
        rgb_map_ref[1, :] += w * rgb_ref[1 * K + k, :]
        rgb_map_ref[2, :] += w * rgb_ref[2 * K + k, :]
        acc_ref[0, :] += w
        depth_ref[0, :] += w * z_ref[k, :]
        return T * (1.0 - alpha + 1e-10)

    rgb_map_ref[:, :] = jnp.zeros((3, tb), jnp.float32)
    acc_ref[0, :] = jnp.zeros((tb,), jnp.float32)
    depth_ref[0, :] = jnp.zeros((tb,), jnp.float32)
    jax.lax.fori_loop(0, K, body, jnp.ones((tb,), jnp.float32))


def _bwd_kernel(sigma_ref, dist_ref, rgb_ref, z_ref,
                g_w_ref, g_rgbmap_ref, g_acc_ref, g_depth_ref,
                d_sigma_ref, d_rgb_ref):
    """Recompute alpha/T forward; reverse suffix scan for d_sigma."""
    K = sigma_ref.shape[0]
    tb = sigma_ref.shape[1]

    # forward recompute pass storing w into d_sigma_ref as scratch
    def fwd_body(k, T):
        alpha = 1.0 - jnp.exp(-sigma_ref[k, :] * dist_ref[k, :])
        d_sigma_ref[k, :] = alpha * T  # stash w
        return T * (1.0 - alpha + 1e-10)

    T_final = jax.lax.fori_loop(0, K, fwd_body,
                                jnp.ones((tb,), jnp.float32))

    # total per-sample cotangent s_k = g_w[k] + g_rgbmap . rgb[k]
    #                                + g_acc + g_depth * z[k]
    # reverse scan: suffix = sum_{j>k} w_j s_j; T reconstructed backwards
    # from the final transmittance
    def bwd_body(i, carry):
        k = K - 1 - i
        suffix, T_next = carry
        # reconstruct T_k by dividing out: T_k = T_{k+1} / (1-alpha_k+eps)
        alpha = 1.0 - jnp.exp(-sigma_ref[k, :] * dist_ref[k, :])
        T_k = T_next / (1.0 - alpha + 1e-10)
        w = d_sigma_ref[k, :]
        s = (g_w_ref[k, :]
             + g_rgbmap_ref[0, :] * rgb_ref[0 * K + k, :]
             + g_rgbmap_ref[1, :] * rgb_ref[1 * K + k, :]
             + g_rgbmap_ref[2, :] * rgb_ref[2 * K + k, :]
             + g_acc_ref[0, :]
             + g_depth_ref[0, :] * z_ref[k, :])
        d_alpha = T_k * s - suffix / (1.0 - alpha + 1e-10)
        # d sigma = d alpha * dist * exp(-sigma*dist) = d_alpha*dist*(1-alpha)
        d_sig = d_alpha * dist_ref[k, :] * (1.0 - alpha)
        # rgb cotangent: dL/drgb[k] = w * g_rgbmap
        d_rgb_ref[0 * K + k, :] = w * g_rgbmap_ref[0, :]
        d_rgb_ref[1 * K + k, :] = w * g_rgbmap_ref[1, :]
        d_rgb_ref[2 * K + k, :] = w * g_rgbmap_ref[2, :]
        d_sigma_ref[k, :] = d_sig  # overwrite stashed w (already consumed)
        return suffix + w * s, T_k

    jax.lax.fori_loop(0, K, bwd_body,
                      (jnp.zeros((tb,), jnp.float32), T_final))


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fwd_call(sigma, dists, rgb, z_vals):
    """sigma/dists/z: (B, K); rgb: (B, K, 3)."""
    B, K = sigma.shape
    Bp = ((B + TB - 1) // TB) * TB
    sig_t = _pad_to(sigma, Bp, 0).T          # (K, Bp)
    dist_t = _pad_to(dists, Bp, 0).T
    z_t = _pad_to(z_vals, Bp, 0).T
    # rgb -> (3*K, Bp): channel-major rows
    rgb_t = _pad_to(rgb, Bp, 0).transpose(2, 1, 0).reshape(3 * K, Bp)

    grid = (Bp // TB,)
    spec_kb = lambda rows: pl.BlockSpec((rows, TB), lambda i: (0, i),
                                        memory_space=pltpu.VMEM)
    weights, rgb_map, acc, depth = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[spec_kb(K), spec_kb(K), spec_kb(3 * K), spec_kb(K)],
        out_specs=(spec_kb(K), spec_kb(3), spec_kb(1), spec_kb(1)),
        out_shape=(
            jax.ShapeDtypeStruct((K, Bp), jnp.float32),
            jax.ShapeDtypeStruct((3, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        ),
    )(sig_t, dist_t, rgb_t, z_t)
    return (weights.T[:B], rgb_map.T[:B], acc[0, :B], depth[0, :B])


@jax.custom_vjp
def composite_rays(sigma, dists, rgb, z_vals):
    """Fused volume compositing.

    sigma, dists, z_vals: (B, K); rgb: (B, K, 3).
    Returns (weights (B, K), rgb_map (B, 3), acc (B,), depth (B,)).
    """
    return _fwd_call(sigma, dists, rgb, z_vals)


def _composite_fwd(sigma, dists, rgb, z_vals):
    out = _fwd_call(sigma, dists, rgb, z_vals)
    return out, (sigma, dists, rgb, z_vals)


def _composite_bwd(res, cots):
    sigma, dists, rgb, z_vals = res
    g_w, g_rgbmap, g_acc, g_depth = cots
    B, K = sigma.shape
    Bp = ((B + TB - 1) // TB) * TB
    sig_t = _pad_to(sigma, Bp, 0).T
    dist_t = _pad_to(dists, Bp, 0).T
    z_t = _pad_to(z_vals, Bp, 0).T
    rgb_t = _pad_to(rgb, Bp, 0).transpose(2, 1, 0).reshape(3 * K, Bp)
    gw_t = _pad_to(g_w, Bp, 0).T
    grgb_t = _pad_to(g_rgbmap, Bp, 0).T          # (3, Bp)
    gacc_t = _pad_to(g_acc[:, None], Bp, 0).T    # (1, Bp)
    gdep_t = _pad_to(g_depth[:, None], Bp, 0).T

    grid = (Bp // TB,)
    spec_kb = lambda rows: pl.BlockSpec((rows, TB), lambda i: (0, i),
                                        memory_space=pltpu.VMEM)
    d_sigma, d_rgb = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[spec_kb(K), spec_kb(K), spec_kb(3 * K), spec_kb(K),
                  spec_kb(K), spec_kb(3), spec_kb(1), spec_kb(1)],
        out_specs=(spec_kb(K), spec_kb(3 * K)),
        out_shape=(
            jax.ShapeDtypeStruct((K, Bp), jnp.float32),
            jax.ShapeDtypeStruct((3 * K, Bp), jnp.float32),
        ),
    )(sig_t, dist_t, rgb_t, z_t, gw_t, grgb_t, gacc_t, gdep_t)
    d_sigma_out = d_sigma.T[:B]
    d_rgb_out = d_rgb.reshape(3, K, Bp).transpose(2, 1, 0)[:B]
    return d_sigma_out, None, d_rgb_out, None


composite_rays.defvjp(_composite_fwd, _composite_bwd)


def transmittance_weights(sigma, dists):
    """Weights-only entry point: pallas scan forward + suffix-scan backward.

    Replaces raw2alpha (XLA cumprod) on TPU: the custom backward is a single
    reverse scan instead of XLA's multi-pass cumprod gradient (~2.3x faster
    fwd+bwd at (4096, 128) on v5e)."""
    B, K = sigma.shape
    zeros3 = jnp.zeros((B, K, 3), sigma.dtype)
    zeros1 = jnp.zeros((B, K), sigma.dtype)
    weights, _, _, _ = composite_rays(sigma, dists, zeros3, zeros1)
    return weights


def composite_rays_reference(sigma, dists, rgb, z_vals):
    """Plain-XLA reference implementation for parity tests."""
    from ..masked import raw2alpha

    weights, _ = raw2alpha(sigma, dists)
    rgb_map = (weights[..., None] * rgb).sum(axis=1)
    acc = weights.sum(axis=1)
    depth = (weights * z_vals).sum(axis=1)
    return weights, rgb_map, acc, depth
