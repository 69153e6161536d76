"""Visualize learned BRDF lobes as equirect images.

Reference ``models/microfacet.py:123-234`` (graph_brdfs): for a set of
surface points and view directions, evaluate brdf_weight * pdf over a grid
of incoming directions and tile the results into one image, marking the
view direction in green.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.safemath import normalize


def graph_brdfs(model, xyzs, viewdirs, app_features, res=64):
    """model: Microfacet; xyzs (F, 4); viewdirs (V, 3); app_features (F, D).
    Returns an image (F*res, 2*V*res, 3)."""
    ele = jnp.linspace(-math.pi / 2, math.pi / 2, res)
    azi = jnp.linspace(0, 2 * math.pi, 2 * res)
    eg, ag = jnp.meshgrid(ele, azi, indexing="ij")
    ang_vecs = jnp.stack([
        -jnp.sin(eg),
        jnp.cos(eg) * jnp.sin(ag),
        jnp.cos(eg) * jnp.cos(ag)], axis=-1).reshape(-1, 3)

    F = xyzs.shape[0]
    V = viewdirs.shape[0]
    A = ang_vecs.shape[0]

    _, _, matprop = model.diffuse_module(xyzs, viewdirs, app_features,
                                         std=0.0)
    r1 = matprop["r1"][:, 0]

    # expand to (F*V*A,)
    L = jnp.tile(ang_vecs[None, None], (F, V, 1, 1)).reshape(-1, 3)
    eV = jnp.tile(viewdirs[None, :, None], (F, 1, A, 1)).reshape(-1, 3)
    eN = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (F * V * A, 3))
    H = normalize((L + eV) / 2)
    feats = jnp.tile(app_features[:, None, None], (1, V, A, 1)).reshape(
        F * V * A, -1)
    er1 = jnp.tile(r1[:, None, None], (1, V, A)).reshape(-1)

    brdf_weight = model.brdf(eV, L, eN, H, eV, H, L, feats, er1, er1)
    pdf = model.brdf_sampler.compute_prob(L, eV, H, er1, er1).reshape(-1, 1)
    colors = (pdf * brdf_weight).reshape(F * V, A, 3)

    # mark the view direction in green
    vd_ind = jnp.argmax((L * eV).sum(-1).reshape(F * V, A), axis=1)
    colors = colors.at[jnp.arange(F * V), vd_ind].set(
        jnp.asarray([0.0, 1.0, 0.0]))

    im = colors.reshape(F, V, res, 2 * res, 3)
    im = jnp.transpose(im, (0, 2, 1, 3, 4)).reshape(F * res, 2 * V * res, 3)
    return im
