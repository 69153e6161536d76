"""Cell-run merging of ray samples (run-collapsed shading).

TPU-original optimization (no reference counterpart; the reference shades
every sample, models/microfacet.py:271-333, and controls cost by adapting
ray counts instead, train.py:616-627). Motivation, measured by
``runs/cell_multiplicity_probe.py``: at a converged field, proposal
resampling concentrates the fine sample budget into a surface shell a few
voxels thick — ~11 consecutive samples share the SAME grid cell on every
factor plane (92% adjacent-equal). Those samples gather identical factor
rows and differ only in interpolation weights, so shading them
individually multiplies every downstream cost (appearance gathers and
their backward scatters — the train step's dominant cost at the per-row
latency floor — shading MLP evals, bounce-ray allocation) by the
multiplicity for near-identical integrands.

``merge_sample_runs`` collapses each maximal run of consecutive same-cell
samples into one representative sample: summed transmittance weight,
weight-averaged depth, summed segment width. Radiance varies within a
cell only through (bi)linear feature interpolation, so the collapse is
exact for cell-constant radiance and first-order accurate otherwise —
the same trade the two-stage top-K' shading makes, re-keyed on runs
(where the compression actually is). Density integration is NOT
coarsened: transmittance weights come from the full per-sample pass.

Static shapes: runs are compacted into ``n_slots`` per-ray slots chosen
top-k by run weight (ties to the existing budget philosophy — overflow
runs beyond the slot budget lose shading, like the bounce-budget
thinning; slots are restored to along-ray order so downstream quadrature
code sees sorted depths). All per-run reductions use cumsum differences
looked up with transition one-hot matmuls on the MXU — zero gathers, the
same trick as ops/resample.py (TPU gathers cost ~10 ns per ROW, so the
machinery must not spend rows to save rows).
"""
from typing import Any

import jax
import jax.numpy as jnp

from .grid_sample import _unnormalize


def cell_indices(rf, xyz):
    """Per-axis grid cell index of each sample: (..., 4) world xyz ->
    (..., 3) int32.

    Mirrors the index math of the plane quad-gathers
    (ops/grid_sample.py:_quad_prep) per world axis, so two samples share
    all three plane rows (and line indices) iff their cell_indices rows
    are equal. Handles fixed_shape padded grids via the live resolutions.
    """
    coords = rf.normalize_coord(xyz)[..., :3]
    live = rf._live3() if hasattr(rf, "_live3") else None
    out = []
    for a in range(3):
        R = int(rf.grid_size[a])
        Rl = R if live is None else live[a]
        c = jnp.clip(coords[..., a], -1, 1)
        x = _unnormalize(c, Rl)
        ix = jnp.clip(jnp.clip(jnp.floor(x), 0, Rl - 1).astype(jnp.int32),
                      0, R - 1)
        out.append(ix)
    return jnp.stack(out, axis=-1)


def _lookup(c, pos, K):
    """c: (B, K+1, C) padded cumsums; pos: (B, S) in [0, K] ->
    (B, S, C) rows via a one-hot matmul (gather-free)."""
    oh = (pos[:, :, None]
          == jnp.arange(K + 1, dtype=jnp.int32)[None, None, :])
    return jnp.einsum("bsk,bkc->bsc", oh.astype(c.dtype), c)


def merge_sample_runs(cells, z_vals, dists, weight, valid, n_slots: int):
    """Collapse consecutive same-cell samples into per-run slots.

    cells: (B, K, 3) int32 per-sample cell indices; z_vals, dists, weight:
    (B, K) f32; valid: (B, K) bool. Returns (z_m, dists_m, w_m, valid_m),
    each (B, n_slots), with slots in along-ray (ascending-z) order:

      w_m     = sum of the run's weights            (mass-preserving for
                                                     the kept runs)
      z_m     = weight-averaged run depth (so sum w_m * z_m == the full
                depth integral over kept runs, exactly)
      dists_m = total segment width of the run
      valid_m = run exists and contains a valid sample

    Runs never span an invalid sample (invalid pairs break runs), and the
    top-``n_slots`` runs by weight are kept per ray; missing slots come
    back invalid with zero weight.
    """
    B, K = weight.shape
    same = ((cells[:, 1:] == cells[:, :-1]).all(-1)
            & valid[:, 1:] & valid[:, :-1])
    starts = jnp.concatenate(
        [jnp.ones((B, 1), dtype=bool), ~same], axis=1)       # (B, K)

    w = jnp.where(valid, weight, 0.0)
    vf = valid.astype(jnp.float32)
    # j-th run start position per ray (ascending; K = no such run)
    kk = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None], (B, K))
    startpos = jnp.sort(jnp.where(starts, kk, K), axis=1)     # (B, K)
    has = startpos < K
    nextpos = jnp.concatenate(
        [startpos[:, 1:], jnp.full((B, 1), K, jnp.int32)], axis=1)

    # per-run sums via padded-cumsum differences (stacked channels, one
    # one-hot matmul pair for all of them)
    stack = jnp.stack([w, w * z_vals, jnp.where(valid, dists, 0.0), vf,
                       vf * z_vals], axis=-1)                 # (B, K, 5)
    cp = jnp.concatenate(
        [jnp.zeros((B, 1, stack.shape[-1]), stack.dtype),
         jnp.cumsum(stack, axis=1)], axis=1)                  # (B, K+1, 5)
    seg = _lookup(cp, nextpos, K) - _lookup(cp, startpos, K)  # (B, K, 5)
    W, WZ, D, V, VZ = [seg[..., i] for i in range(5)]

    # keep the top-n_slots runs by weight, restored to along-ray order
    # (startpos is ascending in j, so sorting the selected j sorts by z)
    _, jsel = jax.lax.top_k(jnp.where(has, W, -1.0), n_slots)
    jsel = jnp.sort(jsel, axis=1)                             # (B, S)
    sel = jnp.stack([W, WZ, D, V, VZ, has.astype(jnp.float32)], axis=-1)
    oh = (jsel[:, :, None] == jnp.arange(K, dtype=jnp.int32)[None, None, :])
    picked = jnp.einsum("bsk,bkc->bsc", oh.astype(sel.dtype), sel)
    W_m, WZ_m, D_m, V_m, VZ_m, has_m = [picked[..., i] for i in range(6)]

    valid_m = (has_m > 0.5) & (V_m > 0.5)
    # weight-averaged depth; zero-weight (but valid) runs fall back to the
    # plain mean over their valid samples so positions stay finite
    eps = 1e-12
    z_w = WZ_m / jnp.maximum(W_m, eps)
    z_u = VZ_m / jnp.maximum(V_m, 1.0)
    z_m = jnp.where(W_m > eps, z_w, z_u)
    return z_m, D_m, W_m, valid_m
