"""Static-shape masked ops: transmittance, masked reductions, compaction.

These are the TPU-native replacements for the reference's ragged/dynamic-shape
primitives:

- ``raw2alpha``: transmittance weights (modules/tensor_nerf.py:19-35) -- on a
  padded (B, N) layout the cumprod form is directly XLA-friendly and autodiff
  provides the backward that raymarching.cu:459-655 hand-writes.
- ``row_mask_sum`` semantics (modules/row_mask_sum.py:15-22): on the padded
  layout this is just a masked sum over the sample axis; the scatter_add /
  segment-sum machinery of the CUDA path disappears.
- ``compact_topk``: replaces data-dependent boolean compaction
  (``xyz_sampled[ray_valid]`` etc.) with a fixed-K stable-sort gather.
- ``flat_compact``: global fixed-budget compaction across a whole batch,
  replacing the reference's cumsum max_samples clamp (samplers/alphagrid.py:
  353-367) and select_bounces ray buffers (modules/pt_selectors.py:5-60).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np


def raw2alpha(sigma, dist):
    """sigma, dist: (B, N) -> (weights (B, N), transmittance_tail (B,)).

    weights[i,j] = alpha_ij * prod_{k<j} (1 - alpha_ik + 1e-10).
    """
    alpha = 1.0 - jnp.exp(-sigma * dist)
    one_m = jnp.concatenate(
        [jnp.ones_like(alpha[:, :1]), 1.0 - alpha + 1e-10], axis=-1
    )
    T = jnp.cumprod(one_m, axis=-1)
    weights = alpha * T[:, :-1]
    return weights, T[:, -1]


def masked_mean(x, mask, axis=None, eps=1e-8):
    mask = mask.astype(x.dtype)
    return (x * mask).sum(axis=axis) / (mask.sum(axis=axis) + eps)


def row_mask_sum(values, mask):
    """values: (B, N, D), mask: (B, N) -> (B, D). Masked sum over samples."""
    return (values * mask[..., None].astype(values.dtype)).sum(axis=1)


def compact_topk(valid, k: int):
    """Gather indices of the first (along axis 1) up-to-k valid entries per row.

    valid: (B, N) bool. Returns (idx (B, k) int32, keep (B, k) bool) where
    idx[b] lists the positions of the first valid samples of row b in order,
    and keep marks which of the k slots hold a real sample.

    Implemented with a stable argsort on ~valid: invalid entries sink to the
    end while valid entries keep their order -- the XLA-native equivalent of
    CUDA stream compaction (raymarching.cu:363-425 writes the same padded
    layout).
    """
    B, N = valid.shape
    order = jnp.argsort(jnp.logical_not(valid), axis=1, stable=True)
    idx = order[:, :k].astype(jnp.int32)
    counts = valid.sum(axis=1, keepdims=True)
    keep = jnp.arange(k)[None, :] < counts
    return idx, keep


def gather_rows(x, idx):
    """x: (B, N, ...) gathered at idx: (B, k) -> (B, k, ...)."""
    return jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1
    )


def scatter_rows(base, idx, updates, keep):
    """Inverse of gather_rows: scatter updates (B, k, ...) back into (B, N, ...)."""
    if updates.ndim > 2:
        keep = keep.reshape(keep.shape + (1,) * (updates.ndim - 2))
    upd = jnp.where(keep, updates, 0.0)
    idx_e = idx.reshape(idx.shape + (1,) * (base.ndim - 2))
    idx_b = jnp.broadcast_to(idx_e, upd.shape)
    return jnp.put_along_axis(base, idx_b, upd, axis=1, inplace=False)


def flat_compact(counts, budget: int):
    """Expand per-element counts into a flat fixed-size buffer of slots.

    counts: (M,) int -- element m wants counts[m] slots.
    Returns (src (budget,) int32, slot_valid (budget,) bool, kept_counts (M,)):
    src[r] = which element slot r belongs to; rays beyond the budget are
    dropped *per element from the end* (an element either keeps all or a
    truncated prefix of its slots).

    This is the static-shape replacement for torch.where(ray_mask) in
    pt_selectors.py / microfacet.py:351.
    """
    M = counts.shape[0]
    starts = jnp.cumsum(counts) - counts  # exclusive prefix sum
    ends = jnp.minimum(starts + counts, budget)
    starts_c = jnp.minimum(starts, budget)
    kept_counts = jnp.maximum(ends - starts_c, 0)
    # slot r belongs to the element whose [start, end) contains r:
    # src[r] = searchsorted(starts, r, side='right') - 1. method='sort'
    # beats the default binary-search scan ~3x on TPU.
    r = jnp.arange(budget)
    src = jnp.searchsorted(starts, r, side="right",
                           method="sort").astype(jnp.int32) - 1
    src = jnp.clip(src, 0, M - 1)
    total = jnp.minimum(jnp.sum(counts), budget)
    slot_valid = r < total
    return src, slot_valid, kept_counts


def segment_sum_to(values, seg_ids, valid, num_segments: int,
                   binsum: bool = False):
    """Sum values (R, D) with segment ids (R,) into (num_segments, D).

    binsum=True routes the (collision-serialized) scatter-add through the
    Pallas bin-sum kernel (ops/pallas/binsum.py): same regrouped sum,
    backward is a plain gather."""
    vals = jnp.where(valid[:, None], values, 0.0)
    if binsum:
        # out-of-range ids are dropped by the kernel; park invalid rows
        # there so they can't alias a real segment
        ids = jnp.where(valid, seg_ids, num_segments)
        return _binsum_segment_sum(vals, ids.astype(jnp.int32),
                                   num_segments)
    return jax.ops.segment_sum(vals, seg_ids, num_segments=num_segments)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _binsum_segment_sum(vals, ids, num_segments):
    from .pallas.binsum import binsum_rows

    return binsum_rows(ids, vals, num_segments)


def _bss_fwd(vals, ids, num_segments):
    return _binsum_segment_sum(vals, ids, num_segments), ids


def _bss_bwd(num_segments, ids, g):
    in_range = (ids >= 0) & (ids < num_segments)
    dv = jnp.take(g, jnp.clip(ids, 0, num_segments - 1), axis=0)
    dv = jnp.where(in_range[:, None], dv, 0.0)
    return dv, np.zeros(ids.shape, dtype=jax.dtypes.float0)


_binsum_segment_sum.defvjp(_bss_fwd, _bss_bwd)


@jax.custom_vjp
def take_rows_binsum(x, idx):
    """``x[idx]`` (axis 0) whose backward scatter-add goes through the
    Pallas bin-sum kernel -- for gathers with REPEATED indices (e.g. many
    bounce rays per parent sample) whose transpose XLA serializes on the
    collisions."""
    return jnp.take(x, idx, axis=0)


def _trb_fwd(x, idx):
    return jnp.take(x, idx, axis=0), (x.shape[0], idx)


def _trb_bwd(res, g):
    from .pallas.binsum import binsum_rows

    m, idx = res
    dx = binsum_rows(idx.astype(jnp.int32), g.astype(jnp.float32), m)
    # g.dtype == out.dtype == x.dtype (take preserves dtype)
    return dx.astype(g.dtype), np.zeros(idx.shape, dtype=jax.dtypes.float0)


take_rows_binsum.defvjp(_trb_fwd, _trb_bwd)
