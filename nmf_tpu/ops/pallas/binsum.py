"""Pallas TPU kernel: sorted segment-accumulate scatter ("bin-sum").

TPU-native replacement for the row scatter-adds that dominate the train
step's backward pass (plane-gradient accumulation in the TensoRF factor
planes and the envmap SAT backward; the reference leaves these to
torch/cuBLAS scatter kernels, e.g. the autograd of ``F.grid_sample`` in
fields/tensoRF.py and ``integral_equirect.py``'s SAT backward).

XLA lowers ``(HW, C).at[idx].add(vals)`` to a serialized read-modify-write
scatter measured at ~18 ns/row on v5e -- 2x the 8-10 ns/row gather floor,
and worse under collisions. This kernel restructures the op:

  1. XLA side: argsort the target row ids, gather the value rows into
     sorted order (one ~10 ns/row gather), and compute per-output-tile
     segment offsets with searchsorted.
  2. Pallas side: grid over output tiles of TR rows. Each tile DMAs only
     its own [offsets[t], offsets[t+1]) slice of the sorted rows from HBM
     in CHUNK-row chunks (dynamic-start async copies) and accumulates them
     into a VMEM-resident (TR, C) block with a one-hot matmul
     ``onehot.T @ vals`` on the MXU -- collisions combine inside the
     matmul instead of serializing memory traffic.

The one-hot entries are exactly 0/1 so the matmul is exact in every
precision; vals stay f32 with HIGHEST precision (the 3-pass bf16 product
is f32-accurate and the flop count -- N*TR*C -- is microscopic next to
the step's field matmuls).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR = 512      # output rows per tile (VMEM-resident accumulator block)
CHUNK = 1024  # sorted input rows per DMA chunk


def _binsum_kernel(off_ref, val_hbm, out_ref, vbuf, vsem):
    # val_hbm rows are [idx_as_exact_f32 | value channels | lane padding]:
    # Mosaic requires HBM DMA slices 128-aligned in the LANE dim, so the
    # row ids ride lane 0 of the (lane-padded) value rows instead of a
    # separate (CHUNK, 1) buffer, and the channel count is padded to a
    # multiple of 128 by the caller. Ids are float-CONVERTED (exact for
    # ids < 2^24), not bitcast: bitcast ids are subnormals and the VPU
    # flushes subnormals to zero, which collapsed every row onto local
    # id 0 on real hardware (interpret mode doesn't flush). The id lane
    # flows through the one-hot matmul into output lane 0, which the
    # caller slices away.
    t = pl.program_id(0)
    base = t * TR
    # Mosaic also requires the DMA start 8-aligned in the sublane dim
    # (f32 tiling (8, 128)): align the tile's range start DOWN to 8. The
    # <=7 extra head rows belong to the previous tile (ids < base), so
    # the one-hot id match drops them for free.
    start = (off_ref[t] // 8) * 8
    n = off_ref[t + 1] - start
    out_ref[:] = jnp.zeros_like(out_ref)

    def chunk_body(k, _):
        s = pl.multiple_of(start + k * CHUNK, 8)
        vdma = pltpu.make_async_copy(
            val_hbm.at[pl.ds(s, CHUNK)], vbuf, vsem)
        vdma.start()
        vdma.wait()
        valid_rows = n - k * CHUNK
        row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TR), 0)
        tgt = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TR), 1)
        local = vbuf[:, 0:1].astype(jnp.int32) - base     # (CHUNK, 1)
        onehot = jnp.where((tgt == local) & (row < valid_rows), 1.0, 0.0)
        out_ref[:] += jax.lax.dot_general(
            onehot, vbuf[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        return 0

    jax.lax.fori_loop(0, pl.cdiv(n, CHUNK), chunk_body, 0)


@functools.partial(jax.jit, static_argnames=("num_rows", "interpret"))
def binsum_rows(idx, vals, num_rows, interpret=None):
    """Scatter-add ``vals`` rows into a fresh ``(num_rows, C)`` buffer.

    Equivalent to ``jnp.zeros((num_rows, C)).at[idx].add(vals)`` for
    ``idx`` in [0, num_rows); rows with idx outside that range are
    dropped (matching XLA scatter's out-of-bounds-drop semantics used for
    padded lanes).

    interpret=None auto-falls-back to interpret mode off-TPU so the
    8-device CPU-mesh tests and dryrun exercise the same code path.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # ids ride a float32 lane (see _binsum_kernel): exact only below 2^24
    assert num_rows <= 2 ** 24, (
        f"binsum_rows: num_rows={num_rows} exceeds exact-f32-integer range; "
        "row ids and the r_pad sentinel would silently collide")
    n, C = vals.shape
    idx = idx.astype(jnp.int32)
    order = jnp.argsort(idx)
    sidx = idx[order]
    svals = jnp.take(vals, order, axis=0).astype(jnp.float32)

    r_pad = int(-(-num_rows // TR) * TR)
    n_tiles = r_pad // TR
    # out-of-range ids sort to the ends; clamp them onto padded tiles'
    # offsets via searchsorted against tile boundaries
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * TR
    offsets = jnp.searchsorted(sidx, bounds, side="left").astype(jnp.int32)
    # Pack [id_as_exact_f32 | values] rows and pad the lane dim to a
    # multiple of 128 (Mosaic DMA alignment; see _binsum_kernel). Row
    # padding is the DMA overrun guard: chunks may read past the last
    # valid row, so overrun rows carry the out-of-range id r_pad.
    LANE = 128
    Cp = int(-(-(C + 1) // LANE) * LANE)
    packed = jnp.concatenate(
        [sidx[:, None].astype(jnp.float32), svals], axis=1)
    packed = jnp.pad(packed, ((0, CHUNK), (0, Cp - (C + 1))))
    packed = packed.at[n:, 0].set(jnp.float32(r_pad))

    out = pl.pallas_call(
        _binsum_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((TR, Cp), lambda t, off: (t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((CHUNK, Cp), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((r_pad, Cp), jnp.float32),
        interpret=interpret,
    )(offsets, packed)
    return out[:num_rows, 1:C + 1]
