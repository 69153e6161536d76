#!/usr/bin/env python
"""Microbenchmarks for the two gather/scatter walls the step profile shows.

1. Alpha-mask lookup: 1.8M single-SCALAR gathers run at ~10.5 ns/row while
   288-channel plane gathers run at ~3 ns/row -- narrow rows, not row count,
   are the cost. Variants: scalar gather, (row, lane) two-step, dtype width.
2. Plane gradient scatter-add: 524k rows -> 16k-row table at ~18 ns/row, and
   collision-heavy envmap SAT scatters at ~58 ns/row. Variants: plain
   .at[].add, pre-sorted indices (+hint), sort + chunk-combine via batched
   one-hot matmul + compacted scatter.

Run alone on the TPU (CPU contention starves the axon tunnel).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parents[2] / ".jax_cache"))


def timeit(fn, *args, n=20):
    red = jax.jit(lambda a: a.astype(jnp.float32).ravel()[:8].sum() * 1e-30)
    salt = jnp.zeros(())
    float(red(fn(*args, salt)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args, salt)
            salt = red(out)
        float(salt)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3  # ms


# ----------------------------------------------------------------- alpha
def bench_alpha():
    M = 4096 * 440
    for G in (32, 128, 200):
        vol = (jax.random.uniform(jax.random.PRNGKey(0), (G, G, G)) > 0.5)
        volf = vol.astype(jnp.float32)
        voli8 = vol.astype(jnp.int8)
        idx = jax.random.randint(jax.random.PRNGKey(1), (M, 3), 0, G)
        iz, iy, ix = idx[:, 0], idx[:, 1], idx[:, 2]

        f_scalar = jax.jit(lambda v, iz, iy, ix, s: v[iz, iy, ix]
                           + s * 0)
        t = timeit(f_scalar, volf, iz, iy, ix)
        print(f"G={G} scalar f32 gather:          {t:7.2f} ms"
              f"  ({t * 1e6 / M:.1f} ns/row)")

        f_scalar8 = jax.jit(lambda v, iz, iy, ix, s: v[iz, iy, ix]
                            + (s * 0).astype(jnp.int8))
        t = timeit(f_scalar8, voli8, iz, iy, ix)
        print(f"G={G} scalar int8 gather:         {t:7.2f} ms")

        # two-step: gather the (z,y) row (G lanes of x), pick lane x
        vol2d = volf.reshape(G * G, G)
        def f_rowlane(v2, iz, iy, ix, s):
            rows = v2[iz * G + iy]          # (M, G)
            return jnp.take_along_axis(rows, ix[:, None], axis=1)[:, 0] + s * 0
        t = timeit(jax.jit(f_rowlane), vol2d, iz, iy, ix)
        print(f"G={G} row+lane f32:               {t:7.2f} ms")

        vol2d8 = voli8.reshape(G * G, G)
        def f_rowlane8(v2, iz, iy, ix, s):
            rows = v2[iz * G + iy]
            return (jnp.take_along_axis(rows, ix[:, None], axis=1)[:, 0]
                    + (s * 0).astype(jnp.int8))
        t = timeit(jax.jit(f_rowlane8), vol2d8, iz, iy, ix)
        print(f"G={G} row+lane int8:              {t:7.2f} ms")

        if G == 32:
            # one-hot matmul: (M, G*G) @ (G*G, G) picked by lane
            vb = volf.reshape(G * G, G).astype(jnp.bfloat16)
            def f_mm(v2, iz, iy, ix, s):
                oh = jax.nn.one_hot(iz * G + iy, G * G, dtype=jnp.bfloat16)
                rows = oh @ v2                          # (M, G)
                return (jnp.take_along_axis(rows, ix[:, None], axis=1)[:, 0]
                        .astype(jnp.float32) + s * 0)
            t = timeit(jax.jit(f_mm), vb, iz, iy, ix)
            print(f"G={G} one-hot matmul bf16:        {t:7.2f} ms")


# ----------------------------------------------------------------- scatter
def _chunk_combine_scatter(idx, g, T, C=128, pairs_cap=None):
    """Sort updates by target row, partial-sum runs inside fixed chunks via
    a batched one-hot matmul, compact the per-chunk uniques, scatter them.

    idx: (M,) int32 targets in [0, T); g: (M, D) updates.
    Exact: each (chunk, unique-target) pair contributes one scattered row;
    #pairs <= #chunks + #targets, a static bound.
    """
    M, D = g.shape
    n_chunks = M // C
    if pairs_cap is None:
        pairs_cap = 1 << int(np.ceil(np.log2(n_chunks + T + 1)))
    order = jnp.argsort(idx)
    si = idx[order]                              # (M,) sorted targets
    sg = g[order]                                # (M, D) reordered payload
    ci = si.reshape(n_chunks, C)
    cg = sg.reshape(n_chunks, C, D)
    eq = (ci[:, :, None] == ci[:, None, :])      # (n_chunks, C, C)
    part = jnp.einsum("nij,njd->nid", eq.astype(cg.dtype), cg)
    first = jnp.concatenate(
        [jnp.ones((n_chunks, 1), bool), ci[:, 1:] != ci[:, :-1]], axis=1)
    # compact first-occurrence rows into the static pairs buffer
    flat_first = first.reshape(-1)
    flat_idx = si
    flat_part = part.reshape(M, D)
    ord2 = jnp.argsort(~flat_first)[:pairs_cap]
    keep = flat_first[ord2]
    tgt = jnp.where(keep, flat_idx[ord2], T)     # dump row T
    out = jnp.zeros((T + 1, D), g.dtype).at[tgt].add(flat_part[ord2])
    return out[:T]


def bench_scatter():
    key = jax.random.PRNGKey(0)
    for (M, T, D, dist) in [(524288, 16384, 288, "uniform"),
                            (131072, 691456, 12, "hot"),
                            (524288, 16384, 288, "hot")]:
        k1, k2 = jax.random.split(jax.random.fold_in(key, M + T))
        if dist == "uniform":
            idx = jax.random.randint(k1, (M,), 0, T)
        else:  # collision-heavy: 90% of updates hit 64 rows
            hot = jax.random.randint(k1, (M,), 0, 64)
            cold = jax.random.randint(k1, (M,), 0, T)
            idx = jnp.where(jax.random.uniform(k2, (M,)) < 0.9, hot, cold)
        g = jax.random.normal(k2, (M, D), jnp.float32).astype(jnp.bfloat16)

        base = jax.jit(lambda idx, g, s: jnp.zeros((T, D), g.dtype)
                       .at[idx].add(g + (s * 0).astype(g.dtype)))
        t0 = timeit(base, idx, g)
        print(f"M={M} T={T} D={D} {dist:8s} plain .at[].add: {t0:7.2f} ms")

        def sorted_add(idx, g, s):
            order = jnp.argsort(idx)
            return jnp.zeros((T, D), g.dtype).at[idx[order]].add(
                g[order] + (s * 0).astype(g.dtype),
                indices_are_sorted=True)
        t1 = timeit(jax.jit(sorted_add), idx, g)
        print(f"{'':28s} sort + sorted add:        {t1:7.2f} ms")

        cc = jax.jit(lambda idx, g, s: _chunk_combine_scatter(
            idx, g + (s * 0).astype(g.dtype), T))
        t2 = timeit(cc, idx, g)
        print(f"{'':28s} chunk-combine scatter:    {t2:7.2f} ms")
        # correctness
        ref = np.asarray(base(idx, g, jnp.zeros(())), np.float32)
        got = np.asarray(cc(idx, g, jnp.zeros(())), np.float32)
        err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-8)
        print(f"{'':28s} chunk-combine rel err:    {err:.2e}")


def bench_binsum():
    """A/B the Pallas bin-sum kernel against XLA scatter at the train
    step's real shapes: fine-pass quad-plane gradient (uniform-ish) and
    envmap SAT backward (collision-heavy)."""
    from nmf_tpu.ops.pallas.binsum import binsum_rows

    key = jax.random.PRNGKey(0)
    for (M, T, D, dist) in [(262144, 90000, 288, "uniform"),
                            (262144, 90000, 288, "hot"),
                            (262144, 691456, 12, "hot"),
                            (262144, 691456, 12, "uniform")]:
        k1, k2 = jax.random.split(jax.random.fold_in(key, M + T + D))
        if dist == "uniform":
            idx = jax.random.randint(k1, (M,), 0, T)
        else:
            hot = jax.random.randint(k1, (M,), 0, 64)
            cold = jax.random.randint(k1, (M,), 0, T)
            idx = jnp.where(jax.random.uniform(k2, (M,)) < 0.9, hot, cold)
        g = jax.random.normal(k2, (M, D), jnp.float32)

        base = jax.jit(lambda idx, g, s: jnp.zeros((T, D), g.dtype)
                       .at[idx].add(g + s * 0))
        t0 = timeit(base, idx, g)
        print(f"M={M} T={T} D={D} {dist:8s} XLA .at[].add:  {t0:7.2f} ms")

        bk = jax.jit(lambda idx, g, s: binsum_rows(idx, g + s * 0, T))
        t1 = timeit(bk, idx, g)
        print(f"{'':28s} pallas binsum:   {t1:7.2f} ms  "
              f"({t0 / max(t1, 1e-9):.2f}x)")
        ref = np.asarray(base(idx, g, jnp.zeros(())), np.float32)
        got = np.asarray(bk(idx, g, jnp.zeros(())), np.float32)
        err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-8)
        print(f"{'':28s} binsum rel err:  {err:.2e}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("alpha", "all"):
        bench_alpha()
    if which in ("scatter", "all"):
        bench_scatter()
    if which in ("binsum", "all"):
        bench_binsum()
