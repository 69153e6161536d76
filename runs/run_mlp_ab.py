#!/usr/bin/env python
"""On-chip A/B for bf16 shading-MLP compute (model.arch.mlp_dtype).

Times the flagship microfacet train step with MLP matmuls in f32 vs bf16
operands (f32 accumulation both ways) and reports the loss drift over a
short trajectory (bf16 operand rounding is a real approximation, unlike
the exact binsum/layout experiments -- drift should stay small but will
not be zero).

    python runs/run_mlp_ab.py
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import bench

FLAGSHIP = [
    "model=microfacet_tensorf2",
    "model.arch.max_samples_per_ray=128",
    "model.arch.recur_samples_per_ray=64",
    "model.arch.proposal_samples_per_ray=64",
    "model.arch.model.brdf_ray_budget=[32768,8192]",
    "model.arch.model.max_retrace_rays=[1024]",
    "model.arch.bg_module.bg_resolution=512",
]


def run(dtype, n_iters=30):
    import jax
    import jax.numpy as jnp

    from nmf_tpu import trainer

    overrides = list(FLAGSHIP)
    if dtype != "f32":
        overrides += [f"model.arch.mlp_dtype={dtype}"]
    nmf = bench._build(overrides)
    key = jax.random.PRNGKey(0)
    tx = trainer.make_optimizer(nmf, trainer.OptimConfig(n_iters=30000))
    opt_state = tx.init(nmf)
    step = trainer.make_train_step(tx)
    weights = trainer.LossWeights()
    rays, rgbs = bench._rays(4096)
    bg_col = jnp.ones((3,))

    losses = []
    key, sk = jax.random.split(key)
    nmf, opt_state, m = step(nmf, opt_state, rays, rgbs, bg_col, sk, weights)
    losses.append(float(m["loss"]))  # compile barrier
    for _ in range(8):
        key, sk = jax.random.split(key)
        nmf, opt_state, m = step(nmf, opt_state, rays, rgbs, bg_col, sk,
                                 weights)
        losses.append(float(m["loss"]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            key, sk = jax.random.split(key)
            nmf, opt_state, m = step(nmf, opt_state, rays, rgbs, bg_col, sk,
                                     weights)
        float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / n_iters)
    return best, losses


if __name__ == "__main__":
    dt32, l32 = run("f32")
    dt16, l16 = run("bf16")
    a, b = np.asarray(l32), np.asarray(l16)
    out = {
        "metric": "mlp_dtype_ab",
        "step_ms_f32": round(dt32 * 1e3, 2),
        "step_ms_bf16": round(dt16 * 1e3, 2),
        "speedup_e2e": round(dt32 / dt16, 4),
        "loss_rel_drift_max": float(
            np.max(np.abs(a - b) / (np.abs(a) + 1e-8))),
        "loss_final_f32": float(a[-1]),
        "loss_final_bf16": float(b[-1]),
    }
    print(json.dumps(out))
    with open(Path(__file__).parent / "mlp_ab.json", "w") as f:
        json.dump(out, f)
