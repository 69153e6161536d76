#!/usr/bin/env python
"""On-chip A/B for the Pallas bin-sum scatter kernel (ops/pallas/binsum.py).

Times the flagship microfacet train step with the kernel OFF (XLA
.at[].add scatter) vs ON (field.scatter_kernel + bg scatter_kernel), and
checks the loss trajectories agree (the kernel is an exact regrouping of
the same sums, so trajectories should match to float-accumulation noise).

Run on the real TPU when the chip is free:
    python runs/run_binsum_ab.py
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


def run(on, n_iters=30, model_arm=False):
    import jax
    import jax.numpy as jnp

    from nmf_tpu import trainer

    overrides = list(FLAGSHIP)
    if on:
        overrides += ["field.scatter_kernel=true",
                      "model.arch.bg_module.scatter_kernel=true"]
    if model_arm:
        # bounce-ray scatters: parent-gather backward + composite segment
        # sums (xplane fusion.45/fusion.40, ~4.7 ms/step serialized)
        overrides += ["model.arch.model.scatter_kernel=true"]
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
    losses.append(float(m["loss"]))  # also the compile barrier
    # parity pass: per-iter host fetch captures the trajectory
    for _ in range(8):
        key, sk = jax.random.split(key)
        nmf, opt_state, m = step(nmf, opt_state, rays, rgbs, bg_col, sk,
                                 weights)
        losses.append(float(m["loss"]))
    # timing pass: fetch only at trial end so tunnel RTT doesn't dilute
    # the kernel delta (bench.py measurement discipline)
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
    dt_off, loss_off = run(False)
    dt_on, loss_on = run(True)
    dt_all, loss_all = run(True, model_arm=True)
    a, b, c = (np.asarray(loss_off), np.asarray(loss_on),
               np.asarray(loss_all))
    out = {
        "step_ms_off": round(dt_off * 1e3, 2),
        "step_ms_on": round(dt_on * 1e3, 2),
        "step_ms_on_plus_model": round(dt_all * 1e3, 2),
        "speedup_e2e": round(dt_off / dt_on, 4),
        "speedup_e2e_plus_model": round(dt_off / dt_all, 4),
        "loss_rel_err_max": float(np.max(np.abs(a - b) / (np.abs(a) + 1e-8))),
        "loss_rel_err_max_model": float(
            np.max(np.abs(a - c) / (np.abs(a) + 1e-8))),
        "loss_final_off": float(a[-1]),
        "loss_final_on": float(b[-1]),
    }
    print(json.dumps(out))
