#!/usr/bin/env python
"""Capture a fresh xplane device trace of the flagship train step and print
the grouped per-op attribution (nmf_tpu.scripts.parse_xplane). Run alone on
the TPU when the chip is free.

Usage:
    python runs/run_trace.py [extra hydra overrides...]

e.g. after the binsum A/B confirms the kernel wins:
    python runs/run_trace.py field.scatter_kernel=true \
        model.arch.bg_module.scatter_kernel=true
Writes the trace under runs/trace_r3/ and prints the top-40 op table so the
attribution survives in the stage log.
"""
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import bench

TRACE_DIR = Path(__file__).parent / "trace_r3"

FLAGSHIP = [
    "model=microfacet_tensorf2",
    "model.arch.max_samples_per_ray=128",
    "model.arch.recur_samples_per_ray=64",
    "model.arch.proposal_samples_per_ray=64",
    "model.arch.model.brdf_ray_budget=[32768,8192]",
    "model.arch.model.max_retrace_rays=[1024]",
    "model.arch.bg_module.bg_resolution=512",
]


def main():
    import jax
    import jax.numpy as jnp

    from nmf_tpu import trainer

    overrides = FLAGSHIP + sys.argv[1:]
    nmf = bench._build(overrides)
    key = jax.random.PRNGKey(0)
    tx = trainer.make_optimizer(nmf, trainer.OptimConfig(n_iters=30000))
    opt_state = tx.init(nmf)
    step = trainer.make_train_step(tx)
    weights = trainer.LossWeights()
    rays, rgbs = bench._rays(4096)
    bg_col = jnp.ones((3,))

    def one(nmf, opt_state, key):
        key, sk = jax.random.split(key)
        nmf, opt_state, m = step(nmf, opt_state, rays, rgbs, bg_col, sk,
                                 weights)
        return nmf, opt_state, key, m

    # warm (compile) outside the trace
    nmf, opt_state, key, m = one(nmf, opt_state, key)
    float(m["loss"])

    TRACE_DIR.mkdir(exist_ok=True)
    jax.profiler.start_trace(str(TRACE_DIR))
    t0 = time.perf_counter()
    for _ in range(3):
        nmf, opt_state, key, m = one(nmf, opt_state, key)
    final = float(m["loss"])  # host-fetch barrier (axon lazy queue)
    dt = (time.perf_counter() - t0) / 3
    jax.profiler.stop_trace()
    print(f"traced 3 steps, {dt*1e3:.1f} ms/step wall, loss={final:.5f}",
          flush=True)

    subprocess.run([sys.executable, "-m", "nmf_tpu.scripts.parse_xplane",
                    str(TRACE_DIR), "--top", "40", "--group"], check=False)


if __name__ == "__main__":
    main()
