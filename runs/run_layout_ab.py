#!/usr/bin/env python
"""A/B: quad-table layout (NMF_QUAD_ROWMAJOR) on the flagship train step.

The xplane trace of the flagship step shows ~7 ms/step of layout copies +
converts on the gathered (262144, 288) bf16 quad rows (copy.4222/4257/4292
+ select_convert_fusion* in /tmp/trace_v2): the transpose-built corner
table makes XLA lay the big gather OUTPUT out column-major. The row-major
table moves that transpose onto the 9 MB table. Values are bit-identical
(tests/test_ops.py::TestQuadTableLayout); this measures the end-to-end
train-step wall time both ways on the chip.

Run each arm in a fresh process (the flag is read at import): this script
re-execs itself. Writes the result to runs/layout_ab.json.
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def measure():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from nmf_tpu import trainer

    key = jax.random.PRNGKey(0)
    nmf, _ = ge._build_nmf(key, grid=128, bg_res=512, k_spr=128, recur_k=48,
                           brdf_budget=(32768, 8192), retrace=1024,
                           proposal=64)
    tx = trainer.make_optimizer(nmf, trainer.OptimConfig(n_iters=1000))
    opt_state = tx.init(nmf)
    step = trainer.make_train_step(tx, donate=False)
    weights = trainer.LossWeights()

    B = 4096
    rng = np.random.default_rng(0)
    o = np.tile([[0.0, 0.0, -4.0]], (B, 1)).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate([o, d], -1))
    rgbs = jnp.asarray(rng.uniform(size=(B, 3)).astype(np.float32))

    # chained timing: each call consumes the previous loss (honest barrier
    # under the lazy axon queue)
    k = jax.random.PRNGKey(1)
    nmf2, opt2, m = step(nmf, opt_state, rays, rgbs, jnp.ones(3), k, weights)
    loss0 = float(m["loss"])  # compile + warm
    n = 20
    t0 = time.perf_counter()
    salt = m["loss"] * 1e-20
    for i in range(n):
        k = jax.random.fold_in(k, i)
        nmf2, opt2, m = step(nmf2, opt2, rays, rgbs,
                             jnp.ones(3) + salt, k, weights)
        salt = m["loss"] * 1e-20
    final = float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    return {"rowmajor": os.environ.get("NMF_QUAD_ROWMAJOR", "0"),
            "step_ms": round(dt * 1000, 2),
            "rays_per_sec": round(B / dt, 1),
            "loss0": round(loss0, 6), "loss_end": round(final, 6)}


def main():
    if os.environ.get("NMF_LAYOUT_AB_CHILD"):
        print("RESULT " + json.dumps(measure()))
        return
    results = []
    for flag in ("0", "1"):
        env = dict(os.environ, NMF_LAYOUT_AB_CHILD="1",
                   NMF_QUAD_ROWMAJOR=flag)
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, timeout=3600)
        line = [l for l in out.stdout.splitlines()
                if l.startswith("RESULT ")]
        if not line:
            print(out.stdout[-2000:], out.stderr[-2000:])
            raise SystemExit(f"arm rowmajor={flag} failed")
        results.append(json.loads(line[0][len("RESULT "):]))
        print(results[-1])
    line = {"metric": "quad_layout_ab", "results": results,
            "speedup": round(results[0]["step_ms"]
                             / max(results[1]["step_ms"], 1e-9), 3)}
    print(json.dumps(line))
    with open(Path(__file__).parent / "layout_ab.json", "w") as f:
        json.dump(line, f)


if __name__ == "__main__":
    main()
