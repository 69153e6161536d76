#!/usr/bin/env python
"""On-chip A/B of the Pallas transmittance_weights kernel on the flagship
train step (VERDICT r3 next #3, first half): `use_pallas` ships default-off
with only a microbench claim (~2.3x over XLA cumprod at bench shape,
ops/pallas/composite.py); this measures the knob where it matters — the
full flagship forward+backward train step — and records the verdict.

Prints one JSON line per arm + a final verdict line; exit 0 on success.
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # repo-root bench harness (reuses _build/_time_train_step)

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
    out = {}
    for name, extra in (("xla", ["model.arch.use_pallas=false"]),
                        ("pallas", ["model.arch.use_pallas=true"])):
        nmf = bench._build(FLAGSHIP + extra)
        rps, step_s, _ = bench._time_train_step(nmf)
        out[name] = {"rays_per_sec": round(rps, 1),
                     "step_ms": round(step_s * 1e3, 2)}
        print(json.dumps({"arm": name, **out[name]}), flush=True)
    speedup = out["pallas"]["rays_per_sec"] / out["xla"]["rays_per_sec"]
    print(json.dumps({
        "ab": "use_pallas_flagship_train_step",
        "speedup": round(speedup, 4),
        "verdict": "pallas" if speedup > 1.02 else
                   ("parity" if speedup > 0.98 else "xla"),
        **out,
    }), flush=True)


def chain_sibling_abs():
    """Run the other two round-3 perf A/Bs that never got chip time
    (VERDICT r3 weak #2): quad-table layout and bf16 shading MLPs. Each
    writes its own log/json; failures don't mask this script's own
    result but do fail the stage so the queue retries (compile caches
    make attempt 2 cheap)."""
    import subprocess

    here = Path(__file__).resolve().parent
    rc_all = 0
    for script, log in (("run_layout_ab.py", "layout_ab.log"),
                        ("run_mlp_ab.py", "mlp_ab.log")):
        with open(here / log, "a") as f:
            rc = subprocess.run([sys.executable, str(here / script)],
                                stdout=f, stderr=subprocess.STDOUT).returncode
        print(json.dumps({"chained": script, "rc": rc}), flush=True)
        rc_all = rc_all or rc
    return rc_all


if __name__ == "__main__":
    main()
    sys.exit(chain_sibling_abs())
