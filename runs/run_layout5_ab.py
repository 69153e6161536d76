#!/usr/bin/env python
"""Round-5 corner-feature layout A/B (VERDICT r4 next-#1, kernel program
item 1): NMF_QUAD_ROWMAJOR x merge_runs on the flagship train step.

trace_r4 attribution: the transpose-built quad table makes XLA lay the
(262144, 288) gather output/cotangent tensors out column-major and pay
{0,1}->{1,0} copies + converts in the shading stage (~5 ms/step tail
share). The row-major table (opt-in since round 4, measured ~2 ms once
but with a polluted control arm) moves the transpose onto the 9 MB table
build. This reruns the pair CLEANLY (fresh processes, 2 reps per arm,
min-of-reps), and crosses it with run-collapsed shading (merge_runs=16)
because merging shrinks the very tensors the layout copies touch — the
shipping decision needs the interaction, not two marginals.

Writes runs/layout5_ab.json; one JSON line per arm on stdout.
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

TINY = os.environ.get("NMF_AB_TINY", "0") == "1"  # CPU smoke mode

BASE = [
    "model=microfacet_tensorf2",
    "model.arch.max_samples_per_ray=128",
    "model.arch.recur_samples_per_ray=64",
    "model.arch.proposal_samples_per_ray=64",
    "model.arch.model.brdf_ray_budget=[32768,8192]",
    "model.arch.model.max_retrace_rays=[1024]",
    "model.arch.bg_module.bg_resolution=512",
] if not TINY else [
    "model=microfacet_tensorf2",
    "model.arch.max_samples_per_ray=32",
    "model.arch.recur_samples_per_ray=8",
    "model.arch.proposal_samples_per_ray=24",
    "model.arch.model.brdf_ray_budget=[2048,512]",
    "model.arch.model.max_retrace_rays=[256]",
    "model.arch.bg_module.bg_resolution=64",
]


def measure():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    import bench

    merge = int(os.environ.get("NMF_AB_MERGE", "0"))
    if TINY and merge:
        merge = 8  # < fine sample count so the branch engages at tiny K
    grid = 32 if TINY else 128
    nmf = bench._build(BASE + [f"model.arch.merge_runs={merge}"], grid=grid)
    B = 256 if TINY else 4096
    rps, step_s, _ = bench._time_train_step(nmf, B=B,
                                            n_iters=2 if TINY else 20)
    return {"rowmajor": os.environ.get("NMF_QUAD_ROWMAJOR", "0"),
            "merge_runs": merge,
            "step_ms": round(step_s * 1e3, 2),
            "rays_per_sec": round(rps, 1)}


def main():
    if os.environ.get("NMF_LAYOUT5_CHILD"):
        print("RESULT " + json.dumps(measure()))
        return
    arms = [("0", "0"), ("1", "0"), ("0", "16"), ("1", "16")]
    best = {}
    for rep in range(2):
        for rm, mg in arms:
            env = dict(os.environ, NMF_LAYOUT5_CHILD="1",
                       NMF_QUAD_ROWMAJOR=rm, NMF_AB_MERGE=mg)
            out = subprocess.run([sys.executable, __file__], env=env,
                                 capture_output=True, text=True,
                                 timeout=1800)
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("RESULT ")]
            if not line:
                print(out.stdout[-1500:], out.stderr[-1500:])
                raise SystemExit(f"arm rowmajor={rm} merge={mg} failed")
            r = json.loads(line[0][len("RESULT "):])
            r["rep"] = rep
            print(json.dumps(r), flush=True)
            k = (rm, mg)
            if k not in best or r["step_ms"] < best[k]["step_ms"]:
                best[k] = r
    summary = {
        "metric": "layout5_ab",
        "arms": [best[k] for k in arms],
        "rowmajor_speedup_merge0":
            round(best[("0", "0")]["step_ms"]
                  / max(best[("1", "0")]["step_ms"], 1e-9), 3),
        "rowmajor_speedup_merge16":
            round(best[("0", "16")]["step_ms"]
                  / max(best[("1", "16")]["step_ms"], 1e-9), 3),
        "merge16_speedup_default":
            round(best[("0", "0")]["step_ms"]
                  / max(best[("0", "16")]["step_ms"], 1e-9), 3),
    }
    print(json.dumps(summary), flush=True)
    with open(Path(__file__).parent / "layout5_ab.json", "w") as f:
        json.dump(summary, f)


if __name__ == "__main__":
    main()
