#!/usr/bin/env python
"""Tabulate the round-4 thinning-cost-curve arms (VERDICT r3 next #5).

Reads each arm's final-eval stats + train-time thinning telemetry and
prints one markdown table: does giving the MC estimator more bounce/
retrace rays (static x2/x4 or the adaptive controller) buy test quality
at the 8k-iter studio protocol, and at what step-time cost?
"""
import json
import sys
from pathlib import Path

RUNS = Path(__file__).parent
ARMS = [
    ("thin_base8k", "x1 budgets (65536,16384)/(1024,)"),
    ("thin_budget2x8k", "bounce budget x2 (131072,32768)"),
    ("thin_retrace4x8k", "retrace budget x4 (4096,)"),
    ("thin_adapt8k", "adaptive controller (adapt_brdf_budget)"),
]


def read_stats(d):
    stats = {}
    mean = d / "imgs_test_all" / "mean.txt"
    if mean.exists():
        import ast

        try:
            stats = dict(ast.literal_eval(mean.read_text().strip()))
        except (ValueError, SyntaxError):
            pass
    # fallback: parse the final test log line from metrics.jsonl
    mfile = d / "metrics.jsonl"
    thin, thin_rt, rps, n = [], [], [], 0
    if mfile.exists():
        for line in mfile.open():
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "thin_scale" in r:
                thin.append(r["thin_scale"])
                thin_rt.append(r.get("thin_scale_retrace", 1.0))
                rps.append(r.get("rays_per_sec", 0.0))
                n += 1
            s = r.get("log", "")
            if s.startswith("final test:") or "'psnr'" in s and "test:" in s:
                try:
                    stats.setdefault(
                        "psnr",
                        float(s.split("'psnr': ")[1].split(",")[0]
                              .rstrip("}")))
                except (IndexError, ValueError):
                    pass
    tail = max(1, len(thin) // 2)
    return {
        "psnr": stats.get("psnr"),
        "ssim": stats.get("ssim"),
        "norm_err": stats.get("norm_err"),
        "thin": (sum(thin[-tail:]) / tail) if thin else None,
        "thin_rt": (sum(thin_rt[-tail:]) / tail) if thin_rt else None,
        "rps": (sum(rps[-tail:]) / tail) if rps else None,
    }


def fmt(v, n=2):
    return "-" if v is None else f"{v:.{n}f}"


def main():
    print("| arm | config | test PSNR | SSIM | norm err | thin L0/rt "
          "(2nd-half mean) | rays/s |")
    print("|---|---|---|---|---|---|---|")
    for exp, desc in ARMS:
        d = RUNS / f"synthetic_studio_{exp}"
        if not d.exists():
            print(f"| {exp} | {desc} | (not run) | | | | |")
            continue
        s = read_stats(d)
        print(f"| {exp} | {desc} | {fmt(s['psnr'])} | {fmt(s['ssim'], 3)} | "
              f"{fmt(s['norm_err'], 1)} | {fmt(s['thin'])}/{fmt(s['thin_rt'])}"
              f" | {fmt(s['rps'], 0)} |")


if __name__ == "__main__":
    main()
