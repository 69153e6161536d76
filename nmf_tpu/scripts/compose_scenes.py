#!/usr/bin/env python
"""Scene composition / relighting demo CLI.

TPU-native counterpart of the reference's composition demos
(``scripts/toaster_on_car.py``, ``scripts/sphere_render.py``,
``scripts/flat_plane_render.py``): load two or more trained checkpoints,
place their radiance fields together with rigid offsets/rotations via
``ListRF`` (fields/listrf.py), optionally swap in a fitted environment map,
and render an orbit video + stills of the composed scene.

Usage:
  python -m nmf_tpu.scripts.compose_scenes \
      --ckpt log/car/car.th --ckpt log/toaster/toaster.th \
      --offset 0,0,0 --offset 1.2,0,0 \
      [--rot-z 0 --rot-z 45] [--bg envmap.th] \
      --out /tmp/composed [--frames 30] [--image-size 256]

The shading model, sampler and background of the FIRST checkpoint drive the
render (matching toaster_on_car.py:51-60, which reuses one TensorNeRF and
swaps its rf for the ListRF).
"""
import argparse
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))


def parse_vec3(s):
    v = [float(x) for x in s.split(",")]
    assert len(v) == 3, f"expected x,y,z got {s}"
    return v


def rot_z(deg):
    a = math.radians(deg)
    return [[math.cos(a), -math.sin(a), 0.0],
            [math.sin(a), math.cos(a), 0.0],
            [0.0, 0.0, 1.0]]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", action="append", required=True,
                    help="checkpoint path; repeat per scene")
    ap.add_argument("--offset", action="append", default=None,
                    help="x,y,z world offset per scene")
    ap.add_argument("--rot-z", action="append", default=None, type=float,
                    help="z-rotation in degrees per scene")
    ap.add_argument("--bg", default=None,
                    help="optional envmap checkpoint (pano2env output) to "
                         "relight the composition")
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--image-size", type=int, default=200)
    ap.add_argument("--radius", type=float, default=4.0)
    ap.add_argument("--chunk", type=int, default=4096)
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parents[2] / ".jax_cache"))

    from nmf_tpu import ckpt as ckpt_lib
    from nmf_tpu.eval import render_path
    from nmf_tpu.fields.listrf import make_listrf

    models = []
    for p in args.ckpt:
        nmf, cfg, _ = ckpt_lib.load(p)
        models.append(nmf)
    F = len(models)
    offsets = ([parse_vec3(s) for s in args.offset]
               if args.offset else [[0.0, 0.0, 0.0]] * F)
    rots = ([rot_z(d) for d in args.rot_z] if args.rot_z else None)
    assert len(offsets) == F, "--offset count must match --ckpt count"

    listrf = make_listrf([m.rf for m in models], offsets=offsets,
                         rotations=rots)
    host = models[0].replace(rf=listrf)
    # the composed scene spans the union of the shifted AABBs: re-adopt
    # sampler geometry AND rebuild the alpha mask from the composed density
    # (the first checkpoint's mask would cull the other objects)
    host = host.replace(sampler=host.sampler.update(listrf, init=False))

    if args.bg is not None:
        bg, _, _ = ckpt_lib.load(args.bg)
        bg_module = getattr(bg, "bg_module", bg)
        host = host.replace(bg_module=bg_module)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    key = jax.random.PRNGKey(0)
    H = W = args.image_size
    focal = 0.5 * W / math.tan(0.5 * 0.6911)
    frames = render_path(host, (H, W), focal, key, n_frames=args.frames,
                         radius=args.radius, chunk=args.chunk,
                         save_dir=str(out))
    print(f"wrote {args.frames} frames to {out}")
    return frames


if __name__ == "__main__":
    main()
