#!/usr/bin/env python
"""Pre-generate the 800px studio GT into the dataset cache on CPU so the
supervision-density-matched run (VERDICT r3 next #7: 100 views x 800^2 =
64M rays, the reference blender protocol's regime) doesn't burn TPU-queue
wall-clock on host-side MC ground-truth generation."""
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nmf_tpu import config as config_lib  # noqa: E402
from nmf_tpu.data.blender import load_dataset  # noqa: E402

cfg = config_lib.compose([
    "model=microfacet_tensorf2", "dataset=synthetic_studio",
    "dataset.hemisphere=true", "dataset.n_views=100",
    "dataset.image_size=800", "seed=20211200",
])
for split in ("train", "test"):
    ds = load_dataset(cfg["dataset"], cfg.get("datadir", "/data"),
                      split=split)
    print(split, ds["all_rays"].shape, flush=True)
print("studio800 GT cached", flush=True)
