"""Recover the flagship30k final test eval (training completed all 30k
iters and saved the checkpoint; the session ended during render_test).
Mirrors the tail of nmf_tpu/train.py:317-338 exactly."""
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
import yaml
import jax

from nmf_tpu import ckpt as ckpt_lib
from nmf_tpu import eval as eval_lib
from nmf_tpu.train import _enable_compile_cache
from nmf_tpu.data.blender import load_dataset

_enable_compile_cache()

run_dir = Path("/root/repo/runs/synthetic_shiny_flagship30k")
with open(run_dir / "config.yaml") as f:
    cfg = yaml.safe_load(f)

nmf, saved_cfg, _ = ckpt_lib.load(run_dir / "synthetic_shiny_flagship30k.th")
test_ds = load_dataset(cfg["dataset"], cfg.get("datadir", "/data"),
                       split="test")
key = jax.random.PRNGKey(0)
gt_bg = test_ds.get("gt_bg_im")
res = eval_lib.evaluate(nmf, test_ds, key,
                        save_dir=str(run_dir / "imgs_test_all"),
                        n_vis=cfg.get("N_vis", -1), gt_bg=gt_bg)
print("final test:", res)
