"""Dual-scene training: one shared field, per-dataset environment maps.

Reference ``train_dualbg.py`` (535 LoC): reconstruction() over a *list* of
datasets; each batch draws from one dataset and selects the matching
background via MultiBG.bg_index (train_dualbg.py:50-76, 267-268). Here the
bg index is a static field, so each dataset gets its own compiled step
(two compilations, cached), and batches alternate between datasets.

CLI:
    python -m nmf_tpu.train_dualbg model=microfacet_tensorf2 \
        dataset=lego dataset2=materials datadir=/data
"""
import math
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from . import ckpt as ckpt_lib
from . import config as config_lib
from . import eval as eval_lib
from . import trainer
from .builders import build_bg, build_nmf
from .data.blender import load_dataset
from .modules.dual_bg import MultiBG
from .train import calibrate_model, make_loss_weights


def reconstruction_dual(cfg, log=print):
    params = cfg["model"]["params"]
    datadir = cfg.get("datadir", "/data")
    # list-valued dataset yamls (dual_lego/dual_mats) carry both scenes;
    # otherwise dataset2=<name> selects the second (reference
    # train_dualbg.py consumes a dataset list)
    if isinstance(cfg["dataset"], list):
        ds_cfgs = list(cfg["dataset"])[:2]
        if len(ds_cfgs) == 1:
            ds_cfgs.append(ds_cfgs[0])
    else:
        ds_cfgs = [cfg["dataset"], cfg.get("dataset2", cfg["dataset"])]
    datasets = [load_dataset(c, datadir, split="train") for c in ds_cfgs]
    test_sets = [load_dataset(c, datadir, split="test") for c in ds_cfgs]

    expname = f"dual_{cfg['expname']}"
    logfolder = Path(cfg.get("basedir", "./log")) / expname
    logfolder.mkdir(parents=True, exist_ok=True)

    key = jax.random.PRNGKey(cfg.get("seed", 20211200))
    key, bkey, bg2key = jax.random.split(key, 3)
    nmf = build_nmf(bkey, cfg["model"]["arch"], datasets[0]["scene_bbox"],
                    datasets[0]["near_far"])
    # wrap the single bg into a MultiBG with one bg per dataset
    if nmf.bg_module is not None:
        bg2 = build_bg(bg2key, cfg["model"]["arch"].get("bg_module"))
        nmf = nmf.replace(bg_module=MultiBG(bgs=(nmf.bg_module, bg2)))

    nmf = nmf.replace(sampler=nmf.sampler.update(nmf.rf, init=True))
    key, ckey = jax.random.split(key)
    nmf = calibrate_model(nmf, ckey)

    n_iters = int(params["n_iters"])
    batch_size = int(params.get("batch_size", 4096))
    opt_cfg = trainer.OptimConfig(
        betas=tuple(params.get("betas", (0.9, 0.99))),
        n_iters=n_iters,
        lr_delay_steps=int(params.get("lr_delay_steps", 100)),
        clip_grad=params.get("clip_grad"),
        weight_decay=float(params.get("weight_decay", 0) or 0))

    key, base_key = jax.random.split(key)

    def init_opt(nmf):
        tx = trainer.make_optimizer(nmf, opt_cfg)
        return tx, tx.init(nmf), trainer.make_device_train_step(
            tx, base_key, donate=False)

    tx, opt_state, step_fn = init_opt(nmf)
    samplers = [trainer.SimpleSampler(d["all_rays"].shape[0], batch_size)
                for d in datasets]
    # device-resident stores per dataset (see trainer.make_device_train_step)
    stores = [(jax.device_put(d["all_rays"]), jax.device_put(d["all_rgbs"]))
              for d in datasets]
    rng = np.random.default_rng(0)

    for iteration in range(n_iters):
        di = iteration % len(datasets)
        if nmf.bg_module is not None and isinstance(nmf.bg_module, MultiBG):
            nmf = nmf.replace(bg_module=nmf.bg_module.select(di))
        ids = samplers[di].nextids()
        bg_col = trainer.bg_col_for(params.get("bg_col", "white"), rng)
        tv_mult = float(cfg.get("lr_decay_target_ratio", 0.1)) ** (
            iteration / n_iters)
        weights = make_loss_weights(params, iteration, tv_mult=tv_mult)
        nmf, opt_state, metrics = step_fn(
            nmf, opt_state, stores[di][0], stores[di][1], None,
            jnp.asarray(ids),
            jnp.asarray(trainer.pack_step_scalars(iteration, bg_col,
                                                  weights)))
        if iteration % cfg.get("progress_refresh_rate", 50) == 0:
            mse = float(metrics["photo_mse"])
            log(f"iter {iteration:06d} ds{di} "
                f"psnr={-10 * math.log10(max(mse, 1e-10)):.2f}")
        new_nmf, changed = nmf.check_schedule(iteration + 1, 1)
        nmf = new_nmf
        if changed:
            if getattr(nmf.rf, "fixed_shape", False):
                # fixed-shape events change leaf values only: fresh
                # moments, same compiled step (see train.py)
                opt_state = tx.init(nmf)
            else:
                tx, opt_state, step_fn = init_opt(nmf)

    ckpt_lib.save(logfolder / f"{expname}.th", nmf, cfg)
    results = []
    for di, tds in enumerate(test_sets):
        if isinstance(nmf.bg_module, MultiBG):
            nmf = nmf.replace(bg_module=nmf.bg_module.select(di))
        key, ek = jax.random.split(key)
        results.append(eval_lib.evaluate(
            nmf, tds, ek, save_dir=str(logfolder / f"imgs_test_{di}"),
            n_vis=cfg.get("N_vis", 5)))
        log(f"dataset {di} test: {results[-1]}")
    return nmf, results


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg = config_lib.compose(argv)
    return reconstruction_dual(cfg)


if __name__ == "__main__":
    main()
