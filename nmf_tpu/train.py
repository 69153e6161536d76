"""Training driver (the reference's train.py:191-916, re-architected).

Host loop responsibilities: batching, schedule events (voxel upsample /
alpha-mask rebuild / bias calibration), optimizer re-init on shape changes,
lambda decay, periodic eval, checkpointing, telemetry. The device step is one
jitted function (trainer.make_train_step).

CLI:
    python train.py model=microfacet_tensorf2 dataset=lego datadir=/data \
        expname=run1 model.params.n_iters=30000
"""
import math
import os
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
from .builders import build_nmf
from .data.blender import load_dataset
from .render import NMF, render


def calibrate_model(nmf: NMF, key):
    """Initial bias calibration against bg brightness (train.py:421-437)."""
    if not hasattr(nmf.model, "calibrate") or nmf.bg_module is None:
        return nmf
    k1, k2 = jax.random.split(key)
    xyz = jax.random.uniform(k1, (10000, 4)) * 2 - 1
    xyz = xyz.at[:, 3].set(0.0)
    feat = nmf.rf.compute_appfeature(xyz)
    bg_brightness = float(nmf.bg_module.mean_color().mean())
    new_model = nmf.model.calibrate(k2, xyz, feat, bg_brightness)
    return nmf.replace(model=new_model)


def pretrain_density(nmf: NMF, key, start_density: float, log=print):
    """Startup density calibration (reference train.py:366-419): either
    ``field.num_pretrain`` Adam(lr=5e-3) iterations fitting the alpha of
    20k random in-bbox points to ``params.start_density`` (+-10% noise), or
    the analytic ``field.calibrate`` density_shift solve (assumes an
    exponential-family activation like the reference). Gradients flow to
    the density factors only (density_rf + dbasis_mat); the reference
    optimizes all parameters but only the density path touches this loss."""
    rf = nmf.rf
    stepsize = float(nmf.sampler.live_stepsize)
    n = int(getattr(rf, "num_pretrain", 0) or 0)
    if n <= 0 or not hasattr(rf, "density_rf"):
        if getattr(rf, "calibrate", False):
            k1, _ = jax.random.split(key)
            xyz3 = (jax.random.uniform(k1, (20000, 3)) * 2 - 1) * rf.aabb[1]
            xyz = jnp.concatenate([xyz3, jnp.zeros((20000, 1))], -1)
            sigma = rf.compute_densityfeature(xyz)
            target = (-math.log(1 - start_density)
                      / (stepsize * rf.distance_scale))
            shift = (math.log(target)
                     - math.log(max(float(sigma.mean()), 1e-12)))
            rf = rf.replace(density_shift=float(rf.density_shift) + shift)
            log(f"density_shift calibrated -> {rf.density_shift:.3f}")
            return nmf.replace(rf=rf)
        return nmf

    import optax

    tx = optax.adam(5e-3, b1=0.9, b2=0.99)
    params = (rf.density_rf, rf.dbasis_mat)
    opt_state = tx.init(params)
    dist_scale = rf.distance_scale

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(params):
            k1, k2 = jax.random.split(key)
            rf2 = rf.replace(density_rf=params[0], dbasis_mat=params[1])
            xyz3 = (jax.random.uniform(k1, (20000, 3)) * 2 - 1) * rf2.aabb[1]
            xyz = jnp.concatenate([xyz3, jnp.zeros((20000, 1))], -1)
            sigma = rf2.compute_densityfeature(xyz)
            alpha = 1 - jnp.exp(-sigma * stepsize * dist_scale)
            target = start_density * (
                1 + 0.1 * jax.random.normal(k2, alpha.shape))
            return jnp.abs(alpha - target).mean(), alpha.mean()

        (_, alpha_mean), g = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), new_opt, alpha_mean

    alpha_mean = 0.0
    for _ in range(n):
        key, sk = jax.random.split(key)
        params, opt_state, alpha_mean = step(params, opt_state, sk)
    log(f"pretrain density: mean alpha {float(alpha_mean):.6f} "
        f"after {n} iters (target {start_density})")
    return nmf.replace(rf=rf.replace(density_rf=params[0],
                                     dbasis_mat=params[1]))


def make_loss_weights(params, iteration=0, ori_mult=1.0, pred_mult=1.0,
                      tv_mult=1.0):
    return trainer.LossWeights(
        ori_lambda=params.get("ori_lambda", 0.0) * ori_mult,
        pred_lambda=params.get("pred_lambda", 0.0) * pred_mult,
        envmap_lambda=params.get("envmap_lambda", 0.0),
        diffuse_lambda=params.get("diffuse_lambda", 0.0),
        brdf_lambda=params.get("brdf_lambda", 0.0),
        normal_err_lambda=params.get("normal_err_lambda", 0.0),
        distortion_lambda=params.get("distortion_lambda", 0.0),
        l1_weight=params.get("L1_weight_initial", 0.0),
        ortho_weight=params.get("ortho_weight", 0.0),
        # TV weights decay by lr_factor every iteration (reference
        # train.py:686,694 -- the classic TensoRF anneal)
        tv_weight_density=params.get("TV_weight_density", 0.0) * tv_mult,
        tv_weight_app=params.get("TV_weight_app", 0.0) * tv_mult,
        tv_weight_bg=params.get("TV_weight_bg", 0.0),
    )


def _final_n_vis(cfg):
    """View count for headline (final / render_only) evals: final_N_vis
    decouples the full-test-set mean.txt from the cheap mid-train
    vis_every probes (N_vis). One definition for both call sites so the
    render_only mean can never silently diverge from the post-train one."""
    final_n = cfg.get("final_N_vis", None)
    if final_n is None:
        final_n = cfg.get("N_vis", -1)
    return final_n


def reconstruction(cfg, log=print):
    params = cfg["model"]["params"]
    # a typo'd eval_tier must fail NOW, not at the final eval after the
    # full training run
    eval_lib.validate_eval_tier(cfg.get("eval_tier", "train"))
    datadir = cfg.get("datadir", "/data")
    expname = f"{cfg['dataset']['scenedir'].split('/')[-1]}_{cfg['expname']}"
    if cfg.get("add_timestamp"):
        import datetime

        expname += datetime.datetime.now().strftime("-%Y%m%d-%H%M%S")
    logfolder = Path(cfg.get("basedir", "./log")) / expname
    logfolder.mkdir(parents=True, exist_ok=True)
    config_lib.save_config(cfg, logfolder / "config.yaml")
    from .logging_utils import RunLogger

    run_log = RunLogger(logfolder, echo=log)
    log = run_log.info

    train_ds = load_dataset(cfg["dataset"], datadir, split="train")
    test_ds = load_dataset(cfg["dataset"], datadir, split="test")
    focal = float(train_ds["focal"])

    key = jax.random.PRNGKey(cfg.get("seed", 20211200))
    key, bkey = jax.random.split(key)
    # dataset yaml near_far overrides the loader's, and aabb_scale scales
    # the scene bbox (reference train.py:219-237)
    near_far = tuple(cfg["dataset"].get("near_far", train_ds["near_far"]))
    aabb = (np.asarray(train_ds["scene_bbox"], np.float32)
            * float(cfg["dataset"].get("aabb_scale", 1)))
    nmf = build_nmf(bkey, cfg["model"]["arch"], aabb, near_far)

    # mid-run resume: resume=True picks up {expname}_latest.th written every
    # save_every iters. The PRNG stream is folded from the iteration scalar
    # (trainer._device_step_body), so the resumed ray/noise sequence matches;
    # optimizer moments restart fresh, which is the same reset the reference
    # performs at every schedule event (train.py:806-813).
    start_iter = 0
    resume_extra = {}
    latest_path = logfolder / f"{expname}_latest.th"
    if cfg.get("resume") and latest_path.exists():
        nmf, _, resume_extra = ckpt_lib.load(latest_path)
        start_iter = int(resume_extra.get("iteration", 0))
        log(f"resume: {latest_path} at iter {start_iter}")
    elif cfg.get("ckpt"):
        nmf, _, _ = ckpt_lib.load(cfg["ckpt"])

    if start_iter == 0 and not cfg.get("ckpt"):
        key, pk = jax.random.split(key)
        nmf = pretrain_density(
            nmf, pk, float(params.get("start_density", 5e-3)), log=log)
    nmf = nmf.replace(sampler=nmf.sampler.update(nmf.rf, init=True))
    key, ckey = jax.random.split(key)
    if start_iter == 0:
        nmf = calibrate_model(nmf, ckey)

    n_iters = int(params["n_iters"])
    batch_size = int(params.get("batch_size", 4096))
    opt_cfg = trainer.OptimConfig(
        betas=tuple(params.get("betas", (0.9, 0.99))),
        eps=params.get("eps", 1e-8),
        lr_init=params.get("lr_init", 1.0),
        lr_final=params.get("lr_final", 1e-3),
        lr_delay_steps=int(params.get("lr_delay_steps", 100)),
        lr_delay_mult=params.get("lr_delay_mult", 0.1),
        n_iters=n_iters,
        clip_grad=params.get("clip_grad"),
        weight_decay=float(params.get("weight_decay", 0) or 0))

    # device-resident ray store (reference keeps its store on-GPU,
    # train.py:333-334): per-step host traffic is just ids + one scalar
    # vector, instead of ray/rgb/weight uploads whose tunnel round-trips
    # dominated the step time
    has_norms = train_ds.get("all_norms") is not None

    # ray-DP over every visible chip (mesh_devices=1 forces single-device;
    # mesh_devices=N caps the mesh). Stores and params replicate, the ids
    # batch axis shards, and XLA all-reduces gradients over ICI.
    n_mesh = int(cfg.get("mesh_devices", 0) or 0)
    if n_mesh <= 0:
        n_mesh = jax.device_count()
    mesh = None
    if n_mesh > 1:
        from .parallel import make_mesh, replicate

        mesh = make_mesh(min(n_mesh, jax.device_count()))
        log(f"ray-DP mesh over {mesh.devices.size} devices")
        store_rays = replicate(mesh, jnp.asarray(train_ds["all_rays"]))
        store_rgba = replicate(mesh, jnp.asarray(train_ds["all_rgbs"]))
        store_norms = (replicate(mesh, jnp.asarray(train_ds["all_norms"]))
                       if has_norms else None)
    else:
        store_rays = jax.device_put(train_ds["all_rays"])
        store_rgba = jax.device_put(train_ds["all_rgbs"])
        store_norms = (jax.device_put(train_ds["all_norms"]) if has_norms
                       else None)
    key, base_key = jax.random.split(key)

    def init_optimizer(nmf):
        tx = trainer.make_optimizer(nmf, opt_cfg)
        return tx, tx.init(nmf), trainer.make_device_train_step(
            tx, base_key, hdr=nmf.hdr,
            use_gt_normals=has_norms,
            donate=cfg.get("donate_buffers", True),
            ndc_ray=bool(cfg["dataset"].get("ndc_ray", False)),
            charbonier=bool(params.get("charbonier_loss", False)),
            charbonier_eps=float(params.get("charbonier_eps", 1e-3)),
            mesh=mesh)

    tx, opt_state, step_fn = init_optimizer(nmf)

    # lr_upsample_reset=true is reference parity (fresh LambdaLR at every
    # schedule event restarts the decay from lr_init); =false continues the
    # global decay across events (original-TensoRF `lr_factor**iteration`
    # semantics) — see trainer.fast_forward_opt_state
    lr_reset = bool(params.get("lr_upsample_reset", True))
    if start_iter:
        if lr_reset:
            # reference-parity mode restarts the schedule at every event,
            # so the unpaused run's count at start_iter is the distance
            # from the LAST event — resume must reproduce that, not jump
            # back to lr_init + warmup (a stop_iter pause would otherwise
            # train its post-resume span on a different lr trajectory
            # than the run it claims to continue)
            def _event_list():
                evs = set()
                for attr in ("upsamp_list",):
                    evs.update(getattr(nmf.rf, attr, ()) or ())
                for attr in ("update_list", "shrink_iters"):
                    evs.update(getattr(nmf.sampler, attr, ()) or ())
                return evs

            last_ev = max((e for e in _event_list() if e <= start_iter),
                          default=0)
            offset = start_iter - last_ev
        else:
            offset = start_iter
        if offset:
            opt_state = trainer.fast_forward_opt_state(opt_state, offset)

    # TV anneal factor (reference train.py:291-295): target_ratio^(1/iters)
    lr_decay_iters = int(cfg.get("lr_decay_iters", -1) or -1)
    if lr_decay_iters <= 0:
        lr_decay_iters = n_iters
    tv_decay = float(cfg.get("lr_decay_target_ratio",
                             params.get("lr_decay_target_ratio", 0.1))
                     ) ** (1.0 / lr_decay_iters)

    ori_decay = (math.exp(math.log(params["final_ori_lambda"]
                                   / params["ori_lambda"]) / n_iters)
                 if params.get("ori_lambda", 0) > 0
                 and params.get("final_ori_lambda") else 1.0)
    pred_decay = (math.exp(math.log(params["final_pred_lambda"]
                                    / params["pred_lambda"]) / n_iters)
                  if params.get("pred_lambda", 0) > 0
                  and params.get("final_pred_lambda") else 1.0)

    sampler = trainer.SimpleSampler(train_ds["all_rays"].shape[0], batch_size,
                                    seed=cfg.get("seed", 0))
    rng = np.random.default_rng(cfg.get("seed", 0))
    bg_mode = params.get("bg_col", "white")

    # adaptive ray-count controller (reference train.py:616-627 tracks
    # target_num_samples field samples/step between min/max_batch_size).
    # The TPU version quantizes to pow2 buckets so the jitted step only
    # recompiles at bucket transitions (a handful over a run), and adapts
    # on the progress cadence to avoid a device sync every iteration.
    target_ns = params.get("target_num_samples")
    min_bs = int(params.get("min_batch_size", batch_size))
    max_bs = int(params.get("max_batch_size", batch_size))
    adapt_bs = bool(target_ns) and max_bs > min_bs

    def fit_bs(b):
        """Round the batch up to a mesh-divisible size."""
        n = mesh.devices.size if mesh is not None else 1
        return int(-(-int(b) // n) * n)

    # reference train.py:486/810: the adaptive controller starts from
    # starting_batch_size and resets to it after schedule events
    start_bs = int(params.get("starting_batch_size", batch_size))
    cur_bs = fit_bs(start_bs)

    # chained dispatch: the harness amortizes the remaining per-iteration
    # host round trips over chain_steps scanned steps. Chains end at every
    # iteration where host control matters: schedule events, occ-grid
    # update ticks, progress prints, eval/save ticks, adapt ticks.
    chain_max = max(int(cfg.get("chain_steps", 8)), 1)
    refresh = max(int(cfg.get("progress_refresh_rate", 50) or 50), 1)
    vis_every = cfg.get("vis_every", 0)
    save_every = int(cfg.get("save_every", 0) or 0)

    def event_iters():
        evs = set()
        for attr in ("upsamp_list",):
            evs.update(getattr(nmf.rf, attr, ()) or ())
        for attr in ("update_list", "shrink_iters"):
            evs.update(getattr(nmf.sampler, attr, ()) or ())
        uf = getattr(nmf.sampler, "update_freq", 0)
        det = getattr(nmf.model, "detach_N_iters", 0)
        if det:
            evs.add(det + 1)
        return evs, uf

    def chunk_len(it):
        """Steps until the next host-control boundary, capped at chain_max
        and quantized to {chain_max, 1} so at most two program variants
        compile."""
        evs, uf = event_iters()
        nxt = n_iters - it
        for e in evs:
            if e > it:
                nxt = min(nxt, e - it)
        if uf:
            nxt = min(nxt, uf - (it % uf))
        if refresh:
            nxt = min(nxt, ((it // refresh + 1) * refresh) - it)
        if vis_every:
            nxt = min(nxt, vis_every - (it % vis_every))
        if save_every:
            nxt = min(nxt, save_every - (it % save_every))
        if adapt_bs or adapt_budget:
            # both controllers read telemetry on (it+1) % 16 == 0 ticks;
            # chains must end there or the controllers go blind for long
            # windows after misaligned schedule-event boundaries
            nxt = min(nxt, 16 - (it % 16))
        return chain_max if nxt >= chain_max else 1

    chain_fn = None

    def get_chain_fn():
        nonlocal chain_fn
        if chain_fn is None:
            chain_fn = trainer.make_chained_device_train_step(
                tx, base_key, chain_max, hdr=nmf.hdr,
                use_gt_normals=has_norms,
                donate=cfg.get("donate_buffers", True),
                ndc_ray=bool(cfg["dataset"].get("ndc_ray", False)),
                charbonier=bool(params.get("charbonier_loss", False)),
                charbonier_eps=float(params.get("charbonier_eps", 1e-3)),
                mesh=mesh)
        return chain_fn

    # Adaptive bounce/retrace budgets (opt-in): the TPU static-shape
    # analogue of the reference's update_n_samples runtime controller
    # (/root/reference/models/microfacet.py:241-268). Budgets move through
    # pow2 multiplier buckets {1..adapt_brdf_budget_max} driven by the
    # measured thinning telemetry (proportional thinning serves every
    # sample rays ∝ weight, so thin_scale = served/demand); each bucket
    # transition costs one recompile, like the batch-size controller.
    adapt_budget = bool(params.get("adapt_brdf_budget", False))
    budget_max_mult = int(params.get("adapt_brdf_budget_max", 4))
    base_brdf = getattr(nmf.model, "brdf_ray_budget", None)
    base_retrace = getattr(nmf.model, "max_retrace_rays", None)
    adapt_budget = adapt_budget and base_brdf is not None
    budget_mult = 1
    if adapt_budget and cfg.get("resume"):
        # the checkpointed model carries SCALED budgets; recover the base
        budget_mult = int(resume_extra.get("budget_mult", 1))
        base_brdf = tuple(b // budget_mult for b in base_brdf)
        base_retrace = tuple(r // budget_mult for r in base_retrace)

    def apply_budget_mult(nmf, mult):
        return nmf.replace(model=nmf.model.replace(
            brdf_ray_budget=tuple(b * mult for b in base_brdf),
            max_retrace_rays=tuple(r * mult for r in base_retrace)))

    ori_mult, pred_mult, tv_mult = 1.0, 1.0, 1.0
    psnrs = []
    t_start = time.time()
    rays_done = 0
    l1_rest_at = 0
    iteration = 0
    if start_iter:
        iteration = start_iter
        ori_mult = ori_decay ** start_iter
        pred_mult = pred_decay ** start_iter
        tv_mult = tv_decay ** start_iter
        cur_bs = fit_bs(int(resume_extra.get("cur_bs", cur_bs)))
        evs, uf = event_iters()
        if any(e <= start_iter for e in evs) or (uf and start_iter >= uf):
            l1_rest_at = start_iter  # L1_weight_rest already engaged
    # stop_iter pauses a long run at a decision point: the run trains with
    # its full n_iters-shaped schedules (lr decay, upsample list), stops
    # early with a resumable latest-checkpoint, and a later resume=True
    # invocation continues to n_iters. Used by gated queue stages (probe
    # the first 10k of a 30k run, then resume the SAME run if it passes).
    stop_iter = int(cfg.get("stop_iter", 0) or 0)
    iter_limit = min(n_iters, stop_iter) if stop_iter > 0 else n_iters
    while iteration < iter_limit:
        k = min(chunk_len(iteration), iter_limit - iteration)
        ids_l, scal_l = [], []
        for j in range(k):
            it = iteration + j
            bg_col = trainer.bg_col_for(bg_mode, rng)
            weights = make_loss_weights(params, it, ori_mult, pred_mult,
                                        tv_mult)
            if it > 0 and params.get("L1_weight_rest") is not None \
                    and l1_rest_at:
                weights = weights._replace(
                    l1_weight=params["L1_weight_rest"])
            ids_l.append(sampler.nextids(cur_bs))
            scal_l.append(np.asarray(
                trainer.pack_step_scalars(it, bg_col, weights)))
            ori_mult *= ori_decay
            pred_mult *= pred_decay
            tv_mult *= tv_decay
        if k == 1:
            nmf, opt_state, metrics = step_fn(
                nmf, opt_state, store_rays, store_rgba, store_norms,
                jnp.asarray(ids_l[0]), jnp.asarray(scal_l[0]))
        else:
            nmf, opt_state, metrics = get_chain_fn()(
                nmf, opt_state, store_rays, store_rgba, store_norms,
                jnp.asarray(np.stack(ids_l)),
                jnp.asarray(np.stack(scal_l)))
        rays_done += cur_bs * k
        last_it = iteration + k - 1
        if adapt_bs and (last_it + 1) % 16 == 0:
            ns = float(metrics["n_valid_samples"])
            spr = max(ns / cur_bs, 1e-3)
            bucket = 2 ** int(math.floor(math.log2(
                max(float(target_ns) / spr, 1.0))))
            cur_bs = fit_bs(np.clip(bucket, min_bs, max_bs))
        if adapt_budget and (last_it + 1) % 16 == 0:
            thin = min(float(metrics.get("thin_scale", 1.0)),
                       float(metrics.get("thin_scale_retrace", 1.0)))
            new_mult = budget_mult
            # grow-only: thin = min(1, 0.98*budget/demand) saturates at 1,
            # so it cannot distinguish "demand just under budget" from
            # "budget mostly idle" — a shrink rule keyed on thin>0.98
            # would ping-pong with the grow rule (one recompile per 16
            # iters) whenever demand sits within ~2% of a bucket edge.
            # Peak memory stays bounded by adapt_brdf_budget_max.
            if thin < 0.5 and budget_mult * 2 <= budget_max_mult:
                new_mult = budget_mult * 2   # demand >2x served: grow
            if new_mult != budget_mult:
                budget_mult = new_mult
                nmf = apply_budget_mult(nmf, budget_mult)
                # budgets are static pytree metadata: the optimizer's
                # nmf-shaped trees (Adam moments, lr tree) must adopt the
                # new treedef. Rebuild tx, then transplant the existing
                # moment leaves (array shapes are unaffected by budget
                # changes) so optimization state survives the transition.
                old_leaves = jax.tree_util.tree_leaves(opt_state)
                tx, opt_state, step_fn = init_optimizer(nmf)
                opt_state = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(opt_state), old_leaves)
                chain_fn = None
                log(f"iter {last_it}: brdf budget mult -> x{budget_mult} "
                    f"(thin={thin:.2f})")

        if (iteration // refresh) != ((last_it + 1) // refresh) \
                or iteration == 0:
            mse = float(metrics["photo_mse"])
            psnr = -10 * math.log10(max(mse, 1e-10))
            psnrs.append(psnr)
            elapsed = time.time() - t_start
            rays_per_sec = rays_done / max(elapsed, 1e-9)
            thin = {k: round(float(metrics[k]), 4)
                    for k in ("thin_scale", "thin_scale_retrace")
                    if k in metrics}
            run_log.scalars(last_it, psnr=psnr,
                            loss=float(metrics["loss"]),
                            rays_per_sec=round(rays_per_sec, 1),
                            n_valid_samples=int(metrics["n_valid_samples"]),
                            **thin)
            log(f"iter {last_it:06d} psnr={psnr:.2f} "
                f"loss={float(metrics['loss']):.5f} "
                f"rays/s={rays_per_sec:.0f}"
                + (f" thin={thin.get('thin_scale', 1.0):.2f}"
                   f"/{thin.get('thin_scale_retrace', 1.0):.2f}"
                   if thin else ""))

        # schedule events (train.py:806-813); leaf-value decays inside the
        # covered range apply at the chunk end (drift < chain_max iters)
        changed = False
        for j in range(iteration, last_it + 1):
            nmf, ch = nmf.check_schedule(j + 1, 1)
            changed = changed or ch
        if changed:
            if getattr(nmf.rf, "fixed_shape", False):
                # fixed-shape events change leaf VALUES only: reset the
                # optimizer state (fresh moments + lr-schedule restart,
                # matching the reference reinit) but KEEP the compiled
                # step/chain functions -- zero recompiles across the
                # whole upsample schedule
                opt_state = tx.init(nmf)
            else:
                tx, opt_state, step_fn = init_optimizer(nmf)
                chain_fn = None  # shapes may have changed
            if not lr_reset:
                opt_state = trainer.fast_forward_opt_state(
                    opt_state, last_it + 1)
            l1_rest_at = last_it + 1
            cur_bs = fit_bs(start_bs)  # reset ray counters (train.py:807-813)
            log(f"iter {last_it}: schedule event -> optimizer reinit; "
                f"grid={getattr(nmf.rf, 'live_grid_size', nmf.rf.grid_size)}")

        if (vis_every > 0 and cfg.get("N_vis", 0) != 0
                and (last_it + 1) % vis_every == 0):
            key, ek = jax.random.split(key)
            res = eval_lib.evaluate(
                nmf, test_ds, ek, save_dir=str(logfolder / "imgs_vis"),
                n_vis=cfg.get("N_vis", 5), prefix=f"{last_it:06d}_",
                compute_extra_metrics=False, mesh=mesh)
            log(f"iter {last_it} test: {res}")
            if cfg.get("save_often"):
                ckpt_lib.save(logfolder / f"{expname}_{last_it}.th",
                              nmf, cfg)
        if save_every and (last_it + 1) % save_every == 0 \
                and last_it + 1 < n_iters:
            ckpt_lib.save(latest_path, nmf, cfg,
                          extra={"iteration": last_it + 1,
                                 "cur_bs": int(cur_bs),
                                 "budget_mult": int(budget_mult)})
        iteration = last_it + 1

    if iteration < n_iters:
        # stop_iter pause: persist resume state, skip the final save/eval
        ckpt_lib.save(latest_path, nmf, cfg,
                      extra={"iteration": iteration, "cur_bs": int(cur_bs),
                             "budget_mult": int(budget_mult)})
        log(f"stop_iter pause at {iteration}/{n_iters}; "
            f"resume=True continues")
        return nmf, {}

    # The final evals must serve the budgets the field was TRAINED to
    # expect: a run the controller grew to x4 bounce rays evaluated at x1
    # is pure MC starvation (measured −9 dB test on the thin_adapt8k arm
    # — the same mechanism as the round-3 eval-starvation bug, reached
    # through the budget reset instead of chunk ordering). The SAVED
    # checkpoint still carries the configured base budgets (portability:
    # a ckpt consumer composes its own eval_tier; render_test scales
    # explicitly), but the in-process final eval keeps budget_mult.
    eval_nmf = nmf
    if adapt_budget and budget_mult != 1:
        nmf = apply_budget_mult(nmf, 1)
        log(f"final eval at trained budgets (x{budget_mult}); "
            f"checkpoint saved at configured budgets")
    ckpt_lib.save(logfolder / f"{expname}.th", nmf, cfg)

    res = {}
    if cfg.get("render_test", True):
        key, ek = jax.random.split(key)
        gt_bg = _resolve_gt_bg(cfg, datadir, test_ds)
        # the tier applies to the eval copy only (on top of the trained
        # budgets); the saved checkpoint keeps the configured base budgets
        res = eval_lib.evaluate(
            eval_lib.apply_eval_tier(eval_nmf, cfg.get("eval_tier",
                                                       "train")),
            test_ds, ek, save_dir=str(logfolder / "imgs_test_all"),
            n_vis=_final_n_vis(cfg), gt_bg=gt_bg, mesh=mesh)
        log(f"final test: {res}")
    if cfg.get("render_train", False):
        # evaluate on the training views (reference train.py:838-858)
        key, tk = jax.random.split(key)
        res_tr = eval_lib.evaluate(
            eval_nmf, train_ds, tk,
            save_dir=str(logfolder / "imgs_train_all"),
            n_vis=cfg.get("N_vis", -1), mesh=mesh)
        log(f"train-split eval: {res_tr}")
    if cfg.get("render_path", False):
        key, pk = jax.random.split(key)
        W, H = test_ds["img_wh"]
        eval_lib.render_path(nmf, (H, W), focal, pk,
                             save_dir=str(logfolder / "imgs_path"))
        log("render_path done")
    return nmf, res


def _resolve_gt_bg(cfg, datadir, test_ds):
    """GT background panorama for the envmap-recovery metrics, resolved
    identically for the in-train final eval and the render_only path:
    dataset yaml gt_bg under backgrounds/ (reference train.py:489-493),
    top-level gt_bg= absolute override, or the procedural scene's own
    gt_bg_im. (Round-5 fix: render_only previously skipped this, so
    render_only stats rows silently lacked the envmap metric family.)"""
    gt_bg_path = cfg.get("gt_bg")
    if cfg["dataset"].get("gt_bg"):
        ds_bg = Path(datadir) / "backgrounds" / cfg["dataset"]["gt_bg"]
        if ds_bg.exists():
            gt_bg_path = str(ds_bg)
    if gt_bg_path:
        from .data.exr import imread_any

        return imread_any(gt_bg_path)
    if test_ds.get("gt_bg_im") is not None:
        return test_ds["gt_bg_im"]  # procedural scenes carry their GT
    return None


def render_test(cfg, log=print):
    """render_only path incl. fixed_bg relighting (train.py:54-138)."""
    if not cfg.get("ckpt"):
        raise SystemExit(
            "render_only=True requires ckpt=<path to a .th checkpoint>")
    nmf, saved_cfg, _ = ckpt_lib.load(cfg["ckpt"])
    if cfg.get("fixed_bg"):
        bg, _, _ = ckpt_lib.load(cfg["fixed_bg"])
        nmf = nmf.replace(bg_module=bg)
    # eval_tier=high|ultra scales the test-time MC budgets (the
    # reference's test_rays_per_ray/update_n_samples analogue)
    nmf = eval_lib.apply_eval_tier(nmf, cfg.get("eval_tier", "train"))
    datadir = cfg.get("datadir", "/data")
    test_ds = load_dataset(cfg["dataset"], datadir, split="test")
    expname = f"{cfg['dataset']['scenedir'].split('/')[-1]}_{cfg['expname']}"
    logfolder = Path(cfg.get("basedir", "./log")) / expname
    key = jax.random.PRNGKey(0)
    n_mesh = int(cfg.get("mesh_devices", 0) or 0) or jax.device_count()
    mesh = None
    if n_mesh > 1:
        from .parallel import make_mesh

        mesh = make_mesh(min(n_mesh, jax.device_count()))
    # render_only headlines honor final_N_vis exactly like reconstruction's
    # final eval (a render_only mean.txt must not silently be a
    # subsampled-view mean)
    res = eval_lib.evaluate(nmf, test_ds, key,
                            save_dir=str(logfolder / "imgs_render"),
                            n_vis=_final_n_vis(cfg), mesh=mesh,
                            gt_bg=_resolve_gt_bg(cfg, datadir, test_ds),
                            streaming=bool(cfg.get("stream", False)))
    log(f"render_test: {res}")
    if cfg.get("render_train", False):
        train_ds = load_dataset(cfg["dataset"], datadir, split="train")
        res_tr = eval_lib.evaluate(
            nmf, train_ds, jax.random.PRNGKey(1),
            save_dir=str(logfolder / "imgs_train_all"),
            n_vis=cfg.get("N_vis", -1), mesh=mesh,
            streaming=bool(cfg.get("stream", False)))
        log(f"train-split eval: {res_tr}")
    return nmf, res


def _enable_compile_cache():
    """Persistent XLA compile cache: repeat runs of the same config skip
    the multi-minute cold compile (ARCHITECTURE.md compile-latency table).
    Override the location with NMF_COMPILE_CACHE=; disable with
    NMF_COMPILE_CACHE=0."""
    import os

    loc = os.environ.get(
        "NMF_COMPILE_CACHE",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    if loc == "0":
        return
    try:
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def _dispatch(cfg):
    if cfg.get("log_rays"):
        # dump rays.pkl (+ rays.html when plotly exists) with eval artifacts
        from .modules.logger import LOGGER

        LOGGER.enable = True
    if cfg.get("render_only"):
        return render_test(cfg)
    if isinstance(cfg.get("dataset"), list):
        # list-valued dataset yaml (dual_lego/...) -> dual-scene driver
        from .train_dualbg import reconstruction_dual

        return reconstruction_dual(cfg)
    return reconstruction(cfg)


def _expand_multirun(argv):
    """Hydra-style sweep expansion for `-m` (reference README.md:10:
    `train.py -m dataset=ficus,drums,... model=...`): every override whose
    value is a bare comma list (no `[`: bracketed values are list-typed
    config values, not sweeps) is swept; jobs are the cartesian product.
    Returns (job_override_lists, swept_key_value_dicts)."""
    import itertools

    keys, choices, fixed = [], [], []
    for ov in argv:
        if "=" in ov:
            k, v = ov.split("=", 1)
            if "," in v and not v.strip().startswith("["):
                keys.append(k)
                choices.append(v.split(","))
                continue
        fixed.append(ov)
    jobs = []
    for combo in itertools.product(*choices):
        swept = dict(zip(keys, combo))
        jobs.append((fixed + [f"{k}={v}" for k, v in swept.items()], swept))
    return jobs


def multirun(argv):
    """Sequential sweep driver. Each job's log dir is distinct: the scene
    name is already part of the folder (f"{scene}_{expname}"), and swept
    non-dataset keys are suffixed onto expname. Stops on the first failing
    job, like hydra's default."""
    jobs = _expand_multirun(argv)
    results = []
    for i, (job_argv, swept) in enumerate(jobs):
        cfg = config_lib.compose(job_argv)
        suffix = "".join(
            f"-{k.rsplit('.', 1)[-1]}{v}" for k, v in swept.items()
            if k != "dataset")
        if suffix:
            cfg["expname"] = f"{cfg.get('expname', 'run')}{suffix}"
        print(f"[multirun {i + 1}/{len(jobs)}] "
              + " ".join(f"{k}={v}" for k, v in swept.items()))
        results.append(_dispatch(cfg))
    return results


def main(argv=None):
    # NMF_PLATFORM=cpu forces the CPU backend even when a remote-TPU PJRT
    # plugin pins JAX_PLATFORMS at import (env overrides don't survive the
    # sitecustomize path; jax.config.update does) — used for CPU
    # verification drives while the real chip is busy with a queue.
    plat = os.environ.get("NMF_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    _enable_compile_cache()
    argv = argv if argv is not None else sys.argv[1:]
    if "-m" in argv or "--multirun" in argv:
        return multirun([a for a in argv if a not in ("-m", "--multirun")])
    return _dispatch(config_lib.compose(argv))


if __name__ == "__main__":
    main()
