"""Core volume renderer: the TensorNeRF composition root, TPU-native.

Re-implements ``modules/tensor_nerf.py`` (TensorNeRF :38-674) as a pure
function over a composed pytree. Structural differences from the reference,
all driven by XLA's static-shape model:

- Samples stay in a padded (B, K) layout with a validity mask end-to-end;
  ``row_mask_sum`` compositing becomes a masked sum over the sample axis.
- Ray recursion (render_reflection closure, tensor_nerf.py:291-317) is
  depth-unrolled: the shading model gathers its top-T retrace rays into a
  fixed (T, 6) buffer and calls back into ``render`` with recur+1; depth is
  bounded statically by len(max_retrace_rays), so the jit trace simply
  inlines the secondary pass.
- The dynamic whole_valid ray-dropping (alphagrid.py:353-367) disappears:
  batch size is a compile-time constant and per-ray sample budgets bound
  work instead.
"""
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from .ops import safemath
from .ops.masked import raw2alpha, row_mask_sum
from .ops.tonemap import get_tonemap


@struct.dataclass
class NMF:
    """Composition root (reference TensorNeRF.__init__, tensor_nerf.py:38-100)."""
    rf: Any
    sampler: Any
    model: Any
    bg_module: Optional[Any] = None
    normal_module: Optional[Any] = None
    # interpolation between predicted and geometric normals; a leaf so the
    # geonorm schedule can update it without recompiling
    predicted_normal_lambda: Any = 0.0

    tonemap: str = struct.field(pytree_node=False, default="srgb")
    hdr: bool = struct.field(pytree_node=False, default=False)
    recur_stepmul: float = struct.field(pytree_node=False, default=1.0)
    recur_alpha_thres: float = struct.field(pytree_node=False, default=1e-3)
    detach_inter: bool = struct.field(pytree_node=False, default=False)
    use_predicted_normals: bool = struct.field(pytree_node=False, default=False)
    align_pred_norms: bool = struct.field(pytree_node=False, default=True)
    orient_world_normals: bool = struct.field(pytree_node=False, default=True)
    geonorm_iters: int = struct.field(pytree_node=False, default=-1)
    geonorm_interp_iters: int = struct.field(pytree_node=False, default=1000)
    eval_batch_size: int = struct.field(pytree_node=False, default=4096)
    lr_scale: float = struct.field(pytree_node=False, default=1.0)
    # per-pass sample budgets (TPU static-shape knobs; None -> full N)
    max_samples_per_ray: int = struct.field(pytree_node=False, default=-1)
    recur_samples_per_ray: int = struct.field(pytree_node=False, default=-1)
    # pallas kernels need a real TPU backend; builders auto-detect
    use_pallas: bool = struct.field(pytree_node=False, default=False)
    # shade only the top-K' samples by transmittance weight (-1 = all)
    app_samples_per_ray: int = struct.field(pytree_node=False, default=-1)
    # run-collapsed shading (ops/runs.py): merge consecutive same-cell
    # samples into <= merge_runs per-ray slots before the appearance +
    # shading stage (0 = off). Density/transmittance keep the full budget;
    # only shading quadrature is coarsened. Primary pass only.
    merge_runs: int = struct.field(pytree_node=False, default=0)
    # proposal resampling: run a stop-gradient density pass over the full
    # (B, K) budget, then place this many weight-proportional fine samples
    # and run the differentiable field + shading on those only (-1 = off).
    # Halving the fine set halves the dominant field scatter/gather rows.
    proposal_samples_per_ray: int = struct.field(pytree_node=False, default=-1)
    # same for the secondary (retrace) pass; -1 = off. Secondary sample
    # positions keep their gradient path to the bounce directions -- the
    # resampled z is differentiable w.r.t. z_vals; only the proposal
    # DENSITY is stop-gradient.
    recur_proposal_samples_per_ray: int = struct.field(
        pytree_node=False, default=-1)
    proposal_pad: float = struct.field(pytree_node=False, default=0.01)
    # annealed pad: geometric interp proposal_pad_init -> proposal_pad over
    # proposal_pad_iters iterations (0 = off). Early in training the
    # stop-gradient proposal density is noise, so a high pad keeps fine
    # samples exploring the whole occupied span; late it concentrates.
    # The live value is the dynamic leaf proposal_pad_cur ("frozen"
    # optimizer group), updated host-side like predicted_normal_lambda --
    # pad is purely numeric so annealing costs zero recompiles.
    proposal_pad_init: float = struct.field(pytree_node=False, default=-1.0)
    proposal_pad_iters: int = struct.field(pytree_node=False, default=0)
    proposal_pad_cur: Any = None

    def check_schedule(self, iteration: int, batch_mul: int = 1):
        """Host-side schedule tick. Returns (new_self, needs_optimizer_reinit)."""
        new_model, m_changed = self.model.check_schedule(iteration, batch_mul)
        new_sampler, s_changed = self.sampler.check_schedule(
            iteration, batch_mul, self.rf)
        new_rf, r_changed = self.rf.check_schedule(iteration, batch_mul)
        # occupancy-grid shrink: bound the field to occupied cells and
        # re-fit the factor grids (reference continuous_alphagrid.py:435-437
        # get_bounds -> rf.shrink; fires optimizer reinit via changed=True)
        shrink_iters = getattr(new_sampler, "shrink_iters", ())
        if (shrink_iters and hasattr(new_sampler, "get_bounds")
                and hasattr(new_rf, "shrink")
                and iteration in [i * batch_mul for i in shrink_iters]):
            new_rf = new_rf.shrink(new_sampler.get_bounds())
            r_changed = True
        changed = m_changed or s_changed or r_changed
        new = self.replace(model=new_model, sampler=new_sampler, rf=new_rf)
        if changed:
            new = new.replace(sampler=new.sampler.update(new.rf, init=True))
        if self.geonorm_iters > 0:
            lam = min(max(
                (iteration / batch_mul - self.geonorm_iters)
                / self.geonorm_interp_iters, 0.0), 1.0)
            # explicit dtype: weak scalars would retrace the jitted step
            new = new.replace(
                predicted_normal_lambda=jnp.asarray(lam, dtype=jnp.float32))
        if self.proposal_pad_iters > 0 and self.proposal_pad_cur is not None:
            t = min(max((iteration / batch_mul) / self.proposal_pad_iters,
                        0.0), 1.0)
            pad = (self.proposal_pad_init ** (1.0 - t)
                   * self.proposal_pad ** t)
            new = new.replace(
                proposal_pad_cur=jnp.asarray(pad, dtype=jnp.float32))
        return new, changed


def render_just_bg(nmf: NMF, viewdirs, mipval, bg_cache=None):
    """Background-only shading (tensor_nerf.py:204-208)."""
    return nmf.bg_module(viewdirs, mipval, cache=bg_cache).reshape(-1, 3)


def render(nmf: NMF, rays, key, focal=1.0, is_train=False, bg_col=(1.0, 1.0, 1.0),
           recur=0, override_near=None, stepmul=1.0, tonemap=True,
           gt_normals=None, start_mipval=None, draw_debug=False, bg_cache=None,
           ndc_ray=False):
    """Render a ray batch.

    rays: (B, 6). Returns (images dict, stats dict). All outputs have leading
    dim B. This is the hot path -- everything inside is jit-compatible with
    static shapes. (Reference: TensorNeRF.forward, tensor_nerf.py:210-674.)
    """
    B = rays.shape[0]
    keys = jax.random.split(key, 4)
    eps = 1e-12

    # ---- sample points along rays (L1 sampler layer) ----
    k_spr = (nmf.max_samples_per_ray if recur == 0
             else nmf.recur_samples_per_ray)
    sample_kwargs = dict(key=keys[0], is_train=is_train,
                         max_samples_per_ray=k_spr, focal=focal)
    if ndc_ray:
        # NDC path (LLFF): linear z steps; recursion always uses world rays
        samp = nmf.sampler.sample(rays, ndc_ray=(recur == 0), **sample_kwargs)
    else:
        samp = nmf.sampler.sample(rays, override_near=override_near,
                                  stepmul=stepmul, **sample_kwargs)
    xyz = samp["xyz"]          # (B, K, 4)
    z_vals = samp["z_vals"]    # (B, K)
    dists = samp["dists"]      # (B, K)
    valid = samp["valid"]      # (B, K)
    if recur == 0:
        # primary sample positions have no gradient path to any parameter
        # (they are functions of the input rays only), but without an
        # explicit stop the backward still materializes their cotangents --
        # including a 0.5M-row scatter transposing the top-K compaction
        # gather (~28 ms/step measured). Secondary passes keep gradients:
        # there the positions depend on bounce directions (= parameters).
        sg = jax.lax.stop_gradient
        xyz, z_vals, dists = sg(xyz), sg(z_vals), sg(dists)
    K = xyz.shape[1]

    # ---- optional proposal resampling: stop-gradient density over the full
    # budget, then concentrate the differentiable field + shading work on a
    # smaller weight-proportional fine set ----
    kf = (nmf.proposal_samples_per_ray if recur == 0
          else nmf.recur_proposal_samples_per_ray)
    if 0 < kf < K:
        from .ops.resample import resample_pdf

        rf_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, nmf.rf)
        dkw = ({"use_gather_dtype": True}
               if hasattr(nmf.rf, "gather_dtype") else {})
        sigma_p = rf_sg.compute_densityfeature(
            xyz.reshape(-1, 4), **dkw).reshape(B, K)
        sigma_p = jnp.where(valid, sigma_p, 0.0)
        w_p, _ = raw2alpha(sigma_p, dists * nmf.rf.distance_scale)
        pad = (nmf.proposal_pad_cur if nmf.proposal_pad_cur is not None
               else nmf.proposal_pad)
        z_vals, dists, _, valid = resample_pdf(
            keys[2], z_vals, dists, w_p, valid, kf, is_train, pad)
        pts = rays[:, None, 0:3] + rays[:, None, 3:6] * z_vals[..., None]
        xyz = jnp.concatenate([pts, z_vals[..., None] / focal], axis=-1)
        K = kf

    needs_normals = nmf.model.needs_normals(recur)
    app_k = nmf.app_samples_per_ray if recur == 0 else -1
    merge_k = nmf.merge_runs if recur == 0 else 0
    merge = 0 < merge_k < K and hasattr(nmf.rf, "grid_size")
    if merge and 0 < app_k < K:
        import warnings

        warnings.warn(
            "merge_runs takes precedence over app_samples_per_ray: the "
            "two-stage top-K shading stage is disabled while run-collapsed "
            "shading is active (both coarsen the same shading set)",
            stacklevel=2)
    two_stage = 0 < app_k < K and not merge
    fused = (hasattr(nmf.rf, "compute_all")
             and (not needs_normals
                  or getattr(nmf.rf, "fused_normals_ok", False)))

    # ---- stage 1: density + transmittance over the full (B, K) budget ----
    if fused and not two_stage and not merge:
        sigma_f, app_features, world_normal = nmf.rf.compute_all(
            xyz.reshape(-1, 4), with_normals=needs_normals)
        sigma = sigma_f.reshape(B, K)
    else:
        # stage-1 density must match compute_all's gather dtype bit-for-bit
        # so the two-stage acc_map equals the full render's
        dkw = ({"use_gather_dtype": True}
               if hasattr(nmf.rf, "gather_dtype") else {})
        sigma = nmf.rf.compute_densityfeature(
            xyz.reshape(-1, 4), **dkw).reshape(B, K)
        app_features = world_normal = None

    sigma = jnp.where(valid, sigma, 0.0)
    if nmf.use_pallas:
        from .ops.pallas.composite import transmittance_weights

        weight = transmittance_weights(sigma, dists * nmf.rf.distance_scale)
    else:
        weight, _ = raw2alpha(sigma, dists * nmf.rf.distance_scale)
    if recur > 0 and nmf.detach_inter:
        weight = jax.lax.stop_gradient(weight)
    # opacity always integrates the full sample budget
    acc_map = weight.sum(axis=1)
    # full-budget quadrature (kept when merge_runs/two_stage coarsen the
    # shading set: the distortion loss and the adaptive-batch sample
    # telemetry must see the real per-sample weights)
    z_full, d_full, w_full, valid_full = z_vals, dists, weight, valid

    # ---- stage 2 (optional): shade only the top-K' samples by weight.
    # The transmittance tail carries negligible radiance; the expensive
    # appearance/normal queries and the shading model run on the compacted
    # set (the same weight-proportional budgeting idea the reference applies
    # to bounce rays, pt_selectors.py:5-60, applied one level earlier). ----
    if two_stage:
        topw, idx2 = jax.lax.top_k(weight, app_k)  # (B, K')
        xyz = jnp.take_along_axis(xyz, idx2[..., None], axis=1)
        z_vals = jnp.take_along_axis(z_vals, idx2, axis=1)
        dists = jnp.take_along_axis(dists, idx2, axis=1)
        valid = jnp.take_along_axis(valid, idx2, axis=1) & (topw > 0)
        weight = topw
        K = app_k

    # ---- run-collapsed shading (ops/runs.py): collapse consecutive
    # same-cell samples into <= merge_runs weight-ranked slots. At a
    # converged field ~11 consecutive fine samples share each grid cell
    # (runs/cell_multiplicity_probe.py), gathering identical factor rows;
    # shading once per run cuts the appearance gathers/scatters, shading
    # MLP evals, and bounce allocation by the multiplicity while density
    # integration above keeps the full budget. ----
    if merge:
        from .ops.runs import cell_indices, merge_sample_runs

        cells = cell_indices(nmf.rf, xyz)
        z_m, d_m, w_m, v_m = merge_sample_runs(
            cells, z_vals, dists, weight, valid, merge_k)
        # Merged positions z_m = WZ/W are differentiable in weight (hence
        # density params), which would re-open the primary-position
        # gradient path the recur==0 stop_gradient above exists to close
        # (~28 ms/step of backward scatters). Positions are a quadrature
        # choice, not part of the estimator the reference differentiates
        # (models/microfacet.py:271-333 shades at fixed sample positions):
        # stop them. Run weights w_m keep their gradient to density.
        z_m = jax.lax.stop_gradient(z_m)
        d_m = jax.lax.stop_gradient(d_m)
        pts = rays[:, None, 0:3] + rays[:, None, 3:6] * z_m[..., None]
        xyz = jnp.concatenate([pts, z_m[..., None] / focal], axis=-1)
        z_vals, dists, valid, weight = z_m, d_m, v_m, w_m
        K = merge_k

    xyz_flat = xyz.reshape(-1, 4)
    valid_flat = valid.reshape(-1)
    xyz_normed = nmf.rf.normalize_coord(xyz_flat)
    viewdirs = jnp.broadcast_to(rays[:, None, 3:6], (B, K, 3))

    # ---- appearance (+ normals) on the shading set ----
    if app_features is None:
        if fused:
            _, app_features, world_normal = nmf.rf.compute_all(
                xyz_flat, with_normals=needs_normals)
        else:
            app_features = nmf.rf.compute_appfeature(xyz_flat)
            world_normal = (nmf.rf.compute_normals(xyz_flat)
                            if needs_normals else None)

    if needs_normals:
        if nmf.normal_module is not None:
            pred_norms = nmf.normal_module(xyz_normed, app_features,
                                           world_normal)
            lam = nmf.predicted_normal_lambda
            v_world_normal = safemath.normalize(
                lam * pred_norms + (1 - lam) * world_normal)
        else:
            pred_norms = jnp.zeros_like(world_normal)
            v_world_normal = world_normal
    else:
        world_normal = jnp.zeros((B * K, 3))
        pred_norms = jnp.zeros_like(world_normal)
        v_world_normal = world_normal

    # ---- shading model (L4) ----
    retrace_thin = []  # thinning telemetry surfaced from the retrace level

    def render_reflection(bounce_rays, mipval, retrace, rkey):
        """bounce_rays: (T, 6); mipval: (T,). Returns (rgb (T,3), bg_vis)."""
        if retrace:
            inc_ims, inc_stats = render(
                nmf, bounce_rays, rkey, focal=focal, is_train=is_train,
                bg_col=None, recur=recur + 1,
                override_near=3 * nmf.sampler.live_stepsize,
                stepmul=nmf.recur_stepmul, tonemap=False,
                start_mipval=mipval, bg_cache=bg_cache)
            if "thin_scale" in inc_stats:
                retrace_thin.append(inc_stats["thin_scale"])
            return inc_ims["rgb_map"], 1 - inc_ims["acc_map"]
        else:
            return render_just_bg(nmf, bounce_rays[:, 3:6], mipval,
                                  bg_cache), None

    rgb, debug = nmf.model.shade(
        xyz_flat, xyz_normed, app_features,
        viewdirs.reshape(-1, 3), v_world_normal,
        weight.reshape(-1), valid_flat, B,
        render_reflection=render_reflection,
        bg_module=nmf.bg_module, bg_cache=bg_cache, is_train=is_train,
        recur=recur, key=keys[1])
    rgb = rgb.reshape(B, K, 3)
    vis_loss = debug.pop("__visibility_loss", None)
    thin_scale = debug.pop("__thin_scale", None)

    eweight = weight[..., None]
    rgb_map = row_mask_sum(eweight * rgb, valid)

    images = {}
    stats = {"recur": recur}
    if thin_scale is not None:
        stats["thin_scale"] = thin_scale
        if retrace_thin:
            stats["thin_scale_retrace"] = retrace_thin[0]

    # ---- background ----
    tm_fn, _ = get_tonemap(nmf.tonemap)
    if nmf.bg_module is not None and bg_col is None:
        bg_mip = (jnp.full((B,), -100.0) if start_mipval is None
                  else start_mipval.reshape(-1))
        bg = render_just_bg(nmf, rays[:, 3:6], bg_mip, bg_cache)
        if tonemap:
            bg = tm_fn(bg, noclip=True)
    else:
        bg = jnp.asarray(bg_col if bg_col is not None else (0.0, 0.0, 0.0)
                         ).reshape(1, 3)

    # ---- losses / statistics (recur == 0 only) ----
    if recur == 0:
        aweight = jnp.where(valid_flat, weight.reshape(-1), 0.0)
        vdet = jax.lax.stop_gradient(viewdirs.reshape(-1, 3))
        NdotV_pred = (-vdet * pred_norms).sum(-1)
        NdotV_geo = (-vdet * world_normal).sum(-1)
        if nmf.geonorm_iters > 0:
            ori = aweight * (jnp.clip(NdotV_pred, None, 0) ** 2
                             + jnp.clip(NdotV_geo, None, 0) ** 2)
        else:
            ori = aweight * jnp.clip(NdotV_geo, None, 0) ** 2
        stats["ori_loss"] = ori.sum()

        if nmf.align_pred_norms and nmf.normal_module is not None:
            align = 2 * (1 - (pred_norms * world_normal).sum(-1))
            stats["prediction_loss"] = (aweight * align).sum()
        else:
            stats["prediction_loss"] = jnp.zeros(())

        if nmf.bg_module is not None:
            env_brightness = nmf.bg_module.mean_color().mean()
            stats["envmap_reg"] = jnp.clip(env_brightness - 0.05, 0)
        else:
            stats["envmap_reg"] = jnp.zeros(())

        if gt_normals is not None:
            # gt_normals: (B, 3); weight samples against per-ray GT normals
            gt_e = jnp.broadcast_to(gt_normals[:, None, :], (B, K, 3)
                                    ).reshape(-1, 3)
            gt_mask = (gt_e.sum(-1) > 0.9) & valid_flat
            err_a = 2 * (1 - (pred_norms * gt_e).sum(-1))
            err_b = 2 * (1 - (world_normal * gt_e).sum(-1))
            stats["normal_err"] = (jnp.where(gt_mask, aweight, 0.0)
                                   * (err_a + err_b)).sum()
        else:
            stats["normal_err"] = jnp.zeros(())

        stats["brdf_reg"] = (jnp.clip(debug["tint"].mean(), 0)
                             if "tint" in debug else jnp.zeros(()))
        if "diffuse" in debug:
            stats["diffuse_reg"] = (
                jax.lax.stop_gradient(aweight)[:, None] * debug["diffuse"]
            ).sum() / 3
        else:
            stats["diffuse_reg"] = jnp.zeros(())
        from .ops.losses import distortion_loss

        stats["distortion_loss"] = distortion_loss(z_full, w_full, d_full)
        stats["visibility_loss"] = (vis_loss if vis_loss is not None
                                    else jnp.zeros(()))
        stats["n_valid_samples"] = valid_full.sum()

    # ---- debug maps (eval only) ----
    if draw_debug:
        depth_map = (weight * z_vals).sum(axis=1)
        pw = jnp.where(valid, weight, 0.0)[..., None]
        wn_map = row_mask_sum(world_normal.reshape(B, K, 3) * pw, valid)
        wn_map = acc_map[..., None] * wn_map + (1 - acc_map[..., None])
        pn_map = row_mask_sum(pred_norms.reshape(B, K, 3) * pw, valid)
        pn_map = acc_map[..., None] * pn_map + (1 - acc_map[..., None])
        inds = jnp.argmax(weight, axis=1)
        term_xyz = jnp.take_along_axis(xyz, inds[:, None, None], axis=1)[:, 0]
        cs_mask = (xyz_normed.reshape(B, K, -1)[..., 2] < 0) & valid
        cross_section = row_mask_sum(
            cs_mask[..., None] * eweight * jnp.clip(rgb, 0, 1), valid)
        images["depth"] = depth_map
        images["world_normal"] = wn_map
        images["normal"] = pn_map
        images["termination_xyz"] = term_xyz
        images["surf_width"] = valid.sum(axis=1)
        images["cross_section"] = cross_section
        for k, v in debug.items():
            im = row_mask_sum(v.reshape(B, K, -1) * eweight, valid)
            images[k] = im + (1 - acc_map[..., None]) * bg

    if tonemap:
        rgb_map = tm_fn(rgb_map, noclip=nmf.hdr)
    rgb_map = rgb_map + (1 - acc_map[..., None]) * bg

    images["rgb_map"] = rgb_map
    images["acc_map"] = acc_map
    return images, stats
