"""Instantiate the composed model from a hydra-style config dict.

The reference builds everything with hydra.utils.instantiate over
``_target_`` strings (train.py:239-241, tensor_nerf.py:68-74). This registry
maps those same target names onto this package's functional builders, so
reference configs translate key-for-key.
"""
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .fields.tensorf import init_tensorvm_split
from .models.microfacet import init_microfacet
from .models.tensorf import init_tensorf_shade
from .modules.bg import init_integral_equirect
from .modules.brdf import init_mlp_brdf, init_specular
from .modules.brdf_samplers import CosineLobeSampler, GGXSampler
from .modules.ish import FullISH, ListISH
from .modules.render_modules import (IPE, PE, init_mlp_normal,
                                     init_mlp_render_fea,
                                     init_rand_hydra_diffuse)
from .render import NMF
from .samplers.alphagrid import AlphaGridSampler


def _target(cfg):
    return (cfg or {}).get("_target_", "")


def _clean(cfg: Dict) -> Dict:
    return {k: v for k, v in (cfg or {}).items()
            if not k.startswith("_")}


def build_encoder(cfg):
    if not cfg:
        return None
    t = _target(cfg)
    kw = _clean(cfg)
    if t.endswith("ListISH"):
        return ListISH(degs=tuple(kw.get("degs", (0, 1, 2, 4))))
    if t.endswith("FullISH"):
        return FullISH(max_degree=kw.get("max_degree", 1))
    if t.endswith("PE"):
        return PE(max_degree=kw.get("max_degree", 8))
    if t.endswith("IPE"):
        return IPE(max_degree=kw.get("max_degree", 8))
    if t.endswith("FullISHScaled"):
        from .modules.ish import FullISHScaled

        return FullISHScaled(max_degree=kw.get("max_degree", 1))
    if t.endswith("RandRotISH"):
        from .modules.ish import RandRotISH

        return RandRotISH(rand_n=kw.get("rand_n", 4),
                          core_degs=tuple(kw.get("core_degs", (1, 2, 4, 8))),
                          rand_degs=tuple(kw.get("rand_degs", (8,))))
    if t.endswith("RandISH"):
        from .modules.ish import RandISH

        return RandISH(rand_n=kw.get("rand_n", 8), std=kw.get("std", 10.0))
    if t.endswith("SHBasis"):
        from .modules.ish import SHBasis

        return SHBasis(deg=kw.get("deg", 1))
    if t.endswith("ISH"):
        from .modules.ish import ISH

        return ISH(max_degree=kw.get("max_degree", 1))
    raise ValueError(f"unknown encoder target {t}")


def build_diffuse(key, cfg, app_dim):
    """Material-head dispatch (diffuse_module _target_s). Order matters:
    RandHydraMLPDiffuse endswith HydraMLPDiffuse endswith MLPDiffuse."""
    t = _target(cfg)
    kw = _clean(cfg)
    if t.endswith("PassthroughDiffuse"):
        from .modules.render_modules import PassthroughDiffuse

        return PassthroughDiffuse()
    if t.endswith("RandHydraMLPDiffuse") or not t:
        kw["view_encoder"] = build_encoder(kw.pop("view_encoder", None))
        kw["roughness_view_encoder"] = build_encoder(
            kw.pop("roughness_view_encoder", None))
        return init_rand_hydra_diffuse(key, app_dim, **kw)
    if t.endswith("HydraMLPDiffuse"):
        from .modules.render_modules import init_hydra_diffuse

        return init_hydra_diffuse(key, app_dim, **kw)
    if t.endswith("MLPDiffuse"):
        from .modules.render_modules import init_mlp_diffuse

        return init_mlp_diffuse(key, app_dim, **kw)
    raise ValueError(f"unknown diffuse module {t}")


def build_brdf_sampler(cfg):
    from .modules.brdf_samplers import BeckmannSampler, MultiSampler

    t = _target(cfg)
    if t.endswith("GGXSampler") or not t:
        return GGXSampler()
    if t.endswith("CosineLobeSampler"):
        return CosineLobeSampler()
    if t.endswith("BeckmannSampler"):
        return BeckmannSampler()
    if t.endswith("SGGXSampler"):
        from .modules.brdf_samplers import SGGXSampler

        return SGGXSampler()
    if t.endswith("MultiSampler"):
        return MultiSampler(sampler_a=GGXSampler(),
                            sampler_b=CosineLobeSampler())
    raise ValueError(f"unknown brdf sampler {t}")


def build_field(key, cfg, aabb, grid_size=None):
    t = _target(cfg)
    kw = _clean(cfg)
    kw.pop("distance_scale", None)
    if grid_size is not None:
        kw["grid_size"] = grid_size
    if t.endswith("TensorVMSplit") or not t:
        allowed = {
            "density_n_comp", "appearance_n_comp", "app_dim", "grid_size",
            "N_voxel_init", "N_voxel_final", "upsamp_list", "init_mode",
            "d_init_val", "app_init_val", "activation", "density_shift",
            "contract_space", "dbasis", "step_ratio", "density_res_multi",
            "smoothing", "numer_grad", "interp_mode", "lr", "lr_net",
            "num_pretrain", "calibrate", "gather_dtype", "scatter_kernel",
            "fixed_shape",
        }
        kw2 = {k: v for k, v in kw.items() if k in allowed}
        if "upsamp_list" in kw2:
            kw2["upsamp_list"] = tuple(kw2["upsamp_list"])
        rf = init_tensorvm_split(key, aabb, **kw2)
        ds = cfg.get("distance_scale")
        if ds is not None:
            rf = rf.replace(distance_scale=float(ds))
        return rf
    if t.endswith("HashGridRF") or t.endswith("TCNNRF"):
        from .fields.hashgrid import init_hashgrid_rf

        allowed = {"n_levels", "n_features", "log2_hashmap_size",
                   "base_resolution", "finest_resolution", "app_dim",
                   "hidden_w", "activation", "density_shift",
                   "distance_scale", "step_ratio", "lr", "lr_net"}
        kw2 = {k: v for k, v in kw.items() if k in allowed}
        return init_hashgrid_rf(key, aabb, **kw2)
    if t.endswith("GridRF") or t.endswith("Grid"):
        from .fields.grid import init_grid_rf

        allowed = {"grid_size", "app_dim", "init_scale", "activation",
                   "density_shift", "distance_scale", "step_ratio", "lr",
                   "lr_net"}
        kw2 = {k: v for k, v in kw.items() if k in allowed}
        if "grid_size" in kw2:
            kw2["grid_size"] = tuple(kw2["grid_size"])
        return init_grid_rf(key, aabb, **kw2)
    raise ValueError(f"unknown field target {t}")


def build_visibility(key, cfg, app_dim):
    """visibility_module config key (reference microfacet.py:34;
    VisibilityMLP render_modules.py:117-198)."""
    if not cfg:
        return None
    t = _target(cfg)
    if t.endswith("VisibilityMLP") or t.endswith("NaiveVisCache") or not t:
        from .modules.visibility import init_visibility_mlp

        allowed = {"feape", "featureC", "num_layers", "lr"}
        kw = {k: v for k, v in _clean(cfg).items() if k in allowed}
        return init_visibility_mlp(key, app_dim, **kw)
    raise ValueError(f"unknown visibility module {t}")


def build_bright_sampler(cfg):
    """bright_sampler config key (reference microfacet.py:36;
    ERBrightSampler equirect_bright_sampler.py:51-99)."""
    if not cfg:
        return None
    t = _target(cfg)
    if t.endswith("ERBrightSampler") or not t:
        from .modules.visibility import ERBrightSampler

        return ERBrightSampler()
    if t.endswith("CubeBrightSampler") or t.endswith(
            "BrightnessImportanceSampler"):
        import jax.numpy as jnp

        from .modules.visibility import CubeBrightSampler

        kw = _clean(cfg)
        S = int(kw.get("n_spots", 16))
        return CubeBrightSampler(
            spots=jnp.zeros((S, 3)),
            scale=int(kw.get("scale", 1)),
            update_freq=int(kw.get("update_freq", 1000)))
    raise ValueError(f"unknown bright sampler {t}")


def build_model(key, cfg, app_dim):
    t = _target(cfg)
    kw = _clean(cfg)
    if t.endswith("Microfacet"):
        k1, k2 = jax.random.split(key)
        dm_cfg = kw.pop("diffuse_module", None) or {}
        brdf_cfg = kw.pop("brdf", None) or {}
        sampler_cfg = kw.pop("brdf_sampler", None) or {}
        vis_cfg = kw.pop("visibility_module", None)
        bright_cfg = kw.pop("bright_sampler", None)
        vis = build_visibility(jax.random.fold_in(key, 7), vis_cfg, app_dim)
        bright = build_bright_sampler(bright_cfg)
        dm = build_diffuse(k1, dm_cfg, app_dim)
        brdf_kw = _clean(brdf_cfg)
        brdf_kw["h_encoder"] = build_encoder(brdf_kw.pop("h_encoder", None))
        brdf_kw["d_encoder"] = build_encoder(brdf_kw.pop("d_encoder", None))
        if _target(brdf_cfg).endswith("Specular"):
            brdf_kw.pop("h_encoder", None)
            brdf_kw.pop("d_encoder", None)
            brdf = init_specular(k2, app_dim, **brdf_kw)
        else:
            brdf = init_mlp_brdf(k2, app_dim, **brdf_kw)
        bs = build_brdf_sampler(sampler_cfg)
        # translate reference budget names to static TPU budgets when given
        kw.pop("max_brdf_rays", None)
        kw.pop("target_num_samples", None)
        mr = kw.pop("max_retrace_rays", None)
        if mr is not None:
            kw["max_retrace_rays"] = tuple(
                int(2 ** math.ceil(math.log2(max(m, 1)))) for m in mr)
        if "brdf_ray_budget" in kw:
            kw["brdf_ray_budget"] = tuple(kw["brdf_ray_budget"])
        return init_microfacet(key, app_dim, diffuse_module=dm, brdf=brdf,
                               brdf_sampler=bs, visibility_module=vis,
                               bright_sampler=bright, **kw)
    if t.endswith("RefNeRF"):
        from .models.refnerf import init_refnerf

        k1, k2 = jax.random.split(key)
        dm_cfg = kw.pop("diffuse_module", None) or {}
        ref_cfg = _clean(kw.pop("ref_module", None) or {})
        if "ref_encoder" in ref_cfg:
            ref_cfg["ref_encoder"] = build_encoder(ref_cfg["ref_encoder"])
        dm = build_diffuse(k1, dm_cfg, app_dim)
        return init_refnerf(k2, app_dim, diffuse_module=dm,
                            ref_module_cfg=ref_cfg)
    if t.endswith("DualModel"):
        from .models.refnerf import DualModel

        k1, k2 = jax.random.split(key)
        m1 = build_model(k1, kw.pop("model1"), app_dim)
        m2 = build_model(k2, kw.pop("model2"), app_dim)
        # reference key: warmup_iters (dual_model.py); alternating mode is
        # subsumed by the recursion split (model1 always handles recur>0)
        switch = kw.get("switch_iter", kw.get("warmup_iters", 0))
        return DualModel(model1=m1, model2=m2, switch_iter=int(switch))
    if t.endswith("TensoRF") or not t:
        dm_cfg = kw.pop("diffuse_module", None) or {}
        dm_kw = _clean(dm_cfg)
        if _target(dm_cfg).endswith("MLPRender_PE"):
            dm_kw["head"] = "pe"
        return init_tensorf_shade(key, app_dim, **dm_kw)
    raise ValueError(f"unknown model target {t}")


def build_bg(key, cfg):
    if not cfg:
        return None
    t = _target(cfg)
    if t.endswith("IntegralEquirect"):
        return init_integral_equirect(key, **_clean(cfg))
    raise ValueError(f"unknown bg target {t}")


def build_normal_module(key, cfg, app_dim):
    if not cfg:
        return None
    t = _target(cfg)
    if t.endswith("MLPNormal"):
        return init_mlp_normal(key, app_dim, **_clean(cfg))
    if t.endswith("AppDimNormal"):
        from .modules.render_modules import AppDimNormal

        return AppDimNormal()
    raise ValueError(f"unknown normal module {t}")


def build_sampler(cfg, aabb, near_far):
    kw = _clean(cfg)
    t = _target(cfg)
    # the reference's CUDA-backed samplers (NerfAccSampler, Raymarcher,
    # ContinuousAlphagrid) all map onto the occupancy-grid sampler here
    if any(t.endswith(n) for n in
           ("NerfAccSampler", "Raymarcher", "ContinuousAlphagrid",
            "OccGridSampler")):
        from .samplers.occgrid import OccGridSampler

        reso = int(kw.get("grid_reso", kw.get("grid_size", 128)))
        okw = {}
        if "update_freq" in kw:
            okw["update_freq"] = int(kw["update_freq"])
        if "ema_decay" in kw:
            okw["ema_decay"] = float(kw["ema_decay"])
        if "occ_thre" in kw or "density_thresh" in kw:
            okw["density_thresh"] = float(
                kw.get("density_thresh", kw.get("occ_thre")))
        if "max_samples" in kw:
            okw["max_samples"] = int(kw["max_samples"])
        if "multiplier" in kw:
            okw["multiplier"] = int(kw["multiplier"])
        if "shrink_iters" in kw:
            okw["shrink_iters"] = tuple(kw["shrink_iters"])
        if "test_multiplier" in kw:
            okw["test_multiplier"] = float(kw["test_multiplier"])
        return OccGridSampler(
            density_grid=jnp.zeros((reso,) * 3, jnp.float32),
            aabb=jnp.asarray(aabb), grid_reso=reso,
            near_far=tuple(near_far), **okw)
    allowed = {"enable_alpha_mask", "update_list", "max_samples",
               "multiplier", "alphaMask_thres", "superstep",
               "fine_alpha_test"}
    kw2 = {k: v for k, v in kw.items() if k in allowed}
    if "update_list" in kw2:
        kw2["update_list"] = tuple(kw2["update_list"])
    if "alphaMask_thres" in kw2:
        kw2["alpha_mask_thres"] = kw2.pop("alphaMask_thres")
    return AlphaGridSampler(alpha_mask=None, aabb=jnp.asarray(aabb),
                            near_far=tuple(near_far), **kw2)



def set_mlp_dtype(obj, dtype: str):
    """Recursively set MLP.compute_dtype on every MLP inside a module tree
    (model.arch.mlp_dtype knob). Walks flax struct dataclasses and standard
    containers; leaves arrays untouched."""
    import dataclasses

    from .modules.mlp import MLP

    if isinstance(obj, MLP):
        return obj.replace(compute_dtype=dtype)
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        changes = {}
        for f in dataclasses.fields(obj):
            v = getattr(obj, f.name)
            nv = set_mlp_dtype(v, dtype)
            if nv is not v:
                changes[f.name] = nv
        return obj.replace(**changes) if changes else obj
    if isinstance(obj, tuple):
        out = tuple(set_mlp_dtype(v, dtype) for v in obj)
        return out if any(a is not b for a, b in zip(out, obj)) else obj
    if isinstance(obj, list):
        return [set_mlp_dtype(v, dtype) for v in obj]
    if isinstance(obj, dict):
        return {k: set_mlp_dtype(v, dtype) for k, v in obj.items()}
    return obj


def build_nmf(key, arch_cfg: Dict, aabb, near_far, grid_size=None) -> NMF:
    """Build the full composed model from cfg.model.arch (the analogue of
    hydra instantiate(args.model.arch)(aabb=..., near_far=...))."""
    keys = jax.random.split(key, 5)
    rf = build_field(keys[0], arch_cfg.get("rf", {}), aabb,
                     grid_size=grid_size)
    sampler = build_sampler(arch_cfg.get("sampler", {}), aabb, near_far)
    if getattr(rf, "fixed_shape", False) \
            and not isinstance(sampler, AlphaGridSampler):
        # OccGridSampler has no step_scale plumbing: it would silently
        # march at the FINAL-resolution stepsize for the whole schedule
        # (and rf.shrink at shrink_iters is unsupported on padded grids)
        raise ValueError(
            "field.fixed_shape requires the AlphaGridSampler march "
            "(occupancy-grid samplers have no live-resolution step "
            "scaling); disable one")
    sampler = sampler.update(rf, init=True)
    model = build_model(keys[1], arch_cfg.get("model", {}), rf.app_dim)
    bg = build_bg(keys[2], arch_cfg.get("bg_module"))
    normal_module = build_normal_module(keys[3],
                                        arch_cfg.get("normal_module"),
                                        rf.app_dim)

    tm_cfg = arch_cfg.get("tonemap") or {}
    tm_t = _target(tm_cfg)
    tonemap = ("srgb" if "SRGB" in tm_t or not tm_t
               else "hdr" if "HDR" in tm_t
               else "linear" if "Linear" in tm_t else "srgb")

    allowed = {"recur_stepmul", "recur_alpha_thres", "detach_inter", "hdr",
               "use_predicted_normals", "align_pred_norms",
               "orient_world_normals", "geonorm_iters",
               "geonorm_interp_iters", "eval_batch_size", "lr_scale",
               "max_samples_per_ray", "recur_samples_per_ray", "use_pallas",
               "app_samples_per_ray", "merge_runs",
               "proposal_samples_per_ray",
               "recur_proposal_samples_per_ray", "proposal_pad",
               "proposal_pad_init", "proposal_pad_iters"}
    top = {k: v for k, v in arch_cfg.items() if k in allowed}
    # NOTE: the pallas composite kernel wins standalone (2.3x on
    # transmittance fwd+bwd) but currently LOSES inside the full train graph
    # (it blocks XLA fusion around the kernel boundary) -> opt-in only.
    top.setdefault("use_pallas", False)

    # mlp_dtype=bf16: run every shading MLP's matmuls with bf16 operands
    # (f32 accumulation + params; see modules/mlp.py). Opt-in perf knob.
    mlp_dtype = arch_cfg.get("mlp_dtype")
    if mlp_dtype and mlp_dtype != "f32":
        model = set_mlp_dtype(model, mlp_dtype)
        normal_module = set_mlp_dtype(normal_module, mlp_dtype)

    use_pred = top.pop("use_predicted_normals", False) and normal_module is not None
    nmf = NMF(rf=rf, sampler=sampler, model=model, bg_module=bg,
              normal_module=normal_module, tonemap=tonemap,
              use_predicted_normals=use_pred,
              predicted_normal_lambda=jnp.asarray(1.0 if use_pred else 0.0),
              **top)
    if nmf.proposal_pad_iters > 0 and nmf.proposal_pad_init > 0:
        # leaf must exist from step 0 so the pytree structure (and the
        # optimizer state built over it) never changes mid-train
        nmf = nmf.replace(
            proposal_pad_cur=jnp.asarray(nmf.proposal_pad_init, jnp.float32))
    return strongify(nmf)


def strongify(tree):
    """Promote every leaf to a strongly-typed device array.

    Weak-typed scalar leaves (python floats, bare jnp.asarray(0.0)) flip to
    strong after one optimizer step, which retraces and RECOMPILES the full
    jitted train step up to twice more (nmf leaves flip first, then the
    Adam mu/nu copies) -- measured as 3 distinct 15 MB XLA programs per
    schedule event. Canonicalizing at build time makes the first signature
    the fixed point."""
    def fix(x):
        if hasattr(x, "dtype"):
            return jnp.asarray(x, dtype=x.dtype)
        if isinstance(x, bool):
            return jnp.asarray(x, dtype=jnp.bool_)
        if isinstance(x, int):
            return jnp.asarray(x, dtype=jnp.int32)
        if isinstance(x, float):
            return jnp.asarray(x, dtype=jnp.float32)
        return x

    return jax.tree_util.tree_map(fix, tree)
