"""Neural Microfacet shading model, TPU-native.

Re-design of the reference ``models/microfacet.py`` (Microfacet :12-673) and
``modules/pt_selectors.py`` (select_bounces :5-60) around static shapes:

Reference (CUDA) pipeline              ->  TPU pipeline (this file)
--------------------------------------     -----------------------------------
(M', S) ray_mask w/ data-dependent S       flat (R,) bounce-ray buffer with a
via torch.where boolean compaction         compile-time budget R per recursion
                                           level (ops.masked.flat_compact)
scatter_add row_mask_sum per sample        segment_sum over parent sample ids
torch recursion via closure                depth-unrolled callback; top-T
(tensor_nerf.py:291-317) with              retrace rays gathered into a fixed
data-dependent retrace count               (T, 6) buffer by ranked contribution
Sobol draws (base.py)                      Hammersley + toroidal shift

The physics is identical: GGX VNDF importance sampling, learned residual
BRDF, SH-convolved irradiance for diffuse, fresnel mixing
(microfacet.py:299-318, 461-472, 565-669).
"""
import math
from typing import Any, Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp
from flax import struct

from ..modules.brdf import MLPBRDF
from ..modules.brdf_samplers import GGXSampler, hammersley_draw
from ..modules.render_modules import RandHydraMLPDiffuse
from ..ops import sh
from ..ops.masked import segment_sum_to, take_rows_binsum
from ..ops.safemath import normalize

EPS = float(jnp.finfo(jnp.float32).eps)


@struct.dataclass
class Microfacet:
    diffuse_module: RandHydraMLPDiffuse
    brdf: MLPBRDF
    brdf_sampler: GGXSampler
    # optional learned visibility cache: damps retrace priority of rays
    # whose background visibility the MLP already predicts (reference
    # microfacet.py:497-505); trained on retraced rays' observed bg
    # visibility (render_modules.py:169-176)
    visibility_module: Optional[Any] = None
    # optional envmap-brightness importance sampler: the last
    # percent_bright fraction of each sample's bounce rays are drawn
    # toward bright texels instead of the GGX lobe (reference
    # pt_selectors.py:52-54 commented bright_mask + ERBrightSampler)
    bright_sampler: Optional[Any] = None
    # decaying schedule scalars (leaves; frozen in the optimizer)
    min_rough: Any = 0.0
    std: Any = 0.0

    # static configuration (configs/model/microfacet_tensorf2.yaml)
    anoise: float = struct.field(pytree_node=False, default=0.25)
    rays_per_ray: int = struct.field(pytree_node=False, default=128)
    test_rays_per_ray: int = struct.field(pytree_node=False, default=128)
    # flat bounce-ray budget per recursion level (TPU redesign of
    # max_brdf_rays=[650000, 450000]; sized per *batch* here)
    brdf_ray_budget: Tuple[int, ...] = struct.field(
        pytree_node=False, default=(65536, 16384))
    # retrace-ray buffer size per level (max_retrace_rays=[1000])
    max_retrace_rays: Tuple[int, ...] = struct.field(
        pytree_node=False, default=(1024,))
    conserve_energy: bool = struct.field(pytree_node=False, default=True)
    no_emitters: bool = struct.field(pytree_node=False, default=True)
    diffuse_mixing_mode: str = struct.field(
        pytree_node=False, default="fresnel")
    detach_N: bool = struct.field(pytree_node=False, default=False)
    detach_N_iters: int = struct.field(pytree_node=False, default=0)
    min_rough_decay: float = struct.field(pytree_node=False, default=0.999)
    std_decay: float = struct.field(pytree_node=False, default=1.0)
    std_decay_interval: int = struct.field(pytree_node=False, default=10)
    percent_bright: float = struct.field(pytree_node=False, default=0.0)
    # route the collision-heavy bounce-ray scatters (parent-gather backward
    # + composite segment sums; xplane: ~4.7 ms/step serialized) through
    # the Pallas bin-sum kernel (ops/pallas/binsum.py)
    scatter_kernel: bool = struct.field(pytree_node=False, default=False)
    cold_start_bg_iters: int = struct.field(pytree_node=False, default=0)
    freeze: bool = struct.field(pytree_node=False, default=False)
    russian_roulette: bool = struct.field(pytree_node=False, default=False)

    def needs_normals(self, recur: int) -> bool:
        return True

    @property
    def outputs(self):
        return {"diffuse": 3, "roughness": 1, "tint": 3, "spec": 3,
                "albedo": 3}

    def check_schedule(self, iteration: int, batch_mul: int = 1):
        new = self
        if iteration % 10 == 0:
            new = new.replace(min_rough=new.min_rough * self.min_rough_decay)
        if iteration % self.std_decay_interval == 0:
            new = new.replace(std=new.std * self.std_decay)
        if self.detach_N and iteration > batch_mul * self.detach_N_iters:
            new = new.replace(detach_N=False)
            return new, True  # static flip -> recompile
        return new, False

    def update_n_samples(self, n_samples):
        """No-op: the reference resizes its bounce budgets to the live
        sample count here (microfacet.py:241-268). Our budgets are
        compile-time statics; the adaptive role is played by (a)
        proportional allocation thinning in shade() — demand above the
        budget scales every sample's rays down by a common factor — and
        (b) eval_tier's precompiled test-time budget multipliers."""
        return self

    def calibrate(self, key, xyz, feat, bg_brightness):
        """Bias auto-tuning against background brightness
        (microfacet.py:79-96). Host-side; returns an updated model."""
        k1, k2 = jax.random.split(key)
        viewdirs = normalize(jax.random.uniform(k1, (xyz.shape[0], 3)))
        dm = self.diffuse_module.calibrate(
            bg_brightness, self.conserve_energy, xyz, viewdirs, feat)
        brdf = self.brdf.replace(
            init_val=0.5 if self.conserve_energy else 0.25)
        brdf = brdf.calibrate(k2, feat, bg_brightness)
        return self.replace(diffuse_module=dm, brdf=brdf)

    # ------------------------------------------------------------------
    def shade(self, xyz, xyz_normed, app_features, viewdirs, normals,
              weights, valid, B, render_reflection, bg_module, bg_cache,
              is_train, recur, key):
        """Flattened sample inputs of length M = B*K. Returns (rgb (M,3),
        debug dict)."""
        M = xyz.shape[0]
        keys = jax.random.split(key, 6)

        noise_app_features = app_features + jax.random.normal(
            keys[0], app_features.shape) * self.anoise
        std = self.std if is_train else 0.0
        albedo, tint, matprop = self.diffuse_module(
            xyz_normed, viewdirs, app_features, std=std, key=keys[1])

        # --- SH-convolved irradiance for diffuse (microfacet.py:304-318) ---
        if self.no_emitters and bg_module is not None:
            if bg_cache is not None and "sh_conv_coeffs" in bg_cache:
                conv_coeffs = bg_cache["sh_conv_coeffs"]
            else:
                _, conv_coeffs = bg_module.get_spherical_harmonics(
                    100, cache=bg_cache)
            evaled = sh.eval_sh_bases(conv_coeffs.shape[0], normals)
            if getattr(bg_module, "sh_grad", False):
                # opt-in extension (bg sh_grad=true): the envmap's SH
                # coefficients receive diffuse-shading gradient (coarse-
                # scale supervision); the normals path stays detached so
                # geometry training is unchanged
                E = (conv_coeffs[None]
                     * jax.lax.stop_gradient(evaled)[..., None]).sum(axis=1)
            else:
                # the irradiance is fully detached in the reference
                # (torch.no_grad + .detach(), microfacet.py:305-316): no
                # gradient flows into the envmap or the normals
                E = jax.lax.stop_gradient(
                    (jax.lax.stop_gradient(conv_coeffs)[None]
                     * evaled[..., None]).sum(axis=1))
            diffuse = albedo * E
        else:
            diffuse = albedo

        rays_per_ray = self.rays_per_ray if is_train else self.test_rays_per_ray
        budget = self.brdf_ray_budget[min(recur,
                                          len(self.brdf_ray_budget) - 1)]

        # --- bounce-ray allocation (pt_selectors.py:5-60, flattened) ---
        w = jnp.where(valid, weights, 0.0)
        # Proportional thinning: when the batch's total demand w*rays_per_ray
        # exceeds the static budget, scale EVERY sample's allocation by the
        # same factor instead of serving samples in flattened order until
        # the budget runs out. The positional cliff starved the tail of the
        # batch (zero bounce rays -> black, and pre-fallback zero gradient);
        # thinning keeps the estimator unbiased (each sample's incoming
        # light is a mean over its own kept rays) at slightly higher MC
        # variance, which is the correct static-shape analogue of the
        # reference's adaptive update_n_samples (microfacet.py:241-268).
        # 2% slack absorbs the stochastic-rounding noise (sd ~ sqrt(M)/2).
        demand = (w * rays_per_ray).sum()
        alloc_scale = jax.lax.stop_gradient(
            jnp.minimum(1.0, 0.98 * budget / jnp.clip(demand, 1.0)))
        pt_limit = (w * rays_per_ray * alloc_scale
                    + jax.random.uniform(keys[2], w.shape) - 0.5)
        counts = jnp.clip(jnp.floor(pt_limit), 0, 400).astype(jnp.int32)
        counts = jnp.where(valid, counts, 0)

        starts = jnp.cumsum(counts) - counts
        r_idx = jnp.arange(budget)
        # method='sort' beats the default binary-search scan ~3x on TPU
        # (one bitonic sort of M+R keys vs log2(M) serialized gather rounds)
        src = jnp.clip(
            jnp.searchsorted(starts, r_idx, side="right",
                             method="sort").astype(jnp.int32) - 1,
            0, M - 1)
        total = jnp.minimum(counts.sum(), budget)
        slot_valid = r_idx < total
        kept = jnp.minimum(jnp.maximum(
            jnp.minimum(starts + counts, budget)
            - jnp.minimum(starts, budget), 0), counts)  # rays kept per sample
        ray_count = jnp.clip(kept.astype(jnp.float32), 1e-8)

        # --- per-bounce-ray parent attributes: ONE packed row gather.
        # Separate per-attribute gathers each transpose to their own
        # (M)-row scatter-add in the backward (~2.4 ms apiece measured);
        # concatenating first makes it one gather + one scatter. Column
        # slicing still happens BEFORE the gather: a fused xyz[src, :3]
        # transposes to a 2D-index scatter that XLA serializes into a
        # 32k-iteration while loop (~100 ms). ---
        Cf = noise_app_features.shape[-1]
        parent = jnp.concatenate([
            viewdirs,                                   # 0:3
            normals,                                    # 3:6
            matprop["r1"][:, :1],                       # 6
            noise_app_features,                         # 7:7+Cf
            xyz[:, :3],                                 # +0:+3
            matprop["f0"],                              # +3:+6
            diffuse,                                    # +6:+9
            counts[:, None].astype(jnp.float32),        # +9 (exact: <=400)
            w[:, None],                                 # +10
            ray_count[:, None],                         # +11 (pre-RR)
            # starts only matter on valid slots, where they are < budget
            # and thus exact in f32
            starts[:, None].astype(jnp.float32),        # +12
        ], axis=-1)
        if self.scatter_kernel:
            P = take_rows_binsum(parent, src)
        else:
            P = parent[src]
        o = 7 + Cf
        bV = -P[:, 0:3]
        bN = P[:, 3:6]
        if self.detach_N:
            bN = jax.lax.stop_gradient(bN)
        bN = bN * jnp.sign((bV * bN).sum(-1, keepdims=True))
        r1 = P[:, 6]
        if is_train:
            r1 = jnp.clip(r1, self.min_rough)
        efeatures = P[:, 7:o]
        exyz = P[:, o:o + 3]
        bR0 = P[:, o + 3:o + 6]
        ediffuse = P[:, o + 6:o + 9]
        bcounts = P[:, o + 9]
        bw = P[:, o + 10]
        brc = P[:, o + 11]
        within = (r_idx - P[:, o + 12]).astype(jnp.int32)

        u1, u2 = hammersley_draw(keys[3], within,
                                 bcounts.astype(jnp.int32), src)
        L, basis, logD = self.brdf_sampler.sample(u1, u2, bV, bN, r1, r1)

        # --- optional bright-ray substitution: the LAST percent_bright
        # fraction of each sample's rays point at bright envmap texels
        # (the commented bright_mask split of pt_selectors.py:52-54 made
        # live). Estimator stays unbiased via the pdf ratio below. ---
        use_bright = (self.bright_sampler is not None
                      and self.percent_bright > 0 and bg_module is not None
                      and recur == 0)
        if use_bright:
            bdirs, bpdf = self.bright_sampler.sample(
                keys[5], bg_module, L.shape[0], cache=bg_cache)
            main = jnp.ceil(bcounts * (1.0 - self.percent_bright))
            bright_mask = ((within >= main.astype(jnp.int32))
                           & ((bdirs * bN).sum(-1) > 0) & slot_valid)
            L = jnp.where(bright_mask[:, None], bdirs, L)

        H = normalize((bV + L) / 2)
        local_v = jnp.einsum("rij,rj->ri", basis, bV)
        halfvec = jnp.einsum("rij,rj->ri", basis, H)
        diffvec = jnp.einsum("rij,rj->ri", basis, L)

        bright_w = None
        if use_bright:
            # the VNDF estimator folds brdf/pdf_ggx into brdf_weight; a ray
            # drawn from pdf_bright instead needs x pdf_ggx/pdf_bright
            ggx_p = self.brdf_sampler.compute_prob(
                diffvec, local_v, halfvec, r1, r1)
            ratio = jnp.clip(ggx_p / jnp.clip(bpdf, EPS), 0.0, 1e3)
            bright_w = jnp.where(bright_mask, ratio, 1.0)[:, None]
            bright_w = jax.lax.stop_gradient(bright_w)
            # footprint mip follows the actual sampling pdf
            logD = jnp.where(bright_mask,
                             jnp.log(jnp.clip(bpdf, EPS)), logD)
        samp_prob = jnp.exp(logD)

        mipval = -jnp.log(jnp.clip(bcounts, 1)) - logD
        bounce_rays = jnp.concatenate([exyz + L * 5e-3, L], axis=-1)

        sg = jax.lax.stop_gradient
        brdf_weight = self.brdf(
            bV, sg(L), sg(bN), sg(H), sg(local_v), sg(halfvec), sg(diffvec),
            efeatures, sg(r1), sg(r1))  # (R, 3)
        if bright_w is not None:
            brdf_weight = brdf_weight * bright_w

        # --- incoming light: envmap for all, retrace the top-T contributors
        #     (microfacet.py:475-563) ---
        incoming_light, _ = render_reflection(bounce_rays, mipval,
                                              retrace=False, rkey=keys[4])
        vis_loss = None
        if recur < len(self.max_retrace_rays) and bg_module is not None:
            T = self.max_retrace_rays[recur]
            per_sample_factor = bw / brc
            per_ray_factor = (
                brdf_weight.max(axis=-1)
                * ((bV * bN).sum(-1) > 0)
                * samp_prob)
            contribution = sg(per_ray_factor * per_sample_factor)
            if self.visibility_module is not None:
                # damp retrace priority by predicted visibility
                # (microfacet.py:497-505; the MLP reads (dir, features) --
                # its pts argument is unused there too)
                _, sigvis = self.visibility_module(
                    sg(exyz), sg(L), sg(efeatures))
                contribution = contribution * sg(1.0 - sigvis)
            contribution = jnp.where(slot_valid, contribution, -1.0)
            contribution = contribution / jnp.clip(contribution.sum(), EPS) * T
            contribution = contribution + jax.random.uniform(
                keys[4], contribution.shape)
            contribution = jnp.where(slot_valid, contribution, -1e9)
            top_idx = jax.lax.top_k(contribution, T)[1]
            retrace_rays = bounce_rays[top_idx]
            retrace_mip = mipval[top_idx]
            retraced, bg_vis = render_reflection(retrace_rays, retrace_mip,
                                                 retrace=True, rkey=keys[4])
            incoming_light = incoming_light.at[top_idx].set(retraced)
            if self.visibility_module is not None and bg_vis is not None:
                # fit sigvis to 1 - observed bg visibility of the retraced
                # rays (render_modules.py:169-176); inputs detached so the
                # gradient only trains the visibility MLP
                _, sv = self.visibility_module(
                    sg(exyz[top_idx]), sg(L[top_idx]),
                    sg(efeatures[top_idx]))
                tv = slot_valid[top_idx]
                vis_loss = (jnp.where(
                    tv, (sv - (1.0 - sg(bg_vis))) ** 2, 0.0).sum()
                    / jnp.clip(tv.sum(), 1))
            if self.russian_roulette:
                # a sample that owns retraced rays is represented ONLY by
                # them: its envmap-only rays are dropped and its ray_count
                # becomes the retrace count (microfacet.py:512-535)
                tvalid = slot_valid[top_idx]
                num_retrace = segment_sum_to(
                    tvalid[:, None].astype(jnp.float32), src[top_idx],
                    tvalid, M, binsum=self.scatter_kernel)[:, 0]
                rtmask = num_retrace > 0
                ray_count = jnp.where(rtmask, num_retrace, ray_count)
                retraced_slot = jnp.zeros(budget, bool).at[top_idx].set(
                    tvalid)
                slot_valid = slot_valid & (retraced_slot | ~rtmask[src])

        # --- composite bounce rays back onto samples (row_mask_sum ->
        #     segment_sum; microfacet.py:565-619). All segment sums share
        # src, so they ride ONE packed scatter-add. ---
        if (self.russian_roulette and recur < len(self.max_retrace_rays)
                and bg_module is not None):
            erc = ray_count[src][:, None]   # RR rewrote ray_count: re-gather
        else:
            erc = brc[:, None]

        def packed_segment_sum(parts):
            out = segment_sum_to(jnp.concatenate(parts, axis=-1) / erc,
                                 src, slot_valid, M,
                                 binsum=self.scatter_kernel)
            sizes = np.cumsum([0] + [p.shape[-1] for p in parts])
            return [out[:, a:b] for a, b in zip(sizes[:-1], sizes[1:])]

        mode = self.diffuse_mixing_mode
        debug = {}
        if mode in ("fresnel", "fresnel_ind"):
            costheta = jnp.abs((-bV * H).sum(-1, keepdims=True))
            spec_reflectance = bR0 + (1 - bR0) * jnp.clip(
                1 - costheta, 0, 1) ** 5
            if mode == "fresnel":
                comb = (spec_reflectance * incoming_light * brdf_weight
                        + (1 - spec_reflectance) * ediffuse)
            else:
                comb = (spec_reflectance * incoming_light
                        + (1 - spec_reflectance) * ediffuse)
            spec, brdf_rgb, rgb = packed_segment_sum(
                [incoming_light, brdf_weight, comb])
            R0s = matprop["f0"]
            cth = jnp.abs((-viewdirs * normals).sum(-1, keepdims=True))
            sr = R0s + (1 - R0s) * jnp.clip(1 - cth, 0, 1) ** 5
            # Samples whose allocation ends up with zero slots (budget
            # truncation, or proportional thinning rounding a small
            # w*rays_per_ray*alloc_scale down to 0) otherwise composite to
            # BLACK — fresnel mixing folds the diffuse term into the
            # per-bounce-ray comb, so losing all slots loses the *known*
            # diffuse too. Fall back to the sample-level diffuse lobe (the
            # unknown specular term stays zero) for every contributing
            # (w > 0) sample.
            starved = ((w > 0) & (kept == 0))[:, None]
            rgb = jnp.where(starved, (1 - sr) * diffuse, rgb)
            debug["diffuse"] = (1 - sr) * diffuse
            debug["tint"] = (sr * brdf_rgb if mode == "fresnel" else sr)
        elif mode == "no_diffuse":
            spec, brdf_rgb, rgb = packed_segment_sum(
                [incoming_light, brdf_weight, incoming_light * brdf_weight])
            debug["diffuse"] = diffuse
            debug["tint"] = brdf_rgb
        else:  # 'lambda'
            spec, brdf_rgb, tinted = packed_segment_sum(
                [incoming_light, brdf_weight, incoming_light * brdf_weight])
            lam = tint.mean(axis=-1, keepdims=True)
            rgb = lam * tinted + (1 - lam) * diffuse
            rgb = jnp.where(counts[:, None] > 0, rgb, 0.0)
            debug["diffuse"] = diffuse * (1 - lam)
            debug["tint"] = brdf_rgb * lam

        debug["roughness"] = matprop["r1"]
        debug["spec"] = spec
        debug["albedo"] = albedo
        # Telemetry: the proportional-thinning factor actually applied this
        # batch (1.0 = demand fit the budget; 0.25 = every sample got a
        # quarter of the bounce rays it asked for, i.e. 4x the MC variance
        # the budgets were sized for). Scalar; popped into stats by render().
        debug["__thin_scale"] = alloc_scale
        if vis_loss is not None:
            # scalar; popped into stats by render() (not a per-sample map)
            debug["__visibility_loss"] = vis_loss
        return rgb, debug


def init_microfacet(key, app_dim, diffuse_module=None, brdf=None,
                    brdf_sampler=None, min_rough_start=0.0, start_std=0.0,
                    **kwargs):
    from ..modules.brdf import init_mlp_brdf
    from ..modules.ish import ListISH
    from ..modules.render_modules import init_rand_hydra_diffuse

    k1, k2 = jax.random.split(key)
    if diffuse_module is None:
        diffuse_module = init_rand_hydra_diffuse(k1, app_dim)
    if brdf is None:
        brdf = init_mlp_brdf(k2, app_dim, h_encoder=ListISH((0, 1, 2, 4)),
                             d_encoder=ListISH((0, 1, 2, 4)))
    if brdf_sampler is None:
        brdf_sampler = GGXSampler()
    conserve = kwargs.get("conserve_energy", True)
    brdf = brdf.replace(init_val=0.5 if conserve else 0.25)
    static_keys = {f.name for f in Microfacet.__dataclass_fields__.values()}
    kwargs = {k: v for k, v in kwargs.items()
              if k in static_keys and k not in (
                  "diffuse_module", "brdf", "brdf_sampler", "min_rough",
                  "std")}
    # detach_N starts True only if the schedule will ever un-detach
    # (reference microfacet.py:71,117-118 with detach_N_iters)
    kwargs.setdefault("detach_N", kwargs.get("detach_N_iters", 0) > 0)
    return Microfacet(
        diffuse_module=diffuse_module, brdf=brdf, brdf_sampler=brdf_sampler,
        min_rough=jnp.asarray(min_rough_start),
        std=jnp.asarray(start_std), **kwargs)
