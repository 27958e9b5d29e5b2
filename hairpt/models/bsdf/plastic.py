"""Plastic / rough-plastic / rough-conductor families.

References: src/bsdfs/plastic.cpp, roughplastic.cpp, roughconductor.cpp.
roughplastic is the material of the furball/curly-hair/hair-curl north-star
scenes (GGX α, nonlinear=false, diffuseReflectance per clump).

Microfacet distribution kind is a per-lane value (scenes may mix GGX and
Beckmann materials); both closed forms are cheap VPU math, so we evaluate
both and lane-select — branchless, TPU-friendly.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...core import warps
from ...core.math import normalize, reflect_z
from . import microfacet as mf
from . import registry as R
from .fresnel import fresnel_dielectric, fresnel_conductor

INV_PI = 1.0 / jnp.pi


def _cos(w):
    return w[..., 2]


def _dyn_ndf(dist, alpha, m):
    return jnp.where(dist == mf.GGX, mf.ndf(mf.GGX, alpha, m),
                     mf.ndf(mf.BECKMANN, alpha, m))


def _dyn_g(dist, alpha, wi, wo, m):
    return jnp.where(dist == mf.GGX, mf.g(mf.GGX, alpha, wi, wo, m),
                     mf.g(mf.BECKMANN, alpha, wi, wo, m))


def _dyn_sample_m(dist, alpha, wi, u2):
    m_g, p_g = mf.sample_visible(mf.GGX, alpha, wi, u2)
    m_b, p_b = mf.sample_all(mf.BECKMANN, alpha, u2)
    sel = (dist == mf.GGX)
    return (jnp.where(sel[..., None], m_g, m_b), jnp.where(sel, p_g, p_b))


def _dyn_pdf_m(dist, alpha, wi, m):
    p_g = mf.pdf_visible(mf.GGX, alpha, wi, m)
    p_b = mf.ndf(mf.BECKMANN, alpha, m) * jnp.maximum(m[..., 2], 0.0)
    return jnp.where(dist == mf.GGX, p_g, p_b)


def _half(wi, wo):
    return normalize(wi + wo)


# ---------------------------------------------------------------------------
# smooth plastic (reference: plastic.cpp — delta spec + compensated diffuse)
# ---------------------------------------------------------------------------

class Plastic:
    @staticmethod
    def _diffuse_term(gm, wi, wo):
        F_i, _ = fresnel_dielectric(_cos(wi), gm.eta)
        F_o, _ = fresnel_dielectric(_cos(wo), gm.eta)
        inv_eta2 = 1.0 / (gm.eta * gm.eta)
        diff = gm.diffuse
        comp = jnp.where(gm.nonlinear[..., None],
                         1.0 - diff * gm.int_fdr[..., None],
                         (1.0 - gm.int_fdr)[..., None])
        diff = diff / jnp.maximum(comp, 1e-6)
        return diff * (INV_PI * jnp.maximum(_cos(wo), 0.0)
                       * (1.0 - F_i) * (1.0 - F_o) * inv_eta2)[..., None]

    @staticmethod
    def _prob_spec(gm, wi):
        F_i, _ = fresnel_dielectric(_cos(wi), gm.eta)
        sw = gm.spec_weight
        return (F_i * sw) / jnp.maximum(F_i * sw + (1.0 - F_i) * (1.0 - sw),
                                        1e-7)

    @staticmethod
    def eval_pdf(gm, wi, wo, aux):
        valid = (_cos(wi) > 0) & (_cos(wo) > 0)
        f = Plastic._diffuse_term(gm, wi, wo)
        p_spec = Plastic._prob_spec(gm, wi)
        pdf = warps.square_to_cosine_hemisphere_pdf(wo) * (1.0 - p_spec)
        return jnp.where(valid[..., None], f, 0.0), jnp.where(valid, pdf, 0.0)

    @staticmethod
    def sample(gm, wi, u_lobe, u2, u2b, aux):
        n = wi.shape[:-1]
        valid = _cos(wi) > 0
        F_i, _ = fresnel_dielectric(_cos(wi), gm.eta)
        p_spec = Plastic._prob_spec(gm, wi)
        choose_spec = u_lobe <= p_spec

        wo_spec = reflect_z(wi)
        wo_diff = warps.square_to_cosine_hemisphere(u2)
        wo = jnp.where(choose_spec[..., None], wo_spec, wo_diff)

        w_spec = gm.specular * (F_i / jnp.maximum(p_spec, 1e-7))[..., None]
        diff_pdf = warps.square_to_cosine_hemisphere_pdf(wo_diff) \
            * (1.0 - p_spec)
        w_diff = Plastic._diffuse_term(gm, wi, wo_diff) \
            / jnp.maximum(diff_pdf, 1e-9)[..., None]
        weight = jnp.where(choose_spec[..., None], w_spec, w_diff)
        weight = jnp.where(valid[..., None], weight, 0.0)
        pdf = jnp.where(choose_spec, p_spec, diff_pdf)
        pdf = jnp.where(valid, pdf, 0.0)
        return wo, weight, pdf, choose_spec, jnp.ones(n, jnp.float32)


# ---------------------------------------------------------------------------
# rough plastic (reference: roughplastic.cpp)
# ---------------------------------------------------------------------------

class RoughPlastic:
    @staticmethod
    def _diffuse_term(gm, wi, wo):
        T12 = R.ext_trans_lookup(gm, _cos(wi))
        T21 = R.ext_trans_lookup(gm, _cos(wo))
        inv_eta2 = 1.0 / (gm.eta * gm.eta)
        diff = gm.diffuse
        comp = jnp.where(gm.nonlinear[..., None],
                         1.0 - diff * gm.int_fdr[..., None],
                         (1.0 - gm.int_fdr)[..., None])
        diff = diff / jnp.maximum(comp, 1e-6)
        return diff * (INV_PI * jnp.maximum(_cos(wo), 0.0)
                       * T12 * T21 * inv_eta2)[..., None]

    @staticmethod
    def _prob_spec(gm, wi):
        p = 1.0 - R.ext_trans_lookup(gm, _cos(wi))
        sw = gm.spec_weight
        return (p * sw) / jnp.maximum(p * sw + (1.0 - p) * (1.0 - sw), 1e-7)

    @staticmethod
    def eval_pdf(gm, wi, wo, aux):
        valid = (_cos(wi) > 0) & (_cos(wo) > 0)
        m = _half(wi, wo)
        D = _dyn_ndf(gm.dist, gm.alpha, m)
        G = _dyn_g(gm.dist, gm.alpha, wi, wo, m)
        F, _ = fresnel_dielectric(jnp.sum(wi * m, axis=-1), gm.eta)
        spec = gm.specular * (F * D * G
                              / jnp.maximum(4.0 * _cos(wi), 1e-7))[..., None]
        f = spec + RoughPlastic._diffuse_term(gm, wi, wo)

        p_spec = RoughPlastic._prob_spec(gm, wi)
        pdf_m = _dyn_pdf_m(gm.dist, gm.alpha, wi, m)
        pdf_s = mf.half_vector_to_wo_pdf(pdf_m, wo, m)
        pdf = p_spec * pdf_s + (1.0 - p_spec) \
            * warps.square_to_cosine_hemisphere_pdf(wo)
        return jnp.where(valid[..., None], f, 0.0), jnp.where(valid, pdf, 0.0)

    @staticmethod
    def sample(gm, wi, u_lobe, u2, u2b, aux):
        n = wi.shape[:-1]
        valid = _cos(wi) > 0
        p_spec = RoughPlastic._prob_spec(gm, wi)
        choose_spec = u_lobe <= p_spec

        m, _ = _dyn_sample_m(gm.dist, gm.alpha, wi, u2)
        wo_spec = 2.0 * jnp.sum(wi * m, axis=-1, keepdims=True) * m - wi
        wo_diff = warps.square_to_cosine_hemisphere(u2b)
        wo = jnp.where(choose_spec[..., None], wo_spec, wo_diff)

        f, pdf = RoughPlastic.eval_pdf(gm, wi, wo, aux)
        ok = valid & (pdf > 1e-9) & (_cos(wo) > 0)
        weight = jnp.where(ok[..., None],
                           f / jnp.maximum(pdf, 1e-9)[..., None], 0.0)
        pdf = jnp.where(ok, pdf, 0.0)
        return wo, weight, pdf, jnp.zeros(n, bool), jnp.ones(n, jnp.float32)


# ---------------------------------------------------------------------------
# rough conductor (reference: roughconductor.cpp)
# ---------------------------------------------------------------------------

class RoughConductor:
    @staticmethod
    def eval_pdf(gm, wi, wo, aux):
        valid = (_cos(wi) > 0) & (_cos(wo) > 0)
        m = _half(wi, wo)
        D = _dyn_ndf(gm.dist, gm.alpha, m)
        G = _dyn_g(gm.dist, gm.alpha, wi, wo, m)
        F = fresnel_conductor(jnp.abs(jnp.sum(wi * m, axis=-1)),
                              jnp.broadcast_to(gm.eta[..., None], gm.k.shape),
                              gm.k)
        f = gm.specular * F * (D * G
                               / jnp.maximum(4.0 * _cos(wi), 1e-7))[..., None]
        pdf_m = _dyn_pdf_m(gm.dist, gm.alpha, wi, m)
        pdf = mf.half_vector_to_wo_pdf(pdf_m, wo, m)
        return jnp.where(valid[..., None], f, 0.0), jnp.where(valid, pdf, 0.0)

    @staticmethod
    def sample(gm, wi, u_lobe, u2, u2b, aux):
        n = wi.shape[:-1]
        m, _ = _dyn_sample_m(gm.dist, gm.alpha, wi, u2)
        wo = 2.0 * jnp.sum(wi * m, axis=-1, keepdims=True) * m - wi
        f, pdf = RoughConductor.eval_pdf(gm, wi, wo, aux)
        ok = (pdf > 1e-9) & (_cos(wo) > 0) & (_cos(wi) > 0)
        weight = jnp.where(ok[..., None],
                           f / jnp.maximum(pdf, 1e-9)[..., None], 0.0)
        return wo, weight, jnp.where(ok, pdf, 0.0), jnp.zeros(n, bool), \
            jnp.ones(n, jnp.float32)


R.register(R.PLASTIC, Plastic)
R.register(R.ROUGHPLASTIC, RoughPlastic)
R.register(R.ROUGHCONDUCTOR, RoughConductor)
