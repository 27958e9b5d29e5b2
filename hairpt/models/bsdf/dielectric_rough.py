"""Rough dielectric (GGX/Beckmann microfacet refraction, Walter et al. 07)
and diffuse transmitter.

References: src/bsdfs/roughdielectric.cpp, src/bsdfs/difftrans.cpp.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...core import warps
from ...core.math import normalize, safe_sqrt
from . import registry as R
from .fresnel import fresnel_dielectric
from .plastic import _dyn_ndf, _dyn_g, _dyn_sample_m, _dyn_pdf_m

INV_PI = 1.0 / jnp.pi


def _cos(w):
    return w[..., 2]


class RoughDielectric:
    """Microfacet reflection+refraction. eta = int/ext; handles both sides."""

    @staticmethod
    def _half_refl(wi, wo):
        # reflection half-vector oriented to +z
        h = wi + wo
        h = h * jnp.sign(_cos(wi))[..., None]
        return normalize(h)

    @staticmethod
    def _half_trans(wi, wo, eta):
        # ht = -(eta_i wi + eta_o wo); orient to +z
        eta_i = jnp.where(_cos(wi) > 0, 1.0, eta)
        eta_o = jnp.where(_cos(wi) > 0, eta, 1.0)
        h = -(eta_i[..., None] * wi + eta_o[..., None] * wo)
        h = h * jnp.sign(h[..., 2:3])
        return normalize(h), eta_i, eta_o

    @staticmethod
    def eval_pdf(gm, wi, wo, aux):
        n = wi.shape[:-1]
        ci = _cos(wi)
        co = _cos(wo)
        reflect = ci * co > 0
        eta = gm.eta

        # --- reflection branch ---
        m_r = RoughDielectric._half_refl(wi, wo)
        wi_u = wi * jnp.sign(ci)[..., None]
        wo_u = wo * jnp.sign(ci)[..., None]
        # χ⁺: both directions on the front side of the microfacet
        side_r = (jnp.sum(wi_u * m_r, axis=-1) > 0) \
            & (jnp.sum(wo_u * m_r, axis=-1) > 0)
        F_r, _ = fresnel_dielectric(jnp.sum(wi * m_r, axis=-1)
                                    * jnp.sign(ci), eta)
        D_r = _dyn_ndf(gm.dist, gm.alpha, m_r)
        G_r = _dyn_g(gm.dist, gm.alpha, wi_u, wo_u, m_r)
        f_refl = gm.specular * (jnp.where(side_r, F_r * D_r * G_r, 0.0)
                                / jnp.maximum(4.0 * jnp.abs(ci),
                                              1e-7))[..., None]

        # --- transmission branch ---
        m_t, eta_i, eta_o = RoughDielectric._half_trans(wi, wo, eta)
        idm = jnp.sum(wi * m_t, axis=-1)
        odm = jnp.sum(wo * m_t, axis=-1)
        # χ⁺: wi and wo on opposite sides of the microfacet, wi on its front
        side_t = (idm * odm < 0) & (idm * ci > 0)
        F_t, _ = fresnel_dielectric(idm * jnp.sign(ci), eta)
        D_t = _dyn_ndf(gm.dist, gm.alpha, m_t)
        wo_t = wo * jnp.sign(co)[..., None]
        G_t = _dyn_g(gm.dist, gm.alpha, wi_u, wo_t, m_t)
        denom = eta_i * idm + eta_o * odm
        jac = eta_o ** 2 * jnp.abs(odm) / jnp.maximum(denom * denom, 1e-12)
        f_tr = gm.transmit * jnp.where(
            side_t,
            jnp.abs(idm) * jac * (1.0 - F_t) * D_t * G_t
            / jnp.maximum(jnp.abs(ci), 1e-7), 0.0)[..., None]
        # radiance transport compression
        eta_rel = jnp.where(ci > 0, eta, 1.0 / eta)
        f_tr = f_tr / (eta_rel * eta_rel)[..., None]

        f = jnp.where(reflect[..., None], f_refl, f_tr)
        valid = jnp.abs(ci) > 1e-6
        f = jnp.where(valid[..., None], f, 0.0)

        # pdfs
        pdf_m_r = _dyn_pdf_m(gm.dist, gm.alpha, wi_u, m_r)
        pdf_refl = jnp.where(side_r,
                             pdf_m_r / jnp.maximum(
                                 4.0 * jnp.abs(jnp.sum(wo * m_r, -1)), 1e-7)
                             * F_r, 0.0)
        pdf_m_t = _dyn_pdf_m(gm.dist, gm.alpha, wi_u, m_t)
        pdf_tr = jnp.where(side_t, pdf_m_t * jac * (1.0 - F_t), 0.0)
        pdf = jnp.where(reflect, pdf_refl, pdf_tr)
        pdf = jnp.where(valid, pdf, 0.0)
        return f, pdf

    @staticmethod
    def sample(gm, wi, u_lobe, u2, u2b, aux):
        n = wi.shape[:-1]
        ci = _cos(wi)
        sign_i = jnp.sign(jnp.where(ci == 0, 1.0, ci))
        wi_u = wi * sign_i[..., None]
        m_u, _ = _dyn_sample_m(gm.dist, gm.alpha, wi_u, u2)
        m = m_u * sign_i[..., None]

        idm = jnp.sum(wi * m, axis=-1)
        F, cos_t = fresnel_dielectric(idm * sign_i, gm.eta)
        choose_r = u_lobe <= F

        wo_r = 2.0 * idm[..., None] * m - wi
        # refraction about m
        eta_rel = jnp.where(ci > 0, gm.eta, 1.0 / gm.eta)
        inv_eta = 1.0 / eta_rel
        c = idm
        sign_c = jnp.sign(jnp.where(c == 0, 1.0, c))
        cos_t_m = safe_sqrt(1.0 - inv_eta ** 2 * (1.0 - c * c))
        wo_t = (inv_eta * c - sign_c * cos_t_m)[..., None] * m \
            - inv_eta[..., None] * wi
        wo = jnp.where(choose_r[..., None], wo_r, wo_t)
        wo = normalize(wo)

        f, pdf = RoughDielectric.eval_pdf(gm, wi, wo, aux)
        ok = pdf > 1e-9
        weight = jnp.where(ok[..., None],
                           f / jnp.maximum(pdf, 1e-9)[..., None], 0.0)
        eta_s = jnp.where(choose_r, 1.0, eta_rel)
        return wo, weight, jnp.where(ok, pdf, 0.0), jnp.zeros(n, bool), eta_s


class DiffTrans:
    """Purely diffuse transmission (reference: difftrans.cpp)."""

    @staticmethod
    def eval_pdf(gm, wi, wo, aux):
        valid = _cos(wi) * _cos(wo) < 0
        f = gm.transmit * (INV_PI * jnp.abs(_cos(wo)))[..., None]
        pdf = jnp.abs(_cos(wo)) * INV_PI
        return jnp.where(valid[..., None], f, 0.0), jnp.where(valid, pdf, 0.0)

    @staticmethod
    def sample(gm, wi, u_lobe, u2, u2b, aux):
        n = wi.shape[:-1]
        wo = warps.square_to_cosine_hemisphere(u2)
        wo = wo * jnp.where(_cos(wi) > 0, -1.0, 1.0)[..., None]
        pdf = jnp.abs(_cos(wo)) * INV_PI
        weight = jnp.broadcast_to(gm.transmit, wi.shape)
        return wo, weight, pdf, jnp.zeros(n, bool), jnp.ones(n, jnp.float32)


R.register(R.ROUGHDIELECTRIC, RoughDielectric)
R.register(R.DIFFTRANS, DiffTrans)
