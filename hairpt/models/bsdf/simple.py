"""Basic BSDF families: diffuse, rough (Oren-Nayar) diffuse, smooth
conductor/dielectric/thindielectric, phong, ward, null.

References: src/bsdfs/{diffuse,roughdiffuse,conductor,dielectric,
thindielectric,phong,ward,null}.cpp — behavior reproduced, implementation
vectorized/branchless.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...core import warps
from ...core.math import safe_sqrt, normalize, reflect_z
from .fresnel import fresnel_dielectric, fresnel_conductor
from . import registry as R

INV_PI = 1.0 / jnp.pi


def _cos(w):
    return w[..., 2]


def _zero_sample(wi):
    n = wi.shape[:-1]
    return (jnp.zeros_like(wi), jnp.zeros(n + (3,), jnp.float32),
            jnp.zeros(n, jnp.float32), jnp.zeros(n, bool),
            jnp.ones(n, jnp.float32))


# ---------------------------------------------------------------------------
# diffuse
# ---------------------------------------------------------------------------

class Diffuse:
    @staticmethod
    def eval_pdf(gm, wi, wo, aux):
        valid = (_cos(wi) > 0) & (_cos(wo) > 0)
        f = gm.diffuse * (INV_PI * jnp.maximum(_cos(wo), 0.0))[..., None]
        pdf = warps.square_to_cosine_hemisphere_pdf(wo)
        return jnp.where(valid[..., None], f, 0.0), jnp.where(valid, pdf, 0.0)

    @staticmethod
    def sample(gm, wi, u_lobe, u2, u2b, aux):
        wo = warps.square_to_cosine_hemisphere(u2)
        valid = _cos(wi) > 0
        weight = jnp.where(valid[..., None], gm.diffuse, 0.0)
        pdf = jnp.where(valid, warps.square_to_cosine_hemisphere_pdf(wo), 0.0)
        n = wi.shape[:-1]
        return wo, weight, pdf, jnp.zeros(n, bool), jnp.ones(n, jnp.float32)


# ---------------------------------------------------------------------------
# roughdiffuse (Oren-Nayar, fast approximation as in the reference's default)
# ---------------------------------------------------------------------------

class RoughDiffuse:
    @staticmethod
    def eval_pdf(gm, wi, wo, aux):
        valid = (_cos(wi) > 0) & (_cos(wo) > 0)
        # conversion beckmann-alpha → Oren-Nayar sigma, reference
        # roughdiffuse.cpp:151
        sigma = gm.alpha / jnp.sqrt(2.0)
        sigma2 = sigma * sigma
        a = 1.0 - sigma2 / (2.0 * (sigma2 + 0.33))
        b = 0.45 * sigma2 / (sigma2 + 0.09)
        ct_i, ct_o = _cos(wi), _cos(wo)
        st_i = safe_sqrt(1 - ct_i * ct_i)
        st_o = safe_sqrt(1 - ct_o * ct_o)
        # cos(phi_i - phi_o)
        denom = jnp.maximum(st_i * st_o, 1e-7)
        cos_dphi = jnp.clip((wi[..., 0] * wo[..., 0] + wi[..., 1] * wo[..., 1])
                            / denom, -1.0, 1.0)
        sin_alpha = jnp.maximum(st_i, st_o)
        tan_beta = jnp.minimum(st_i, st_o) / jnp.maximum(
            jnp.minimum(ct_i, ct_o), 1e-4)
        f = gm.diffuse * (INV_PI * jnp.maximum(ct_o, 0.0)
                          * (a + b * jnp.maximum(cos_dphi, 0.0)
                             * sin_alpha * tan_beta))[..., None]
        pdf = warps.square_to_cosine_hemisphere_pdf(wo)
        return jnp.where(valid[..., None], f, 0.0), jnp.where(valid, pdf, 0.0)

    @staticmethod
    def sample(gm, wi, u_lobe, u2, u2b, aux):
        wo = warps.square_to_cosine_hemisphere(u2)
        f, pdf = RoughDiffuse.eval_pdf(gm, wi, wo, aux)
        weight = f / jnp.maximum(pdf, 1e-12)[..., None]
        n = wi.shape[:-1]
        return wo, weight, pdf, jnp.zeros(n, bool), jnp.ones(n, jnp.float32)


# ---------------------------------------------------------------------------
# smooth conductor (also "mirror" with F ≡ 1 via k-free params)
# ---------------------------------------------------------------------------

class Conductor:
    @staticmethod
    def eval_pdf(gm, wi, wo, aux):
        n = wi.shape[:-1]
        return jnp.zeros(n + (3,), jnp.float32), jnp.zeros(n, jnp.float32)

    @staticmethod
    def sample(gm, wi, u_lobe, u2, u2b, aux):
        n = wi.shape[:-1]
        wo = reflect_z(wi)
        valid = _cos(wi) > 0
        F = fresnel_conductor(jnp.abs(_cos(wi)),
                              jnp.broadcast_to(gm.eta[..., None], gm.k.shape),
                              gm.k)
        weight = jnp.where(valid[..., None], gm.specular * F, 0.0)
        pdf = jnp.where(valid, 1.0, 0.0)
        return wo, weight, pdf, jnp.ones(n, bool), jnp.ones(n, jnp.float32)


# ---------------------------------------------------------------------------
# smooth dielectric
# ---------------------------------------------------------------------------

def _refract_z(wi, cos_t, eta_rel):
    """Refract across z=0 given signed cos_theta_t and relative ior."""
    scale = jnp.where(_cos(wi) >= 0, 1.0 / eta_rel, eta_rel)
    return jnp.stack([-wi[..., 0] * scale, -wi[..., 1] * scale, cos_t],
                     axis=-1)


class Dielectric:
    @staticmethod
    def eval_pdf(gm, wi, wo, aux):
        n = wi.shape[:-1]
        return jnp.zeros(n + (3,), jnp.float32), jnp.zeros(n, jnp.float32)

    @staticmethod
    def sample(gm, wi, u_lobe, u2, u2b, aux):
        n = wi.shape[:-1]
        F, cos_t = fresnel_dielectric(_cos(wi), gm.eta)
        choose_r = u_lobe <= F
        wo_r = reflect_z(wi)
        eta_rel = jnp.where(_cos(wi) >= 0, gm.eta, 1.0 / gm.eta)
        wo_t = _refract_z(wi, cos_t, gm.eta)
        wo = jnp.where(choose_r[..., None], wo_r, wo_t)
        # radiance transport: solid-angle compression factor 1/eta_rel^2
        factor = 1.0 / (eta_rel * eta_rel)
        weight = jnp.where(choose_r[..., None], gm.specular,
                           gm.transmit * factor[..., None])
        pdf = jnp.where(choose_r, F, 1.0 - F)
        eta_s = jnp.where(choose_r, 1.0, eta_rel)
        return wo, weight, pdf, jnp.ones(n, bool), eta_s


# ---------------------------------------------------------------------------
# thin dielectric (reference: thindielectric.cpp — R' = R + TRT + TR^3T...)
# ---------------------------------------------------------------------------

class ThinDielectric:
    @staticmethod
    def eval_pdf(gm, wi, wo, aux):
        n = wi.shape[:-1]
        return jnp.zeros(n + (3,), jnp.float32), jnp.zeros(n, jnp.float32)

    @staticmethod
    def sample(gm, wi, u_lobe, u2, u2b, aux):
        n = wi.shape[:-1]
        F, _ = fresnel_dielectric(jnp.abs(_cos(wi)), gm.eta)
        T = 1.0 - F
        Rp = jnp.where(F < 1.0, F + T * T * F / (1.0 - F * F + 1e-12), F)
        choose_r = u_lobe <= Rp
        wo = jnp.where(choose_r[..., None], reflect_z(wi), -wi)
        weight = jnp.where(choose_r[..., None], gm.specular, gm.transmit)
        pdf = jnp.where(choose_r, Rp, 1.0 - Rp)
        return wo, weight, pdf, jnp.ones(n, bool), jnp.ones(n, jnp.float32)


# ---------------------------------------------------------------------------
# null (pass-through; reference: null.cpp)
# ---------------------------------------------------------------------------

class Null:
    @staticmethod
    def eval_pdf(gm, wi, wo, aux):
        n = wi.shape[:-1]
        return jnp.zeros(n + (3,), jnp.float32), jnp.zeros(n, jnp.float32)

    @staticmethod
    def sample(gm, wi, u_lobe, u2, u2b, aux):
        n = wi.shape[:-1]
        return (-wi, jnp.broadcast_to(gm.transmit, wi.shape),
                jnp.ones(n, jnp.float32), jnp.ones(n, bool),
                jnp.ones(n, jnp.float32))


# ---------------------------------------------------------------------------
# modified Phong (reference: phong.cpp)
# ---------------------------------------------------------------------------

class Phong:
    @staticmethod
    def eval_pdf(gm, wi, wo, aux):
        valid = (_cos(wi) > 0) & (_cos(wo) > 0)
        alpha = jnp.sum(wo * reflect_z(wi), axis=-1)
        e = gm.exponent
        spec = jnp.where((alpha > 0)[..., None],
                         gm.specular * ((e + 2.0) * warps.INV_TWOPI
                                        * jnp.power(jnp.maximum(alpha, 1e-12),
                                                    e))[..., None],
                         0.0)
        f = (spec + gm.diffuse * INV_PI) * jnp.maximum(_cos(wo), 0.0)[..., None]
        spec_pdf = warps.phong_lobe_pdf(jnp.maximum(alpha, 0.0), e)
        diff_pdf = warps.square_to_cosine_hemisphere_pdf(wo)
        pdf = gm.spec_weight * spec_pdf + (1.0 - gm.spec_weight) * diff_pdf
        return jnp.where(valid[..., None], f, 0.0), jnp.where(valid, pdf, 0.0)

    @staticmethod
    def sample(gm, wi, u_lobe, u2, u2b, aux):
        from ...core.math import frame_from_normal
        choose_spec = u_lobe <= gm.spec_weight
        local = warps.square_to_phong_lobe(u2, gm.exponent)
        refl = reflect_z(wi)
        f_r = frame_from_normal(normalize(refl))
        wo_spec = f_r.to_world(local)
        wo_diff = warps.square_to_cosine_hemisphere(u2)
        wo = jnp.where(choose_spec[..., None], wo_spec, wo_diff)
        f, pdf = Phong.eval_pdf(gm, wi, wo, aux)
        weight = jnp.where(pdf[..., None] > 0, f / jnp.maximum(pdf, 1e-12)[..., None], 0.0)
        n = wi.shape[:-1]
        return wo, weight, pdf, jnp.zeros(n, bool), jnp.ones(n, jnp.float32)


# ---------------------------------------------------------------------------
# Ward (balanced variant, isotropic; reference: ward.cpp)
# ---------------------------------------------------------------------------

class Ward:
    @staticmethod
    def eval_pdf(gm, wi, wo, aux):
        valid = (_cos(wi) > 0) & (_cos(wo) > 0)
        a = gm.alpha
        h = wi + wo
        h2 = jnp.sum(h * h, axis=-1)
        h_len = jnp.sqrt(jnp.maximum(h2, 1e-20))
        hz = h[..., 2] / h_len
        tan_h2 = jnp.maximum(1 - hz * hz, 0) / jnp.maximum(hz * hz, 1e-12)
        exp_term = jnp.exp(-tan_h2 / jnp.maximum(a * a, 1e-12))
        spec = exp_term / jnp.maximum(
            4.0 * jnp.pi * a * a * jnp.sqrt(jnp.maximum(_cos(wi) * _cos(wo),
                                                        1e-8)), 1e-12)
        f = (gm.specular * spec[..., None] + gm.diffuse * INV_PI) \
            * jnp.maximum(_cos(wo), 0.0)[..., None]
        # pdf: gaussian half-vector distribution (with the dωh→dωo Jacobian)
        # mixed with a cosine lobe
        spec_pdf = exp_term / jnp.maximum(
            jnp.pi * a * a * hz ** 3 * 4.0
            * jnp.abs(jnp.sum(h / h_len[..., None] * wo, axis=-1)), 1e-12)
        diff_pdf = warps.square_to_cosine_hemisphere_pdf(wo)
        pdf = gm.spec_weight * spec_pdf + (1 - gm.spec_weight) * diff_pdf
        return jnp.where(valid[..., None], f, 0.0), jnp.where(valid, pdf, 0.0)

    @staticmethod
    def sample(gm, wi, u_lobe, u2, u2b, aux):
        a = gm.alpha
        choose_spec = u_lobe <= gm.spec_weight
        phi_h = 2 * jnp.pi * u2[..., 1]
        tan_h = a * jnp.sqrt(-jnp.log(jnp.maximum(1 - u2[..., 0], 1e-12)))
        cos_h = 1.0 / jnp.sqrt(1.0 + tan_h * tan_h)
        sin_h = safe_sqrt(1 - cos_h * cos_h)
        h = jnp.stack([sin_h * jnp.cos(phi_h), sin_h * jnp.sin(phi_h), cos_h],
                      axis=-1)
        wo_spec = 2.0 * jnp.sum(wi * h, axis=-1, keepdims=True) * h - wi
        wo_diff = warps.square_to_cosine_hemisphere(u2)
        wo = jnp.where(choose_spec[..., None], wo_spec, wo_diff)
        f, pdf = Ward.eval_pdf(gm, wi, wo, aux)
        weight = jnp.where(pdf[..., None] > 0,
                           f / jnp.maximum(pdf, 1e-12)[..., None], 0.0)
        n = wi.shape[:-1]
        return wo, weight, pdf, jnp.zeros(n, bool), jnp.ones(n, jnp.float32)


R.register(R.DIFFUSE, Diffuse)
R.register(R.ROUGHDIFFUSE, RoughDiffuse)
R.register(R.CONDUCTOR, Conductor)
R.register(R.DIELECTRIC, Dielectric)
R.register(R.THINDIELECTRIC, ThinDielectric)
R.register(R.NULL, Null)
R.register(R.PHONG, Phong)
R.register(R.WARD, Ward)
