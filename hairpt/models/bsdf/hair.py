"""Hair BSDFs: Kajiya-Kay, Marschner (R/TT/TRT + diffuse hybrid), and the
Kajiya-Kay × thin-dielectric hybrid.

These are the fork's own contributions, reproduced behaviorally:
- KajiyaKay       — src/bsdfs/kajiyakay.cpp:58-333
- Marschner       — src/bsdfs/marschner_diffuse.cpp (the plugin registered
                    under the name "marschner", SConscript:31), Tungsten-style
                    precomputed azimuthal tables
- MarschnerDielectric — src/bsdfs/marschnerdielectric.cpp:145-620

Local frame convention (from HairShape::fillIntersectionRecord,
src/shapes/hair.cpp:825-862): local x = fiber tangent, z = radial normal.
Kajiya-Kay uses wi.x as the tangent coordinate; the Marschner code instead
treats wi.y as sin(theta) and atan2(wo.x, wo.z) as the azimuth — a fork
quirk that we reproduce as-is so renders match.

The azimuthal precompute is a *differentiable JAX function* of
(sigma_a, beta_r, eta) — unlike the reference's one-shot C++ constructor
loop — so inverse rendering can optimize absorption/roughness through it.

Faithful-mode quirks reproduced (marschner_diffuse.cpp):
- eval scales the R lobe by 0.15                     (line 454)
- pdf() returns 1 when the diffuse component is on   (lines 517-520)
- sample() reuses one 2D sample for lobe selection, longitudinal and
  azimuthal sampling and the diffuse hemisphere       (line 648)
- the three Gaussian detector tables are all built with beta_R (precompute
  loop, line 774)
- the sampled specular lobe is flagged EDeltaReflection, so MIS treats
  BSDF-sampled emitter hits as delta (weight 1)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core import warps
from ...core.math import safe_sqrt
from ...core.quad import gauss_legendre
from .fresnel import fresnel_dielectric
from . import registry as R

INV_PI = 1.0 / jnp.pi
INV_TWOPI = 1.0 / (2.0 * jnp.pi)
INV_FOURPI = 1.0 / (4.0 * jnp.pi)
TWO_PI = 2.0 * jnp.pi

AZ_RES = 64            # azimuthal table resolution (matches reference)
N_GAUSS = 140          # Gauss-Legendre points over fiber offset h
N_DETECTOR = 2048      # detector table samples

_GL_X, _GL_W = gauss_legendre(N_GAUSS)


# ---------------------------------------------------------------------------
# longitudinal scattering M (von Mises-Fisher, stable small-v branch)
# (reference: marschner_diffuse.cpp:365-377 M, 289-299 logI0/I0)
# ---------------------------------------------------------------------------

def _log_i0(x):
    # series for small x, asymptotic for large (stable)
    x = jnp.abs(x)
    small = jnp.log(jnp.i0(jnp.minimum(x, 12.0)))
    large = x + 0.5 * (jnp.log(1.0 / (TWO_PI * jnp.maximum(x, 1e-6)))
                       + 1.0 / (8.0 * jnp.maximum(x, 1e-6)))
    return jnp.where(x > 12.0, large, small)


def longitudinal_m(v, sin_ti, sin_to, cos_ti, cos_to):
    # both branches are evaluated lane-wide under `where`, so each must stay
    # finite (value AND gradient) over the other's domain — computed in log
    # space with clipped exponents
    a = cos_ti * cos_to / v
    b = sin_ti * sin_to / v
    log_stable = -b + _log_i0(a) - 1.0 / v + 0.6931 + jnp.log(1.0 / (2.0 * v))
    log_csch = -jnp.log(jnp.sinh(jnp.clip(1.0 / v, 1e-3, 40.0)))
    log_direct = -b + _log_i0(a) + log_csch - jnp.log(2.0 * v)
    out = jnp.where(v < 0.1, log_stable, log_direct)
    return jnp.exp(jnp.clip(out, -80.0, 80.0))


def sample_longitudinal(v, sin_ti, cos_ti, u1, u2):
    """Numerically stable vMF inversion
    (reference: marschner_diffuse.cpp:581-591 sampleM)."""
    cos_t = 1.0 + v * jnp.log(u1 + (1.0 - u1) * jnp.exp(-2.0 / v))
    sin_t = jnp.minimum(safe_sqrt(1.0 - cos_t * cos_t), 1.0)
    cos_phi = jnp.cos(TWO_PI * u2)
    return -cos_t * sin_ti + sin_t * cos_phi * cos_ti


# ---------------------------------------------------------------------------
# azimuthal precompute (differentiable)
# ---------------------------------------------------------------------------

def _gaussian_g(beta, theta):
    return jnp.exp(-theta * theta / (2.0 * beta * beta)) \
        / (jnp.sqrt(TWO_PI) * beta)


def _detector_table(beta):
    """D(beta, phi) on a uniform [0, 2π] grid with wrap-around
    (reference D(): sum of 2π-shifted Gaussians until convergence; beta≈0.1
    needs only a few wraps — we use a fixed ±3)."""
    phi = jnp.arange(N_DETECTOR) / (N_DETECTOR - 1.0) * TWO_PI
    acc = jnp.zeros_like(phi)
    for k in range(-3, 4):
        acc = acc + _gaussian_g(beta, phi + k * TWO_PI)
    return acc  # [N_DETECTOR]


def _approx_d(table, phi):
    """Wrapped linear interpolation of the detector table
    (reference approxD lambda)."""
    u = jnp.abs(phi * (INV_TWOPI * (N_DETECTOR - 1)))
    x0 = u.astype(jnp.int32)
    frac = u - x0.astype(u.dtype)
    x0 = jnp.mod(x0, N_DETECTOR)
    x1 = jnp.mod(x0 + 1, N_DETECTOR)
    return table[x0] * (1.0 - frac) + table[x1] * frac


def _phi_exit(gamma_i, gamma_t, p):
    """Exit azimuth Φ(p, h) (reference Phi(), line 316)."""
    return 2.0 * p * gamma_t - 2.0 * gamma_i + p * jnp.pi


def precompute_azimuthal(sigma_a, beta_r, eta):
    """Build the three azimuthal scattering tables N_R/N_TT/N_TRT.

    Returns values [3, AZ_RES(cosθd), AZ_RES(phi), 3(rgb)].
    Pure JAX — differentiable w.r.t. sigma_a/beta_r/eta; jit once per
    material at scene build, re-traced inside inverse-rendering steps.
    (reference: precomputeAzimuthalDistributions, marschner_diffuse.cpp:752-846)
    """
    sigma_a = jnp.asarray(sigma_a, jnp.float32)
    beta_r = jnp.asarray(beta_r, jnp.float32)
    eta = jnp.asarray(eta, jnp.float32)

    gl_x = jnp.asarray(_GL_X, jnp.float32)        # [G] fiber offsets h
    gl_w = jnp.asarray(_GL_W, jnp.float32)
    gamma_i = jnp.arcsin(jnp.clip(gl_x, -1.0, 1.0))

    det = _detector_table(beta_r)                  # all lobes use beta_R

    y = jnp.arange(AZ_RES, dtype=jnp.float32) / (AZ_RES - 1.0)  # cosθd rows
    cos_hd = jnp.maximum(y, 1e-4)[:, None]         # [Y, 1]

    ior_prime = jnp.sqrt(jnp.maximum(eta * eta - (1.0 - cos_hd * cos_hd),
                                     0.0)) / cos_hd
    cos_tt = jnp.sqrt(jnp.maximum(1.0 - (1.0 - cos_hd * cos_hd)
                                  / (eta * eta), 0.0))           # [Y, 1]
    sigma_prime = sigma_a[None, None, :] / cos_tt[..., None]     # [Y, 1, 3]

    gamma_t = jnp.arcsin(jnp.clip(gl_x[None, :] / ior_prime, -1.0, 1.0))
    f, _ = fresnel_dielectric(cos_hd * jnp.cos(gamma_i)[None, :], eta)  # [Y, G]
    absorption = jnp.exp(-sigma_prime * 2.0
                         * jnp.cos(gamma_t)[..., None])          # [Y, G, 3]

    a_r = f                                        # [Y, G]
    a_tt = ((1.0 - f) ** 2)[..., None] * absorption
    a_trt = a_tt * f[..., None] * absorption

    phi = jnp.arange(AZ_RES, dtype=jnp.float32) / (AZ_RES - 1.0) * TWO_PI

    def row(p, amp):
        # amp: [Y, G] or [Y, G, 3]
        delta = phi[None, :, None] - _phi_exit(gamma_i, gamma_t[:, None, :],
                                               p)                 # [Y, P, G]
        d = _approx_d(det, delta)
        if amp.ndim == 2:
            integ = jnp.einsum("g,ypg,yg->yp", gl_w, d, amp)
            integ = integ[..., None] * jnp.ones((3,), jnp.float32)
        else:
            integ = jnp.einsum("g,ypg,ygc->ypc", gl_w, d, amp)
        return 0.5 * integ                                       # [Y, P, 3]

    n_r = row(0, a_r)
    n_tt = row(1, a_tt)
    n_trt = row(2, a_trt)
    return jnp.stack([n_r, n_tt, n_trt], axis=0)   # [3, Y, P, 3]


def azimuthal_sampling_tables(values):
    """Dilated max-weights + lobe-selection integrals from the value tables
    (reference: Azimuthal ctor, marschner_diffuse.cpp:39-65 + weight())."""
    w = jnp.max(values, axis=-1)                   # [3, Y, P]
    # one-step dilation along both axes (conservative, like the reference's
    # sweep; a single max-pool with both neighbours is equivalent here)
    w = jnp.maximum(w, jnp.maximum(jnp.roll(w, 1, axis=-1),
                                   jnp.roll(w, -1, axis=-1)))
    w = jnp.maximum(w, jnp.maximum(jnp.roll(w, 1, axis=-2),
                                   jnp.roll(w, -1, axis=-2)))
    lobe_weight = jnp.sum(w, axis=-1) * (TWO_PI / AZ_RES)   # [3, Y]
    return w, lobe_weight


# ---------------------------------------------------------------------------
# Kajiya-Kay (reference: kajiyakay.cpp)
# ---------------------------------------------------------------------------

class KajiyaKay:
    @staticmethod
    def eval_pdf(gm, wi, wo, aux):
        valid = (wi[..., 2] > 0) & (wo[..., 2] > 0)
        tl = jnp.abs(wi[..., 0])
        te = jnp.abs(wo[..., 0])
        alpha = tl * te + safe_sqrt(1 - tl * tl) * safe_sqrt(1 - te * te)
        e = gm.exponent
        spec_on = (alpha > 0) & (wi[..., 0] * wo[..., 0] < 0)
        spec = jnp.where(spec_on[..., None],
                         0.15 * gm.specular
                         * ((e + 2.0) * INV_FOURPI
                            * jnp.power(jnp.maximum(alpha, 1e-12), e))[..., None],
                         0.0)
        f = (spec + gm.diffuse * INV_PI) \
            * jnp.maximum(wo[..., 2], 0.0)[..., None]

        # pdf: phong lobe around mirror(reflect about z) + cosine mixture
        alpha_ph = jnp.sum(wo * jnp.stack([-wi[..., 0], -wi[..., 1],
                                           wi[..., 2]], axis=-1), axis=-1)
        spec_pdf = warps.phong_lobe_pdf(jnp.maximum(alpha_ph, 0.0), e)
        diff_pdf = warps.square_to_cosine_hemisphere_pdf(wo)
        pdf = gm.spec_weight * spec_pdf + (1.0 - gm.spec_weight) * diff_pdf
        return jnp.where(valid[..., None], f, 0.0), jnp.where(valid, pdf, 0.0)

    @staticmethod
    def sample(gm, wi, u_lobe, u2, u2b, aux):
        from ...core.math import frame_from_normal, normalize
        n = wi.shape[:-1]
        choose_spec = u_lobe <= gm.spec_weight
        local = warps.square_to_phong_lobe(u2, gm.exponent)
        refl = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)
        f_r = frame_from_normal(normalize(refl))
        wo_spec = f_r.to_world(local)
        wo_diff = warps.square_to_cosine_hemisphere(u2)
        wo = jnp.where(choose_spec[..., None], wo_spec, wo_diff)
        f, pdf = KajiyaKay.eval_pdf(gm, wi, wo, aux)
        ok = pdf > 1e-9
        weight = jnp.where(ok[..., None],
                           f / jnp.maximum(pdf, 1e-9)[..., None], 0.0)
        return wo, weight, jnp.where(ok, pdf, 0.0), jnp.zeros(n, bool), \
            jnp.ones(n, jnp.float32)


# ---------------------------------------------------------------------------
# Marschner (= the fork's MarschnerDiffuse)
# ---------------------------------------------------------------------------

def _marschner_angles(gm, wi, wo):
    sin_ti = wi[..., 1]
    sin_to = wo[..., 1]
    cos_to = jnp.minimum(safe_sqrt(1.0 - sin_to * sin_to), 1.0)
    theta_i = jnp.arcsin(jnp.clip(sin_ti, -1.0, 1.0))
    theta_o = jnp.arcsin(jnp.clip(sin_to, -1.0, 1.0))
    theta_d = (theta_o - theta_i) * 0.5
    cos_td = jnp.cos(theta_d)
    phi = jnp.arctan2(wo[..., 0], wo[..., 2])
    phi = jnp.where(phi < 0, phi + TWO_PI, phi)
    return sin_ti, sin_to, cos_to, theta_i, cos_td, phi


def _marschner_m3(gm, theta_i, sin_to, cos_to):
    tilt = gm.scale_tilt
    v_r = gm.beta_r ** 2
    v_tt = (gm.beta_r * 0.5) ** 2
    v_trt = (gm.beta_r * 2.0) ** 2
    th_r = theta_i - 2.0 * tilt
    th_tt = theta_i + tilt
    th_trt = theta_i + 4.0 * tilt
    m_r = longitudinal_m(v_r, jnp.sin(th_r), sin_to, jnp.cos(th_r), cos_to)
    m_tt = longitudinal_m(v_tt, jnp.sin(th_tt), sin_to, jnp.cos(th_tt), cos_to)
    m_trt = longitudinal_m(v_trt, jnp.sin(th_trt), sin_to, jnp.cos(th_trt),
                           cos_to)
    return m_r, m_tt, m_trt


def _marschner_diffuse_term(gm, wi, wo):
    """Roughplastic-style compensated diffuse term, z-axis cosines
    (marschner_diffuse.cpp:467-479)."""
    T12 = R.ext_trans_lookup(gm, wi[..., 2])
    T21 = R.ext_trans_lookup(gm, wo[..., 2])
    inv_eta2 = 1.0 / (gm.eta * gm.eta)
    diff = gm.diffuse
    comp = jnp.where(gm.nonlinear[..., None],
                     1.0 - diff * gm.int_fdr[..., None],
                     (1.0 - gm.int_fdr)[..., None])
    diff = diff / jnp.maximum(comp, 1e-6)
    return diff * (INV_PI * jnp.maximum(wo[..., 2], 0.0)
                   * T12 * T21 * inv_eta2)[..., None]


class Marschner:
    @staticmethod
    def eval_pdf(gm, wi, wo, aux):
        k = jnp.maximum(gm.aux_id, 0)
        sin_ti, sin_to, cos_to, theta_i, cos_td, phi = \
            _marschner_angles(gm, wi, wo)
        m_r, m_tt, m_trt = _marschner_m3(gm, theta_i, sin_to, cos_to)

        # per-lane bilinear texel gathers from the stacked tables
        n_r, n_tt, n_trt = _azimuthal_eval_lanes(
            aux.values, k, phi, cos_td,
            getattr(aux, 'values_quad', None))
        hair = 0.15 * m_r[..., None] * n_r + m_tt[..., None] * n_tt \
            + m_trt[..., None] * n_trt

        f = hair + _marschner_diffuse_term(gm, wi, wo)
        # faithful-mode pdf quirk: pdf() ≡ 1 with diffuse enabled
        pdf = jnp.ones(wi.shape[:-1], jnp.float32)
        return f, pdf

    @staticmethod
    def sample(gm, wi, u_lobe, u2, u2b, aux):
        n = wi.shape[:-1]
        values = aux.values
        weights = aux.weights
        lobe_w = aux.lobe_weight
        k = jnp.maximum(gm.aux_id, 0)

        # faithful quirk: xiN = xiM = the same 2D sample
        xi_n = u2
        xi_m = u2

        sin_ti = wi[..., 1]
        cos_ti = jnp.minimum(safe_sqrt(1.0 - sin_ti * sin_ti), 1.0)
        theta_i = jnp.arcsin(jnp.clip(sin_ti, -1.0, 1.0))
        tilt = gm.scale_tilt
        th = jnp.stack([theta_i - 2 * tilt, theta_i + tilt,
                        theta_i + 4 * tilt], axis=-1)        # [N, 3]
        v3 = jnp.stack([gm.beta_r ** 2, (gm.beta_r * 0.5) ** 2,
                        (gm.beta_r * 2.0) ** 2], axis=-1)

        # lobe selection ∝ azimuthal weight at cosθi row
        v_row = (AZ_RES - 1) * cos_ti
        lw = _lobe_weight_lanes(lobe_w, k, v_row)            # [N, 3]
        lw_sum = jnp.sum(lw, axis=-1)
        target = xi_n[..., 0] * lw_sum
        c0 = lw[..., 0]
        c01 = c0 + lw[..., 1]
        lobe = jnp.where(target < c0, 0, jnp.where(target < c01, 1, 2))

        v_sel = jnp.take_along_axis(v3, lobe[..., None], axis=-1)[..., 0]
        th_sel = jnp.take_along_axis(th, lobe[..., None], axis=-1)[..., 0]

        sin_to = sample_longitudinal(v_sel, jnp.sin(th_sel), jnp.cos(th_sel),
                                     xi_m[..., 0], xi_m[..., 1])
        sin_to = jnp.clip(sin_to, -1.0, 1.0)
        cos_to = jnp.minimum(safe_sqrt(1.0 - sin_to * sin_to), 1.0)
        theta_o = jnp.arcsin(sin_to)
        cos_td = jnp.cos((theta_o - theta_i) * 0.5)

        phi = _azimuthal_sample_lanes(weights, k, lobe,
                                      (AZ_RES - 1) * cos_td, xi_n[..., 1])

        sin_phi = jnp.sin(phi)
        cos_phi = jnp.cos(phi)
        wo_spec = jnp.stack([sin_phi * cos_to, sin_to, cos_phi * cos_to],
                            axis=-1)

        # spec-vs-diffuse choice (rough-transmittance based, quirk: reuses
        # sample.y); diffuse wo reuses the same 2D sample too
        p_spec_base = 1.0 - R.ext_trans_lookup(gm, wi[..., 2])
        sw = gm.spec_weight
        p_spec = (p_spec_base * sw) / jnp.maximum(
            p_spec_base * sw + (1.0 - p_spec_base) * (1.0 - sw), 1e-7)
        choose_spec = u2[..., 1] < p_spec
        wo_diff = warps.square_to_cosine_hemisphere(u2)
        wo = jnp.where(choose_spec[..., None], wo_spec, wo_diff)

        # faithful pdf quirk: pdf = 1, weight = eval
        f, _ = Marschner.eval_pdf(gm, wi, wo, aux)
        pdf = jnp.ones(n, jnp.float32)
        # specular branch is flagged delta (EDeltaReflection quirk)
        return wo, f, pdf, choose_spec, jnp.ones(n, jnp.float32)


# ---------------------------------------------------------------------------
# Corrected-mode Marschner (the default for the "marschner" plugin name):
# the fork's *pure* variant semantics (src/bsdfs/marschner.cpp:409-535 —
# never built upstream, SConscript:30) with the quirks removed:
#   - eval keeps all three lobes (no TRT-only zeroing, no 0.15·R scale)
#   - pdf() is the true 3-lobe mixture  Σ_p w_p(cosθi)·M_p(θo)·N_pdf_p(φ)
#     / Σ w_p  (marschner.cpp:447-410 pdf()), MIS-compatible
#   - sample() uses fresh decorrelated 2D samples for lobe selection,
#     longitudinal and azimuthal warps (marschner.cpp:473-474)
#   - the sampled lobe is smooth (not flagged delta), so NEE + MIS apply
# The faithful behavior stays available as kind=MARSCHNER (above).
# ---------------------------------------------------------------------------

def _marschner_p_spec(gm, wi):
    """Probability of taking the specular (hair-lobe) branch. Matches the
    faithful spec-vs-diffuse mixture when a diffuse term is present; pure
    hair materials (diffuse == 0) always sample the hair lobes."""
    p_base = 1.0 - R.ext_trans_lookup(gm, wi[..., 2])
    sw = gm.spec_weight
    p = (p_base * sw) / jnp.maximum(
        p_base * sw + (1.0 - p_base) * (1.0 - sw), 1e-7)
    has_diffuse = jnp.sum(gm.diffuse, axis=-1) > 0
    return jnp.where(has_diffuse, p, 1.0)


def _azimuthal_pdf_lanes(weights, k, phi, v_row):
    """Per-lobe piecewise-constant azimuthal pdf matching
    _azimuthal_sample_lanes exactly (same lerped weight row, same φ bins).
    weights: [K, 3, Y, P]; returns [..., 3] pdf over dφ."""
    v = jnp.clip(v_row, 0.0, AZ_RES - 1 - 1e-4)
    r0 = jnp.clip(v.astype(jnp.int32), 0, AZ_RES - 2)
    fv = (v - r0.astype(v.dtype))[..., None]
    x = jnp.clip((phi * (AZ_RES * INV_TWOPI)).astype(jnp.int32),
                 0, AZ_RES - 1)
    out = []
    for lobe in range(3):
        w0 = weights[k, lobe, r0]            # [..., P]
        w1 = weights[k, lobe, r0 + 1]
        w = w0 * (1.0 - fv) + w1 * fv
        total = jnp.sum(w, axis=-1)
        wx = jnp.take_along_axis(w, x[..., None], axis=-1)[..., 0]
        out.append(wx / jnp.maximum(total, 1e-20) * (AZ_RES * INV_TWOPI))
    return jnp.stack(out, axis=-1)


class MarschnerPure:
    @staticmethod
    def eval_pdf(gm, wi, wo, aux):
        k = jnp.maximum(gm.aux_id, 0)
        sin_ti, sin_to, cos_to, theta_i, cos_td, phi = \
            _marschner_angles(gm, wi, wo)
        cos_ti = jnp.minimum(safe_sqrt(1.0 - sin_ti * sin_ti), 1.0)
        m_r, m_tt, m_trt = _marschner_m3(gm, theta_i, sin_to, cos_to)
        n_r, n_tt, n_trt = _azimuthal_eval_lanes(
            aux.values, k, phi, cos_td,
            getattr(aux, 'values_quad', None))
        hair = m_r[..., None] * n_r + m_tt[..., None] * n_tt \
            + m_trt[..., None] * n_trt

        # true mixture pdf over the 3 lobes (marschner.cpp pdf():447-410)
        lw = _lobe_weight_lanes(aux.lobe_weight, k, (AZ_RES - 1) * cos_ti)
        npdf = _azimuthal_pdf_lanes(aux.weights, k, phi,
                                    (AZ_RES - 1) * cos_td)
        m3 = jnp.stack([m_r, m_tt, m_trt], axis=-1)
        pdf_hair = jnp.sum(lw * m3 * npdf, axis=-1) \
            / jnp.maximum(jnp.sum(lw, axis=-1), 1e-20)

        diffuse = _marschner_diffuse_term(gm, wi, wo)
        p_spec = _marschner_p_spec(gm, wi)
        pdf = p_spec * pdf_hair + (1.0 - p_spec) \
            * warps.square_to_cosine_hemisphere_pdf(wo)
        return hair + diffuse, pdf

    @staticmethod
    def sample(gm, wi, u_lobe, u2, u2b, aux):
        n = wi.shape[:-1]
        k = jnp.maximum(gm.aux_id, 0)
        sin_ti = wi[..., 1]
        cos_ti = jnp.minimum(safe_sqrt(1.0 - sin_ti * sin_ti), 1.0)
        theta_i = jnp.arcsin(jnp.clip(sin_ti, -1.0, 1.0))
        tilt = gm.scale_tilt
        th = jnp.stack([theta_i - 2 * tilt, theta_i + tilt,
                        theta_i + 4 * tilt], axis=-1)
        v3 = jnp.stack([gm.beta_r ** 2, (gm.beta_r * 0.5) ** 2,
                        (gm.beta_r * 2.0) ** 2], axis=-1)

        # lobe selection ∝ azimuthal weight at the cosθi row, from a FRESH
        # sample (u2b.x); longitudinal warp gets its own 2D sample (u2)
        lw = _lobe_weight_lanes(aux.lobe_weight, k, (AZ_RES - 1) * cos_ti)
        target = u2b[..., 0] * jnp.sum(lw, axis=-1)
        c0 = lw[..., 0]
        c01 = c0 + lw[..., 1]
        lobe = jnp.where(target < c0, 0, jnp.where(target < c01, 1, 2))
        v_sel = jnp.take_along_axis(v3, lobe[..., None], axis=-1)[..., 0]
        th_sel = jnp.take_along_axis(th, lobe[..., None], axis=-1)[..., 0]

        sin_to = jnp.clip(sample_longitudinal(
            v_sel, jnp.sin(th_sel), jnp.cos(th_sel),
            u2[..., 0], u2[..., 1]), -1.0, 1.0)
        cos_to = jnp.minimum(safe_sqrt(1.0 - sin_to * sin_to), 1.0)
        cos_td = jnp.cos((jnp.arcsin(sin_to) - theta_i) * 0.5)
        phi = _azimuthal_sample_lanes(aux.weights, k, lobe,
                                      (AZ_RES - 1) * cos_td, u2b[..., 1])
        wo_spec = jnp.stack([jnp.sin(phi) * cos_to, sin_to,
                             jnp.cos(phi) * cos_to], axis=-1)

        p_spec = _marschner_p_spec(gm, wi)
        choose_spec = u_lobe < p_spec
        wo_diff = warps.square_to_cosine_hemisphere(u2)
        wo = jnp.where(choose_spec[..., None], wo_spec, wo_diff)

        f, pdf = MarschnerPure.eval_pdf(gm, wi, wo, aux)
        ok = pdf > 1e-9
        weight = jnp.where(ok[..., None],
                           f / jnp.maximum(pdf, 1e-9)[..., None], 0.0)
        return wo, weight, jnp.where(ok, pdf, 0.0), jnp.zeros(n, bool), \
            jnp.ones(n, jnp.float32)


def quad_pack(values):
    """Repack stacked azimuthal tables [K, 3, Y, X, 3] into 2×2
    bilinear quads [K, Y-1, X-1, 3, 4, 3] so the per-lane eval gathers
    ONE 36-float block instead of 12 scattered texels (all three lobes
    share the (y0, x0) footprint). TPU gathers are descriptor-bound:
    measured 26.5 ms → ~7 ms per 262k-lane eval. Pure slicing+stack —
    gradients flow for the differentiable inverse-rendering path."""
    v00 = values[:, :, :-1, :-1, :]
    v01 = values[:, :, :-1, 1:, :]
    v10 = values[:, :, 1:, :-1, :]
    v11 = values[:, :, 1:, 1:, :]
    quad = jnp.stack([v00, v01, v10, v11], axis=-2)  # [K,3,Y-1,X-1,4,3]
    return jnp.moveaxis(quad, 1, 3)                  # [K,Y-1,X-1,3,4,3]


def _azimuthal_eval_lanes(values, k, phi, cos_td, values_quad=None):
    """values: [K, 3, Y, P, 3] stacked tables; k: [N] per-lane material.
    With values_quad (quad_pack) a single [3, 4, 3] block gather per
    lane replaces the 12 scattered texel gathers."""
    u = (AZ_RES - 1) * phi * INV_TWOPI
    v = (AZ_RES - 1) * cos_td
    x0 = jnp.clip(u.astype(jnp.int32), 0, AZ_RES - 2)
    y0 = jnp.clip(v.astype(jnp.int32), 0, AZ_RES - 2)
    fu = jnp.clip(u - x0.astype(u.dtype), 0.0, 1.0)[..., None]
    fv = jnp.clip(v - y0.astype(v.dtype), 0.0, 1.0)[..., None]

    if values_quad is not None:
        quad = values_quad[k, y0, x0]            # [N, 3, 4, 3]
        wu = fu[..., None]                       # [N, 1, 1]
        wv = fv[..., None]
        blend = (quad[..., 0, :] * (1 - wu) + quad[..., 1, :] * wu) \
            * (1 - wv) \
            + (quad[..., 2, :] * (1 - wu) + quad[..., 3, :] * wu) * wv
        return blend[:, 0], blend[:, 1], blend[:, 2]

    def g(lobe, yy, xx):
        return values[k, lobe, yy, xx]

    out = []
    for lobe in range(3):
        v00 = g(lobe, y0, x0)
        v01 = g(lobe, y0, x0 + 1)
        v10 = g(lobe, y0 + 1, x0)
        v11 = g(lobe, y0 + 1, x0 + 1)
        out.append((v00 * (1 - fu) + v01 * fu) * (1 - fv)
                   + (v10 * (1 - fu) + v11 * fu) * fv)
    return out


def _lobe_weight_lanes(lobe_weight, k, v_row):
    """lobe_weight: [K, 3, Y]; returns [N, 3] blended at continuous row."""
    v = jnp.clip(v_row, 0.0, AZ_RES - 1 - 1e-4)
    r0 = jnp.clip(v.astype(jnp.int32), 0, AZ_RES - 2)
    fv = (v - r0.astype(v.dtype))[..., None]
    w0 = lobe_weight[k, :, r0]
    w1 = lobe_weight[k, :, r0 + 1]
    return w0 * (1.0 - fv) + w1 * fv


def _azimuthal_sample_lanes(weights, k, lobe, v_row, u):
    """Sample phi from the interpolated row CDF
    (reference: Azimuthal::sample + InterpolatedDistribution1D::warp)."""
    v = jnp.clip(v_row, 0.0, AZ_RES - 1 - 1e-4)
    r0 = jnp.clip(v.astype(jnp.int32), 0, AZ_RES - 2)
    fv = (v - r0.astype(v.dtype))[..., None]
    w0 = weights[k, lobe, r0]          # [N, P]
    w1 = weights[k, lobe, r0 + 1]
    w = w0 * (1.0 - fv) + w1 * fv
    cdf = jnp.cumsum(w, axis=-1)
    total = cdf[..., -1:]
    cdf = cdf / jnp.maximum(total, 1e-20)
    x = jnp.sum((cdf < u[..., None]).astype(jnp.int32), axis=-1)
    x = jnp.clip(x, 0, AZ_RES - 1)
    hi = jnp.take_along_axis(cdf, x[..., None], axis=-1)[..., 0]
    lo = jnp.where(x > 0,
                   jnp.take_along_axis(cdf, jnp.maximum(x - 1, 0)[..., None],
                                       axis=-1)[..., 0], 0.0)
    ur = jnp.clip((u - lo) / jnp.maximum(hi - lo, 1e-20), 0.0, 1.0 - 1e-6)
    phi = TWO_PI * (x.astype(u.dtype) + ur) / AZ_RES
    return phi


# ---------------------------------------------------------------------------
# MarschnerDielectric (reference: marschnerdielectric.cpp)
# ---------------------------------------------------------------------------

class MarschnerDielectric:
    """Thin-dielectric R/TT energy split where the reflection is a mirror
    delta and transmission is delta-forward; the solid-angle eval/pdf are 0
    (the reference's eval returns 0 in the ESolidAngle measure for every
    direction, so NEE never sees this material and the sampled diffuse
    branch carries zero weight — reproduced faithfully)."""

    @staticmethod
    def eval_pdf(gm, wi, wo, aux):
        n = wi.shape[:-1]
        return jnp.zeros(n + (3,), jnp.float32), jnp.zeros(n, jnp.float32)

    @staticmethod
    def sample(gm, wi, u_lobe, u2, u2b, aux):
        n = wi.shape[:-1]
        sw = gm.spec_weight
        choose_spec = u_lobe <= sw
        F, _ = fresnel_dielectric(wi[..., 2], gm.eta)
        T = 1.0 - F
        Rp = jnp.where(F < 1.0, F + T * T * F / (1.0 - F * F + 1e-12), F)
        # rescaled lobe sample (reference: sample.x /= specularSamplingWeight)
        x = jnp.where(choose_spec, u_lobe / jnp.maximum(sw, 1e-7), 0.0)
        choose_r = x <= Rp
        refl = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)
        wo_spec = jnp.where(choose_r[..., None], refl, -wi)
        w_spec = jnp.where(choose_r[..., None], gm.specular, gm.transmit)
        wo_diff = warps.square_to_cosine_hemisphere(u2)
        wo = jnp.where(choose_spec[..., None], wo_spec, wo_diff)
        # diffuse branch: weight = eval/pdf = 0 (faithful)
        weight = jnp.where(choose_spec[..., None], w_spec, 0.0)
        pdf = jnp.where(choose_spec, jnp.where(choose_r, Rp, 1.0 - Rp), 0.0)
        return wo, weight, pdf, choose_spec, jnp.ones(n, jnp.float32)


R.register(R.KAJIYAKAY, KajiyaKay)
R.register(R.MARSCHNER, Marschner)
R.register(R.MARSCHNER_PURE, MarschnerPure)
R.register(R.MARSCHNERDIELECTRIC, MarschnerDielectric)
