"""Participating media: homogeneous medium + phase functions.

Capability parity targets: src/medium/homogeneous.cpp, src/phase/
{isotropic,hg,rayleigh,kkay}.cpp. The `kkay` fiber phase
(src/phase/kkay.cpp:36-125, instantiated by the fork's Marschner BSDFs as
their default phase) is implemented exactly: uniform-sphere sampling with
weight eval·4π and the Simpson-quadrature specular normalization of
kkay.cpp:58-76.
"""
from __future__ import annotations

from typing import NamedTuple

import jax

import jax.numpy as jnp
import numpy as np

from ..core.math import frame_from_normal, normalize, safe_sqrt

ISOTROPIC = 0
HG = 1
RAYLEIGH = 2
KKAY = 3
MICROFLAKE = 4      # Gaussian-fiber micro-flake (src/phase/microflake.cpp)
MIXTURE_PHASE = 5   # weighted mixture (src/phase/mixturephase.cpp)
KKAY_IS = 6         # kkay with cone importance sampling (the reference
                    # samples the uniform sphere; this mode importance-
                    # samples the specular cone + diffuse floor)

INV_FOURPI = 1.0 / (4.0 * jnp.pi)

_KKAY_LAT_BINS = 64  # latitude CDF resolution for KKAY_IS
_MF_TRIES = 64       # micro-flake rejection-sampling candidates per lane
_MF_SIGT_RES = 64    # σ_t(cosθ) lookup resolution


class Medium(NamedTuple):
    sigma_t: jnp.ndarray   # [3] extinction
    albedo: jnp.ndarray    # [3] single-scattering albedo (sigma_s/sigma_t)
    g: jnp.ndarray         # [] HG asymmetry
    fog_depth: jnp.ndarray  # [] medium thickness along any escaping ray
    phase_kind: int        # static
    # kkay fiber-phase parameters (ks, kd, exponent, normalization);
    # unused by the other kinds (reference: src/phase/kkay.cpp:40-45)
    phase_p: jnp.ndarray = None
    # fiber tangent at the scattering point (the reference reads it from
    # mRec.orientation, filled by oriented volumes); zero = unoriented,
    # kkay then degrades to kd/(4π) exactly as kkay.cpp:105-106
    orientation: jnp.ndarray = None
    # MIXTURE_PHASE components: static tuple of (kind, weight, g) per child
    # (src/phase/mixturephase.cpp; weights may sum to < 1 → absorption)
    mix: tuple = ()


def kkay_normalization(exponent: float) -> float:
    """Simpson quadrature of the specular lobe for perpendicular
    illumination, matching src/phase/kkay.cpp:58-76 (n=1000 panels)."""
    n_parts = 1000
    step = np.pi / n_parts
    theta = step * np.arange(1, n_parts)
    m = np.where(np.arange(1, n_parts) % 2 == 1, 4.0, 2.0)
    val = np.cos(theta - np.pi / 2) ** exponent * np.sin(theta)
    integral = float((val * m).sum() * step / 3.0)
    return 1.0 / (integral * 2.0 * np.pi)


def _fiber_sigma_t_table(stddev: float, res: int = _MF_SIGT_RES):
    """σ_t(cosθ) = ∫ D(m)·|ω·m| dm for the Gaussian fiber distribution,
    tabulated over |cosθ| ∈ [0,1]. The reference ships fitted polynomial
    coefficients (microflake_fiber.h fiberSigmaTCoeffs); we evaluate the
    same integral by quadrature at build time instead."""
    from math import erf
    norm = 1.0 / ((2.0 * np.pi) ** 1.5 * stddev
                  * erf(1.0 / (np.sqrt(2.0) * stddev)))
    zq, wq = np.polynomial.legendre.leggauss(128)      # flake z = cosθ_m
    phi = (np.arange(256) + 0.5) / 256 * 2.0 * np.pi   # flake azimuth
    ct = (np.arange(res) + 0.5) / res                  # |cosθ| of ω
    st = np.sqrt(np.maximum(1.0 - ct * ct, 0.0))
    # |ω·m| over the (z_m, φ_m) grid for each row
    sm = np.sqrt(np.maximum(1.0 - zq * zq, 0.0))
    dots = np.abs(st[:, None, None] * sm[None, :, None]
                  * np.cos(phi)[None, None, :]
                  + ct[:, None, None] * zq[None, :, None])
    d = norm * np.exp(-zq * zq / (2.0 * stddev * stddev))
    tab = (dots.mean(axis=-1) * d[None, :] * wq[None, :]).sum(-1) * 2 * np.pi
    return tab.astype(np.float32)


def make_medium(sigma_s, sigma_a, g=0.0, phase_kind=HG,
                fog_depth=1e4, ks=0.4, kd=0.2, exponent=4.0,
                orientation=(0.0, 0.0, 0.0), stddev=0.3,
                mix=()) -> Medium:
    """Global homogeneous 'fog' of finite optical extent: any ray towards
    the environment traverses `fog_depth` of medium (the bounded-slab
    approximation of the reference's shape-bounded media)."""
    # HOST arrays on purpose: Medium is captured as a closure constant by
    # jitted waves; device-resident constants cost minutes to embed
    # through the axon compile tunnel at lower() time.
    sigma_s = np.asarray(sigma_s, np.float32)
    sigma_a = np.asarray(sigma_a, np.float32)
    sigma_t = sigma_s + sigma_a
    albedo = sigma_s / np.maximum(sigma_t, 1e-8)
    if phase_kind == MICROFLAKE:
        from math import erf
        c1 = 1.0 / erf(1.0 / (np.sqrt(2.0) * stddev))
        norm = 1.0 / ((2.0 * np.pi) ** 1.5 * stddev
                      * erf(1.0 / (np.sqrt(2.0) * stddev)))
        phase_p = np.asarray(
            np.concatenate([[stddev, norm, c1, 0.0],
                            _fiber_sigma_t_table(stddev)]), np.float32)
    else:
        phase_p = np.asarray([ks, kd, exponent,
                              kkay_normalization(exponent)], np.float32)
    return Medium(sigma_t=sigma_t, albedo=albedo,
                  g=np.asarray(g, np.float32),
                  fog_depth=np.asarray(fog_depth, np.float32),
                  phase_kind=phase_kind,
                  phase_p=phase_p,
                  orientation=np.asarray(orientation, np.float32),
                  mix=tuple(mix))


# ---------------------------------------------------------------------------
# phase functions (wi points towards the viewer, wo is the new direction;
# cos_theta below is wi·wo as in the reference's PhaseFunctionSamplingRecord)
# ---------------------------------------------------------------------------

def _kkay_eval(phase_p, orientation, wi, wo):
    """Kajiya-Kay fiber phase (src/phase/kkay.cpp:104-120): specular cone
    around the fiber tangent + isotropic diffuse floor. `orientation` may
    be a single [3] or per-lane [..., 3]."""
    ks, kd, exponent, norm = (phase_p[0], phase_p[1], phase_p[2],
                              phase_p[3])
    ori = jnp.broadcast_to(jnp.asarray(orientation, jnp.float32), wo.shape)
    has_ori = jnp.sum(ori * ori, axis=-1) > 1e-12
    n = normalize(jnp.where(has_ori[..., None], ori,
                            jnp.asarray([0.0, 0.0, 1.0])))
    fr = frame_from_normal(n)
    loc = fr.to_local(wo)
    # replace the longitudinal coordinate with the mirrored wi angle,
    # rescaling the azimuthal part back to unit length (kkay.cpp:108-115)
    z = -jnp.sum(wi * n, axis=-1)
    xy2 = jnp.maximum(loc[..., 0] ** 2 + loc[..., 1] ** 2, 1e-20)
    a = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0) / xy2)
    r_loc = jnp.stack([loc[..., 0] * a, loc[..., 1] * a, z], axis=-1)
    r_world = fr.to_world(r_loc)
    spec = jnp.maximum(jnp.sum(r_world * wo, axis=-1), 0.0) ** exponent
    val = spec * norm * ks + kd * INV_FOURPI
    return jnp.where(has_ori, val, kd * INV_FOURPI)


def _microflake_eval(phase_p, orientation, wi, wo):
    """Gaussian-fiber micro-flake phase (microflake.cpp:118-125):
    f = D((wi+wo)/|wi+wo|) / (2·σ_t(cosθ_i)) in the fiber frame; 0 for
    unoriented lanes (reference keeps the `return 0` branch)."""
    stddev, norm = phase_p[0], phase_p[1]
    sig_tab = phase_p[4:4 + _MF_SIGT_RES]
    ori = jnp.broadcast_to(jnp.asarray(orientation, jnp.float32), wo.shape)
    has_ori = jnp.sum(ori * ori, axis=-1) > 1e-12
    n = normalize(jnp.where(has_ori[..., None], ori,
                            jnp.asarray([0.0, 0.0, 1.0])))
    fr = frame_from_normal(n)
    wi_l = fr.to_local(wi)
    wo_l = fr.to_local(wo)
    h = wi_l + wo_l
    hl = jnp.sqrt(jnp.maximum(jnp.sum(h * h, axis=-1), 1e-20))
    hz = h[..., 2] / hl
    d = norm * jnp.exp(-hz * hz / (2.0 * stddev * stddev))
    # bilinear σ_t(|cosθ_i|) lookup
    x = jnp.abs(wi_l[..., 2]) * _MF_SIGT_RES - 0.5
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, _MF_SIGT_RES - 2)
    fx = jnp.clip(x - x0.astype(x.dtype), 0.0, 1.0)
    sig = sig_tab[x0] * (1.0 - fx) + sig_tab[x0 + 1] * fx
    val = 0.5 * d / jnp.maximum(sig, 1e-8)
    return jnp.where(has_ori & (jnp.sum(h * h, -1) > 1e-18), val, 0.0)


def _hash_u01(u2, salt: int):
    """Derive fresh decorrelated uniforms from a 2D sample by integer
    hashing its bit patterns with a salt (for fixed-try rejection loops
    that only receive one 2D sample)."""
    a = jax.lax.bitcast_convert_type(u2[..., 0], jnp.uint32)
    b = jax.lax.bitcast_convert_type(u2[..., 1], jnp.uint32)
    x = a ^ (b * jnp.uint32(0x9E3779B9)) \
        ^ jnp.uint32((salt * 0x85EBCA6B) & 0xFFFFFFFF)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x.astype(jnp.float32) * (1.0 / 4294967296.0)


def _microflake_sample(phase_p, orientation, wi, u2):
    """Rejection sampling per microflake.cpp:127-170: draw flake normals
    H ~ D (exact truncated-Gaussian inversion via erfinv — the reference
    Brent-solves the same CDF, microflake_fiber.h:259-276), accept with
    probability |wi·H|, reflect. Fixed _MF_TRIES candidates; lanes with no
    acceptance return pdf 0 (the reference bails with 0 after its
    iteration cap)."""
    from jax.scipy.special import erfinv
    stddev, c1 = phase_p[0], phase_p[2]
    ori = jnp.broadcast_to(jnp.asarray(orientation, jnp.float32), wi.shape)
    has_ori = jnp.sum(ori * ori, axis=-1) > 1e-12
    nrm = normalize(jnp.where(has_ori[..., None], ori,
                              jnp.asarray([0.0, 0.0, 1.0])))
    fr = frame_from_normal(nrm)
    wi_l = fr.to_local(wi)

    accepted = jnp.zeros(wi.shape[:-1], bool)
    h_sel = jnp.zeros_like(wi_l)
    for t in range(_MF_TRIES):
        xi1 = _hash_u01(u2, 3 * t + 1)
        xi2 = _hash_u01(u2, 3 * t + 2)
        xia = _hash_u01(u2, 3 * t + 3)
        # cosθ = √2·σ·erfinv((1−2ξ)/c1)  (inverts microflake_fiber.h cdf())
        ct = jnp.clip(jnp.sqrt(2.0) * stddev
                      * erfinv(jnp.clip((1.0 - 2.0 * xi1) / c1,
                                        -0.999999, 0.999999)), -1.0, 1.0)
        st = safe_sqrt(1.0 - ct * ct)
        ph = 2.0 * jnp.pi * xi2
        h = jnp.stack([st * jnp.cos(ph), st * jnp.sin(ph), ct], axis=-1)
        acc = (xia < jnp.abs(jnp.sum(wi_l * h, axis=-1))) & ~accepted
        h_sel = jnp.where(acc[..., None], h, h_sel)
        accepted = accepted | acc
    wo_l = h_sel * (2.0 * jnp.sum(wi_l * h_sel, -1, keepdims=True)) - wi_l
    wo = fr.to_world(wo_l)
    ok = accepted & has_ori
    wo = jnp.where(ok[..., None], wo, -wi)
    pdf = jnp.where(ok, _microflake_eval(phase_p, orientation, wi, wo), 0.0)
    return wo, pdf


def _kkay_lat_weights(phase_p, lat_m):
    """Latitude-bin weights cos^e(λ−λ_m)·cos(λ) for the KKAY_IS cone
    sampler; λ_m is the per-lane mirrored inclination."""
    exponent = phase_p[2]
    centers = (jnp.arange(_KKAY_LAT_BINS) + 0.5) / _KKAY_LAT_BINS \
        * jnp.pi - jnp.pi / 2.0
    dlt = centers - lat_m[..., None]
    return jnp.maximum(jnp.cos(dlt), 0.0) ** exponent * jnp.cos(centers)


def _kkay_is_pdf(phase_p, orientation, wi, wo):
    """pdf of the KKAY_IS sampler (cone-latitude CDF × uniform azimuth,
    mixed with the uniform-sphere diffuse floor)."""
    ks, kd = phase_p[0], phase_p[1]
    ori = jnp.broadcast_to(jnp.asarray(orientation, jnp.float32), wo.shape)
    has_ori = jnp.sum(ori * ori, axis=-1) > 1e-12
    n = normalize(jnp.where(has_ori[..., None], ori,
                            jnp.asarray([0.0, 0.0, 1.0])))
    fr = frame_from_normal(n)
    z_m = -jnp.sum(wi * n, axis=-1)
    lat_m = jnp.arcsin(jnp.clip(z_m, -1.0, 1.0))
    w = _kkay_lat_weights(phase_p, lat_m)                 # [..., B]
    total = jnp.maximum(jnp.sum(w, axis=-1), 1e-20)
    z_o = jnp.clip(fr.to_local(wo)[..., 2], -1.0, 1.0)
    lat_o = jnp.arcsin(z_o)
    j = jnp.clip(((lat_o / jnp.pi + 0.5) * _KKAY_LAT_BINS).astype(jnp.int32),
                 0, _KKAY_LAT_BINS - 1)
    wj = jnp.take_along_axis(w, j[..., None], axis=-1)[..., 0]
    dlat = jnp.pi / _KKAY_LAT_BINS
    cos_lat = jnp.maximum(jnp.cos(lat_o), 1e-6)
    pdf_spec = wj / (total * dlat * 2.0 * jnp.pi * cos_lat)
    p_spec = jnp.where(has_ori, ks / jnp.maximum(ks + kd, 1e-9), 0.0)
    return p_spec * pdf_spec + (1.0 - p_spec) * INV_FOURPI


def _kkay_is_sample(phase_p, orientation, wi, u2):
    ks, kd = phase_p[0], phase_p[1]
    ori = jnp.broadcast_to(jnp.asarray(orientation, jnp.float32), wi.shape)
    has_ori = jnp.sum(ori * ori, axis=-1) > 1e-12
    n = normalize(jnp.where(has_ori[..., None], ori,
                            jnp.asarray([0.0, 0.0, 1.0])))
    fr = frame_from_normal(n)
    z_m = -jnp.sum(wi * n, axis=-1)
    lat_m = jnp.arcsin(jnp.clip(z_m, -1.0, 1.0))
    p_spec = jnp.where(has_ori, ks / jnp.maximum(ks + kd, 1e-9), 0.0)
    pick_spec = u2[..., 0] < p_spec
    u0 = jnp.where(pick_spec,
                   u2[..., 0] / jnp.maximum(p_spec, 1e-9),
                   (u2[..., 0] - p_spec) / jnp.maximum(1.0 - p_spec, 1e-9))
    u0 = jnp.clip(u0, 0.0, 1.0 - 1e-6)
    # cone branch: invert the latitude-bin CDF, uniform within a bin
    w = _kkay_lat_weights(phase_p, lat_m)
    cdf = jnp.cumsum(w, axis=-1)
    total = jnp.maximum(cdf[..., -1:], 1e-20)
    cdf = cdf / total
    j = jnp.clip(jnp.sum((cdf < u0[..., None]).astype(jnp.int32), -1),
                 0, _KKAY_LAT_BINS - 1)
    hi = jnp.take_along_axis(cdf, j[..., None], -1)[..., 0]
    lo = jnp.where(j > 0, jnp.take_along_axis(
        cdf, jnp.maximum(j - 1, 0)[..., None], -1)[..., 0], 0.0)
    frac = jnp.clip((u0 - lo) / jnp.maximum(hi - lo, 1e-20), 0.0, 1.0)
    lat = (j.astype(jnp.float32) + frac) / _KKAY_LAT_BINS * jnp.pi \
        - jnp.pi / 2.0
    phi = 2.0 * jnp.pi * u2[..., 1]
    cl = jnp.cos(lat)
    wo_spec = fr.to_world(jnp.stack([cl * jnp.cos(phi), cl * jnp.sin(phi),
                                     jnp.sin(lat)], axis=-1))
    # diffuse branch: uniform sphere
    z = 1.0 - 2.0 * u0
    r = safe_sqrt(1.0 - z * z)
    wo_diff = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    wo = jnp.where(pick_spec[..., None], wo_spec, wo_diff)
    return wo, _kkay_is_pdf(phase_p, orientation, wi, wo)


def _mix_norm(mix):
    tot = sum(w for _, w, _ in mix)
    return [(k, w / max(tot, 1e-9), gc) for k, w, gc in mix], tot


def phase_eval(kind: int, g, wi, wo, phase_p=None, orientation=None,
               mix=()):
    ct = jnp.sum(wi * (-wo), axis=-1)   # forward scattering: wo ≈ -wi
    if kind == ISOTROPIC:
        return jnp.broadcast_to(jnp.float32(INV_FOURPI), ct.shape)
    if kind == HG:
        # ct = wi·(−wo) = +1 at forward scattering, so the HG denominator
        # is 1+g²−2g·ct (hg.cpp eval uses +2g·dot(wi,wo) with the mitsuba
        # wi-towards-source convention; dot(wi,wo) = −ct)
        denom = 1.0 + g * g - 2.0 * g * ct
        return INV_FOURPI * (1.0 - g * g) \
            / jnp.maximum(denom * jnp.sqrt(jnp.maximum(denom, 1e-8)), 1e-8)
    if kind in (KKAY, KKAY_IS):
        if phase_p is None:
            phase_p = jnp.asarray([0.4, 0.2, 4.0, kkay_normalization(4.0)],
                                  jnp.float32)
        if orientation is None:
            orientation = jnp.zeros(3, jnp.float32)
        return _kkay_eval(phase_p, orientation, wi, wo)
    if kind == MICROFLAKE:
        if orientation is None:
            orientation = jnp.zeros(3, jnp.float32)
        return _microflake_eval(phase_p, orientation, wi, wo)
    if kind == MIXTURE_PHASE:
        # Σ wᵢ·fᵢ with the raw (possibly < 1) weights
        # (mixturephase.cpp:119-126)
        out = 0.0
        for k, w, gc in mix:
            out = out + w * phase_eval(k, gc, wi, wo, phase_p, orientation)
        return out
    # Rayleigh
    return (3.0 / (16.0 * jnp.pi)) * (1.0 + ct * ct)


def phase_pdf(kind: int, g, wi, wo, phase_p=None, orientation=None,
              mix=()):
    """pdf of phase_sample at wo (== eval for the self-importance-sampled
    kinds; uniform-sphere for the reference-faithful kkay; its own mixture
    for KKAY_IS / MIXTURE_PHASE)."""
    if kind == KKAY:
        return jnp.broadcast_to(jnp.float32(INV_FOURPI), wi.shape[:-1])
    if kind == KKAY_IS:
        if phase_p is None:
            phase_p = jnp.asarray([0.4, 0.2, 4.0, kkay_normalization(4.0)],
                                  jnp.float32)
        if orientation is None:
            orientation = jnp.zeros(3, jnp.float32)
        return _kkay_is_pdf(phase_p, orientation, wi, wo)
    if kind == MIXTURE_PHASE:
        # Σ ŵᵢ·pdfᵢ with the normalized selection weights
        nmix, _ = _mix_norm(mix)
        out = 0.0
        for k, w, gc in nmix:
            out = out + w * phase_pdf(k, gc, wi, wo, phase_p, orientation)
        return out
    return phase_eval(kind, g, wi, wo, phase_p, orientation)


def phase_sample(kind: int, g, wi, u2, phase_p=None, orientation=None,
                 mix=()):
    """Sample wo; returns (wo, pdf). HG/isotropic/Rayleigh exact inverse-
    CDF; kkay samples the uniform sphere exactly like the reference
    (kkay.cpp:88-101 — weight = eval·4π is applied by the caller as
    eval/pdf); KKAY_IS cone-importance-samples; microflake rejection-
    samples flake normals; mixtures pick a child ∝ weight."""
    if kind == ISOTROPIC or kind == KKAY:
        z = 1.0 - 2.0 * u2[..., 0]
        r = safe_sqrt(1.0 - z * z)
        phi = 2.0 * jnp.pi * u2[..., 1]
        wo = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
        return wo, jnp.broadcast_to(jnp.float32(INV_FOURPI),
                                    u2.shape[:-1])
    if kind == RAYLEIGH:
        # exact cubic-root CDF inversion (rayleigh.cpp:104-130):
        # cosθ³ + 3cosθ = 2z,  z = 2(2ξ−1)
        z = 2.0 * (2.0 * u2[..., 0] - 1.0)
        tmp = jnp.sqrt(z * z + 1.0)
        A = jnp.cbrt(z + tmp)
        B = jnp.cbrt(z - tmp)
        cos_theta = jnp.clip(A + B, -1.0, 1.0)
        sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
        phi = 2.0 * jnp.pi * u2[..., 1]
        fr = frame_from_normal(normalize(-wi))
        wo = fr.to_world(jnp.stack([sin_theta * jnp.cos(phi),
                                    sin_theta * jnp.sin(phi),
                                    cos_theta], axis=-1))
        return wo, phase_eval(RAYLEIGH, g, wi, wo)
    if kind == KKAY_IS:
        if phase_p is None:
            phase_p = jnp.asarray([0.4, 0.2, 4.0, kkay_normalization(4.0)],
                                  jnp.float32)
        if orientation is None:
            orientation = jnp.zeros(3, jnp.float32)
        return _kkay_is_sample(phase_p, orientation, wi, u2)
    if kind == MICROFLAKE:
        if orientation is None:
            orientation = jnp.zeros(3, jnp.float32)
        return _microflake_sample(phase_p, orientation, wi, u2)
    if kind == MIXTURE_PHASE:
        # child selection ∝ normalized weight, first sample dim rescaled
        nmix, _ = _mix_norm(mix)
        n = wi.shape[:-1]
        wo = jnp.zeros(n + (3,), jnp.float32)
        lo = 0.0
        u0 = u2[..., 0]
        for k, w, gc in nmix:
            hi = lo + w
            sel = (u0 >= lo) & (u0 < hi)
            u_r = jnp.clip((u0 - lo) / max(w, 1e-9), 0.0, 1.0 - 1e-7)
            u2_r = jnp.stack([u_r, u2[..., 1]], axis=-1)
            wo_k, _ = phase_sample(k, gc, wi, u2_r, phase_p, orientation)
            wo = jnp.where(sel[..., None], wo_k, wo)
            lo = hi
        return wo, phase_pdf(MIXTURE_PHASE, g, wi, wo, phase_p,
                             orientation, mix)
    # HG inverse-CDF (reference: hg.cpp sample)
    g_safe = jnp.where(jnp.abs(g) < 1e-3, 1e-3, g)
    sqr = (1.0 - g * g) / (1.0 - g + 2.0 * g * u2[..., 0])
    cos_theta = jnp.where(jnp.abs(g) < 1e-3,
                          1.0 - 2.0 * u2[..., 0],
                          (1.0 + g * g - sqr * sqr) / (2.0 * g_safe))
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = 2.0 * jnp.pi * u2[..., 1]
    # local frame around the forward direction -wi
    fr = frame_from_normal(normalize(-wi))
    wo = fr.to_world(jnp.stack([sin_theta * jnp.cos(phi),
                                sin_theta * jnp.sin(phi),
                                cos_theta], axis=-1))
    pdf = phase_eval(HG, g, wi, wo)
    return wo, pdf


def transmittance(medium: Medium, dist):
    """exp(-σ_t d) with inf distance → 0."""
    d = jnp.minimum(dist, 1e30)[..., None]
    return jnp.exp(-medium.sigma_t * d)


def sample_distance(medium: Medium, u_channel, u_dist, t_max):
    """Spectral-MIS free-flight sampling (channel picked uniformly).
    Returns (d, is_medium_event, weight [3]): weight already includes
    transmittance/pdf and σ_s·albedo for medium events (reference:
    homogeneous.cpp sampleDistance)."""
    c = jnp.clip((u_channel * 3).astype(jnp.int32), 0, 2)
    sig_c = jnp.asarray(medium.sigma_t)[c]
    d = -jnp.log(jnp.maximum(1.0 - u_dist, 1e-20)) / jnp.maximum(sig_c, 1e-8)
    is_medium = d < t_max
    d = jnp.minimum(d, t_max)

    tr = transmittance(medium, d)             # [N, 3]
    # pdf of a medium event at d: mean_c σ_c exp(-σ_c d)
    pdf_med = jnp.mean(medium.sigma_t[None, :] * tr, axis=-1)
    # pdf of surviving past t_max: mean_c exp(-σ_c t_max)
    pdf_surf = jnp.mean(tr, axis=-1)
    sigma_s = medium.sigma_t * medium.albedo
    w_med = tr * sigma_s[None, :] / jnp.maximum(pdf_med, 1e-20)[..., None]
    w_surf = tr / jnp.maximum(pdf_surf, 1e-20)[..., None]
    weight = jnp.where(is_medium[..., None], w_med, w_surf)
    return d, is_medium, weight


# ---------------------------------------------------------------------------
# shape-bounded media: a table of homogeneous media indexed per lane.
# Row 0 is always vacuum. The reference attaches Medium objects to shapes
# as interior/exterior references (Shape::setInteriorMedium,
# src/librender/shape.cpp; scene XML <medium name="interior">) and the
# integrator tracks the current medium across refractive/null boundaries
# (volpath.cpp rRec.medium handling). Here that becomes a per-lane int32
# medium id indexing this table.
# ---------------------------------------------------------------------------

class MediumTable(NamedTuple):
    sigma_t: jnp.ndarray   # [M, 3] extinction (row 0 = vacuum = 0)
    albedo: jnp.ndarray    # [M, 3]
    g: jnp.ndarray         # [M] HG asymmetry (0 = isotropic)


def make_medium_table(entries) -> MediumTable:
    """entries: list of dicts with sigma_s/sigma_a/g. A vacuum row is
    prepended, so medium ids in the scene are 1-based (0 = no medium)."""
    rows_t, rows_a, rows_g = [np.zeros(3, np.float32)], \
        [np.zeros(3, np.float32)], [0.0]
    for e in entries:
        ss = np.asarray(e.get("sigma_s", (0.5,) * 3), np.float32)
        sa = np.asarray(e.get("sigma_a", (0.1,) * 3), np.float32)
        st = ss + sa
        rows_t.append(st)
        rows_a.append(ss / np.maximum(st, 1e-8))
        rows_g.append(float(e.get("g", 0.0)))
    return MediumTable(sigma_t=np.stack(rows_t),
                       albedo=np.stack(rows_a),
                       g=np.asarray(rows_g, np.float32))


def sample_distance_lane(sig_t, albedo, u_channel, u_dist, t_max):
    """Per-lane spectral-MIS free flight: sig_t/albedo are [N, 3] gathered
    from a MediumTable. Same estimator as sample_distance; vacuum lanes
    (σ=0) always reach the surface with weight 1."""
    c = jnp.clip((u_channel * 3).astype(jnp.int32), 0, 2)
    sig_c = jnp.take_along_axis(sig_t, c[:, None], axis=1)[:, 0]
    d = -jnp.log(jnp.maximum(1.0 - u_dist, 1e-20)) \
        / jnp.maximum(sig_c, 1e-8)
    d = jnp.where(sig_c > 0, d, jnp.inf)
    is_medium = d < t_max
    d = jnp.minimum(d, t_max)

    tr = jnp.exp(-sig_t * jnp.minimum(d, 1e30)[..., None])   # [N, 3]
    pdf_med = jnp.mean(sig_t * tr, axis=-1)
    pdf_surf = jnp.mean(tr, axis=-1)
    sigma_s = sig_t * albedo
    w_med = tr * sigma_s / jnp.maximum(pdf_med, 1e-20)[..., None]
    w_surf = tr / jnp.maximum(pdf_surf, 1e-20)[..., None]
    return d, is_medium, jnp.where(is_medium[..., None], w_med, w_surf)


# ---------------------------------------------------------------------------
# heterogeneous media: grid volumes + Woodcock (delta) tracking
# (reference: src/volume/gridvolume.cpp, src/medium/heterogeneous.cpp)
# ---------------------------------------------------------------------------

class GridVolume(NamedTuple):
    data: jnp.ndarray        # [D, H, W] density (z, y, x)
    world_min: jnp.ndarray   # [3]
    inv_extent: jnp.ndarray  # [3] 1 / (world_max - world_min)


class HeteroMedium(NamedTuple):
    vol: GridVolume
    sigma_t: jnp.ndarray     # [3] extinction at density 1
    albedo: jnp.ndarray      # [3]
    g: jnp.ndarray           # []
    majorant: jnp.ndarray    # [] max over grid of density * max(sigma_t)
    phase_kind: int          # static
    max_steps: int = 512     # static Woodcock iteration cap


def load_vol(path: str) -> GridVolume:
    """Read the reference's .vol grid format (src/volume/gridvolume.cpp):
    'VOL' magic, version 3, int32 encoding (1 = float32), xres/yres/zres,
    channels, bbox (2x3 float32), then x-fastest data."""
    with open(path, "rb") as f:
        magic = f.read(3)
        if magic != b"VOL":
            raise ValueError("not a .vol file")
        version = f.read(1)[0]
        if version != 3:
            raise ValueError(f"unsupported .vol version {version}")
        enc, xres, yres, zres, channels = np.frombuffer(f.read(20),
                                                        np.int32)
        if enc != 1:
            raise ValueError(f"unsupported .vol encoding {enc}")
        bbox = np.frombuffer(f.read(24), np.float32)
        data = np.frombuffer(f.read(4 * xres * yres * zres * channels),
                             np.float32)
    data = data.reshape(zres, yres, xres, channels)[..., 0]
    wmin = bbox[:3]
    wmax = bbox[3:]
    return GridVolume(data=np.asarray(data, np.float32),
                      world_min=np.asarray(wmin, np.float32),
                      inv_extent=np.asarray(
                          1.0 / np.maximum(wmax - wmin, 1e-12), np.float32))


def make_grid_volume(data, world_min, world_max) -> GridVolume:
    wmin = np.asarray(world_min, np.float32)
    wmax = np.asarray(world_max, np.float32)
    return GridVolume(data=np.asarray(data, np.float32),
                      world_min=np.asarray(wmin),
                      inv_extent=jnp.asarray(1.0 / np.maximum(wmax - wmin,
                                                              1e-12)))


def grid_density(vol: GridVolume, p):
    """Trilinear density lookup; zero outside the grid bbox
    (reference: gridvolume.cpp lookupFloat)."""
    g = (p - vol.world_min) * vol.inv_extent  # [..., 3] in [0, 1]
    inside = jnp.all((g >= 0.0) & (g <= 1.0), axis=-1)
    D, H, W = vol.data.shape
    fx = g[..., 0] * (W - 1)
    fy = g[..., 1] * (H - 1)
    fz = g[..., 2] * (D - 1)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, H - 2)
    z0 = jnp.clip(jnp.floor(fz).astype(jnp.int32), 0, D - 2)
    wx = jnp.clip(fx - x0, 0.0, 1.0)
    wy = jnp.clip(fy - y0, 0.0, 1.0)
    wz = jnp.clip(fz - z0, 0.0, 1.0)
    d = jnp.asarray(vol.data)   # host table → in-trace constant

    def at(dz, dy, dx):
        return d[z0 + dz, y0 + dy, x0 + dx]

    c00 = at(0, 0, 0) * (1 - wx) + at(0, 0, 1) * wx
    c01 = at(0, 1, 0) * (1 - wx) + at(0, 1, 1) * wx
    c10 = at(1, 0, 0) * (1 - wx) + at(1, 0, 1) * wx
    c11 = at(1, 1, 0) * (1 - wx) + at(1, 1, 1) * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return jnp.where(inside, c0 * (1 - wz) + c1 * wz, 0.0)


def make_hetero_medium(vol: GridVolume, sigma_s, sigma_a, g=0.0,
                       phase_kind=HG, density_scale=1.0) -> HeteroMedium:
    sigma_s = np.asarray(sigma_s, np.float32) * density_scale
    sigma_a = np.asarray(sigma_a, np.float32) * density_scale
    sigma_t = sigma_s + sigma_a
    albedo = sigma_s / np.maximum(sigma_t, 1e-8)
    dens_max = np.max(vol.blocks) if isinstance(vol, HGridVolume) \
        else np.max(vol.data)
    majorant = float(dens_max) * float(np.max(sigma_t))
    return HeteroMedium(vol=vol, sigma_t=sigma_t, albedo=albedo,
                        g=np.asarray(g, np.float32),
                        majorant=np.float32(max(majorant, 1e-8)),
                        phase_kind=phase_kind)


# ---------------------------------------------------------------------------
# hierarchical (block-sparse) grid volume + bake-to-grid cache
# (reference: src/volume/hgridvolume.cpp — two-layer grid of gridvolume
# blocks, empty cells return 0; src/volume/volcache.cpp — block LRU cache,
# which on TPU becomes a one-time bake into a dense grid in HBM)
# ---------------------------------------------------------------------------

class HGridVolume(NamedTuple):
    block_idx: jnp.ndarray   # [BZ, BY, BX] int32 block table (-1 = empty)
    blocks: jnp.ndarray      # [NB, bz, by, bx] per-block density
    world_min: jnp.ndarray   # [3]
    inv_extent: jnp.ndarray  # [3]


def make_hgrid_from_dense(data, world_min, world_max, block: int = 8,
                          eps: float = 0.0) -> HGridVolume:
    """Split a dense [D, H, W] grid into `block`³ tiles, dropping tiles
    whose max density ≤ eps (the sparsity hgridvolume gets from its
    dictionary file)."""
    d = np.asarray(data, np.float32)
    D, H, W = d.shape
    pz, py, px = [(-s) % block for s in (D, H, W)]
    d = np.pad(d, ((0, pz), (0, py), (0, px)))
    BZ, BY, BX = d.shape[0] // block, d.shape[1] // block, d.shape[2] // block
    tiles = d.reshape(BZ, block, BY, block, BX, block) \
        .transpose(0, 2, 4, 1, 3, 5).reshape(-1, block, block, block)
    keep = tiles.max(axis=(1, 2, 3)) > eps
    idx = np.full(len(tiles), -1, np.int32)
    idx[keep] = np.arange(int(keep.sum()), dtype=np.int32)
    blocks = tiles[keep] if keep.any() else np.zeros(
        (1, block, block, block), np.float32)
    wmin = np.asarray(world_min, np.float32)
    wmax = np.asarray(world_max, np.float32)
    # node-centered grid: extent grows with padding so node spacing
    # matches the dense input's ext/(n-1)
    scale = (np.asarray(d.shape[::-1], np.float32) - 1) \
        / np.maximum(np.asarray((W, H, D), np.float32) - 1, 1)
    ext = (wmax - wmin) * scale
    return HGridVolume(block_idx=np.asarray(idx.reshape(BZ, BY, BX)),
                       blocks=np.asarray(blocks, np.float32),
                       world_min=np.asarray(wmin),
                       inv_extent=np.asarray(1.0 / np.maximum(ext, 1e-12),
                                             np.float32))


def hgrid_density(vol: HGridVolume, p):
    """Block-sparse trilinear lookup: resolve the coarse cell, then
    interpolate inside its block (clamped at block borders, matching the
    reference's per-block gridvolume lookups); empty cells → 0
    (hgridvolume.cpp:144-158)."""
    BZ, BY, BX = vol.block_idx.shape
    nb = vol.blocks.shape[1]
    g = (p - vol.world_min) * vol.inv_extent          # [..., 3] in [0,1]
    inside = jnp.all((g >= 0.0) & (g <= 1.0), axis=-1)
    # node-centered like grid_density: node index = g * (n_nodes - 1)
    fx = jnp.clip(g[..., 0] * (BX * nb - 1), 0.0, BX * nb - 1.0)
    fy = jnp.clip(g[..., 1] * (BY * nb - 1), 0.0, BY * nb - 1.0)
    fz = jnp.clip(g[..., 2] * (BZ * nb - 1), 0.0, BZ * nb - 1.0)
    cz = jnp.clip((fz / nb).astype(jnp.int32), 0, BZ - 1)
    cy = jnp.clip((fy / nb).astype(jnp.int32), 0, BY - 1)
    cx = jnp.clip((fx / nb).astype(jnp.int32), 0, BX - 1)
    bi = jnp.asarray(vol.block_idx)[cz, cy, cx]
    lz = fz - cz * nb
    ly = fy - cy * nb
    lx = fx - cx * nb
    x0 = jnp.clip(jnp.floor(lx).astype(jnp.int32), 0, nb - 2)
    y0 = jnp.clip(jnp.floor(ly).astype(jnp.int32), 0, nb - 2)
    z0 = jnp.clip(jnp.floor(lz).astype(jnp.int32), 0, nb - 2)
    wx = jnp.clip(lx - x0, 0.0, 1.0)
    wy = jnp.clip(ly - y0, 0.0, 1.0)
    wz = jnp.clip(lz - z0, 0.0, 1.0)
    b = jnp.asarray(vol.blocks)[jnp.maximum(bi, 0)]

    def at(dz, dy, dx):
        return jnp.take_along_axis(
            b.reshape(b.shape[0], -1),
            ((z0 + dz) * nb * nb + (y0 + dy) * nb
             + (x0 + dx))[..., None], axis=-1)[..., 0]

    c00 = at(0, 0, 0) * (1 - wx) + at(0, 0, 1) * wx
    c01 = at(0, 1, 0) * (1 - wx) + at(0, 1, 1) * wx
    c10 = at(1, 0, 0) * (1 - wx) + at(1, 0, 1) * wx
    c11 = at(1, 1, 0) * (1 - wx) + at(1, 1, 1) * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    val = c0 * (1 - wz) + c1 * wz
    return jnp.where(inside & (bi >= 0), val, 0.0)


def bake_volume_cache(fn, world_min, world_max, res: int = 64,
                      block: int = 8, eps: float = 0.0) -> HGridVolume:
    """volcache counterpart: evaluate an arbitrary density function on a
    dense grid once and serve lookups from the block-sparse result (the
    reference's per-block LRU cache exists to bound CPU memory; in HBM
    the bake is the cache)."""
    wmin = np.asarray(world_min, np.float32)
    wmax = np.asarray(world_max, np.float32)
    zs = np.linspace(wmin[2], wmax[2], res)
    ys = np.linspace(wmin[1], wmax[1], res)
    xs = np.linspace(wmin[0], wmax[0], res)
    Z, Y, X = np.meshgrid(zs, ys, xs, indexing="ij")
    pts = jnp.asarray(np.stack([X, Y, Z], -1).reshape(-1, 3), jnp.float32)
    dens = np.asarray(fn(pts)).reshape(res, res, res)
    return make_hgrid_from_dense(dens, wmin, wmax, block=block, eps=eps)


def volume_density(vol, p):
    """Dispatch density lookup on the volume type (dense GridVolume or
    block-sparse HGridVolume)."""
    if isinstance(vol, HGridVolume):
        return hgrid_density(vol, p)
    return grid_density(vol, p)


def _woodcock_uniform(pixel, sample, dim_base, it, salt):
    from ..core import rng
    return rng.uniform_1d(pixel, sample,
                          dim_base + 0x9E37 * it + salt)


def _bbox_overlap(vol: GridVolume, o, d, t_max):
    """[t0, t1] of the ray's overlap with the grid bbox (t1 < t0 = none)."""
    wmax = vol.world_min + 1.0 / vol.inv_extent
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                            jnp.where(d >= 0, 1e-12, -1e-12), d)
    a0 = (vol.world_min - o) * inv_d
    a1 = (wmax - o) * inv_d
    t0 = jnp.max(jnp.minimum(a0, a1), axis=-1)
    t1 = jnp.min(jnp.maximum(a0, a1), axis=-1)
    return jnp.maximum(t0, 0.0), jnp.minimum(t1, t_max)


def woodcock_sample(med: HeteroMedium, o, d, t_max, pixel, sample,
                    dim_base: int):
    """Delta-tracking free-flight sampling, clipped to the grid bbox
    (reference: heterogeneous.cpp sampleDistance, Woodcock tracking).
    Returns (t [N], is_medium_event [N]). The estimator weight of a
    medium event is albedo (throughput *= albedo), of escape 1 — delta
    tracking is analog, so transmittance/pdf cancels exactly."""
    n = o.shape[0]
    inv_mj = 1.0 / med.majorant
    t0, t1 = _bbox_overlap(med.vol, o, d, t_max)

    def cond(st):
        it, t, done = st
        return jnp.any(~done) & (it < med.max_steps)

    def body(st):
        it, t, done = st
        u1 = _woodcock_uniform(pixel, sample, dim_base, it, 0)
        u2 = _woodcock_uniform(pixel, sample, dim_base, it, 0x5bd1)
        t_new = t - jnp.log(jnp.maximum(1.0 - u1, 1e-20)) * inv_mj
        escaped = t_new >= t1        # left the medium bbox → vacuum
        p_evt = o + d * t_new[..., None]
        dens = volume_density(med.vol, p_evt)
        sig = dens * jnp.max(med.sigma_t)
        real = u2 < sig * inv_mj
        newly_done = ~done & (escaped | real)
        t = jnp.where(done, t, t_new)
        done = done | newly_done
        return it + 1, t, done

    init = (jnp.int32(0), jnp.maximum(t0, 0.0), t0 >= t1)
    _, t, _ = jax.lax.while_loop(cond, body, init)
    is_med = (t < t1) & (t0 < t1)
    return jnp.where(is_med, t, t_max), is_med


def woodcock_transmittance(med: HeteroMedium, o, d, dist, pixel, sample,
                           dim_base: int):
    """Ratio-tracking transmittance estimate along [0, dist], clipped to
    the grid bbox (unbiased; reference: heterogeneous.cpp
    evalTransmittance)."""
    n = o.shape[0]
    inv_mj = 1.0 / med.majorant
    t0, t1 = _bbox_overlap(med.vol, o, d, dist)

    def cond(st):
        it, t, tr, done = st
        return jnp.any(~done) & (it < med.max_steps)

    def body(st):
        it, t, tr, done = st
        u1 = _woodcock_uniform(pixel, sample, dim_base, it, 0x1234)
        t_new = t - jnp.log(jnp.maximum(1.0 - u1, 1e-20)) * inv_mj
        escaped = t_new >= t1
        p = o + d * t_new[..., None]
        dens = volume_density(med.vol, p)
        ratio = 1.0 - dens * jnp.max(med.sigma_t) * inv_mj
        tr = jnp.where((done | escaped)[..., None], tr,
                       tr * jnp.maximum(ratio, 0.0)[..., None])
        done = done | escaped | (jnp.max(tr, axis=-1) <= 0.0)
        t = jnp.where(done, t, t_new)
        return it + 1, t, tr, done

    init = (jnp.int32(0), jnp.maximum(t0, 0.0),
            jnp.ones((n, 3), jnp.float32), t0 >= t1)
    _, _, tr, _ = jax.lax.while_loop(cond, body, init)
    return tr
