"""Participating media: homogeneous medium + phase functions.

Capability parity targets: src/medium/homogeneous.cpp, src/phase/
{isotropic,hg,rayleigh}.cpp. The `kkay` fiber phase (src/phase/kkay.cpp,
instantiated by the fork's Marschner BSDFs as their default phase) is
represented by the HG approximation with g chosen from the fiber exponent;
heterogeneous (gridvolume/Woodcock) media are a documented roadmap item.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.math import frame_from_normal, normalize, safe_sqrt

ISOTROPIC = 0
HG = 1
RAYLEIGH = 2

INV_FOURPI = 1.0 / (4.0 * jnp.pi)


class Medium(NamedTuple):
    sigma_t: jnp.ndarray   # [3] extinction
    albedo: jnp.ndarray    # [3] single-scattering albedo (sigma_s/sigma_t)
    g: jnp.ndarray         # [] HG asymmetry
    fog_depth: jnp.ndarray  # [] medium thickness along any escaping ray
    phase_kind: int        # static


def make_medium(sigma_s, sigma_a, g=0.0, phase_kind=HG,
                fog_depth=1e4) -> Medium:
    """Global homogeneous 'fog' of finite optical extent: any ray towards
    the environment traverses `fog_depth` of medium (the bounded-slab
    approximation of the reference's shape-bounded media)."""
    sigma_s = jnp.asarray(sigma_s, jnp.float32)
    sigma_a = jnp.asarray(sigma_a, jnp.float32)
    sigma_t = sigma_s + sigma_a
    albedo = sigma_s / jnp.maximum(sigma_t, 1e-8)
    return Medium(sigma_t=sigma_t, albedo=albedo,
                  g=jnp.asarray(g, jnp.float32),
                  fog_depth=jnp.asarray(fog_depth, jnp.float32),
                  phase_kind=phase_kind)


# ---------------------------------------------------------------------------
# phase functions (wi points towards the viewer, wo is the new direction;
# cos_theta below is wi·wo as in the reference's PhaseFunctionSamplingRecord)
# ---------------------------------------------------------------------------

def phase_eval(kind: int, g, wi, wo):
    ct = jnp.sum(wi * (-wo), axis=-1)   # forward scattering: wo ≈ -wi
    if kind == ISOTROPIC:
        return jnp.broadcast_to(jnp.float32(INV_FOURPI), ct.shape)
    if kind == HG:
        denom = 1.0 + g * g + 2.0 * g * ct
        return INV_FOURPI * (1.0 - g * g) \
            / jnp.maximum(denom * jnp.sqrt(jnp.maximum(denom, 1e-8)), 1e-8)
    # Rayleigh
    return (3.0 / (16.0 * jnp.pi)) * (1.0 + ct * ct)


def phase_sample(kind: int, g, wi, u2):
    """Sample wo; returns (wo, pdf). HG/isotropic exact; Rayleigh via HG0."""
    if kind == ISOTROPIC or kind == RAYLEIGH:
        z = 1.0 - 2.0 * u2[..., 0]
        r = safe_sqrt(1.0 - z * z)
        phi = 2.0 * jnp.pi * u2[..., 1]
        wo = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
        return wo, jnp.broadcast_to(jnp.float32(INV_FOURPI),
                                    u2.shape[:-1])
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
    sig_c = medium.sigma_t[c]
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
