"""Microfacet distributions: GGX & Beckmann with Smith shadowing and
visible-normal sampling.

Capability parity with the reference's shared microfacet library
(src/bsdfs/microfacet.h: eval/smithG1/sample/pdf, both EGGX and EBeckmann,
including the visible-normal sampling path), vectorized over batches.
Isotropic only (the reference's roughplastic also rejects anisotropy).
"""
from __future__ import annotations

import jax.numpy as jnp

from ...core.math import safe_sqrt, normalize

GGX = 0
BECKMANN = 1


def ndf(kind: int, alpha, m):
    """D(m): microfacet density, m in local frame (z up)."""
    ct = jnp.maximum(m[..., 2], 0.0)
    ct2 = ct * ct
    a2 = alpha * alpha
    if kind == GGX:
        denom = jnp.pi * (ct2 * (a2 - 1.0) + 1.0) ** 2
        d = a2 / jnp.maximum(denom, 1e-20)
    else:
        t2 = jnp.where(ct2 > 0, (1.0 - ct2) / jnp.maximum(ct2, 1e-12), 0.0)
        d = jnp.exp(-t2 / a2) / jnp.maximum(jnp.pi * a2 * ct2 * ct2, 1e-20)
    return jnp.where(ct > 0, d, 0.0)


def smith_g1(kind: int, alpha, v, m):
    """Monodirectional Smith shadowing term."""
    cos_v = v[..., 2]
    # backfacing wrt the micronormal
    chi = (jnp.sum(v * m, axis=-1) * cos_v) > 0
    ct2 = cos_v * cos_v
    tan2 = jnp.where(ct2 > 0, (1.0 - ct2) / jnp.maximum(ct2, 1e-12), jnp.inf)
    a2 = alpha * alpha
    if kind == GGX:
        g = 2.0 / (1.0 + jnp.sqrt(1.0 + a2 * tan2))
    else:
        a = 1.0 / jnp.maximum(alpha * jnp.sqrt(tan2), 1e-12)
        g = jnp.where(a < 1.6,
                      (3.535 * a + 2.181 * a * a)
                      / (1.0 + 2.276 * a + 2.577 * a * a),
                      1.0)
    return jnp.where(chi, g, 0.0)


def g(kind: int, alpha, wi, wo, m):
    return smith_g1(kind, alpha, wi, m) * smith_g1(kind, alpha, wo, m)


def sample_all(kind: int, alpha, u):
    """Sample m ∝ D(m) cosθ. Returns (m, pdf)."""
    if kind == GGX:
        a2 = alpha * alpha
        ct2 = (1.0 - u[..., 0]) / (u[..., 0] * (a2 - 1.0) + 1.0)
        ct = safe_sqrt(ct2)
    else:
        a2 = alpha * alpha
        t2 = -a2 * jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-20))
        ct = 1.0 / jnp.sqrt(1.0 + t2)
        ct2 = ct * ct
    st = safe_sqrt(1.0 - ct2)
    phi = 2.0 * jnp.pi * u[..., 1]
    m = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)
    pdf = ndf(kind, alpha, m) * ct
    return m, pdf


def sample_visible(kind: int, alpha, wi, u):
    """Sample m from the distribution of visible normals (Heitz 2018 for GGX;
    Beckmann falls back to D·cosθ sampling, matching the accuracy tradeoff the
    reference takes in microfacet.h sampleVisible)."""
    if kind != GGX:
        return sample_all(kind, alpha, u)
    # stretch
    vh = normalize(jnp.stack([alpha * wi[..., 0], alpha * wi[..., 1],
                              jnp.abs(wi[..., 2])], axis=-1))
    # orthonormal basis around vh
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where(lensq[..., None] > 1e-18,
                   jnp.stack([-vh[..., 1] * inv, vh[..., 0] * inv,
                              jnp.zeros_like(inv)], axis=-1),
                   jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], vh.dtype), vh.shape))
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * jnp.pi * u[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * safe_sqrt(1.0 - p1 * p1) + s * p2
    p3 = safe_sqrt(1.0 - p1 * p1 - p2 * p2)
    nh = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * vh
    m = normalize(jnp.stack([alpha * nh[..., 0], alpha * nh[..., 1],
                             jnp.maximum(nh[..., 2], 1e-6)], axis=-1))
    pdf = pdf_visible(kind, alpha, jnp.stack([wi[..., 0], wi[..., 1],
                                              jnp.abs(wi[..., 2])], axis=-1), m)
    return m, pdf


def pdf_visible(kind: int, alpha, wi, m):
    """pdf of sample_visible in half-vector measure: G1(wi) |wi·m| D(m)/|cosθi|."""
    if kind != GGX:
        return ndf(kind, alpha, m) * jnp.maximum(m[..., 2], 0.0)
    cos_i = jnp.abs(wi[..., 2])
    return smith_g1(kind, alpha, wi, m) * jnp.abs(jnp.sum(wi * m, axis=-1)) \
        * ndf(kind, alpha, m) / jnp.maximum(cos_i, 1e-8)


def half_vector_to_wo_pdf(pdf_m, wo, m):
    """Convert half-vector pdf to solid-angle pdf of the reflected direction:
    divide by the Jacobian |dωh/dωo| = 1 / (4 |wo·m|)."""
    return pdf_m / jnp.maximum(4.0 * jnp.abs(jnp.sum(wo * m, axis=-1)), 1e-8)
