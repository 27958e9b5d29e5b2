"""Square → sphere/hemisphere/disk/... warps and their densities.

Mirrors the capability of the reference warp library
(reference: include/mitsuba/core/warp.h:40-120, src/libcore/warp.cpp),
vectorized over trailing-batch jnp arrays.
"""
from __future__ import annotations

import jax.numpy as jnp

from .math import safe_sqrt

PI = jnp.pi
INV_PI = 1.0 / jnp.pi
INV_TWOPI = 1.0 / (2.0 * jnp.pi)
INV_FOURPI = 1.0 / (4.0 * jnp.pi)


def square_to_uniform_sphere(s):
    z = 1.0 - 2.0 * s[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * PI * s[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_sphere_pdf(w):
    return jnp.broadcast_to(jnp.float32(INV_FOURPI), w.shape[:-1])


def square_to_uniform_hemisphere(s):
    z = s[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * PI * s[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_hemisphere_pdf(w):
    return jnp.where(w[..., 2] >= 0, INV_TWOPI, 0.0)


def square_to_cosine_hemisphere(s):
    p = square_to_uniform_disk_concentric(s)
    z = safe_sqrt(1.0 - p[..., 0] ** 2 - p[..., 1] ** 2)
    return jnp.stack([p[..., 0], p[..., 1], z], axis=-1)


def square_to_cosine_hemisphere_pdf(w):
    return jnp.maximum(w[..., 2], 0.0) * INV_PI


def square_to_uniform_cone(s, cos_cutoff):
    cos_theta = (1.0 - s[..., 0]) + s[..., 0] * cos_cutoff
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = 2.0 * PI * s[..., 1]
    return jnp.stack([jnp.cos(phi) * sin_theta,
                      jnp.sin(phi) * sin_theta,
                      cos_theta], axis=-1)


def square_to_uniform_cone_pdf(cos_cutoff):
    return INV_TWOPI / (1.0 - cos_cutoff)


def square_to_uniform_disk(s):
    r = jnp.sqrt(s[..., 0])
    phi = 2.0 * PI * s[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_disk_concentric(s):
    ox = 2.0 * s[..., 0] - 1.0
    oy = 2.0 * s[..., 1] - 1.0
    zero = (ox == 0.0) & (oy == 0.0)
    cond = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(cond, ox, oy)
    safe_r = jnp.where(r == 0.0, 1.0, r)
    phi = jnp.where(cond,
                    (PI / 4.0) * (oy / jnp.where(cond, safe_r, 1.0)),
                    (PI / 2.0) - (PI / 4.0) * (ox / jnp.where(cond, 1.0, safe_r)))
    r = jnp.where(zero, 0.0, r)
    phi = jnp.where(zero, 0.0, phi)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_triangle(s):
    a = safe_sqrt(1.0 - s[..., 0])
    return jnp.stack([1.0 - a, a * s[..., 1]], axis=-1)


def square_to_tent(s):
    """Inverse-CDF of the 1D tent on [-1, 1], applied per component
    (reference: warp.cpp intervalToNonuniformTent / tent rfilter)."""
    def warp1(x):
        return jnp.where(x < 0.5,
                         jnp.sqrt(2.0 * x) - 1.0,
                         1.0 - jnp.sqrt(jnp.maximum(2.0 - 2.0 * x, 0.0)))
    return jnp.stack([warp1(s[..., 0]), warp1(s[..., 1])], axis=-1)


def square_to_std_normal(s):
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - s[..., 0], 1e-20)))
    phi = 2.0 * PI * s[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_phong_lobe(s, exponent):
    """Sample a Phong lobe around +z (reference: kajiyakay.cpp:244-249)."""
    cos_alpha = s[..., 1] ** (1.0 / (exponent + 1.0))
    sin_alpha = safe_sqrt(1.0 - s[..., 1] ** (2.0 / (exponent + 1.0)))
    phi = 2.0 * PI * s[..., 0]
    return jnp.stack([sin_alpha * jnp.cos(phi),
                      sin_alpha * jnp.sin(phi),
                      cos_alpha], axis=-1)


def phong_lobe_pdf(cos_alpha, exponent):
    return jnp.where(cos_alpha > 0,
                     (cos_alpha ** exponent) * (exponent + 1.0) * INV_TWOPI,
                     0.0)
