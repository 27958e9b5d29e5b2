"""Reconstruction filters.

Capability parity with the reference rfilter plugins
(src/rfilters/{box,tent,gaussian,mitchell,catmullrom,lanczos}.cpp), but
evaluated analytically on the fly inside the differentiable splat instead of
through a pre-discretized lookup table — the filter weight is then itself
differentiable w.r.t. the sample position.
"""
from __future__ import annotations

import jax.numpy as jnp

BOX = 0
TENT = 1
GAUSSIAN = 2
MITCHELL = 3
CATMULLROM = 4
LANCZOS = 5

FILTERS = {
    "box": (BOX, 0.5),
    "tent": (TENT, 1.0),
    "gaussian": (GAUSSIAN, 2.0),
    "mitchell": (MITCHELL, 2.0),
    "catmullrom": (CATMULLROM, 2.0),
    "lanczos": (LANCZOS, 3.0),
}


def _mitchell_1d(x, B, C):
    x = jnp.abs(x)
    x2, x3 = x * x, x * x * x
    return jnp.where(
        x < 1,
        ((12 - 9 * B - 6 * C) * x3 + (-18 + 12 * B + 6 * C) * x2
         + (6 - 2 * B)) * (1.0 / 6.0),
        jnp.where(
            x < 2,
            ((-B - 6 * C) * x3 + (6 * B + 30 * C) * x2 + (-12 * B - 48 * C) * x
             + (8 * B + 24 * C)) * (1.0 / 6.0),
            0.0))


def filter_eval(kind: int, radius: float, dx, dy):
    """Evaluate the 2D separable filter at offsets (dx, dy) from the sample."""
    if kind == BOX:
        w = jnp.where((jnp.abs(dx) <= radius) & (jnp.abs(dy) <= radius), 1.0, 0.0)
    elif kind == TENT:
        w = jnp.maximum(0.0, 1.0 - jnp.abs(dx) / radius) * \
            jnp.maximum(0.0, 1.0 - jnp.abs(dy) / radius)
    elif kind == GAUSSIAN:
        # stddev 0.5, truncated at radius (reference: rfilters/gaussian.cpp)
        alpha = -1.0 / (2.0 * 0.5 ** 2)
        off = jnp.exp(alpha * radius * radius)
        gx = jnp.maximum(0.0, jnp.exp(alpha * dx * dx) - off)
        gy = jnp.maximum(0.0, jnp.exp(alpha * dy * dy) - off)
        w = gx * gy
    elif kind == MITCHELL:
        w = _mitchell_1d(dx, 1 / 3, 1 / 3) * _mitchell_1d(dy, 1 / 3, 1 / 3)
    elif kind == CATMULLROM:
        w = _mitchell_1d(dx, 0.0, 0.5) * _mitchell_1d(dy, 0.0, 0.5)
    elif kind == LANCZOS:
        def sinc(x):
            x = jnp.abs(x) + 1e-8
            return jnp.sin(jnp.pi * x) / (jnp.pi * x)
        tau = 3.0
        w = jnp.where(jnp.abs(dx) < tau, sinc(dx) * sinc(dx / tau), 0.0) * \
            jnp.where(jnp.abs(dy) < tau, sinc(dy) * sinc(dy / tau), 0.0)
    else:
        raise ValueError(f"unknown filter kind {kind}")
    return w
