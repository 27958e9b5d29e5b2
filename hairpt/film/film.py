"""Differentiable film: filter-weighted sample splatting + develop.

TPU-native replacement of the reference's ImageBlock/Film pipeline
(include/mitsuba/render/imageblock.h:144-188 `put`, src/films/{hdrfilm,
ldrfilm}.cpp): instead of per-thread tiles merged under a mutex, all samples
are splatted with one batched scatter-add per wave (order-independent,
deterministic given the same sharding) into an RGB accumulator plus a filter
weight channel; ``develop`` normalizes by the weight channel exactly like
HDRFilm::develop (src/films/hdrfilm.cpp:427).
"""
from __future__ import annotations

import math as pymath
from typing import NamedTuple

import jax.numpy as jnp

from .rfilter import FILTERS, filter_eval


class Film(NamedTuple):
    width: int
    height: int
    filter_kind: int
    filter_radius: float
    gamma: float = 2.2          # ldrfilm gamma (all reference hair scenes use 2.2)
    annotations: tuple = ()     # ((x, y, text), ...) label[] overlays
    #                             (src/films/annotations.h)
    banner: bool = False        # hdrfilm/ldrfilm banner overlay

    @staticmethod
    def make(width: int, height: int, rfilter: str = "tent",
             gamma: float = 2.2, annotations=(), banner=False) -> "Film":
        kind, radius = FILTERS[rfilter]
        return Film(width, height, kind, radius, gamma,
                    tuple(annotations), bool(banner))


def splat_samples(film: Film, pos, value, image, weight):
    """Scatter-add filtered samples into the accumulators.

    pos:    [N, 2] continuous image coordinates (pixel centers at i + 0.5)
    value:  [N, 3] radiance
    image:  [H, W, 3] accumulator, weight: [H, W]
    Returns updated (image, weight).
    """
    radius = film.filter_radius
    n_taps = int(pymath.ceil(2.0 * radius)) + 1
    x = pos[..., 0]
    y = pos[..., 1]
    # first pixel whose center (i + 0.5) can be inside [x - r, x + r]
    x0 = jnp.ceil(x - radius - 0.5).astype(jnp.int32)
    y0 = jnp.ceil(y - radius - 0.5).astype(jnp.int32)

    H, W = film.height, film.width
    for ty in range(n_taps):
        iy = y0 + ty
        cy = iy.astype(jnp.float32) + 0.5
        for tx in range(n_taps):
            ix = x0 + tx
            cx = ix.astype(jnp.float32) + 0.5
            w = filter_eval(film.filter_kind, radius, cx - x, cy - y)
            valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            w = jnp.where(valid, w, 0.0)
            ixc = jnp.clip(ix, 0, W - 1)
            iyc = jnp.clip(iy, 0, H - 1)
            image = image.at[iyc, ixc].add(w[..., None] * value,
                                           mode="drop")
            weight = weight.at[iyc, ixc].add(w, mode="drop")
    return image, weight


def develop(image, weight):
    """Weighted-average normalize (HDRFilm::develop semantics)."""
    return image / jnp.maximum(weight, 1e-8)[..., None]


def zeros(film: Film):
    return (jnp.zeros((film.height, film.width, 3), jnp.float32),
            jnp.zeros((film.height, film.width), jnp.float32))


def splat_add_only(film: Film, pos, value, image):
    """Nearest-pixel scatter-add with no weight bookkeeping — for
    measurement-estimate splats (BDPT t=1 / light tracing), which are
    already normalized by sample count (reference: hdrfilm's separate
    `develop` splat buffer with splatScale)."""
    ix = jnp.clip(jnp.floor(pos[..., 0]).astype(jnp.int32), 0,
                  film.width - 1)
    iy = jnp.clip(jnp.floor(pos[..., 1]).astype(jnp.int32), 0,
                  film.height - 1)
    inb = (pos[..., 0] >= 0) & (pos[..., 0] < film.width) \
        & (pos[..., 1] >= 0) & (pos[..., 1] < film.height)
    return image.at[iy, ix].add(jnp.where(inb[..., None], value, 0.0),
                                mode="drop")
