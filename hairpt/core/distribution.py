"""Discrete CDF sampling utilities (jit/vmap friendly).

TPU-native replacement for the reference's DiscreteDistribution
(include/mitsuba/core/pmf.h), the 2D envmap distribution
(src/emitters/envmap.cpp) and the fork's InterpolatedDistribution1D
(src/bsdfs/InterpolatedDistribution1D.hpp:1-112): CDFs are dense arrays,
inversion is a vectorized searchsorted instead of per-sample binary search.
"""
from __future__ import annotations

import jax.numpy as jnp


def build_cdf(weights):
    """weights [..., N] → (cdf [..., N], total [...]) with cdf[..., -1] == 1
    (unless total == 0, in which case the cdf is uniform)."""
    c = jnp.cumsum(weights, axis=-1)
    total = c[..., -1]
    n = weights.shape[-1]
    safe = total[..., None] > 0
    uniform = (jnp.arange(1, n + 1, dtype=weights.dtype)) / n
    cdf = jnp.where(safe, c / jnp.maximum(total[..., None], 1e-30), uniform)
    return cdf, total


def sample_discrete(cdf, u):
    """Invert a normalized CDF [..., N] at u [...]. Returns (index, prob, u_rescaled).

    u_rescaled reuses the sample within the chosen bin (Mitsuba's
    sampleReuse pattern, core/pmf.h:178)."""
    n = cdf.shape[-1]
    idx = jnp.sum((cdf < u[..., None]).astype(jnp.int32), axis=-1)
    idx = jnp.clip(idx, 0, n - 1)
    hi = jnp.take_along_axis(cdf, idx[..., None], axis=-1)[..., 0]
    lo = jnp.where(idx > 0,
                   jnp.take_along_axis(cdf, jnp.maximum(idx - 1, 0)[..., None],
                                       axis=-1)[..., 0],
                   0.0)
    prob = hi - lo
    u_rescaled = jnp.clip((u - lo) / jnp.maximum(prob, 1e-30), 0.0, 1.0 - 1e-7)
    return idx, prob, u_rescaled


def sample_continuous(cdf, u):
    """Sample x ∈ [0,1) with density ∝ piecewise-constant weights.
    Returns (x, pdf_wrt_x)."""
    n = cdf.shape[-1]
    idx, prob, ur = sample_discrete(cdf, u)
    x = (idx.astype(cdf.dtype) + ur) / n
    pdf = prob * n
    return x, pdf


def pdf_continuous(cdf, x):
    """Density at x ∈ [0,1) for the piecewise-constant distribution."""
    n = cdf.shape[-1]
    idx = jnp.clip((x * n).astype(jnp.int32), 0, n - 1)
    hi = jnp.take_along_axis(cdf, idx[..., None], axis=-1)[..., 0]
    lo = jnp.where(idx > 0,
                   jnp.take_along_axis(cdf, jnp.maximum(idx - 1, 0)[..., None],
                                       axis=-1)[..., 0],
                   0.0)
    return (hi - lo) * n


class InterpolatedCdf1D:
    """A family of R row distributions over N bins, indexed by a continuous
    row coordinate v ∈ [0, R-1]; the neighbouring rows' weights are linearly
    blended before sampling (reference: InterpolatedDistribution1D.hpp:69-112).
    """

    def __init__(self, weights):
        # weights: [R, N] (host or device array)
        self.weights = jnp.asarray(weights, jnp.float32)
        self.rows, self.bins = self.weights.shape
        self.row_sums = jnp.sum(self.weights, axis=-1)

    def _blend(self, v):
        v = jnp.clip(v, 0.0, self.rows - 1 - 1e-6)
        r0 = jnp.clip(v.astype(jnp.int32), 0, self.rows - 2)
        fv = v - r0.astype(v.dtype)
        w0 = self.weights[r0]        # [..., N]
        w1 = self.weights[r0 + 1]
        return w0 * (1.0 - fv[..., None]) + w1 * fv[..., None]

    def sum(self, v):
        v = jnp.clip(v, 0.0, self.rows - 1 - 1e-6)
        r0 = jnp.clip(v.astype(jnp.int32), 0, self.rows - 2)
        fv = v - r0.astype(v.dtype)
        return self.row_sums[r0] * (1.0 - fv) + self.row_sums[r0 + 1] * fv

    def sample(self, v, u):
        """Returns (bin_index, u_rescaled, prob_of_bin)."""
        w = self._blend(v)
        cdf, _ = build_cdf(w)
        idx, prob, ur = sample_discrete(cdf, u)
        return idx, ur, prob

    def pdf_bin(self, v, idx):
        """Unnormalized-to-normalized probability of a bin under row v."""
        w = self._blend(v)
        total = jnp.sum(w, axis=-1)
        sel = jnp.take_along_axis(w, jnp.clip(idx, 0, self.bins - 1)[..., None],
                                  axis=-1)[..., 0]
        return sel / jnp.maximum(total, 1e-30)
