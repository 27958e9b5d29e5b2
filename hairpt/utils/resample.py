"""Bitmap resampling with the reconstruction-filter library.

TPU-first counterpart of the reference's `Bitmap::resample` /
`Resampler<Scalar>` (include/mitsuba/core/bitmap.h:1040-1090,
src/libcore/bitmap.cpp:2230-2300, core/rfilter.h): separable filtered
resampling expressed as TWO DENSE MATMULS — out = W_y · img · W_xᵀ — so
the whole operation rides the MXU instead of the reference's per-row
scalar convolution loops. Boundary conditions (clamp/wrap/mirror/zero)
fold into the weight matrices at build time; optional range clamping
suppresses ringing for negative-lobe filters exactly like the
reference's min/max clamp pass.
"""
from __future__ import annotations

import numpy as np

from ..film.rfilter import FILTERS, filter_eval

BOUNDARIES = ("clamp", "wrap", "mirror", "zero")


def _filter_1d(kind: int, x: np.ndarray, radius: float) -> np.ndarray:
    """1-D filter profile via the separable 2-D eval at dy=0 (the f(0)
    factor cancels in the row normalization below)."""
    import jax.numpy as jnp
    w = filter_eval(kind, radius, jnp.asarray(x, jnp.float32),
                    jnp.zeros_like(jnp.asarray(x, jnp.float32)))
    return np.asarray(w, np.float64)


def resample_matrix(filter_name: str, src_n: int, dst_n: int,
                    boundary: str = "clamp") -> np.ndarray:
    """[dst_n, src_n] row-normalized resampling weights for one axis.

    Downsampling widens the kernel by the scale factor (low-pass), as in
    the reference Resampler's `filterRadius * scale` path."""
    if boundary not in BOUNDARIES:
        raise ValueError(f"boundary must be one of {BOUNDARIES}")
    kind, radius = FILTERS[filter_name]
    scale = src_n / dst_n
    kscale = max(1.0, scale)          # kernel dilation when minifying
    r = radius * kscale
    W = np.zeros((dst_n, src_n), np.float64)
    j = np.arange(dst_n)
    centers = (j + 0.5) * scale       # target centers in source coords
    lo = np.floor(centers - r + 0.5).astype(np.int64)
    hi = np.ceil(centers + r - 0.5).astype(np.int64)
    n_tap = int((hi - lo).max()) + 1
    taps = lo[:, None] + np.arange(n_tap)[None, :]          # [dst, taps]
    off = (taps + 0.5 - centers[:, None]) / kscale
    w = _filter_1d(kind, off.astype(np.float32), radius)
    if boundary == "clamp":
        idx = np.clip(taps, 0, src_n - 1)
    elif boundary == "wrap":
        idx = np.mod(taps, src_n)
    elif boundary == "mirror":
        period = 2 * src_n
        m = np.mod(taps, period)
        idx = np.where(m < src_n, m, period - 1 - m)
    else:                              # zero: drop out-of-range taps
        inside = (taps >= 0) & (taps < src_n)
        w = np.where(inside, w, 0.0)
        idx = np.clip(taps, 0, src_n - 1)
    np.add.at(W, (np.repeat(j, n_tap), idx.reshape(-1)), w.reshape(-1))
    s = W.sum(axis=1, keepdims=True)
    # zero-boundary rows fully outside keep their (partial) mass; others
    # normalize to exactly preserve constants (bitmap.cpp does the same
    # per-row normalization in Resampler's ctor)
    W = np.where(s > 1e-9, W / np.maximum(s, 1e-9), W)
    return W.astype(np.float32)


def resample(img, width: int, height: int, filter_name: str = "lanczos",
             boundary: str = "clamp", clamp: tuple | None = None):
    """Resample [H, W] or [H, W, C] to (height, width).

    clamp=(lo, hi) bounds the output (ringing suppression for
    negative-lobe filters — bitmap.h:1066 minValue/maxValue); pass
    clamp="auto" to clamp to the source range per channel."""
    import jax.numpy as jnp
    img = jnp.asarray(img)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W0, C = img.shape
    Wy = jnp.asarray(resample_matrix(filter_name, H, height, boundary))
    Wx = jnp.asarray(resample_matrix(filter_name, W0, width, boundary))
    flat = img.reshape(H, W0 * C)
    mid = (Wy @ flat).reshape(height, W0, C)                # rows
    mid = jnp.swapaxes(mid, 0, 1).reshape(W0, height * C)
    out = (Wx @ mid).reshape(width, height, C)
    out = jnp.swapaxes(out, 0, 1)                           # cols
    if clamp == "auto":
        lo = img.min(axis=(0, 1))
        hi = img.max(axis=(0, 1))
        out = jnp.clip(out, lo, hi)
    elif clamp is not None:
        out = jnp.clip(out, clamp[0], clamp[1])
    return out[..., 0] if squeeze else out
