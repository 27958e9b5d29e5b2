"""Misc numerics: Brent root finding, Catmull-Rom cubic splines, real
spherical harmonics.

Capability counterparts of the reference's include/mitsuba/core/
{brent.h, spline.h, shvector.h} + src/libcore/{brent,spline,shvector}.cpp,
re-expressed as batched jnp functions (fixed-iteration bisection/Brent
hybrid instead of data-dependent loops so everything jits; SH projection
by Gauss-Legendre×trapezoid product quadrature instead of the reference's
32×64 rule)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Brent's method (reference: brent.h BrentSolver::solve)
# ---------------------------------------------------------------------------

def brent_solve(f, a, b, iters: int = 64, xtol: float = 1e-7):
    """Vectorized Brent root find of f on bracketing interval [a, b]
    (f(a)·f(b) ≤ 0 required, like BrentSolver::solve). f maps arrays to
    arrays; a/b broadcastable. Fixed `iters` iterations (jit-friendly).
    Returns the root estimate."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    fa = f(a)
    fb = f(b)
    # ensure |f(b)| <= |f(a)| (b is the better guess)
    swap = jnp.abs(fa) < jnp.abs(fb)
    a, b = jnp.where(swap, b, a), jnp.where(swap, a, b)
    fa, fb = jnp.where(swap, fb, fa), jnp.where(swap, fa, fb)

    def body(i, st):
        a, b, c, fa, fb, fc, mflag = st
        # secant / inverse quadratic step
        use_iq = (fa != fc) & (fb != fc)
        denom_iq0 = (fa - fb) * (fa - fc)
        denom_iq1 = (fb - fa) * (fb - fc)
        denom_iq2 = (fc - fa) * (fc - fb)
        s_iq = a * fb * fc / jnp.where(denom_iq0 == 0, 1, denom_iq0) \
            + b * fa * fc / jnp.where(denom_iq1 == 0, 1, denom_iq1) \
            + c * fa * fb / jnp.where(denom_iq2 == 0, 1, denom_iq2)
        s_sec = b - fb * (b - a) / jnp.where(fb == fa, 1, fb - fa)
        s = jnp.where(use_iq, s_iq, s_sec)
        lo = (3 * a + b) / 4
        cond_bisect = ((s < jnp.minimum(lo, b)) | (s > jnp.maximum(lo, b))
                       | (mflag & (jnp.abs(s - b) >= jnp.abs(b - c) / 2))
                       | (~mflag & (jnp.abs(s - b) >= jnp.abs(c - b) / 2)))
        s = jnp.where(cond_bisect, 0.5 * (a + b), s)
        mflag = cond_bisect
        fs = f(s)
        c, fc = b, fb
        left = fa * fs < 0
        a2 = jnp.where(left, a, s)
        fa2 = jnp.where(left, fa, fs)
        b2 = jnp.where(left, s, b)
        fb2 = jnp.where(left, fs, fb)
        swap = jnp.abs(fa2) < jnp.abs(fb2)
        a3 = jnp.where(swap, b2, a2)
        b3 = jnp.where(swap, a2, b2)
        fa3 = jnp.where(swap, fb2, fa2)
        fb3 = jnp.where(swap, fa2, fb2)
        return a3, b3, c, fa3, fb3, fc, mflag

    st = (a, b, a, fa, fb, fa, jnp.ones_like(a, bool))
    st = jax.lax.fori_loop(0, iters, body, st)
    return st[1]


# ---------------------------------------------------------------------------
# Catmull-Rom cubic spline interpolation on a uniform grid
# (reference: spline.h evalCubicInterp1D / integrate / sample)
# ---------------------------------------------------------------------------

def eval_cubic_1d(x, values, xmin: float, xmax: float):
    """Catmull-Rom interpolation of `values` sampled uniformly on
    [xmin, xmax] at query points x (0 outside the domain, matching
    evalCubicInterp1D's extrapolate=false)."""
    values = jnp.asarray(values, jnp.float32)
    n = values.shape[0]
    t = (x - xmin) / (xmax - xmin) * (n - 1)
    inside = (t >= 0) & (t <= n - 1)
    i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 2)
    u = t - i
    f0 = values[i]
    f1 = values[i + 1]
    # one-sided derivatives at the boundary (spline.cpp behavior)
    d0 = jnp.where(i > 0, 0.5 * (f1 - values[jnp.maximum(i - 1, 0)]),
                   f1 - f0)
    d1 = jnp.where(i + 2 < n,
                   0.5 * (values[jnp.minimum(i + 2, n - 1)] - f0),
                   f1 - f0)
    u2 = u * u
    u3 = u2 * u
    val = (2 * u3 - 3 * u2 + 1) * f0 + (-2 * u3 + 3 * u2) * f1 \
        + (u3 - 2 * u2 + u) * d0 + (u3 - u2) * d1
    return jnp.where(inside, val, 0.0)


def integrate_cubic_1d(values, xmin: float, xmax: float):
    """Per-interval definite integrals of the Catmull-Rom interpolant
    (reference: integrateCubicInterp1D). Returns [n-1] interval areas."""
    values = np.asarray(values, np.float64)
    n = len(values)
    w = (xmax - xmin) / (n - 1)
    f0 = values[:-1]
    f1 = values[1:]
    d0 = np.empty(n - 1)
    d1 = np.empty(n - 1)
    d0[0] = f1[0] - f0[0]
    d0[1:] = 0.5 * (values[2:] - values[:-2])
    d1[:-1] = d0[1:]
    d1[-1] = f1[-1] - f0[-1]
    # ∫0^1 of the Hermite basis: h00=1/2, h10=1/12, h01=1/2, h11=-1/12
    return w * (0.5 * (f0 + f1) + (d0 - d1) / 12.0)


def sample_cubic_1d(u, values, xmin: float, xmax: float, iters: int = 40):
    """Importance-sample x ∝ the (non-negative) Catmull-Rom interpolant
    of `values` (reference: sampleCubicInterp1D, Newton there; bisection
    on the monotone CDF here). Returns (x, pdf)."""
    areas = integrate_cubic_1d(values, xmin, xmax)
    cdf = np.concatenate([[0.0], np.cumsum(areas)])
    total = cdf[-1]
    cdf_n = jnp.asarray(cdf / total, jnp.float32)
    vals = jnp.asarray(values, jnp.float32)
    n = len(values)

    u = jnp.asarray(u, jnp.float32)
    idx = jnp.clip(jnp.searchsorted(cdf_n, u, side="right") - 1, 0, n - 2)
    w = (xmax - xmin) / (n - 1)

    # within-interval CDF inversion by bisection on the quartic
    u_loc = (u - cdf_n[idx]) / jnp.maximum(cdf_n[idx + 1] - cdf_n[idx],
                                           1e-12)
    x_lo = xmin + idx.astype(jnp.float32) * w
    lo = jnp.zeros_like(u)
    hi = jnp.ones_like(u)

    f0 = vals[idx]
    f1 = vals[idx + 1]
    d0 = jnp.where(idx > 0, 0.5 * (f1 - vals[jnp.maximum(idx - 1, 0)]),
                   f1 - f0)
    d1 = jnp.where(idx + 2 < n,
                   0.5 * (vals[jnp.minimum(idx + 2, n - 1)] - f0),
                   f1 - f0)

    def cdf_local(t):
        # ∫0^t hermite(u) du, normalized by ∫0^1
        t2 = t * t
        t3 = t2 * t
        t4 = t3 * t
        h00 = 0.5 * t4 - t3 + t
        h10 = 0.25 * t4 - (2.0 / 3.0) * t3 + 0.5 * t2
        h01 = -0.5 * t4 + t3
        h11 = 0.25 * t4 - t3 / 3.0
        num = h00 * f0 + h10 * d0 + h01 * f1 + h11 * d1
        den = 0.5 * (f0 + f1) + (d0 - d1) / 12.0
        return num / jnp.maximum(den, 1e-12)

    def body(i, st):
        lo, hi = st
        mid = 0.5 * (lo + hi)
        below = cdf_local(mid) < u_loc
        return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    t = 0.5 * (lo + hi)
    x = x_lo + t * w
    pdf = eval_cubic_1d(x, vals, xmin, xmax) / total
    return x, pdf


# ---------------------------------------------------------------------------
# Real spherical harmonics (reference: shvector.h SHVector)
# ---------------------------------------------------------------------------

def _assoc_legendre(l_max: int, x):
    """All P_l^m(x) for 0<=m<=l<=l_max, via stable recurrences. Returns a
    dict (l, m) -> array."""
    P = {}
    P[(0, 0)] = jnp.ones_like(x)
    if l_max == 0:
        return P
    somx2 = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))
    for m in range(l_max + 1):
        if m > 0:
            P[(m, m)] = -(2 * m - 1) * somx2 * P[(m - 1, m - 1)]
        if m < l_max:
            P[(m + 1, m)] = x * (2 * m + 1) * P[(m, m)]
        for l in range(m + 2, l_max + 1):
            P[(l, m)] = ((2 * l - 1) * x * P[(l - 1, m)]
                         - (l + m - 1) * P[(l - 2, m)]) / (l - m)
    return P


def sh_eval_basis(l_max: int, theta, phi):
    """Real SH basis Y_l^m(θ, φ) for all l<=l_max, ordered like the
    reference's SHVector::operator() (l, m with m in [-l, l]).
    Returns [..., (l_max+1)²]."""
    from math import factorial
    x = jnp.cos(theta)
    P = _assoc_legendre(l_max, x)
    out = []
    for l in range(l_max + 1):
        for m in range(-l, l + 1):
            am = abs(m)
            norm = np.sqrt((2 * l + 1) / (4 * np.pi)
                           * factorial(l - am) / factorial(l + am))
            if m > 0:
                y = np.sqrt(2.0) * norm * P[(l, am)] * jnp.cos(m * phi)
            elif m < 0:
                y = np.sqrt(2.0) * norm * P[(l, am)] * jnp.sin(am * phi)
            else:
                y = norm * P[(l, 0)]
            out.append(y)
    return jnp.stack(out, axis=-1)


def sh_project(f, l_max: int, res: int = 32):
    """Project f(theta, phi) onto SH up to l_max by Gauss-Legendre (θ) ×
    trapezoid (φ) quadrature (reference: SHVector::project, res=32).
    Returns [(l_max+1)²] coefficients."""
    xg, wg = np.polynomial.legendre.leggauss(res)
    theta = jnp.asarray(np.arccos(xg), jnp.float32)           # [res]
    phi = jnp.asarray((np.arange(2 * res) + 0.5) / (2 * res)
                      * 2 * np.pi, jnp.float32)               # [2res]
    th, ph = jnp.meshgrid(theta, phi, indexing="ij")
    vals = f(th, ph)                                          # [res, 2res]
    basis = sh_eval_basis(l_max, th, ph)                      # [..., B]
    w = jnp.asarray(wg, jnp.float32)[:, None] * (2 * np.pi / (2 * res))
    return jnp.sum(vals[..., None] * basis * w[..., None], axis=(0, 1))


def sh_eval(coeffs, l_max: int, theta, phi):
    """Evaluate an SH expansion at (θ, φ)."""
    basis = sh_eval_basis(l_max, theta, phi)
    return jnp.sum(jnp.asarray(coeffs, jnp.float32) * basis, axis=-1)
