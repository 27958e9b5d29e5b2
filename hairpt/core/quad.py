"""Quadrature rules (host-side precompute).

Replaces the reference's GaussLegendre<N> Newton-Raphson root finder
(reference: src/bsdfs/gausssexylingerie.hpp:1-97) and the Gauss-Lobatto
rules in core/quad.h with numpy's Golub-Welsch eigenvalue method — the
nodes/weights are computed once at scene build and baked into jit constants.
"""
from __future__ import annotations

import numpy as np


def gauss_legendre(n: int):
    """Nodes and weights on [-1, 1]."""
    x, w = np.polynomial.legendre.leggauss(n)
    return x.astype(np.float64), w.astype(np.float64)


def gauss_lobatto(f, a: float, b: float, abs_err: float = 0.0,
                  rel_err: float = 1e-6, max_evals: int = 100000) -> float:
    """Adaptive Gauss-Lobatto quadrature of a scalar function on [a, b]
    (Gander & Gautschi 2000 'adaptlob'), mirroring the reference's
    GaussLobattoIntegrator::integrate (src/libcore/quad.cpp:295-420):
    a 13-point Kronrod estimate calibrates the absolute tolerance, then
    each interval is accepted when the 7-point Kronrod and 4-point Lobatto
    rules agree to within it. Host-side precompute only (pure Python)."""
    if abs_err == 0.0 and rel_err == 0.0:
        raise ValueError("need a nonzero absolute or relative tolerance")
    alpha = np.sqrt(2.0 / 3.0)
    beta = 1.0 / np.sqrt(5.0)
    x1 = 0.94288241569547971906
    x2 = 0.64185334234578130578
    x3 = 0.23638319966214988028
    # 13-point degree-? rule weights (quad.cpp:325-369)
    A, B, C = 0.015827191973480183087, 0.094273840218850045531, \
        0.15507198733658539625
    D, E, F2, G = 0.18882157396018245442, 0.19977340522685852679, \
        0.22492646533333952701, 0.24261107190140773379

    m = 0.5 * (a + b)
    h = 0.5 * (b - a)
    xs = [a, m - x1 * h, m - alpha * h, m - x2 * h, m - beta * h,
          m - x3 * h, m, m + x3 * h, m + beta * h, m + x2 * h,
          m + alpha * h, m + x1 * h, b]
    y = [float(f(x)) for x in xs]
    evals = [13]

    i2 = (h / 6.0) * (y[0] + y[12] + 5.0 * (y[4] + y[8]))
    i1 = (h / 1470.0) * (77.0 * (y[0] + y[12]) + 432.0 * (y[2] + y[10])
                         + 625.0 * (y[4] + y[8]) + 672.0 * y[6])
    i_s = h * (A * (y[0] + y[12]) + B * (y[1] + y[11]) + C * (y[2] + y[10])
               + D * (y[3] + y[9]) + E * (y[4] + y[8]) + F2 * (y[5] + y[7])
               + G * y[6])
    err_i1 = abs(i1 - i_s)
    err_i2 = abs(i2 - i_s)
    r = err_i1 / err_i2 if err_i2 != 0.0 else 1.0
    tol = rel_err
    if 0.0 < r < 1.0:
        tol /= r
    i_s = abs(i_s) * tol / np.finfo(np.float64).eps
    if i_s == 0.0:
        i_s = abs(b - a)
    if abs_err != 0.0:
        i_s = min(i_s, abs_err / np.finfo(np.float64).eps)

    def step(a_, b_, fa, fb, acc):
        if evals[0] >= max_evals:
            return None
        h_ = 0.5 * (b_ - a_)
        m_ = 0.5 * (a_ + b_)
        mll, ml = m_ - alpha * h_, m_ - beta * h_
        mr, mrr = m_ + beta * h_, m_ + alpha * h_
        fmll, fml, fm = float(f(mll)), float(f(ml)), float(f(m_))
        fmr, fmrr = float(f(mr)), float(f(mrr))
        evals[0] += 5
        i2_ = (h_ / 6.0) * (fa + fb + 5.0 * (fml + fmr))
        i1_ = (h_ / 1470.0) * (77.0 * (fa + fb) + 432.0 * (fmll + fmrr)
                               + 625.0 * (fml + fmr) + 672.0 * fm)
        # termination when the machine-scaled estimates agree or the
        # interval hits floating-point resolution (quad.cpp:371-405)
        if (i_s + (i1_ - i2_) == i_s) or mll <= a_ or b_ <= mrr:
            return i1_
        parts = (step(a_, mll, fa, fmll, acc),
                 step(mll, ml, fmll, fml, acc),
                 step(ml, m_, fml, fm, acc),
                 step(m_, mr, fm, fmr, acc),
                 step(mr, mrr, fmr, fmrr, acc),
                 step(mrr, b_, fmrr, fb, acc))
        if any(p is None for p in parts):
            return i1_
        return sum(parts)

    out = step(a, b, y[0], y[12], i_s)
    return out if out is not None else i1


def composite_simpson(n: int):
    """Composite Simpson weights on [0, 1] with n (odd) samples."""
    if n % 2 == 0:
        n += 1
    x = np.linspace(0.0, 1.0, n)
    w = np.ones(n)
    w[1:-1:2] = 4.0
    w[2:-1:2] = 2.0
    w *= (x[1] - x[0]) / 3.0
    return x, w
