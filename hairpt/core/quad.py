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
