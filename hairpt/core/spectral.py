"""Spectral (N > 3 bins) rendering support.

Capability counterpart of the reference's compile-time
``SPECTRUM_SAMPLES > 3`` mode (include/mitsuba/core/spectrum.h:25,
spectrum.cpp: continuous spectra + CIE integration): hairpt renders RGB
by default, and `integrators/spectral.render_spectral` re-runs the
3-channel pipeline per WAVELENGTH BAND of 3 bins (each SoA channel
carries one wavelength), integrating the per-bin radiance against the
CIE color matching functions into XYZ → linear sRGB.

This module provides the colorimetry:
  * cmf_xyz(lam)    — CIE 1931 2° x̄ȳz̄ via the Wyman-Sloan-Shirley
                      multi-Gaussian analytic fit (no tables needed)
  * upsample_basis  — smooth RGB→SPD bases, linearly corrected so that
                      SPD → (CMF integration) → XYZ → sRGB round-trips
                      the identity EXACTLY (up to the nonneg clamp for
                      very saturated inputs) for any bin layout
  * xyz_to_rgb / rgb_to_xyz — linear sRGB (D65) matrices
"""
from __future__ import annotations

import numpy as np

LAM_MIN = 380.0
LAM_MAX = 720.0

# linear sRGB <-> XYZ (D65 white), IEC 61966-2-1
XYZ_TO_RGB = np.array([
    [3.2404542, -1.5371385, -0.4985314],
    [-0.9692660, 1.8760108, 0.0415560],
    [0.0556434, -0.2040259, 1.0572252]])
RGB_TO_XYZ = np.linalg.inv(XYZ_TO_RGB)


def _g(x, mu, s1, s2):
    s = np.where(x < mu, s1, s2)
    return np.exp(-0.5 * ((x - mu) / s) ** 2)


def cmf_xyz(lam):
    """CIE 1931 2° color matching functions at wavelengths lam [nm].
    Wyman, Sloan & Shirley 2013 'Simple Analytic Approximations to the
    CIE XYZ Color Matching Functions' (multi-lobe Gaussian fit).
    Returns [..., 3] (x̄, ȳ, z̄)."""
    lam = np.asarray(lam, np.float64)
    x = (1.056 * _g(lam, 599.8, 37.9, 31.0)
         + 0.362 * _g(lam, 442.0, 16.0, 26.7)
         - 0.065 * _g(lam, 501.1, 20.4, 26.2))
    y = (0.821 * _g(lam, 568.8, 46.9, 40.5)
         + 0.286 * _g(lam, 530.9, 16.3, 31.1))
    z = (1.217 * _g(lam, 437.0, 11.8, 36.0)
         + 0.681 * _g(lam, 459.0, 26.0, 13.8))
    return np.stack([x, y, z], axis=-1)


def bin_centers(n_bins: int):
    """n_bins uniform bin centers over [LAM_MIN, LAM_MAX] + bin width."""
    edges = np.linspace(LAM_MIN, LAM_MAX, n_bins + 1)
    return 0.5 * (edges[:-1] + edges[1:]), edges[1] - edges[0]


def _raw_bases(lam):
    """Smooth non-negative primaries (roughly sRGB-hued Gaussians) used
    as the RGB→SPD upsampling basis before correction. [..., 3]."""
    lam = np.asarray(lam, np.float64)
    r = _g(lam, 615.0, 45.0, 55.0) + 0.12 * _g(lam, 430.0, 25.0, 25.0)
    g = _g(lam, 545.0, 40.0, 45.0)
    b = _g(lam, 462.0, 28.0, 38.0)
    return np.stack([r, g, b], axis=-1)


def rgb_weights(n_bins: int):
    """Per-bin RGB integration weights W [n_bins, 3]: a per-bin radiance
    array S [..., n_bins] integrates directly to linear sRGB as S @ W.
    Built from the CIE CMFs + XYZ→sRGB, then column-normalized so a FLAT
    spectrum integrates to exactly (1, 1, 1) — the von-Kries adaptation
    from the equal-energy white the bins integrate under to the sRGB
    (D65) white the rest of the pipeline assumes."""
    lam, dl = bin_centers(n_bins)
    cm = cmf_xyz(lam)
    W = (cm * dl) @ XYZ_TO_RGB.T              # [N, 3(rgb)]
    W = W / np.sum(W, axis=0, keepdims=True)  # flat → (1, 1, 1)
    return W, lam, dl


def upsample_basis(n_bins: int):
    """Corrected RGB→SPD basis for an n_bins layout.

    Returns (A [n_bins, 3], lam [n_bins], dl): spd = clip(A @ rgb, 0).
    Constructed so that integrating A@rgb with rgb_weights reproduces
    rgb exactly (up to the nonneg clamp for very saturated inputs):
        M = W.T @ B,   A = B @ inv(M)   ⇒   W.T @ A = I."""
    lam, dl = bin_centers(n_bins)
    B = _raw_bases(lam)                       # [N, 3]
    W, _, _ = rgb_weights(n_bins)
    M = W.T @ B                               # [3(rgb), 3(basis)]
    A = B @ np.linalg.inv(M)                  # [N, 3(rgb)]
    return A, lam, dl


def cauchy_eta(eta_d, b_um2, lam_nm):
    """Cauchy dispersion: η(λ) = η_d + B(1/λ² − 1/λ_d²), λ in µm,
    λ_d = 589.3 nm (the sodium D line the scene η is quoted at).
    b_um2 is the Cauchy B coefficient in µm² (e.g. ~0.0042 for BK7)."""
    lam_um = np.asarray(lam_nm, np.float64) / 1000.0
    return eta_d + b_um2 * (1.0 / lam_um ** 2 - 1.0 / 0.5893 ** 2)
