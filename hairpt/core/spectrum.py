"""RGB spectrum helpers.

The reference renders in RGB (SPECTRUM_SAMPLES == 3,
include/mitsuba/core/spectrum.h:25); radiance here is a trailing [..., 3]
axis on SoA arrays.
"""
from __future__ import annotations

import jax.numpy as jnp


def luminance(rgb):
    """ITU-R BT.709 luminance, matching Spectrum::getLuminance
    (reference: spectrum.h / spectrum.cpp)."""
    w = jnp.asarray([0.212671, 0.715160, 0.072169], rgb.dtype)
    return jnp.sum(rgb * w, axis=-1)


def srgb_gamma(x):
    """Linear → sRGB transfer curve (reference: Bitmap gamma handling,
    src/libcore/bitmap.cpp)."""
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.0031308,
                     12.92 * x,
                     1.055 * jnp.power(jnp.maximum(x, 1e-8), 1.0 / 2.4) - 0.055)


def inv_srgb_gamma(y):
    y = jnp.clip(y, 0.0, 1.0)
    return jnp.where(y <= 0.04045, y / 12.92,
                     jnp.power((y + 0.055) / 1.055, 2.4))


def gamma_encode(x, gamma: float):
    """Simple power-law gamma as used by ldrfilm (gamma=2.2 in all scenes)."""
    return jnp.power(jnp.clip(x, 0.0, 1.0), 1.0 / gamma)


def blackbody_rgb(temperature_k):
    """Very small Planckian locus approximation for completeness of the
    `blackbody` spectrum capability (reference: spectrum.cpp BlackBodySpectrum).
    Returns linear RGB normalized to unit luminance."""
    t = jnp.clip(temperature_k, 1000.0, 40000.0) / 100.0
    # Tanner Helland style fit
    r = jnp.where(t <= 66.0, 255.0,
                  329.698727446 * jnp.power(jnp.maximum(t - 60.0, 1e-3), -0.1332047592))
    g = jnp.where(t <= 66.0,
                  99.4708025861 * jnp.log(jnp.maximum(t, 1e-3)) - 161.1195681661,
                  288.1221695283 * jnp.power(jnp.maximum(t - 60.0, 1e-3), -0.0755148492))
    b = jnp.where(t >= 66.0, 255.0,
                  jnp.where(t <= 19.0, 0.0,
                            138.5177312231 * jnp.log(jnp.maximum(t - 10.0, 1e-3))
                            - 305.0447927307))
    rgb = jnp.stack([r, g, b], axis=-1) / 255.0
    rgb = jnp.clip(rgb, 0.0, 1.0) ** 2.2
    lum = jnp.sum(rgb * jnp.asarray([0.212671, 0.715160, 0.072169]), axis=-1,
                  keepdims=True)
    return rgb / jnp.maximum(lum, 1e-6)
