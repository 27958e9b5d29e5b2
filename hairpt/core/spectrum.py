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


def planck_radiance(lam_nm, temperature_k):
    """EXACT Planck's law — spectral radiance of a blackbody in
    W / (m² · sr · nm), the same quantity the reference computes
    (src/libcore/spectrum.cpp:1528 BlackBodySpectrum::eval:
    (2hc²)/(λ⁵·(exp(hc/(λkT))−1)) · 1e-9). Host-side float64 numpy —
    spectra are resolved at scene-build time."""
    import numpy as np
    h = 6.62607015e-34          # Planck constant [J s] (SI 2019 exact)
    c = 299792458.0             # speed of light [m/s]
    kb = 1.380649e-23           # Boltzmann constant [J/K]
    lam = np.asarray(lam_nm, np.float64) * 1e-9
    t = np.asarray(temperature_k, np.float64)
    x = h * c / (lam * kb * np.maximum(t, 1e-6))
    # expm1 keeps the long-wavelength (x→0) limit exact
    return (2.0 * h * c * c) / (lam ** 5 * np.expm1(x)) * 1e-9


def blackbody_rgb_exact(temperature_k, scale: float = 1.0,
                        normalize: bool = False):
    """Exact blackbody color: Planck's law integrated against the CIE
    color matching functions over [380, 720] nm → linear sRGB (replaces
    the Planckian-locus fit; reference parity: BlackBodySpectrum +
    Spectrum::fromContinuousSpectrum + toLinearRGB, spectrum.cpp:1528).
    normalize=True rescales to unit luminance (color-only use);
    otherwise the ABSOLUTE radiometric scale (W/(m²·sr·nm) integrated
    per CMF) is kept, times `scale`."""
    import numpy as np
    from . import spectral
    lam = np.linspace(spectral.LAM_MIN, spectral.LAM_MAX, 512)
    spd = planck_radiance(lam, temperature_k)
    cm = spectral.cmf_xyz(lam)
    dl = lam[1] - lam[0]
    # CIE Y integrates to luminance with the 683 lm/W scaling dropped
    # (the reference likewise keeps radiometric units)
    xyz = np.sum(spd[..., None] * cm, axis=-2) * dl
    rgb = xyz @ spectral.XYZ_TO_RGB.T
    rgb = np.maximum(rgb, 0.0)
    if normalize:
        lum = np.maximum(rgb @ np.array([0.212671, 0.715160, 0.072169]),
                         1e-30)
        return rgb / lum
    return rgb * scale


class InterpolatedSpectrum:
    """Piecewise-linear spectrum over irregular wavelength samples —
    parity with the reference's InterpolatedSpectrum
    (src/libcore/spectrum.cpp: eval = linear interpolation, average =
    exact integral of the interpolant over a bin / its width, zero
    outside the sampled range)."""

    def __init__(self, wavelengths, values):
        import numpy as np
        w = np.asarray(wavelengths, np.float64)
        v = np.asarray(values, np.float64)
        order = np.argsort(w)
        self.w = w[order]
        self.v = v[order]
        if len(self.w) < 2:
            raise ValueError("InterpolatedSpectrum needs >= 2 samples")

    @classmethod
    def from_string(cls, s: str):
        """Parse the scene-XML 'λ1:v1, λ2:v2, …' form
        (scenehandler.cpp spectrum-tag wavelength:value syntax)."""
        pairs = [p for p in s.replace(",", " ").split() if p]
        w, v = [], []
        for p in pairs:
            a, b = p.split(":")
            w.append(float(a))
            v.append(float(b))
        return cls(w, v)

    def eval(self, lam):
        import numpy as np
        lam = np.asarray(lam, np.float64)
        out = np.interp(lam, self.w, self.v)
        return np.where((lam < self.w[0]) | (lam > self.w[-1]), 0.0, out)

    def average(self, lam0: float, lam1: float):
        """Exact mean of the piecewise-linear interpolant over
        [lam0, lam1] (trapezoid integration with the knots + interval
        endpoints as breakpoints), zero-extended outside the data."""
        import numpy as np
        if lam1 <= lam0:
            return float(self.eval(lam0))
        a = max(lam0, self.w[0])
        b = min(lam1, self.w[-1])
        if b <= a:
            return 0.0
        inner = self.w[(self.w > a) & (self.w < b)]
        xs = np.concatenate([[a], inner, [b]])
        ys = self.eval(xs)
        return float(np.trapezoid(ys, xs) / (lam1 - lam0))

    def to_rgb(self):
        """Integrate against the CIE CMFs → linear sRGB (reference:
        Spectrum::fromContinuousSpectrum + toLinearRGB), normalized by
        the CIE-Y integral so a flat unit spectrum maps to luminance 1
        (the reference's same-white convention for reflectances)."""
        import numpy as np
        from . import spectral
        lam = np.linspace(max(spectral.LAM_MIN, self.w[0]),
                          min(spectral.LAM_MAX, self.w[-1]), 512)
        spd = self.eval(lam)
        cm = spectral.cmf_xyz(lam)
        dl = lam[1] - lam[0]
        xyz = np.sum(spd[:, None] * cm, axis=0) * dl
        lam_full = np.linspace(spectral.LAM_MIN, spectral.LAM_MAX, 512)
        y_norm = np.sum(spectral.cmf_xyz(lam_full)[:, 1]) \
            * (lam_full[1] - lam_full[0])
        return np.maximum(xyz / y_norm @ spectral.XYZ_TO_RGB.T, 0.0)


def blackbody_rgb(temperature_k):
    """Planckian-locus approximation (kept for cheap traced use; the
    exact path is blackbody_rgb_exact / planck_radiance above —
    reference: spectrum.cpp BlackBodySpectrum).
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
