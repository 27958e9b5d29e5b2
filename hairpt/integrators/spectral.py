"""Spectral rendering driver — the N>3-bin counterpart of the RGB path.

Reference parity: Mitsuba's compile-time SPECTRUM_SAMPLES option
(include/mitsuba/core/spectrum.h:25) widens every Spectrum to N bins;
here the SAME 3-channel TPU pipeline is re-run once per BAND of 3
wavelength bins — each SoA channel carries one wavelength — and the
per-bin radiance is integrated against the CIE matching functions into
XYZ → linear sRGB (core/spectral.py). RGB scene inputs (reflectances,
emitter radiances, hair σ_a) are upsampled to smooth SPDs with an
exactly-round-tripping basis, so a dispersion-free scene converges to
the plain RGB render; dielectric η takes Cauchy dispersion per band.

The Marschner azimuthal tables are re-precomputed per band from the
band σ_a (the reference equivalently re-runs its ctor precompute under
a spectral build)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import spectral as sp
from ..scene.scene import Scene


def _up(A_band, rgb_arr):
    """Upsample [..., 3] RGB to this band's 3 wavelengths via the
    corrected basis rows A_band [3(bins), 3(rgb)]."""
    v = jnp.asarray(rgb_arr)
    return jnp.clip(v @ jnp.asarray(A_band, jnp.float32).T, 0.0, None)


def respectralize_arrays(scene: Scene, A_band, lam_band,
                         cauchy_b: float = 0.0):
    """SceneArrays with every RGB quantity replaced by its value at the
    band's 3 wavelengths."""
    arr = scene.arrays
    mats = arr.materials
    eta = mats.eta
    if cauchy_b > 0.0:
        # per-band scalar η at the band's CENTER bin (the 3-channel
        # pipeline shares one η per lane; finer dispersion = more bins)
        eta_c = sp.cauchy_eta(np.asarray(eta, np.float64), cauchy_b,
                              float(lam_band[1]))
        eta = jnp.asarray(eta_c, jnp.float32)
    mats = mats._replace(
        diffuse=_up(A_band, mats.diffuse),
        specular=_up(A_band, mats.specular),
        transmit=_up(A_band, mats.transmit),
        sigma_a=_up(A_band, mats.sigma_a),
        eta=eta)
    arr2 = arr._replace(materials=mats)
    if arr.area is not None:
        arr2 = arr2._replace(area=arr.area._replace(
            radiance=_up(A_band, arr.area.radiance)))
    if arr.delta is not None:
        arr2 = arr2._replace(delta=arr.delta._replace(
            intensity=_up(A_band, arr.delta.intensity)))
    if arr.env is not None:
        # texels re-expressed at the band wavelengths; the sampling CDFs
        # stay RGB-luminance-built — the pdf the estimator divides by is
        # whatever the stored tables encode, so this stays unbiased
        arr2 = arr2._replace(env=arr.env._replace(
            image=_up(A_band, arr.env.image)))
    if arr.hair_tables is not None and scene.marschner_rows:
        from ..models.bsdf import hair as hair_bsdf
        from ..models.bsdf import registry as mat
        vals, ws, lws = [], [], []
        for row in scene.marschner_rows:
            sa = _up(A_band, mats.sigma_a[row])  # band σ_a (already up'd)
            beta_r = float(np.asarray(arr.materials.beta_r[row]))
            eta_r = float(np.asarray(arr.materials.eta[row]))
            v = hair_bsdf.precompute_azimuthal(sa, beta_r, eta_r)
            w, lw = hair_bsdf.azimuthal_sampling_tables(v)
            vals.append(v); ws.append(w); lws.append(lw)
        stacked = jnp.stack(vals)
        arr2 = arr2._replace(hair_tables=mat.HairTables(
            values=stacked, weights=jnp.stack(ws),
            lobe_weight=jnp.stack(lws),
            values_quad=hair_bsdf.quad_pack(stacked)))
    return arr2


def render_spectral(scene: Scene, n_bins: int = 12, spp: int = 16,
                    seed: int = 0, cauchy_b: float = 0.0,
                    return_bins: bool = False):
    """Spectral render: n_bins wavelength bins (multiple of 3) over
    [380, 720] nm → linear sRGB [H, W, 3] image.

    cauchy_b: Cauchy dispersion coefficient (µm²) applied to dielectric
    η per band (0 = no dispersion, every band refracts identically and
    the result matches the RGB render up to upsampling round-trip).
    return_bins: also return the raw per-bin radiance [H, W, n_bins]."""
    assert n_bins % 3 == 0 and n_bins >= 3, "n_bins must be a multiple of 3"
    from . import path as path_int

    A, lam, dl = sp.upsample_basis(n_bins)
    Wrgb, _, _ = sp.rgb_weights(n_bins)
    cfg = scene.config
    rgb = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    bins = []
    for g in range(n_bins // 3):
        sl = slice(3 * g, 3 * g + 3)
        arr_g = respectralize_arrays(scene, A[sl], lam[sl], cauchy_b)
        scene_g = scene._replace(arrays=arr_g)
        img_g = path_int.render(scene_g, spp=spp, seed=seed)  # [H,W,3]
        if return_bins:
            bins.append(img_g)
        rgb = rgb + img_g @ jnp.asarray(Wrgb[sl], jnp.float32)
    if return_bins:
        return rgb, jnp.concatenate(bins, axis=-1)
    return rgb
