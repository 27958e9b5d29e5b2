"""Dipole BSSRDF subsurface scattering.

Capability counterpart of the reference `dipole` plugin
(src/subsurface/dipole.cpp + irrtree): the classic Jensen et al. 2001
dipole diffusion approximation. TPU-native redesign: instead of an
irradiance octree filled by adaptive sampling, a fixed pool of
area-weighted surface samples gets its irradiance evaluated in one
wavefront NEE pass, and shading gathers the dipole kernel over a hash
grid of those samples (same structure as the photon map).

  Fdr = -1.440/η² + 0.710/η + 0.668 + 0.0636·η
  A = (1 + Fdr)/(1 - Fdr),  σt' = σs' + σa,  α' = σs'/σt'
  σtr = sqrt(3 σa σt'),  zr = 1/σt',  zv = zr (1 + 4A/3)
  Rd(r) = α'/4π · [ zr (σtr dr + 1) e^{-σtr dr}/dr³
                  + zv (σtr dv + 1) e^{-σtr dv}/dv³ ]
  Lo(x, ωo) = Ft(η, ωo)/π · Σ_i Rd(|x - xᵢ|) Eᵢ Aᵢ / Fdr-normalization
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SSSParams(NamedTuple):
    sigma_s: jnp.ndarray   # [3] reduced scattering σs'
    sigma_a: jnp.ndarray   # [3]
    eta: jnp.ndarray       # []
    scale: jnp.ndarray     # [] global density scale
    g: float = 0.0         # HG anisotropy (single-scatter term only)


class SSSSamples(NamedTuple):
    pos: jnp.ndarray       # [M, 3] sorted by grid cell
    irr: jnp.ndarray       # [M, 3] irradiance
    area: jnp.ndarray      # [M] surface area represented by the sample
    cell: jnp.ndarray      # [M] sorted cell keys
    grid_min: jnp.ndarray  # [3]
    inv_cell: jnp.ndarray  # []
    grid_res: int          # static
    params: SSSParams


def dipole_coeffs(params: SSSParams):
    eta = params.eta
    fdr = -1.440 / (eta * eta) + 0.710 / eta + 0.668 + 0.0636 * eta
    a_ = (1.0 + fdr) / (1.0 - fdr)
    sig_s = params.sigma_s * params.scale
    sig_a = params.sigma_a * params.scale
    sig_tp = sig_s + sig_a
    alpha_p = sig_s / jnp.maximum(sig_tp, 1e-9)
    sig_tr = jnp.sqrt(3.0 * sig_a * sig_tp)
    zr = 1.0 / jnp.maximum(sig_tp, 1e-9)
    zv = zr * (1.0 + 4.0 / 3.0 * a_)
    return alpha_p, sig_tr, zr, zv, fdr


def rd_kernel(params: SSSParams, r2):
    """Diffusion reflectance Rd(r) per channel; r2 [...] → [..., 3]."""
    alpha_p, sig_tr, zr, zv, _ = dipole_coeffs(params)
    r2 = jnp.maximum(r2, 1e-12)[..., None]
    dr = jnp.sqrt(r2 + zr * zr)
    dv = jnp.sqrt(r2 + zv * zv)
    c1 = zr * (sig_tr * dr + 1.0) * jnp.exp(-sig_tr * dr) / (dr ** 3)
    c2 = zv * (sig_tr * dv + 1.0) * jnp.exp(-sig_tr * dv) / (dv ** 3)
    return alpha_p / (4.0 * jnp.pi) * (c1 + c2)


def sample_surface_points(meshes_tris, n_samples: int, seed: int = 0):
    """Host-side area-weighted sampling of (pos, normal, area-per-sample)
    over the given triangles (p0, e1, e2 numpy arrays)."""
    p0, e1, e2 = meshes_tris
    cr = np.cross(e1, e2)
    tri_area = 0.5 * np.linalg.norm(cr, axis=1)
    total = tri_area.sum()
    rng_ = np.random.default_rng(seed)
    ti = rng_.choice(len(p0), size=n_samples, p=tri_area / total)
    u = rng_.random((n_samples, 2))
    su = np.sqrt(u[:, 0])
    b0 = 1 - su
    b1 = u[:, 1] * su
    pos = p0[ti] + e1[ti] * b0[:, None] + b1[:, None] * e2[ti]
    nrm = cr[ti] / np.maximum(np.linalg.norm(cr[ti], axis=1,
                                             keepdims=True), 1e-20)
    area = np.full(n_samples, total / n_samples, np.float32)
    return (pos.astype(np.float32), nrm.astype(np.float32), area)


def build_sss(pos, irr, area, params: SSSParams, grid_res: int = 128):
    """Hash-grid the irradiance samples (cell size = effective kernel
    radius ~ 1/σtr of the most translucent channel)."""
    _, sig_tr, _, _, _ = dipole_coeffs(params)
    cell = float(2.0 / np.asarray(jnp.min(sig_tr)))
    lo = jnp.min(pos, axis=0) - cell
    inv = 1.0 / cell
    ijk = jnp.clip(((pos - lo) * inv).astype(jnp.int32), 0, grid_res - 1)
    key = (ijk[:, 0] * grid_res + ijk[:, 1]) * grid_res + ijk[:, 2]
    order = jnp.argsort(key)
    return SSSSamples(pos=pos[order], irr=irr[order], area=area[order],
                      cell=key[order], grid_min=lo,
                      inv_cell=jnp.float32(inv), grid_res=grid_res,
                      params=params)


def sss_radiance(sss: SSSSamples, p, wo_cos, max_per_cell: int = 64):
    """Outgoing subsurface radiance at points p [N, 3] with |cos| of the
    outgoing direction (for the Fresnel transmittance factor).

    Lo = Ft(η, ωo)/π · Σ Rd(r) E A   (reference: dipole.cpp Lo())."""
    from ..models.bsdf.fresnel import fresnel_dielectric
    gr = sss.grid_res
    q_ijk = ((p - sss.grid_min) * sss.inv_cell).astype(jnp.int32)
    n = p.shape[0]
    acc = jnp.zeros((n, 3), jnp.float32)
    offs = jnp.arange(max_per_cell)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                c = q_ijk + jnp.asarray([dx, dy, dz])
                okc = jnp.all((c >= 0) & (c < gr), axis=-1)
                key = (c[:, 0] * gr + c[:, 1]) * gr + c[:, 2]
                start = jnp.searchsorted(sss.cell, key)
                idxs = jnp.minimum(start[:, None] + offs[None, :],
                                   sss.cell.shape[0] - 1)
                in_cell = sss.cell[idxs] == key[:, None]
                d2 = jnp.sum((sss.pos[idxs] - p[:, None]) ** 2, -1)
                rd = rd_kernel(sss.params, d2)            # [N, M, 3]
                w = (in_cell & okc[:, None]).astype(jnp.float32) \
                    * sss.area[idxs]
                acc = acc + jnp.sum(rd * sss.irr[idxs] * w[..., None],
                                    axis=1)
    f_t, _ = fresnel_dielectric(jnp.abs(wo_cos), sss.params.eta)
    return (1.0 - f_t)[..., None] / jnp.pi * acc
