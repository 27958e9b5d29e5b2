"""Dipole subsurface prepass: irradiance at surface sample points.

Counterpart of the reference's IrradianceSamplingProcess feeding the
dipole's irradiance octree (src/subsurface/dipole.cpp:convert/preprocess):
a fixed pool of area-weighted surface points gets E = ∫ L cosθ dω
estimated with K light samples each, in one wavefront pass.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng
from ..core.math import Ray, dot
from ..models import subsurface as sss_mod
from ..scene.scene import Scene
from .common import scene_occluded
from .path import _sample_emitter_direct, _swept_params


def compute_irradiance(scene: Scene, pos, nrm, k_samples: int = 16,
                       seed: int = 0):
    """E at surface points pos with normals nrm via NEE."""
    cfg = scene.config
    arr = scene.arrays
    m = pos.shape[0]
    pos_j = jnp.asarray(pos, jnp.float32)
    nrm_j = jnp.asarray(nrm, jnp.float32)
    idx = jnp.arange(m, dtype=jnp.uint32)

    @jax.jit
    def one(arrs, s):
        u_sel = rng.uniform_1d(idx, jnp.uint32(seed) + s, 0)
        u2 = rng.uniform_2d(idx, jnp.uint32(seed) + s, 1)
        d, dist, le, pdf, is_dl = _sample_emitter_direct(
            arrs, cfg, pos_j, u_sel, u2)
        cos_i = jnp.maximum(dot(nrm_j, d), 0.0)
        ok = (pdf > 0) & (cos_i > 0)
        o = pos_j + nrm_j * cfg.ray_eps
        shadow = Ray(o=o, d=d, mint=jnp.zeros(m),
                     maxt=jnp.where(ok, dist - 2 * cfg.ray_eps, 0.0))
        occ = scene_occluded(arrs, shadow, cfg.traversal, cfg.block,
                             _swept_params(cfg))
        return jnp.where((ok & ~occ)[..., None],
                         le * (cos_i / jnp.maximum(pdf, 1e-20))[..., None],
                         0.0)

    e = jnp.zeros((m, 3), jnp.float32)
    for s in range(k_samples):
        e = e + one(arr, jnp.uint32(s * 7919))
    return e / k_samples


def attach_dipole(scene: Scene, n_samples: int = 4096,
                  k_light_samples: int = 16, seed: int = 0) -> Scene:
    """Build the dipole irradiance-sample structure for all triangles
    whose material kind == DIPOLE and return the scene with arrays.sss
    set. No-op if the scene has no dipole materials."""
    from ..models.bsdf import registry as mat
    arr = scene.arrays
    if mat.DIPOLE not in scene.active_kinds or arr.tri is None:
        return scene
    kinds = np.asarray(arr.materials.kind)
    mids = np.asarray(arr.tri_shading.mat_id)
    sel = kinds[mids] == mat.DIPOLE
    if not sel.any():
        return scene
    # dipole parameters from the first dipole material row
    row = int(np.nonzero(kinds == mat.DIPOLE)[0][0])
    params = sss_mod.SSSParams(
        sigma_s=arr.materials.transmit[row],
        sigma_a=arr.materials.sigma_a[row],
        eta=arr.materials.eta[row],
        scale=arr.materials.mix_w[row],
        g=scene.config.sss_g)
    if scene.config.sss_single:
        # single scattering needs no irradiance prepass — the path tracer
        # marches the refracted view ray at shading time (reference:
        # src/subsurface/singlescatter.cpp LoSingle); a 1-sample pool
        # carries just the parameters
        z1 = jnp.zeros((1, 3), jnp.float32)
        sss = sss_mod.build_sss(z1, z1, jnp.zeros((1,), jnp.float32),
                                params)
        return scene._replace(arrays=arr._replace(sss=sss))
    p0 = np.asarray(arr.tri.p0)[sel]
    e1 = np.asarray(arr.tri.e1)[sel]
    e2 = np.asarray(arr.tri.e2)[sel]
    pos, nrm, area = sss_mod.sample_surface_points((p0, e1, e2), n_samples,
                                                   seed)
    irr = compute_irradiance(scene, pos, nrm, k_light_samples, seed)
    sss = sss_mod.build_sss(jnp.asarray(pos), irr, jnp.asarray(area),
                            params)
    return scene._replace(arrays=arr._replace(sss=sss))
