"""Irradiance caching (two-pass wavefront redesign).

Capability counterpart of the reference `irrcache` meta-integrator
(src/integrators/misc/irrcache.cpp + libcore irrcache.cpp octree): the
reference fills an octree lazily with adaptive gradient-interpolated
irradiance records. A lazy shared octree is hostile to lockstep SPMD
execution, so the TPU redesign is two deterministic passes:

  1. cache pass — a pool of area-weighted surface points gets its
     INDIRECT diffuse irradiance estimated by M cosine-hemisphere rays
     each (direct lighting evaluated at the secondary hits),
  2. render pass — pixels get exact direct lighting (NEE) plus
     albedo/π × E_indirect interpolated from the k nearest cache records
     with Ward-style weights  w = 1/(|x−xᵢ|/r + sqrt(1−n·nᵢ)).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng, warps
from ..core.math import Ray, dot, frame_from_normal
from ..film import film as film_mod
from ..models import subsurface as sss_mod
from ..models import sensors
from ..models.bsdf import registry as mat
from ..scene.scene import Scene
from .common import scene_intersect, scene_occluded, frame
from .path import (_sample_emitter_direct, _swept_params, _env_radiance,
                   _emitter_radiance_at_hit)


def _direct_light(scene, arr, p, sh_n, mat_id, uv, gm, fr, wi_l, pixel_idx,
                  salt):
    """One-sample NEE estimate of direct reflected radiance."""
    cfg = scene.config
    n = p.shape[0]
    u_sel = rng.uniform_1d(pixel_idx, salt, 0)
    u2 = rng.uniform_2d(pixel_idx, salt, 1)
    d, dist, le, pdf, is_dl = _sample_emitter_direct(arr, cfg, p, u_sel, u2)
    wo_l = fr.to_local(d)
    f, _ = mat.eval_pdf_mix(scene.active_kinds, arr.materials,
                            arr.checkers, mat_id, uv, gm, wi_l, wo_l,
                            arr.hair_tables)
    ok = (pdf > 0) & (dot(sh_n, d) > 0)
    o = p + sh_n * cfg.ray_eps
    shadow = Ray(o=o, d=d, mint=jnp.zeros(n),
                 maxt=jnp.where(ok, dist - 2 * cfg.ray_eps, 0.0))
    occ = scene_occluded(arr, shadow, cfg.traversal, cfg.block,
                         _swept_params(cfg))
    return jnp.where((ok & ~occ)[..., None],
                     le * f / jnp.maximum(pdf, 1e-20)[..., None], 0.0)


def build_irradiance_cache(scene: Scene, n_points: int = 4096,
                           m_rays: int = 16, seed: int = 0):
    """Pass 1. Returns (pos [M,3], nrm [M,3], e_ind [M,3])."""
    cfg = scene.config
    arr = scene.arrays
    assert arr.tri is not None
    p0 = np.asarray(arr.tri.p0)
    e1 = np.asarray(arr.tri.e1)
    e2 = np.asarray(arr.tri.e2)
    pos, nrm, _ = sss_mod.sample_surface_points((p0, e1, e2), n_points,
                                                seed)
    pos_j = jnp.asarray(pos)
    nrm_j = jnp.asarray(nrm)
    m = n_points
    idx = jnp.arange(m, dtype=jnp.uint32)
    fr = frame_from_normal(nrm_j)

    @jax.jit
    def one(arr, s):
        u2 = rng.uniform_2d(idx, s, 11)
        d_l = warps.square_to_cosine_hemisphere(u2)
        d = fr.to_world(d_l)
        o = pos_j + nrm_j * cfg.ray_eps
        r = Ray(o=o, d=d, mint=jnp.zeros(m), maxt=jnp.full(m, jnp.inf))
        hit = scene_intersect(arr, r, cfg.traversal, cfg.block,
                              _swept_params(cfg))
        # direct lighting at the secondary hit
        wi_w = -d
        fr2 = frame(hit)
        wi_l2 = fr2.to_local(wi_w)
        gm2 = mat.gather(arr.materials, arr.checkers, hit.mat_id, hit.uv)
        ld = _direct_light(scene, arr, hit.p, hit.sh_n, hit.mat_id,
                           hit.uv, gm2, fr2, wi_l2, idx, s + 977)
        le = _emitter_radiance_at_hit(arr, hit, wi_w) if arr.area is not \
            None else 0.0
        lr = jnp.where(hit.valid[..., None], ld + le, 0.0)
        # cosine-weighted sampling: E ≈ π · mean(L)
        return lr

    e = jnp.zeros((m, 3), jnp.float32)
    for s in range(m_rays):
        e = e + one(arr, jnp.uint32(seed * 7919 + s))
    return pos_j, nrm_j, jnp.pi * e / m_rays


def render_irrcache(scene: Scene, n_points: int = 4096, m_rays: int = 16,
                    spp: int = 4, k_norm_radius: float = 0.25,
                    seed: int = 0):
    """Pass 2: direct NEE + interpolated indirect irradiance."""
    cfg = scene.config
    arr = scene.arrays
    fl = scene.film
    n_pix = cfg.width * cfg.height
    cpos, cnrm, e_ind = build_irradiance_cache(scene, n_points, m_rays,
                                               seed)

    @jax.jit
    def wave(arr, sample_id, image, weight):
        pixel_idx = jnp.arange(n_pix, dtype=jnp.uint32)
        px = (pixel_idx % cfg.width).astype(jnp.float32)
        py = (pixel_idx // cfg.width).astype(jnp.float32)
        j2 = rng.next_2d(cfg.sampler, pixel_idx, sample_id, 0)
        p2 = jnp.stack([px + j2[..., 0], py + j2[..., 1]], -1)
        ray = sensors.sample_ray(scene.camera, p2, None)
        hit = scene_intersect(arr, ray, cfg.traversal, cfg.block,
                              _swept_params(cfg))
        fr = frame(hit)
        wi_l = fr.to_local(-ray.d)
        gm = mat.gather(arr.materials, arr.checkers, hit.mat_id, hit.uv)
        ld = _direct_light(scene, arr, hit.p, hit.sh_n, hit.mat_id,
                           hit.uv, gm, fr, wi_l, pixel_idx,
                           sample_id * 31 + 7)
        le = _emitter_radiance_at_hit(arr, hit, -ray.d) if arr.area is not \
            None else 0.0

        # Ward-weighted interpolation over the cache (dense [N, M] — the
        # cache is small; replaces the octree range query)
        d2 = jnp.sum((hit.p[:, None] - cpos[None]) ** 2, -1)
        ndot = jnp.clip(jnp.sum(hit.sh_n[:, None] * cnrm[None], -1), -1, 1)
        w = 1.0 / (jnp.sqrt(d2) / k_norm_radius
                   + jnp.sqrt(jnp.maximum(1.0 - ndot, 0.0)) + 1e-4)
        w = jnp.where(ndot > 0.2, w, 0.0)
        e_interp = (w @ e_ind) / jnp.maximum(jnp.sum(w, -1), 1e-9)[:, None]
        l_ind = gm.diffuse / jnp.pi * e_interp

        rad = jnp.where(hit.valid[..., None], ld + le + l_ind,
                        _env_radiance(arr, ray.d))
        rad = jnp.nan_to_num(rad, nan=0.0, posinf=0.0, neginf=0.0)
        return film_mod.splat_samples(fl, p2, rad, image, weight)

    image, weight = film_mod.zeros(fl)
    for s in range(spp):
        image, weight = wave(arr, jnp.uint32(s + seed * 65536), image,
                             weight)
    return film_mod.develop(image, weight)
