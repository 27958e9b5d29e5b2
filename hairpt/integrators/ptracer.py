"""Adjoint particle tracer: light paths splatted through the camera.

Capability counterpart of the reference `ptracer` plugin
(src/integrators/ptracer/*, CaptureParticleWorker): particles are emitted
from EVERY emitter type (area, point, spot, directional, collimated,
environment — Emitter::sampleRay parity via em.area_emit/delta_emit/env
sampling), bounced through the scene, and every vertex (including the
emitter point itself where it has a finite position) is connected to the
pinhole camera with a visibility ray and splatted via camera_importance.
Single-strategy — unbiased on its own, no MIS needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.math import Ray, dot
from ..film import film as film_mod
from ..models import emitters as em
from ..models import sensors
from ..models.bsdf import registry as mat
from ..scene.scene import Scene
from .common import scene_intersect, scene_occluded, frame
from .path import _swept_params
from .photonmap import _scene_bsphere


def render_ptracer(scene: Scene, n_paths: int = 1 << 15, spp_norm=None,
                   s_max: int = 5, seed: int = 0):
    """Particle-traced render (camera side only). n_paths light subpaths
    per wave; the number of waves is chosen so total work ≈ the film's
    spp budget."""
    cfg = scene.config
    arr = scene.arrays
    cam = scene.camera
    fl = scene.film
    active_kinds = scene.active_kinds
    assert (arr.area is not None or arr.delta is not None
            or arr.env is not None), "ptracer needs an emitter"
    n_waves = max(1, (cfg.width * cfg.height * cfg.spp) // (4 * n_paths))
    n = n_paths
    p_env, p_area, p_delta = cfg.nee_probs
    center, radius = _scene_bsphere(arr)

    def camera_splat(splat_img, p, val, ok, geo_n=None):
        """Visibility-test p towards the camera and splat val·We/d²."""
        film_pos, we, dist, d_cam, vis = sensors.camera_importance(cam, p)
        ok = ok & vis
        c = val * (we / jnp.maximum(dist * dist, 1e-12))[..., None]
        ok = ok & (jnp.max(jnp.abs(c), -1) > 0)
        off = d_cam if geo_n is None else geo_n * jnp.where(
            dot(d_cam, geo_n) > 0, 1.0, -1.0)[..., None]
        sh = Ray(o=p + off * cfg.ray_eps, d=d_cam, mint=jnp.zeros(n),
                 maxt=jnp.where(ok, dist - 2 * cfg.ray_eps, 0.0))
        occ = scene_occluded(arr, sh, cfg.traversal, cfg.block,
                             _swept_params(cfg), sort_rays=True)
        c = jnp.where((ok & ~occ)[..., None], c, 0.0)
        return film_mod.splat_add_only(fl, film_pos, c, splat_img)

    def one_wave(arrs, wave_id, splat_img):
        idx = jnp.arange(n, dtype=jnp.uint32)
        sd = wave_id * jnp.uint32(2654435761) + jnp.uint32(seed)
        u_dir = rng.uniform_2d(idx, sd, 0)
        u_disk = rng.uniform_2d(idx, sd, 2)
        u_grp = rng.uniform_1d(idx, sd, 4)
        u_sel = rng.uniform_1d(idx, sd, 5)
        u_tri = rng.uniform_2d(idx, sd, 6)
        grp = jnp.where(u_grp < p_env, 0,
                        jnp.where(u_grp < p_env + p_area, 1, 2))

        o = jnp.broadcast_to(center, (n, 3))
        d = jnp.zeros((n, 3), jnp.float32).at[:, 2].set(1.0)
        pw = jnp.zeros((n, 3), jnp.float32)

        if arr.env is not None and p_env > 0:
            from ..core import warps
            from ..core.math import coordinate_system
            d_env, le, pdf_dir = em.env_sample(arrs.env, u_dir)
            d_e = -d_env
            disk = warps.square_to_uniform_disk_concentric(u_disk) * radius
            s_, t_ = coordinate_system(d_e)
            o_e = center - d_e * radius * 1.5 \
                + s_ * disk[..., 0:1] + t_ * disk[..., 1:2]
            pw_e = le / jnp.maximum(pdf_dir, 1e-12)[..., None] \
                * (jnp.pi * radius * radius) / p_env
            m = (grp == 0)[..., None]
            o = jnp.where(m, o_e, o)
            d = jnp.where(m, d_e, d)
            pw = jnp.where(m, pw_e, pw)
        if arr.area is not None and p_area > 0:
            o_a, d_a, n_a, pw_a = em.area_emit(arrs.area, u_sel, u_tri,
                                               u_dir)
            m = (grp == 1)[..., None]
            o = jnp.where(m, o_a, o)
            d = jnp.where(m, d_a, d)
            pw = jnp.where(m, pw_a / p_area, pw)
            # s=1: the emitter point itself, Le·cosθ to the camera; the
            # position-only pdf gives (L·A/p_sel)·cos = (pw_a/π)·cos
            _, _, _, d_cam, _ = sensors.camera_importance(cam, o_a)
            cos_l = jnp.maximum(dot(n_a, d_cam), 0.0)
            splat_img = camera_splat(
                splat_img, o_a,
                pw_a / (jnp.pi * p_area) * cos_l[..., None],
                (grp == 1), geo_n=n_a)
        if arr.delta is not None and p_delta > 0:
            o_d, d_d, pw_d, (l_i, prob) = em.delta_emit(
                arrs.delta, u_sel, u_dir, center, radius)
            m = (grp == 2)[..., None]
            o = jnp.where(m, o_d, o)
            d = jnp.where(m, d_d, d)
            pw = jnp.where(m, pw_d / p_delta, pw)
            # s=1 for finite-position, non-delta-direction emitters
            kind = arrs.delta.kind[l_i]
            inten = arrs.delta.intensity[l_i]
            _, _, _, d_cam, _ = sensors.camera_importance(cam, o_d)
            cos_sp = dot(arrs.delta.direction[l_i], d_cam)
            cc = arrs.delta.cos_cutoff[l_i]
            cb = arrs.delta.cos_beam[l_i]
            fall = jnp.clip((cos_sp - cc) / jnp.maximum(cb - cc, 1e-6),
                            0.0, 1.0)
            fall = jnp.where(cos_sp >= cb, 1.0, fall)
            i_cam = jnp.where((kind == em.SPOT)[..., None],
                              inten * fall[..., None], inten)
            finite = (kind == em.POINT) | (kind == em.SPOT)
            splat_img = camera_splat(
                splat_img, o_d,
                i_cam / (jnp.maximum(prob, 1e-12) * p_delta)[..., None],
                (grp == 2) & finite)

        def body(carry, b):
            o, d, pw, alive, splat_img = carry
            r = Ray(o=o + d * cfg.ray_eps, d=d, mint=jnp.zeros(n),
                    maxt=jnp.where(alive, jnp.inf, 0.0))
            hit = scene_intersect(arr, r, cfg.traversal, cfg.block,
                                  _swept_params(cfg), sort_rays=True)
            landed = alive & hit.valid

            wi_world = -d
            two = arr.materials.twosided[jnp.maximum(hit.mat_id, 0)]
            flip = two & (dot(hit.sh_n, wi_world) < 0)
            sh_n = jnp.where(flip[..., None], -hit.sh_n, hit.sh_n)
            sh_t = jnp.where(flip[..., None], -hit.sh_t, hit.sh_t)
            geo_n = jnp.where(flip[..., None], -hit.geo_n, hit.geo_n)
            fr = frame(hit)._replace(n=sh_n, t=sh_t)
            wi = fr.to_local(wi_world)
            gm = mat.gather(arr.materials, arr.checkers, hit.mat_id,
                            hit.uv)

            # connect this vertex to the camera
            _, _, _, d_cam, _ = sensors.camera_importance(cam, hit.p)
            wo_cam = fr.to_local(d_cam)
            f_cam, _ = mat.eval_pdf_mix(active_kinds, arr.materials,
                                        arr.checkers, hit.mat_id, hit.uv,
                                        gm, wi, wo_cam, arr.hair_tables)
            splat_img = camera_splat(splat_img, hit.p, pw * f_cam, landed,
                                     geo_n=geo_n)

            # continue the subpath
            dims = 8 + b * 8
            u_l = rng.uniform_1d(idx, sd, dims)
            u2 = rng.uniform_2d(idx, sd, dims + 1)
            u2b = rng.uniform_2d(idx, sd, dims + 3)
            wo, w, _, _, _ = mat.sample_mix(active_kinds, arr.materials,
                                            arr.checkers, hit.mat_id,
                                            hit.uv, gm, wi, u_l, u2, u2b,
                                            arr.hair_tables)
            wo_world = fr.to_world(wo)
            pw2 = pw * w
            q = jnp.clip(jnp.max(w, axis=-1), 0.0, 0.95)
            u_rr = rng.uniform_1d(idx, sd, dims + 5)
            keep = u_rr < q
            pw2 = pw2 / jnp.maximum(q, 1e-6)[..., None]
            alive2 = landed & keep & (jnp.max(pw2, axis=-1) > 0)
            o2 = hit.p + geo_n * jnp.where(dot(wo_world, geo_n) > 0,
                                           cfg.ray_eps,
                                           -cfg.ray_eps)[..., None]
            return (o2, wo_world, pw2, alive2, splat_img), None

        carry = (o, d, pw, jnp.max(pw, axis=-1) > 0, splat_img)
        carry, _ = jax.lax.scan(body, carry, jnp.arange(s_max))
        return carry[4]

    wave = jax.jit(one_wave)
    splat_img = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    for w in range(n_waves):
        splat_img = wave(arr, jnp.uint32(w + 1), splat_img)
    # each particle carries flux/n_paths; splats estimate the measurement
    # integral per pixel (see bdpt t=1 splats for the W/H normalization)
    return splat_img * (cfg.width * cfg.height) / (n_paths * n_waves)
