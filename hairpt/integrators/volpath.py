"""Volumetric path tracer for a global homogeneous medium.

Capability counterpart of the reference's `volpath_simple`/`volpath`
(src/integrators/path/volpath*.cpp) restricted to a homogeneous exterior
medium: free-flight distance sampling with spectral MIS, phase-function
scattering at medium events, NEE with medium transmittance on the shadow
ray at both medium and surface events. (Emitter-hit MIS is env-only, like
the forward path tracer.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.math import Ray, dot
from ..film import film as film_mod
from ..models import sensors
from ..models import media as med
from ..models.bsdf import registry as mat
from ..scene.scene import Scene
from .common import scene_intersect, scene_occluded, frame
from .path import (_mi_weight, _sample_emitter_direct, _pdf_emitter_hit,
                   _env_radiance, _swept_params, DIM_CAM_POS, DIM_BASE,
                   DIM_STRIDE)


def make_volpath_li(scene: Scene, medium):
    """medium: med.Medium (homogeneous fog) or med.HeteroMedium (grid
    volume, Woodcock tracking)."""
    cfg = scene.config
    cam = scene.camera
    active_kinds = scene.active_kinds
    smode = cfg.sampler
    ray_eps = cfg.ray_eps
    pk = medium.phase_kind
    hetero = isinstance(medium, med.HeteroMedium)

    def s1(pix, smp, dim):
        return rng.next_1d(smode, pix, smp, dim)

    def s2(pix, smp, dim):
        return rng.next_2d(smode, pix, smp, dim)

    def li(arr, pixel_idx, sample_idx):
        n = pixel_idx.shape[0]
        px = (pixel_idx % cfg.width).astype(jnp.float32)
        py = (pixel_idx // cfg.width).astype(jnp.float32)
        jit2 = s2(pixel_idx, sample_idx, DIM_CAM_POS)
        pos = jnp.stack([px + jit2[..., 0], py + jit2[..., 1]], -1)
        ray = sensors.sample_ray(cam, pos, None)

        def cond(st):
            depth = st[0]
            active = st[1]
            return jnp.any(active) & (depth < cfg.max_depth)

        def body(st):
            (depth, active, o, d, throughput, li_acc, first,
             prev_pdf, prev_delta) = st
            dims = DIM_BASE + (depth - 1) * DIM_STRIDE
            r = Ray(o=o, d=d, mint=jnp.zeros(n),
                    maxt=jnp.where(active, jnp.inf, 0.0))
            hit = scene_intersect(arr, r, cfg.traversal, cfg.block,
                                  _swept_params(cfg))
            if hetero:
                t_surf = jnp.where(hit.valid, hit.t, 1e30)
                dist, is_med = med.woodcock_sample(
                    medium, o, d, t_surf, pixel_idx, sample_idx, dims + 9)
                # delta tracking is analog: medium events weight by albedo
                w_flight = jnp.where(is_med[..., None],
                                     medium.albedo[None, :], 1.0)
            else:
                t_surf = jnp.where(hit.valid, hit.t, medium.fog_depth)
                u_ch = s1(pixel_idx, sample_idx, dims + 9)
                u_dd = s1(pixel_idx, sample_idx, dims + 10)
                dist, is_med, w_flight = med.sample_distance(
                    medium, u_ch, u_dd, t_surf)
            throughput = throughput * jnp.where(active[..., None],
                                                w_flight, 1.0)

            # environment reached: no surface hit and the free flight
            # survived the fog slab; MIS against the NEE strategy of the
            # previous event
            miss = active & ~hit.valid & ~is_med
            lum_pdf = _pdf_emitter_hit(arr, cfg, hit, d)
            w_esc = jnp.where(first | prev_delta, 1.0,
                              _mi_weight(prev_pdf, lum_pdf))
            li_acc = li_acc + jnp.where(
                miss[..., None],
                throughput * _env_radiance(arr, d) * w_esc[..., None], 0.0)
            active2 = active & (hit.valid | is_med)

            p_evt = o + d * dist[..., None]

            # ---- NEE from the event point ----
            u_sel = s1(pixel_idx, sample_idx, dims + 0)
            u_nee = s2(pixel_idx, sample_idx, dims + 1)
            d_nee, dist_nee, le_nee, pdf_nee, is_dl = \
                _sample_emitter_direct(arr, cfg, p_evt, u_sel, u_nee)

            # medium-event scattering value towards the light
            ph_p = getattr(medium, "phase_p", None)
            ph_ori = getattr(medium, "orientation", None)
            ph_mix = getattr(medium, "mix", ())
            ph = med.phase_eval(pk, medium.g, -d, d_nee, ph_p, ph_ori,
                                ph_mix)
            # surface-event BSDF value
            wi_world = -d
            two = arr.materials.twosided[jnp.maximum(hit.mat_id, 0)]
            flip = two & (dot(hit.sh_n, wi_world) < 0)
            sh_n = jnp.where(flip[..., None], -hit.sh_n, hit.sh_n)
            sh_t = jnp.where(flip[..., None], -hit.sh_t, hit.sh_t)
            fr = frame(hit)._replace(n=sh_n, t=sh_t)
            wi = fr.to_local(wi_world)
            wo_nee = fr.to_local(d_nee)
            gm = mat.gather(arr.materials, arr.checkers, hit.mat_id, hit.uv)
            f_s, pdf_bs = mat.eval_pdf(active_kinds, gm, wi, wo_nee,
                                       arr.hair_tables)
            scat = jnp.where(is_med[..., None],
                             ph[..., None] * jnp.ones((1, 3)), f_s)

            geo_n = jnp.where(flip[..., None], -hit.geo_n, hit.geo_n)
            off = jnp.where(is_med[..., None], 0.0,
                            geo_n * jnp.where(dot(d_nee, geo_n) > 0,
                                              ray_eps, -ray_eps)[..., None])
            ok = active2 & (pdf_nee > 0)
            shadow = Ray(o=p_evt + off, d=d_nee, mint=jnp.zeros(n),
                         maxt=jnp.where(ok, dist_nee - 2 * ray_eps, 0.0))
            occl = scene_occluded(arr, shadow, cfg.traversal, cfg.block,
                                  _swept_params(cfg))
            if hetero:
                tr_shadow = med.woodcock_transmittance(
                    medium, p_evt + off, d_nee,
                    jnp.minimum(dist_nee, 1e6), pixel_idx, sample_idx,
                    dims + 11)
            else:
                tr_shadow = med.transmittance(
                    medium, jnp.minimum(dist_nee, medium.fog_depth))
            # pdf of the phase sampler at the NEE direction (== eval for
            # the self-importance-sampled kinds; 1/(4π) for the uniform-
            # sphere-sampled kkay; its own mixture for KKAY_IS/mixtures)
            ph_pdf_nee = med.phase_pdf(pk, medium.g, -d, d_nee, ph_p,
                                       ph_ori, ph_mix)
            scatter_pdf_nee = jnp.where(is_med, ph_pdf_nee, pdf_bs)
            w_mis = jnp.where(is_dl, 1.0,
                              _mi_weight(pdf_nee, scatter_pdf_nee))
            li_acc = li_acc + jnp.where(
                (ok & ~occl)[..., None],
                throughput * le_nee * scat * tr_shadow
                * (w_mis / jnp.maximum(pdf_nee, 1e-20))[..., None], 0.0)

            # ---- continue the path ----
            u_ph = s2(pixel_idx, sample_idx, dims + 4)
            u_lobe = s1(pixel_idx, sample_idx, dims + 3)
            u2b = s2(pixel_idx, sample_idx, dims + 6)
            wo_med, pdf_ph = med.phase_sample(pk, medium.g, -d, u_ph,
                                              ph_p, ph_ori, ph_mix)
            # phase throughput weight eval/pdf (exactly 1 for HG/iso/
            # rayleigh where the sampler inverts eval; eval·4π for the
            # uniform-sphere-sampled kkay; general ratio otherwise)
            if pk in (med.HG, med.ISOTROPIC, med.RAYLEIGH):
                w_ph = 1.0
            else:
                w_ph = jnp.where(
                    pdf_ph > 0,
                    med.phase_eval(pk, medium.g, -d, wo_med, ph_p, ph_ori,
                                   ph_mix) / jnp.maximum(pdf_ph, 1e-20),
                    0.0)
            wo_l, w_bsdf, pdf_b, is_delta, _ = mat.sample(
                active_kinds, gm, wi, u_lobe, u_ph, u2b, arr.hair_tables)
            wo_surf = fr.to_world(wo_l)
            d_next = jnp.where(is_med[..., None], wo_med, wo_surf)
            w_med3 = jnp.ones((n, 3), jnp.float32) \
                if pk in (med.HG, med.ISOTROPIC, med.RAYLEIGH) \
                else w_ph[..., None] * jnp.ones((1, 3))
            w_next = jnp.where(is_med[..., None], w_med3, w_bsdf)
            throughput = throughput * w_next
            dead = jnp.max(jnp.abs(throughput), axis=-1) <= 0
            active2 = active2 & ~dead

            o_next = jnp.where(
                is_med[..., None], p_evt,
                hit.p + geo_n * jnp.where(dot(wo_surf, geo_n) > 0, ray_eps,
                                          -ray_eps)[..., None])

            # RR
            depth2 = depth + 1
            q = jnp.minimum(jnp.max(throughput, axis=-1), 0.95)
            u_rr = s1(pixel_idx, sample_idx, dims + 8)
            do_rr = depth2 > cfg.rr_depth
            kill = do_rr & (u_rr >= q)
            throughput = jnp.where((do_rr & ~kill)[..., None],
                                   throughput
                                   / jnp.maximum(q, 1e-6)[..., None],
                                   throughput)
            active2 = active2 & ~kill

            next_pdf = jnp.where(is_med, pdf_ph, pdf_b)
            next_delta = jnp.where(is_med, False, is_delta)
            return (depth2, active2, o_next, d_next, throughput, li_acc,
                    jnp.zeros((n,), bool), next_pdf, next_delta)

        init = (jnp.int32(1), jnp.ones((n,), bool), ray.o, ray.d,
                jnp.ones((n, 3), jnp.float32), jnp.zeros((n, 3), jnp.float32),
                jnp.ones((n,), bool), jnp.zeros((n,), jnp.float32),
                jnp.zeros((n,), bool))
        final = jax.lax.while_loop(cond, body, init)
        return final[5], pos

    return li


def _march_transmittance(arr, cfg, p0, d_nee, max_dist, start_med, ok,
                         k_max: int = 3):
    """Shadow-ray transmittance through shape-bounded media: march up to
    k_max boundary crossings, attenuating each segment by its medium's
    σt and passing only through null-BSDF boundaries (the reference's
    Scene::evalTransmittance convention — any non-null surface occludes).
    Returns (tr [N, 3], occluded [N])."""
    n = p0.shape[0]
    tr = jnp.ones((n, 3), jnp.float32)
    occluded = jnp.zeros((n,), bool)
    done = ~ok
    cur = start_med
    p = p0
    remaining = max_dist
    for _ in range(k_max):
        live = ~done & ~occluded & (remaining > 0)
        r = Ray(o=p, d=d_nee, mint=jnp.zeros(n),
                maxt=jnp.where(live, remaining, 0.0))
        h = scene_intersect(arr, r, cfg.traversal, cfg.block,
                            _swept_params(cfg), sort_rays=True)
        seg = jnp.where(h.valid, jnp.minimum(h.t, remaining), remaining)
        sig = arr.media.sigma_t[cur]
        tr = tr * jnp.where(live[..., None],
                            jnp.exp(-sig * jnp.minimum(seg,
                                                       1e30)[..., None]),
                            1.0)
        boundary = live & h.valid & (h.t < remaining)
        kind = arr.materials.kind[jnp.maximum(h.mat_id, 0)]
        passable = boundary & (kind == mat.NULL) & ~h.is_hair
        occluded = occluded | (boundary & ~passable)
        done = done | (live & ~boundary)
        med_ids = arr.tri_med[jnp.maximum(h.prim, 0)]
        # parity-robust switch: leaving the medium we are in beats the
        # normal heuristic (interpolated-normal flips at tessellation
        # seams would otherwise leak through boundaries)
        by_norm = jnp.where(dot(d_nee, h.geo_n) < 0,
                            med_ids[:, 0], med_ids[:, 1])
        nxt = jnp.where(cur == med_ids[:, 0], med_ids[:, 1],
                        jnp.where(cur == med_ids[:, 1], med_ids[:, 0],
                                  by_norm))
        cur = jnp.where(passable, nxt, cur)
        p = jnp.where(passable[..., None],
                      h.p + d_nee * cfg.ray_eps, p)
        remaining = jnp.where(passable,
                              remaining - seg - cfg.ray_eps, remaining)
    # lanes still mid-march after k_max crossings: the remaining stretch
    # was never verified → treat as occluded (conservative)
    occluded = occluded | ~done
    return tr, occluded


def make_volpath_bounded_li(scene: Scene):
    """Volumetric path tracing with SHAPE-BOUNDED homogeneous media
    (reference: volpath.cpp with per-shape interior/exterior Medium refs,
    Shape::setInteriorMedium): each lane tracks its current medium id
    into arr.media (row 0 = vacuum); null-BSDF surfaces are pure medium
    boundaries; refractive/null crossings switch the id by the side of
    the geometric normal. Outward-oriented closed meshes assumed (the
    reference makes the same assumption for medium transitions)."""
    cfg = scene.config
    cam = scene.camera
    active_kinds = scene.active_kinds
    smode = cfg.sampler
    ray_eps = cfg.ray_eps

    def s1(pix, smp, dim):
        return rng.next_1d(smode, pix, smp, dim)

    def s2(pix, smp, dim):
        return rng.next_2d(smode, pix, smp, dim)

    def li(arr, pixel_idx, sample_idx):
        n = pixel_idx.shape[0]
        px = (pixel_idx % cfg.width).astype(jnp.float32)
        py = (pixel_idx // cfg.width).astype(jnp.float32)
        jit2 = s2(pixel_idx, sample_idx, DIM_CAM_POS)
        pos = jnp.stack([px + jit2[..., 0], py + jit2[..., 1]], -1)
        ray = sensors.sample_ray(cam, pos, None)

        def cond(st):
            return jnp.any(st[1]) & (st[0] < cfg.max_depth)

        def body(st):
            (depth, active, o, d, cur_med, throughput, li_acc, first,
             prev_pdf, prev_delta) = st
            dims = DIM_BASE + (depth - 1) * DIM_STRIDE
            r = Ray(o=o, d=d, mint=jnp.zeros(n),
                    maxt=jnp.where(active, jnp.inf, 0.0))
            hit = scene_intersect(arr, r, cfg.traversal, cfg.block,
                                  _swept_params(cfg),
                                  sort_rays=True)
            # far bound: vacuum lanes escape with weight 1; σ>0 lanes
            # essentially never out-fly 1e7 mean free paths
            t_surf = jnp.where(hit.valid, hit.t, 1e7)

            sig_t = arr.media.sigma_t[cur_med]
            albedo = arr.media.albedo[cur_med]
            g_lane = arr.media.g[cur_med]
            u_ch = s1(pixel_idx, sample_idx, dims + 9)
            u_dd = s1(pixel_idx, sample_idx, dims + 10)
            dist, is_med, w_flight = med.sample_distance_lane(
                sig_t, albedo, u_ch, u_dd, t_surf)
            throughput = throughput * jnp.where(active[..., None],
                                                w_flight, 1.0)

            miss = active & ~hit.valid & ~is_med
            lum_pdf = _pdf_emitter_hit(arr, cfg, hit, d)
            w_esc = jnp.where(first | prev_delta, 1.0,
                              _mi_weight(prev_pdf, lum_pdf))
            li_acc = li_acc + jnp.where(
                miss[..., None],
                throughput * _env_radiance(arr, d) * w_esc[..., None], 0.0)
            active2 = active & (hit.valid | is_med)

            p_evt = o + d * dist[..., None]

            # ---- NEE (with boundary-marched transmittance) ----
            u_sel = s1(pixel_idx, sample_idx, dims + 0)
            u_nee = s2(pixel_idx, sample_idx, dims + 1)
            d_nee, dist_nee, le_nee, pdf_nee, is_dl = \
                _sample_emitter_direct(arr, cfg, p_evt, u_sel, u_nee)

            ph = med.phase_eval(med.HG, g_lane, -d, d_nee)
            wi_world = -d
            two = arr.materials.twosided[jnp.maximum(hit.mat_id, 0)]
            flip = two & (dot(hit.sh_n, wi_world) < 0)
            sh_n = jnp.where(flip[..., None], -hit.sh_n, hit.sh_n)
            sh_t = jnp.where(flip[..., None], -hit.sh_t, hit.sh_t)
            fr = frame(hit)._replace(n=sh_n, t=sh_t)
            wi = fr.to_local(wi_world)
            wo_nee = fr.to_local(d_nee)
            gm = mat.gather(arr.materials, arr.checkers, hit.mat_id, hit.uv)
            f_s, pdf_bs = mat.eval_pdf(active_kinds, gm, wi, wo_nee,
                                       arr.hair_tables)
            scat = jnp.where(is_med[..., None],
                             ph[..., None] * jnp.ones((1, 3)), f_s)

            geo_n = jnp.where(flip[..., None], -hit.geo_n, hit.geo_n)
            off = jnp.where(is_med[..., None], 0.0,
                            geo_n * jnp.where(dot(d_nee, geo_n) > 0,
                                              ray_eps, -ray_eps)[..., None])
            ok = active2 & (pdf_nee > 0) \
                & (jnp.max(jnp.abs(scat), axis=-1) > 0)
            tr_shadow, occl = _march_transmittance(
                arr, cfg, p_evt + off, d_nee,
                jnp.minimum(dist_nee, 1e7) - 2 * ray_eps, cur_med, ok)
            w_mis = jnp.where(is_dl, 1.0, _mi_weight(pdf_nee, jnp.where(
                is_med, ph, pdf_bs)))
            li_acc = li_acc + jnp.where(
                (ok & ~occl)[..., None],
                throughput * le_nee * scat * tr_shadow
                * (w_mis / jnp.maximum(pdf_nee, 1e-20))[..., None], 0.0)

            # ---- continue ----
            u_ph = s2(pixel_idx, sample_idx, dims + 4)
            u_lobe = s1(pixel_idx, sample_idx, dims + 3)
            u2b = s2(pixel_idx, sample_idx, dims + 6)
            wo_med, pdf_ph = med.phase_sample(med.HG, g_lane, -d, u_ph)
            wo_l, w_bsdf, pdf_b, is_delta, _ = mat.sample(
                active_kinds, gm, wi, u_lobe, u_ph, u2b, arr.hair_tables)
            wo_surf = fr.to_world(wo_l)
            d_next = jnp.where(is_med[..., None], wo_med, wo_surf)
            w_next = jnp.where(is_med[..., None], 1.0, w_bsdf)
            throughput = throughput * w_next
            dead = jnp.max(jnp.abs(throughput), axis=-1) <= 0
            active2 = active2 & ~dead

            # medium transition at transmissive surface events: crossing
            # to the far side of an outward normal enters the interior
            surf_evt = active2 & ~is_med & hit.valid & ~hit.is_hair
            crossed = surf_evt & (dot(wo_surf, hit.geo_n)
                                  * dot(wi_world, hit.geo_n) < 0)
            med_ids = arr.tri_med[jnp.maximum(hit.prim, 0)]
            # parity-robust: if we are in one of this boundary's media,
            # crossing moves us to the other one; the normal heuristic is
            # only the fallback (nested-media entry from a third medium)
            by_norm = jnp.where(dot(wo_surf, hit.geo_n) < 0,
                                med_ids[:, 0], med_ids[:, 1])
            nxt_med = jnp.where(cur_med == med_ids[:, 0], med_ids[:, 1],
                                jnp.where(cur_med == med_ids[:, 1],
                                          med_ids[:, 0], by_norm))
            cur_med2 = jnp.where(crossed, nxt_med, cur_med)

            o_next = jnp.where(
                is_med[..., None], p_evt,
                hit.p + geo_n * jnp.where(dot(wo_surf, geo_n) > 0, ray_eps,
                                          -ray_eps)[..., None])
            depth2 = depth + 1
            q = jnp.minimum(jnp.max(throughput, axis=-1), 0.95)
            u_rr = s1(pixel_idx, sample_idx, dims + 8)
            do_rr = depth2 > cfg.rr_depth
            kill = do_rr & (u_rr >= q)
            throughput = jnp.where((do_rr & ~kill)[..., None],
                                   throughput
                                   / jnp.maximum(q, 1e-6)[..., None],
                                   throughput)
            active2 = active2 & ~kill

            next_pdf = jnp.where(is_med, pdf_ph, pdf_b)
            next_delta = jnp.where(is_med, False, is_delta)
            # an index-matched (null) boundary is not a scattering event:
            # it must carry the previous MIS state through, exactly like
            # the reference's volpath, whose transmittance queries never
            # touch rRec's last-pdf (otherwise the env would be double
            # counted: once by NEE through the boundary, once at escape
            # with weight 1)
            kind_hit = arr.materials.kind[jnp.maximum(hit.mat_id, 0)]
            is_null_evt = active2 & ~is_med & (kind_hit == mat.NULL)
            next_pdf = jnp.where(is_null_evt, prev_pdf, next_pdf)
            next_delta = jnp.where(is_null_evt, prev_delta, next_delta)
            first_next = first & is_null_evt
            return (depth2, active2, o_next, d_next, cur_med2, throughput,
                    li_acc, first_next, next_pdf, next_delta)

        init = (jnp.int32(1), jnp.ones((n,), bool), ray.o, ray.d,
                jnp.zeros((n,), jnp.int32),
                jnp.ones((n, 3), jnp.float32),
                jnp.zeros((n, 3), jnp.float32),
                jnp.ones((n,), bool), jnp.zeros((n,), jnp.float32),
                jnp.zeros((n,), bool))
        final = jax.lax.while_loop(cond, body, init)
        return final[6], pos

    return li


def render_volpath(scene: Scene, medium=None, spp: int = 8,
                   seed: int = 0):
    cfg = scene.config
    fl = scene.film
    n_pix = cfg.width * cfg.height
    if medium is None and scene.medium is None \
            and scene.arrays.media is not None:
        li = make_volpath_bounded_li(scene)
    else:
        if medium is None:
            medium = scene.medium if scene.medium is not None \
                else med.make_medium((0.05,) * 3, (0.01,) * 3)
        li = make_volpath_li(scene, medium)

    @jax.jit
    def wave(arr, sample_id, image, weight):
        pixel_idx = jnp.arange(n_pix, dtype=jnp.uint32)
        sample_idx = jnp.full((n_pix,), sample_id, jnp.uint32)
        radiance, pos = li(arr, pixel_idx, sample_idx)
        radiance = jnp.nan_to_num(radiance, nan=0.0, posinf=0.0, neginf=0.0)
        return film_mod.splat_samples(fl, pos, radiance, image, weight)

    image, weight = film_mod.zeros(fl)
    for s in range(spp):
        image, weight = wave(scene.arrays, jnp.uint32(s + seed * 65536),
                             image, weight)
    return film_mod.develop(image, weight)
