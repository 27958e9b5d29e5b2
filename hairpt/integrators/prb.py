"""Path-replay backpropagation (PRB) — depth-scalable gradients.

The scan-AD differentiable mode (path.make_li_fn(differentiable=True))
checkpoints one Hit record per bounce per lane, so its memory grows
linearly in depth: fine at depth 6-16, impossible at the workload's
depth 65 (furball scene.xml maxDepth=65) at 1024². This module computes
the SAME detached-sampling gradient estimator with O(1) memory in depth,
in the style of Vicini et al. 2021 ("Path Replay Backpropagation"):

  1. primal pass: the ordinary forward wavefront gives per-lane radiance
     L (and the loss adjoint δ = ∂loss/∂L per lane).
  2. replay pass: re-trace the identical path (same stateless RNG keys →
     same sampling decisions, same RR kills). At bounce k maintain
       T_k  — throughput prefix (recomputed),
       S_k  — suffix radiance in prefix-stripped units, seeded with
              S_1 = L and peeled by  S_{k+1} = (S_k − e_k − c_k) / w_k
     and accumulate  ∂loss/∂θ += vjpθ[c_k](δ·T_k)
                               + vjpθ[w_k](δ·T_k·S_{k+1})
     where c_k is the NEE contribution and w_k the bounce weight — the
     only θ-dependent terms of the detached estimator (directions, pdfs
     and RR factors are detached, exactly as in the scan-AD mode).

θ = (MaterialTable, HairTables): every differentiable material parameter,
including the Marschner azimuthal tables (σ_a/β_R gradients then flow
through precompute_azimuthal outside this loop, see inverse.py).

Supported feature set = the inverse-rendering configs (hair + mesh
geometry, env/area/delta emitters, any registered BSDF, RR, strict
normals). NOT supported here (use scan-AD): media, dipole subsurface,
textured materials (checkers/EWA), PSSMLT uniform streams.

Division guard: lanes with |w_k| < 1e-6 in a channel zero that channel's
suffix (the path carries no further gradient there) — the standard PRB
safeguard.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.lax import stop_gradient as sg

from ..core import rng
from ..core.math import Ray, dot
from ..models import emitters as em
from ..models.bsdf import registry as mat
from ..scene.scene import Scene
from .common import scene_intersect, scene_occluded, frame
from . import path as path_int
from .path import (DIM_BASE, DIM_STRIDE, D_NEE_SEL, D_NEE_POS,
                   D_BSDF_LOBE, D_BSDF_U2, D_BSDF_U2B, D_RR,
                   _mi_weight, _sample_emitter_direct, _pdf_emitter_hit,
                   _swept_params)


def _check_supported(scene: Scene):
    arr = scene.arrays
    assert arr.sss is None, "PRB: dipole subsurface unsupported (scan-AD)"
    assert getattr(arr, "media", None) is None or arr.media is None, \
        "PRB: media unsupported (use volpath scan-AD)"
    if arr.checkers is not None and arr.checkers.mips.shape[1] > 0:
        raise AssertionError("PRB: textured materials unsupported")
    assert mat.DIPOLE not in set(int(k) for k in scene.active_kinds)
    assert scene.config.nee_rr == 0.0, \
        "PRB: shadow-ray RR not replayed (set nee_rr=0 for gradients)"


def float_theta(arrays):
    """The differentiable θ: float MaterialTable fields + HairTables."""
    mats = arrays.materials
    ff = tuple(f for f in mats._fields
               if hasattr(getattr(mats, f), "dtype")
               and jnp.issubdtype(getattr(mats, f).dtype, jnp.floating))
    return ({f: getattr(mats, f) for f in ff}, arrays.hair_tables)


def make_prb_grad_fn(scene: Scene, loss_fn=None):
    """Returns grad(arr, pixel_idx, sample_idx, *loss_args)
        -> ((loss, L [N,3]), (d_mat_floats, d_hair_tables))

    loss_fn(L, pos, *loss_args) -> scalar defines the objective over the
    per-lane radiance (default: mean). The returned cotangents are w.r.t.
    float_theta(arr) — feed them into the outer vjp of
    apply_params_arrays (inverse.py) for σ_a/β_R/diffuse gradients.
    """
    _check_supported(scene)
    cfg = scene.config
    active_kinds = scene.active_kinds
    smode = cfg.sampler
    ray_eps = cfg.ray_eps
    li_fn = path_int.make_li_fn(scene)

    def s1(pix, smp, dim):
        return rng.next_1d(smode, pix, smp, dim)

    def s2(pix, smp, dim):
        return rng.next_2d(smode, pix, smp, dim)

    def grad(arr, pixel_idx, sample_idx, *loss_args):
        pixel_idx = jnp.asarray(pixel_idx, jnp.uint32)
        n = pixel_idx.shape[0]

        # ---- pass 1: primal (identical estimator, full RR) ----
        L, pos0, _ = li_fn(arr, pixel_idx, sample_idx)
        L = sg(L)
        pos0 = sg(pos0)
        if loss_fn is None:
            loss_val = jnp.mean(L)
            adjoint = jnp.full_like(L, 1.0 / L.size)
        else:
            loss_val, vjp_l = jax.vjp(
                lambda R: loss_fn(R, pos0, *loss_args), L)
            (adjoint,) = vjp_l(jnp.ones_like(loss_val))
        adjoint = sg(adjoint)

        # θ = float material fields + hair tables (int fields like `kind`
        # would produce float0 cotangents that cannot accumulate)
        mats0 = arr.materials
        theta0 = float_theta(arr)

        # ---- pass 2: replay ----
        from ..models import sensors
        jitter = s2(pixel_idx, sample_idx, path_int.DIM_CAM_POS)
        px = (pixel_idx % cfg.width).astype(jnp.float32)
        py = (pixel_idx // cfg.width).astype(jnp.float32)
        pos = jnp.stack([px + jitter[..., 0], py + jitter[..., 1]], -1)
        ap = s2(pixel_idx, sample_idx, path_int.DIM_CAM_APERTURE)
        ray = sensors.sample_ray(scene.camera, pos, ap)
        hit0 = scene_intersect(arr, ray, cfg.traversal, cfg.block,
                               _swept_params(cfg))

        g0 = jax.tree_util.tree_map(jnp.zeros_like, theta0)

        init = dict(
            depth=jnp.int32(1),
            active=jnp.ones((n,), bool),
            ray_d=ray.d,
            T=jnp.ones((n, 3), jnp.float32),
            S=L,                      # suffix in prefix-stripped units
            eta=jnp.ones((n,), jnp.float32),
            hit=hit0,
            prev_bsdf_pdf=jnp.zeros((n,), jnp.float32),
            prev_delta=jnp.zeros((n,), bool),
            emission_allowed=jnp.ones((n,), bool),
            grads=g0,
        )

        def cond(st):
            return jnp.any(st["active"]) & (st["depth"] < cfg.max_depth)

        def body(st):
            dims = DIM_BASE + (st["depth"] - 1) * DIM_STRIDE
            hit = st["hit"]
            active = st["active"]
            d_in = st["ray_d"]
            T = st["T"]
            S = st["S"]

            # ---- loop-top emission e_k (θ-independent) ----
            e = jnp.zeros((n, 3), jnp.float32)
            miss = active & ~hit.valid
            if arr.env is not None:
                le_env = em.env_eval(arr.env, d_in)
                lum_pdf = _pdf_emitter_hit(arr, cfg, hit, d_in)
                w = jnp.where(st["prev_delta"] | st["emission_allowed"],
                              1.0, _mi_weight(st["prev_bsdf_pdf"],
                                              lum_pdf))
                e = e + jnp.where(miss[..., None],
                                  le_env * w[..., None], 0.0)
            active = active & hit.valid
            wi_world = -d_in
            if arr.area is not None:
                le = path_int._emitter_radiance_at_hit(arr, hit, wi_world)
                lum_pdf = _pdf_emitter_hit(arr, cfg, hit, d_in)
                w = jnp.where(st["prev_delta"] | st["emission_allowed"],
                              1.0, _mi_weight(st["prev_bsdf_pdf"],
                                              lum_pdf))
                e = e + jnp.where(active[..., None], le * w[..., None],
                                  0.0)

            # ---- shading frame (no textures: perturb is identity) ----
            two = arr.materials.twosided[jnp.maximum(hit.mat_id, 0)]
            flip = two & (dot(hit.sh_n, wi_world) < 0)
            sh_n = jnp.where(flip[..., None], -hit.sh_n, hit.sh_n)
            sh_t = jnp.where(flip[..., None], -hit.sh_t, hit.sh_t)
            geo_n = jnp.where(flip[..., None], -hit.geo_n, hit.geo_n)
            fr = frame(hit)._replace(n=sh_n, t=sh_t)
            wi = fr.to_local(wi_world)
            if cfg.strict_normals:
                bad = dot(d_in, geo_n) * wi[..., 2] >= 0
                active = active & ~bad

            pix, smp = pixel_idx, sample_idx
            u_sel = s1(pix, smp, dims + D_NEE_SEL)
            u_nee = s2(pix, smp, dims + D_NEE_POS)
            d_nee, dist_nee, le_nee, pdf_nee, is_dl = \
                _sample_emitter_direct(arr, cfg, hit.p, u_sel, u_nee)
            wo_nee = fr.to_local(d_nee)
            u_lobe = s1(pix, smp, dims + D_BSDF_LOBE)
            u2 = s2(pix, smp, dims + D_BSDF_U2)
            u2b = s2(pix, smp, dims + D_BSDF_U2B)

            # ---- θ-dependent locals: NEE contribution + bounce weight --
            def local(theta):
                mats_f, ht = theta
                mats = mats0._replace(**mats_f)
                gm = mat.gather(mats, None, hit.mat_id, hit.uv)
                f_nee, bsdf_pdf_nee = mat.eval_pdf_mix(
                    active_kinds, mats, None, hit.mat_id, hit.uv, gm, wi,
                    wo_nee, ht)
                w_nee = jnp.where(is_dl, 1.0,
                                  _mi_weight(pdf_nee, bsdf_pdf_nee))
                c = le_nee * f_nee \
                    * (w_nee / jnp.maximum(pdf_nee, 1e-20))[..., None]
                wo_s, wt_s, pdf_s, is_delta_s, eta_s = mat.sample_mix(
                    active_kinds, mats, None, hit.mat_id, hit.uv, gm, wi,
                    u_lobe, u2, u2b, ht)
                # detached-sampling estimator: direction + pdf carry no
                # gradient; smooth lanes re-evaluate f at the frozen wo
                f2, p2 = mat.eval_pdf_mix(
                    active_kinds, mats, None, hit.mat_id, hit.uv, gm, wi,
                    sg(wo_s), ht)
                w_s = jnp.where(is_delta_s[..., None], wt_s,
                                f2 / jnp.maximum(sg(p2), 1e-9)[..., None])
                return (c, w_s), (sg(wo_s), sg(is_delta_s), sg(pdf_s),
                                  sg(f_nee), sg(eta_s))

            (c_val, w_val), vjp_fn, \
                (wo, is_delta, bsdf_pdf, f_nee_v, eta_s) = \
                jax.vjp(local, theta0, has_aux=True)
            c_val, w_val = sg(c_val), sg(w_val)

            # ---- NEE visibility (geometry, detached) ----
            nee_ok = active & (pdf_nee > 0) \
                & (jnp.max(jnp.abs(f_nee_v), axis=-1) > 0)
            if cfg.strict_normals:
                nee_ok = nee_ok & (dot(geo_n, d_nee) * wo_nee[..., 2] > 0)
            shadow_o = hit.p + geo_n * jnp.where(
                dot(d_nee, geo_n) > 0, ray_eps, -ray_eps)[..., None]
            shadow = Ray(o=shadow_o, d=d_nee,
                         mint=jnp.zeros((n,), jnp.float32),
                         maxt=jnp.where(nee_ok,
                                        dist_nee - 2.0 * ray_eps, 0.0))
            occluded = scene_occluded(arr, shadow, cfg.traversal,
                                      cfg.block, _swept_params(cfg),
                                      sort_rays=True, compact=False)
            vis = (nee_ok & ~occluded)[..., None]
            c_vis = jnp.where(vis, c_val, 0.0)

            # ---- masks mirroring the forward body ----
            wo_world = fr.to_world(wo)
            dead = jnp.max(jnp.abs(w_val), axis=-1) <= 0
            active_next = active & ~dead
            if cfg.strict_normals:
                bad2 = dot(geo_n, wo_world) * wo[..., 2] <= 0
                active_next = active_next & ~bad2

            # ---- RR (replayed decisions; factor detached) ----
            depth_next = st["depth"] + 1
            w_rr = jnp.where(active[..., None], w_val, 0.0)
            T_bsdf = T * w_rr
            eta = st["eta"] * eta_s
            q = jnp.minimum(jnp.max(sg(T_bsdf), axis=-1) * eta * eta,
                            0.95)
            do_rr = depth_next > cfg.rr_depth
            u_rr = s1(pix, smp, dims + D_RR)
            kill = do_rr & (u_rr >= q)
            rr_fac = jnp.where(do_rr & ~kill,
                               1.0 / jnp.maximum(q, 1e-6), 1.0)
            active_next = active_next & ~kill
            w_total = w_rr * rr_fac[..., None]
            w_total = jnp.where(active_next[..., None], w_total, 0.0)

            # ---- suffix peel: S_{k+1} = (S − e − c)/w ----
            e_m = jnp.where(st["active"][..., None], e, 0.0)
            num = S - e_m - jnp.where(active[..., None], c_vis, 0.0)
            S_next = jnp.where(jnp.abs(w_total) > 1e-6,
                               num / jnp.where(jnp.abs(w_total) > 1e-6,
                                               w_total, 1.0), 0.0)
            S_next = jnp.where(active_next[..., None], S_next, 0.0)

            # ---- accumulate gradients ----
            cot_c = jnp.where(vis & active[..., None], adjoint * T, 0.0)
            cot_w = jnp.where(active_next[..., None],
                              adjoint * T * S_next
                              * rr_fac[..., None], 0.0)
            cot_c = jnp.nan_to_num(cot_c, nan=0.0, posinf=0.0, neginf=0.0)
            cot_w = jnp.nan_to_num(cot_w, nan=0.0, posinf=0.0, neginf=0.0)
            (d_theta,) = vjp_fn((cot_c, cot_w))
            grads = jax.tree_util.tree_map(
                lambda a, b: a + jnp.nan_to_num(b, nan=0.0, posinf=0.0,
                                                neginf=0.0),
                st["grads"], d_theta)

            # ---- next ray ----
            next_o = hit.p + geo_n * jnp.where(
                dot(wo_world, geo_n) > 0, ray_eps, -ray_eps)[..., None]
            next_ray = Ray(o=next_o, d=wo_world,
                           mint=jnp.zeros((n,), jnp.float32),
                           maxt=jnp.where(active_next, jnp.inf, 0.0))
            hit2 = scene_intersect(arr, next_ray, cfg.traversal,
                                   cfg.block, _swept_params(cfg),
                                   sort_rays=True, compact=False)

            return dict(
                depth=depth_next,
                active=active_next,
                ray_d=wo_world,
                T=T_bsdf * rr_fac[..., None],
                S=S_next,
                eta=eta,
                hit=hit2,
                prev_bsdf_pdf=bsdf_pdf,
                prev_delta=is_delta,
                emission_allowed=jnp.zeros((n,), bool),
                grads=grads,
            )

        final = jax.lax.while_loop(cond, body, init)
        return (loss_val, L), final["grads"]

    return grad
