"""Wavefront MIS path tracer with next-event estimation + Russian roulette.

Faithful vectorization of the reference `path` plugin's bounce loop
(src/integrators/path/path.cpp:119-289 MIPathTracer::Li): the per-sample
recursion becomes a `lax.while_loop` over a whole wavefront of SoA path
states, all shading is lane-masked switch-free BSDF dispatch, and the film
splat is a batched scatter-add. `direct` (src/integrators/direct/direct.cpp)
is the max_depth=2 special case.

Key correspondences:
- power-heuristic miWeight (path.cpp:291-295)        → _mi_weight
- emitter NEE + shadow ray (path.cpp:178-196)        → _sample_emitter_direct
- BSDF sampling + emitter-hit MIS (path.cpp:208-266) → body of _bounce
- RR with eta² throughput clamp (path.cpp:276-283)   → same constants
- strictNormals handling (path.cpp:160-175)          → same tests
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..core import rng
from ..core.math import Ray, dot
from ..film import film as film_mod
from ..models import emitters as em
from ..models import sensors
from ..models.bsdf import registry as mat
from ..models.bsdf import simple, plastic, hair as hair_bsdf  # noqa: F401
from ..models.bsdf import dielectric_rough  # noqa: F401  (register families)
from ..models.bsdf import hk as hk_bsdf  # noqa: F401
from ..models.bsdf import cloth as cloth_bsdf  # noqa: F401 (register)
from ..scene.scene import Scene
from .common import Hit, scene_intersect, scene_occluded, frame

# sample-dimension layout: camera uses [0,4); bounce b uses [4+16b, 4+16(b+1))
DIM_CAM_POS = 0
DIM_CAM_APERTURE = 2
DIM_BASE = 4
DIM_STRIDE = 16
D_NEE_SEL = 0
D_NEE_POS = 1
D_BSDF_LOBE = 3
D_BSDF_U2 = 4
D_BSDF_U2B = 6
D_RR = 8
D_SSS_DIST = 9              # single-scatter interior distance
D_SSS_SEL = 10              # single-scatter light selection
D_SSS_POS = 11              # +12: single-scatter light position
D_NEE_RR = 13               # shadow-ray RR (cfg.nee_rr)


def _swept_params(cfg):
    return (cfg.swept_c, cfg.swept_k, cfg.swept_pmax, cfg.swept_chunk,
            cfg.tiled_q, cfg.tiled_short)


def _mi_weight(pdf_a, pdf_b):
    a2 = pdf_a * pdf_a
    return jnp.where(pdf_a > 0, a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-30),
                     0.0)


def _camera_uv_partials(arr, cam_l, pos, ap, ray, hit):
    """Screen-space uv footprint Jacobian at the FIRST (camera) hit —
    parity with Intersection::computePartials (reference:
    include/mitsuba/render/records.inl: offset-ray plane transfer +
    dpdu/dpdv least squares). Returns (duv_dx, duv_dy) [N, 2] in
    unscaled uv units; zeros for hair/miss/degenerate-uv lanes (callers
    fall back to the isotropic LOD there)."""
    sh = arr.tri_shading
    i = jnp.maximum(hit.prim, 0)
    duv1 = sh.uv1[i] - sh.uv0[i]
    duv2 = sh.uv2[i] - sh.uv0[i]
    e1 = arr.tri.e1[i]
    e2 = arr.tri.e2[i]
    det_uv = duv1[..., 0] * duv2[..., 1] - duv1[..., 1] * duv2[..., 0]
    inv_uv = 1.0 / jnp.where(jnp.abs(det_uv) < 1e-12, 1.0, det_uv)
    dpdu = (duv2[..., 1:2] * e1 - duv1[..., 1:2] * e2) * inv_uv[..., None]
    dpdv = (-duv2[..., 0:1] * e1 + duv1[..., 0:1] * e2) * inv_uv[..., None]

    # offset rays through the adjacent pixel centers, transferred to the
    # hit's tangent plane (the reference's rayDifferential construction,
    # perspective.cpp:271 sampleRayDifferential)
    one_x = jnp.asarray([1.0, 0.0], jnp.float32)
    one_y = jnp.asarray([0.0, 1.0], jnp.float32)
    ray_dx = sensors.sample_ray(cam_l, pos + one_x, ap)
    ray_dy = sensors.sample_ray(cam_l, pos + one_y, ap)
    n = hit.geo_n
    d_dot = dot(ray.d, n)

    def transfer(rd):
        tq = dot(hit.p - rd.o, n) / jnp.where(
            jnp.abs(dot(rd.d, n)) < 1e-12, 1.0, dot(rd.d, n))
        return rd.o + rd.d * tq[..., None] - hit.p

    dpdx = transfer(ray_dx)
    dpdy = transfer(ray_dy)

    # least-squares projection onto (dpdu, dpdv)
    g00 = dot(dpdu, dpdu)
    g01 = dot(dpdu, dpdv)
    g11 = dot(dpdv, dpdv)
    det_g = g00 * g11 - g01 * g01
    inv_g = 1.0 / jnp.where(jnp.abs(det_g) < 1e-20, 1.0, det_g)

    def solve(dp):
        bu = dot(dpdu, dp)
        bv = dot(dpdv, dp)
        return jnp.stack([(g11 * bu - g01 * bv) * inv_g,
                          (g00 * bv - g01 * bu) * inv_g], axis=-1)

    # uv_density > 0 restricts to direct triangle hits (instanced lanes
    # carry prototype prim ids that must not index the scene tri table)
    ok = (hit.valid & ~hit.is_hair & (hit.uv_density > 0)
          & (jnp.abs(det_uv) > 1e-12)
          & (jnp.abs(det_g) > 1e-20) & (jnp.abs(d_dot) > 1e-6))
    z = jnp.zeros(pos.shape, jnp.float32)
    return (jnp.where(ok[..., None], solve(dpdx), z),
            jnp.where(ok[..., None], solve(dpdy), z))


class PathState(NamedTuple):
    depth: jnp.ndarray          # [] int32 (uniform across wavefront)
    active: jnp.ndarray         # [N]
    ray_o: jnp.ndarray          # [N, 3]
    ray_d: jnp.ndarray          # [N, 3]
    throughput: jnp.ndarray     # [N, 3]
    li: jnp.ndarray             # [N, 3]
    eta: jnp.ndarray            # [N]
    # hit of the current ray (computed before loop / at end of each bounce)
    hit: Hit
    # MIS bookkeeping for the emitter hit by the *current* ray
    prev_bsdf_pdf: jnp.ndarray  # [N]
    prev_delta: jnp.ndarray     # [N]
    emission_allowed: jnp.ndarray  # [N] loop-top Le gate (first hit only)
    n_rays: jnp.ndarray         # [] float32 — rays traced (perf counter)
    duv_dx: jnp.ndarray         # [N, 2] camera-ray uv footprint Jacobian
    duv_dy: jnp.ndarray         # [N, 2] (zeros when unavailable — EWA
    #                             falls back to the isotropic LOD)


def _env_radiance(arr, d):
    if arr.env is None:
        return jnp.zeros(d.shape[:-1] + (3,), jnp.float32)
    return em.env_eval(arr.env, d)


def _emitter_radiance_at_hit(arr, hit: Hit, wi_world):
    """Le of an area emitter at the hit, facing check included."""
    if arr.area is None:
        return jnp.zeros(hit.p.shape[:-1] + (3,), jnp.float32)
    area = arr.area
    le = area.radiance[jnp.maximum(hit.emitter_id, 0)]
    facing = dot(hit.geo_n, wi_world) > 0
    on = (hit.emitter_id >= 0) & facing
    return jnp.where(on[..., None], le, 0.0)


def _sample_emitter_direct(arr, cfg, p, u_sel, u2):
    """Pick an emitter source (env / area / delta, static probs from
    cfg.nee_probs) and sample a direction towards it
    (reference: Scene::sampleEmitterDirect, scene.cpp:828).
    Returns (d, dist, le, pdf, is_delta_light). `le/pdf` is the full
    divided contribution for delta lights (MIS weight forced to 1)."""
    n = p.shape[0]
    zero3 = jnp.zeros((n, 3), jnp.float32)
    d = zero3.at[:, 2].set(1.0)
    le = zero3
    pdf = jnp.zeros((n,), jnp.float32)
    dist = jnp.full((n,), jnp.inf, jnp.float32)
    is_dl = jnp.zeros((n,), bool)
    p_env, p_area, p_delta = cfg.nee_probs

    if arr.env is not None and p_env > 0:
        d_env, le_env, pdf_env = em.env_sample(arr.env, u2)
        sel = u_sel < p_env
        d = jnp.where(sel[..., None], d_env, d)
        le = jnp.where(sel[..., None], le_env, le)
        pdf = jnp.where(sel, pdf_env * p_env, pdf)

    if arr.area is not None and p_area > 0:
        area = arr.area
        u_resc = jnp.clip((u_sel - p_env) / p_area, 0.0, 1.0 - 1e-7)
        l, prob_l, _ = _sample_discrete_cdf(area.cdf, u_resc)
        su = jnp.sqrt(jnp.maximum(u2[..., 0], 1e-12))
        b0 = 1.0 - su
        b1 = u2[..., 1] * su
        q = area.p0[l] + area.e1[l] * b0[..., None] \
            + area.e2[l] * b1[..., None]
        dq = q - p
        d2 = jnp.sum(dq * dq, axis=-1)
        dl = jnp.sqrt(jnp.maximum(d2, 1e-20))
        dd = dq / dl[..., None]
        cos_l = -jnp.sum(area.n[l] * dd, axis=-1)
        pdf_sa = prob_l / jnp.maximum(area.area[l], 1e-12) * d2 \
            / jnp.maximum(cos_l, 1e-6)
        ok = cos_l > 1e-6
        sel = (u_sel >= p_env) & (u_sel < p_env + p_area)
        d = jnp.where(sel[..., None], dd, d)
        le = jnp.where((sel & ok)[..., None], area.radiance[l],
                       jnp.where(sel[..., None], 0.0, le))
        pdf = jnp.where(sel, jnp.where(ok, pdf_sa * p_area, 0.0), pdf)
        dist = jnp.where(sel, dl, dist)

    if arr.delta is not None and p_delta > 0:
        u_resc = jnp.clip((u_sel - p_env - p_area) / p_delta,
                          0.0, 1.0 - 1e-7)
        d_dl, dist_dl, contrib, prob_l = em.delta_light_sample(
            arr.delta, p, u_resc)
        sel = u_sel >= p_env + p_area
        d = jnp.where(sel[..., None], d_dl, d)
        le = jnp.where(sel[..., None], contrib, le)
        pdf = jnp.where(sel, prob_l * p_delta, pdf)
        dist = jnp.where(sel, dist_dl, dist)
        is_dl = is_dl | sel

    return d, dist, le, pdf, is_dl


def _sample_discrete_cdf(cdf, u):
    nl = cdf.shape[0]
    idx = jnp.clip(jnp.searchsorted(cdf, u), 0, nl - 1)
    hi = cdf[idx]
    lo = jnp.where(idx > 0, cdf[jnp.maximum(idx - 1, 0)], 0.0)
    return idx, hi - lo, u


def _pdf_emitter_hit(arr, cfg, hit: Hit, d):
    """pdf of NEE having produced the direction that the BSDF ray took to
    reach its emitter (env for misses, area light for emissive hits; delta
    lights are unreachable by BSDF rays)."""
    n = d.shape[0]
    p_env, p_area, _ = cfg.nee_probs
    pdf = jnp.zeros((n,), jnp.float32)
    if arr.env is not None and p_env > 0:
        pdf_env = em.env_pdf(arr.env, d) * p_env
        pdf = jnp.where(hit.valid, pdf, pdf_env)
    if arr.area is not None and p_area > 0:
        area = arr.area
        l = jnp.maximum(hit.emitter_id, 0)
        power_lum = area.area * (area.radiance
                                 @ jnp.asarray([0.212671, 0.715160,
                                                0.072169]))
        prob_l = power_lum / jnp.maximum(jnp.sum(power_lum), 1e-12)
        d2 = hit.t * hit.t
        cos_l = -jnp.sum(area.n[l] * d, axis=-1)
        pdf_area = prob_l[l] / jnp.maximum(area.area[l], 1e-12) * d2 \
            / jnp.maximum(cos_l, 1e-6)
        on = hit.valid & (hit.emitter_id >= 0) & (cos_l > 1e-6)
        pdf = jnp.where(on, pdf_area * p_area, pdf)
    return pdf


def _single_scatter(arr, cfg, p, n, wo_world, params, sel,
                    u_dist, u_sel, u_pos):
    """Single scattering through the refractive boundary (capability
    counterpart of src/subsurface/singlescatter.cpp LoSingle, using the
    classical Jensen et al. 2001 estimator rather than Holzschuch's exact
    point-line construction): refract the view ray into the medium, sample
    one scatter point along it (truncated-exponential in the interior
    chord), connect to a light through the boundary with the Snell-
    corrected inside distance s'_i = s_i·|ω·n| / sqrt(1 − (1/η)²(1−|ω·n|²))
    (Jensen eq. 13), attenuate by both interior path lengths and both
    Fresnel transmittances. Returns [N, 3] radiance; lanes with sel=False
    trace degenerate rays and return 0."""
    from ..models.bsdf.fresnel import fresnel_dielectric

    eta = params.eta
    cos_o = jnp.maximum(dot(wo_world, n), 0.0)
    r_o, _ = fresnel_dielectric(cos_o, eta)
    sin2_t = (1.0 - cos_o * cos_o) / (eta * eta)
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    w_in = -wo_world / eta + ((cos_o / eta - cos_t))[..., None] * n

    # interior chord length along the refracted ray
    o_in = p - n * cfg.ray_eps
    nray = p.shape[0]
    r0 = Ray(o=o_in, d=w_in, mint=jnp.zeros(nray),
             maxt=jnp.where(sel, jnp.inf, 0.0))
    hx0 = scene_intersect(arr, r0, cfg.traversal, cfg.block,
                          _swept_params(cfg), sort_rays=True)
    s_max = jnp.where(hx0.valid, hx0.t, 0.0)

    sig_s = params.sigma_s * params.scale
    sig_t = sig_s + params.sigma_a * params.scale
    sig_bar = jnp.mean(sig_t)
    cdf_max = 1.0 - jnp.exp(-sig_bar * s_max)
    s = -jnp.log1p(-u_dist * cdf_max) / sig_bar
    pdf_s = sig_bar * jnp.exp(-sig_bar * s) / jnp.maximum(cdf_max, 1e-12)
    x_s = o_in + w_in * s[..., None]

    ok = sel & hx0.valid & (cdf_max > 1e-6)
    d_nee, dist_nee, le, pdf_nee, _ = _sample_emitter_direct(
        arr, cfg, x_s, u_sel, u_pos)
    ok = ok & (pdf_nee > 0)

    # boundary exit point towards the light
    r1 = Ray(o=x_s, d=d_nee, mint=jnp.zeros(nray),
             maxt=jnp.where(ok, jnp.inf, 0.0))
    hx1 = scene_intersect(arr, r1, cfg.traversal, cfg.block,
                          _swept_params(cfg), sort_rays=True)
    ok = ok & hx1.valid
    si = jnp.where(hx1.valid, hx1.t, 0.0)
    cos_exit = jnp.abs(dot(d_nee, hx1.geo_n))
    denom = jnp.sqrt(jnp.maximum(
        1.0 - (1.0 - cos_exit * cos_exit) / (eta * eta), 1e-6))
    s_i = si * cos_exit / denom                      # Jensen eq. 13
    r_i, _ = fresnel_dielectric(cos_exit, eta)

    # shadow ray from the exit point onward to the light
    n_out = jnp.where(dot(hx1.geo_n, d_nee)[..., None] > 0,
                      hx1.geo_n, -hx1.geo_n)
    sh = Ray(o=hx1.p + n_out * cfg.ray_eps, d=d_nee,
             mint=jnp.zeros(nray),
             maxt=jnp.where(ok, dist_nee - si - 2 * cfg.ray_eps, 0.0))
    occ = scene_occluded(arr, sh, cfg.traversal, cfg.block,
                         _swept_params(cfg), sort_rays=True)
    ok = ok & ~occ

    # HG phase between the interior propagation dir and the light dir
    g = jnp.float32(params.g)
    cos_ph = dot(w_in, d_nee)
    # forward scattering (d_nee ≈ w_in, cos_ph = +1) is the HG peak
    ph = (1.0 - g * g) / (4.0 * jnp.pi * jnp.maximum(
        1.0 + g * g - 2.0 * g * cos_ph, 1e-6) ** 1.5)

    tr = jnp.exp(-sig_t[None, :] * (s + s_i)[..., None])
    lo = sig_s[None, :] * tr * le \
        * (ph * (1.0 - r_o) * (1.0 - r_i)
           / (jnp.maximum(pdf_nee, 1e-20)
              * jnp.maximum(pdf_s, 1e-20)))[..., None]
    return jnp.where(ok[..., None], lo, 0.0)


def make_li_fn(scene: Scene, differentiable: bool = False,
               n_uniform_dims: int = 0, ablate: tuple = (),
               antithetic: bool = False):
    """Builds the jit-able per-wavefront radiance estimator.

    Returns li(arr: SceneArrays, pixel_idx [N], sample_idx [N])
        -> (radiance [N,3], pos [N,2], n_rays []).

    The scene arrays are an explicit ARGUMENT (not a closure) so jit treats
    them as device buffers rather than baking megabytes of BVH/envmap data
    into the HLO as literals — that kept compiles fast and lets inverse
    rendering pass parameter-dependent tables so gradients flow to them.
    `scene` only contributes static structure/config.

    differentiable: use a fixed-length `lax.scan` over bounces instead of
    `lax.while_loop` (reverse-mode differentiable; sampling decisions are
    detached — gradients flow through BSDF eval only, the standard
    path-replay style estimator for continuous parameters). Russian
    roulette is disabled in this mode.

    n_uniform_dims > 0: li takes a 4th argument `uniforms [N, D]` and all
    sample requests read from it instead of the procedural sampler — the
    primary-sample-space hook used by PSSMLT (reference:
    src/integrators/pssmlt + ReplayableSampler, bidir/rsampler.h).

    ablate: diagnostic-only knobs for perf decomposition (each removes a
    wave-time component; the image is WRONG under any of them):
      'nonee'      — skip emitter sampling + the shadow query entirely
      'noshadow'   — sample NEE but treat every shadow ray as unoccluded
      'cheapshade' — replace BSDF eval/sample with closed-form Lambert
      'nosort'     — no Morton/octant resort of bounce/shadow waves
    Resolved at trace time by construction (make_li_fn builds a fresh
    closure per call — never cached across differing ablate values).
    """
    cfg = scene.config
    cam = scene.camera
    active_kinds = scene.active_kinds
    smode = cfg.sampler
    ray_eps = cfg.ray_eps
    _U = [None]  # set per-call when n_uniform_dims > 0

    # antithetic: False, or a tuple of per-bounce dim offsets to mirror
    # (u → 1−u). True = (D_BSDF_U2, D_BSDF_U2+1) — the faithful
    # Marschner's shared xi_m/xi_n 2D sample, i.e. the longitudinal vMF
    # inversion + azimuthal warp whose noise rectification biases
    # recovered β_R. Measured β-gradient std on the tiny furball:
    # base 1.83, flip u2.x only 1.49, u2.y only 1.12, both 1.10.
    anti_rels = antithetic
    if antithetic is True:
        anti_rels = (D_BSDF_U2, D_BSDF_U2 + 1)

    def _flip(u, dim):
        # paired renders mirror the selected BSDF dims so first-order
        # sampling noise cancels; all other dims (camera, NEE, RR)
        # keep the primary stream so the pair shares its path skeleton
        if not anti_rels:
            return u
        rel = jnp.mod(dim - DIM_BASE, DIM_STRIDE)
        mirror = (dim >= DIM_BASE) & jnp.isin(
            rel, jnp.asarray(list(anti_rels), rel.dtype))
        return jnp.where(mirror, 1.0 - u, u)

    def s1(pix, smp, dim):
        if n_uniform_dims > 0:
            d = jnp.mod(dim, n_uniform_dims)
            return jax.lax.dynamic_index_in_dim(
                _U[0], d, axis=1, keepdims=False) if jnp.ndim(d) == 0 \
                else jnp.take_along_axis(_U[0], d[None].astype(jnp.int32),
                                         axis=1)[:, 0]
        return _flip(rng.next_1d(smode, pix, smp, dim), dim)

    def s2(pix, smp, dim):
        if n_uniform_dims > 0:
            return jnp.stack([s1(pix, smp, dim), s1(pix, smp, dim + 1)],
                             axis=-1)
        u = rng.next_2d(smode, pix, smp, dim)
        return jnp.stack([_flip(u[..., 0], dim),
                          _flip(u[..., 1], dim + 1)], axis=-1)

    def li(arr, pixel_idx, sample_idx, uniforms=None, cam_to_world=None):
        if n_uniform_dims > 0:
            _U[0] = uniforms
        # pixel_idx may arrive as a host numpy constant (block_swizzle
        # stays host-side so lowering embeds it as a literal instead of
        # fetching a device buffer through the compile tunnel); coerce to
        # a traced array HERE so downstream tracer-indexed gathers
        # (staged-width compaction) don't hit numpy.__getitem__(tracer)
        pixel_idx = jnp.asarray(pixel_idx, jnp.uint32)
        # camera motion blur: the per-wave shutter-time pose arrives as a
        # traced [4,4] (shapes identical → one compile for all times)
        cam_l = cam if cam_to_world is None \
            else cam._replace(to_world=cam_to_world)
        n = pixel_idx.shape[0]
        px = (pixel_idx % cfg.width).astype(jnp.float32)
        py = (pixel_idx // cfg.width).astype(jnp.float32)
        jitter = s2(pixel_idx, sample_idx, DIM_CAM_POS)
        pos = jnp.stack([px + jitter[..., 0], py + jitter[..., 1]], axis=-1)
        ap = s2(pixel_idx, sample_idx, DIM_CAM_APERTURE)
        ray = sensors.sample_ray(cam_l, pos, ap)

        hit0 = scene_intersect(arr, ray, cfg.traversal, cfg.block,
                               _swept_params(cfg))

        # EWA footprint Jacobian at the camera hit (mipmap.h parity);
        # bounce hits fall back to the isotropic LOD inside the loop.
        # Untextured scenes carry ZERO-width fields — no dead [N,2]
        # state threaded through the bounce loop at wavefront scale
        has_ewa = (arr.checkers is not None
                   and arr.checkers.mips.shape[1] > 0
                   and arr.tri is not None)
        if has_ewa:
            duv0_dx, duv0_dy = _camera_uv_partials(arr, cam_l, pos, ap,
                                                   ray, hit0)
        else:
            duv0_dx = jnp.zeros((n, 0), jnp.float32)
            duv0_dy = jnp.zeros((n, 0), jnp.float32)

        state = PathState(
            depth=jnp.int32(1),
            active=jnp.ones((n,), bool),
            ray_o=ray.o, ray_d=ray.d,
            throughput=jnp.ones((n, 3), jnp.float32),
            li=jnp.zeros((n, 3), jnp.float32),
            eta=jnp.ones((n,), jnp.float32),
            hit=hit0,
            prev_bsdf_pdf=jnp.zeros((n,), jnp.float32),
            prev_delta=jnp.zeros((n,), bool),
            emission_allowed=jnp.ones((n,), bool),
            n_rays=jnp.float32(n),
            duv_dx=duv0_dx, duv_dy=duv0_dy,
        )

        def cond(st: PathState):
            # depth semantics match the reference: at depth == maxDepth the
            # loop only collects the pending emission (done by the flush
            # below) and stops, so bounces happen at depths 1..maxDepth-1
            return jnp.any(st.active) & (st.depth < cfg.max_depth)

        def body(st: PathState, pixel_idx, sample_idx):
            n = st.active.shape[0]
            dims = DIM_BASE + (st.depth - 1) * DIM_STRIDE
            hit = st.hit
            active = st.active
            d_in = st.ray_d

            # ---- miss: environment ----
            miss = active & ~hit.valid
            li_acc = st.li + jnp.where(
                (miss & st.emission_allowed)[..., None],
                st.throughput * _env_radiance(arr, d_in), 0.0)
            # env with MIS for non-first hits
            if arr.env is not None:
                lum_pdf = _pdf_emitter_hit(arr, cfg, hit, d_in)
                w = jnp.where(st.prev_delta, 1.0,
                              _mi_weight(st.prev_bsdf_pdf, lum_pdf))
                li_acc = li_acc + jnp.where(
                    (miss & ~st.emission_allowed)[..., None],
                    st.throughput * _env_radiance(arr, d_in)
                    * w[..., None], 0.0)
            active = active & hit.valid

            # ---- emitter hit ----
            wi_world = -d_in
            if arr.area is not None:
                le = _emitter_radiance_at_hit(arr, hit, wi_world)
                lum_pdf = _pdf_emitter_hit(arr, cfg, hit, d_in)
                w_mis = jnp.where(st.prev_delta, 1.0,
                                  _mi_weight(st.prev_bsdf_pdf, lum_pdf))
                w_sel = jnp.where(st.emission_allowed, 1.0, w_mis)
                li_acc = li_acc + jnp.where(active[..., None],
                                            st.throughput * le
                                            * w_sel[..., None], 0.0)

            # ---- shading frame (normal/bump maps, then twosided flip) ----
            p_n, p_s, p_t = mat.perturb_shading_frame(
                arr.materials, arr.checkers, hit.mat_id, hit.uv,
                hit.sh_n, hit.sh_s, hit.sh_t)
            hit = hit._replace(sh_n=p_n, sh_s=p_s, sh_t=p_t)
            two = arr.materials.twosided[jnp.maximum(hit.mat_id, 0)]
            flip = two & (dot(hit.sh_n, wi_world) < 0)
            sh_n = jnp.where(flip[..., None], -hit.sh_n, hit.sh_n)
            sh_t = jnp.where(flip[..., None], -hit.sh_t, hit.sh_t)
            geo_n = jnp.where(flip[..., None], -hit.geo_n, hit.geo_n)
            fr = frame(hit)._replace(n=sh_n, t=sh_t)
            wi = fr.to_local(wi_world)

            # strict normals: classify wi consistently on both frames
            if cfg.strict_normals:
                bad = dot(d_in, geo_n) * wi[..., 2] >= 0
                active = active & ~bad

            # mip LOD from the ray footprint: uv-space footprint ≈
            # t · (pixel angle) · uv_density, in texels at the base level
            lod = None
            duv = None
            if arr.checkers is not None and arr.checkers.mips.shape[1] > 0:
                pix_ang = 2.0 * cam.tan_half_fov / cfg.width
                res_t = arr.checkers.bitmaps.shape[1]
                foot = hit.t * pix_ang * hit.uv_density * res_t
                lod = jnp.log2(jnp.maximum(foot, 1.0))
                # camera-hit lanes with a real Jacobian get anisotropic
                # EWA; zero-Jacobian lanes (bounces, hair, degenerate uv)
                # keep the isotropic trilinear LOD above
                if st.duv_dx.shape[-1] == 2:
                    duv = (st.duv_dx, st.duv_dy)
            gm = mat.gather(arr.materials, arr.checkers, hit.mat_id, hit.uv,
                            lod, hit.bary, hit.vcolor, duv)

            # ---- dipole subsurface lanes: gather Lo, terminate ----
            if mat.DIPOLE in set(int(k) for k in active_kinds) \
                    and arr.sss is not None:
                from ..models import subsurface as sss_mod
                is_sss = active & (gm.kind == mat.DIPOLE)
                if cfg.sss_single:
                    lo_sss = _single_scatter(
                        arr, cfg, hit.p, sh_n, wi_world, arr.sss.params,
                        is_sss,
                        s1(pixel_idx, sample_idx, dims + D_SSS_DIST),
                        s1(pixel_idx, sample_idx, dims + D_SSS_SEL),
                        s2(pixel_idx, sample_idx, dims + D_SSS_POS))
                else:
                    lo_sss = sss_mod.sss_radiance(arr.sss, hit.p,
                                                  wi[..., 2])
                li_acc = li_acc + jnp.where(is_sss[..., None],
                                            st.throughput * lo_sss, 0.0)
                active = active & ~is_sss

            pix, smp = pixel_idx, sample_idx

            def _eval_pdf(wo_q):
                if "cheapshade" in ablate:
                    cz = jnp.maximum(wo_q[..., 2], 0.0)
                    return (gm.diffuse * (cz / jnp.pi)[..., None],
                            cz / jnp.pi)
                return mat.eval_pdf_mix(
                    active_kinds, arr.materials, arr.checkers, hit.mat_id,
                    hit.uv, gm, wi, wo_q, arr.hair_tables)

            # ---- NEE ----
            nee_ok = jnp.zeros((n,), bool)
            if "nonee" not in ablate:
                u_sel = s1(pix, smp, dims + D_NEE_SEL)
                u_nee = s2(pix, smp, dims + D_NEE_POS)
                d_nee, dist_nee, le_nee, pdf_nee, is_dl = \
                    _sample_emitter_direct(arr, cfg, hit.p, u_sel, u_nee)
                wo_nee = fr.to_local(d_nee)
                f_nee, bsdf_pdf_nee = _eval_pdf(wo_nee)
                nee_ok = active & (pdf_nee > 0) \
                    & (jnp.max(jnp.abs(f_nee), axis=-1) > 0)
                if cfg.strict_normals:
                    nee_ok = nee_ok \
                        & (dot(geo_n, d_nee) * wo_nee[..., 2] > 0)
                # shadow-ray RR: the full pre-visibility contribution is
                # known BEFORE the occlusion query; dim samples (deep
                # bounces, dim sky texels) trace with p = lum/nee_rr and
                # carry 1/p — unbiased, cuts the any-hit load on lanes
                # that contribute almost nothing (the sun-disc samples
                # that carry the image always have p = 1)
                w_nee = jnp.where(is_dl, 1.0,
                                  _mi_weight(pdf_nee, bsdf_pdf_nee))
                contrib = st.throughput * le_nee * f_nee \
                    * (w_nee / jnp.maximum(pdf_nee, 1e-20))[..., None]
                if cfg.nee_rr > 0.0:
                    lum_c = jax.lax.stop_gradient(contrib) @ jnp.asarray(
                        [0.212671, 0.715160, 0.072169], jnp.float32)
                    p_tr = jnp.clip(lum_c / cfg.nee_rr, 0.05, 1.0)
                    u_srr = s1(pix, smp, dims + D_NEE_RR)
                    nee_ok = nee_ok & (u_srr < p_tr)
                    contrib = contrib / p_tr[..., None]
                shadow_o = hit.p + geo_n * jnp.where(
                    dot(d_nee, geo_n) > 0, ray_eps, -ray_eps)[..., None]
                shadow = Ray(o=shadow_o, d=d_nee,
                             mint=jnp.full((n,), 0.0, jnp.float32),
                             maxt=dist_nee - 2.0 * ray_eps)
                # lanes that don't need the shadow ray get a degenerate one
                shadow = shadow._replace(
                    maxt=jnp.where(nee_ok, shadow.maxt, 0.0))
                if "noshadow" in ablate:
                    occluded = jnp.zeros((n,), bool)
                else:
                    occluded = scene_occluded(
                        arr, shadow, cfg.traversal, cfg.block,
                        _swept_params(cfg),
                        sort_rays=("nosort" not in ablate), compact=False)
                    # saved across the remat boundary in differentiable
                    # mode (policy below): geometry queries carry no
                    # tangents, so re-running the any-hit Pallas kernels
                    # during backward is pure waste
                    occluded = checkpoint_name(occluded, "isect")
                vis = nee_ok & ~occluded
                li_acc = li_acc + jnp.where(vis[..., None], contrib, 0.0)

            # ---- BSDF sampling ----
            u_lobe = s1(pix, smp, dims + D_BSDF_LOBE)
            u2 = s2(pix, smp, dims + D_BSDF_U2)
            u2b = s2(pix, smp, dims + D_BSDF_U2B)
            if "cheapshade" in ablate:
                from ..core import warps as _warps
                wo = _warps.square_to_cosine_hemisphere(u2)
                bsdf_pdf = jnp.maximum(wo[..., 2], 0.0) / jnp.pi
                bsdf_weight = gm.diffuse
                is_delta = jnp.zeros((n,), bool)
                eta_s = jnp.ones((n,), jnp.float32)
            else:
                wo, bsdf_weight, bsdf_pdf, is_delta, eta_s = \
                    mat.sample_mix(
                        active_kinds, arr.materials, arr.checkers,
                        hit.mat_id, hit.uv, gm, wi, u_lobe, u2, u2b,
                        arr.hair_tables)
            if differentiable:
                # detached-sampling estimator: the sampled direction and its
                # pdf carry no gradient; parameter gradients flow through
                # the BSDF value only
                wo = jax.lax.stop_gradient(wo)
                bsdf_pdf = jax.lax.stop_gradient(bsdf_pdf)
                f2, p2 = _eval_pdf(wo)
                w_smooth = f2 / jnp.maximum(jax.lax.stop_gradient(p2),
                                            1e-9)[..., None]
                bsdf_weight = jnp.where(is_delta[..., None], bsdf_weight,
                                        w_smooth)
            wo_world = fr.to_world(wo)
            dead = jnp.max(jnp.abs(bsdf_weight), axis=-1) <= 0
            active = active & ~dead
            if cfg.strict_normals:
                bad2 = dot(geo_n, wo_world) * wo[..., 2] <= 0
                active = active & ~bad2

            throughput = st.throughput * bsdf_weight
            eta = st.eta * eta_s

            # ---- next ray ----
            next_o = hit.p + geo_n * jnp.where(dot(wo_world, geo_n) > 0,
                                               ray_eps,
                                               -ray_eps)[..., None]
            next_ray = Ray(o=next_o, d=wo_world,
                           mint=jnp.zeros((n,), jnp.float32),
                           maxt=jnp.where(active, jnp.inf, 0.0))
            hit2 = scene_intersect(arr, next_ray, cfg.traversal,
                                   cfg.block, _swept_params(cfg),
                                   sort_rays=("nosort" not in ablate),
                                   compact=False)
            # tag the full hit record for the differentiable remat
            # policy (identity in forward-only mode)
            hit2 = jax.tree_util.tree_map(
                lambda x: checkpoint_name(x, "isect"),
                hit2)

            # ---- RR ---- (disabled in differentiable mode: the survival
            # decision is not differentiable and max_depth is small there)
            depth_next = st.depth + 1
            if not differentiable:
                q = jnp.minimum(jnp.max(throughput, axis=-1) * eta * eta,
                                0.95)
                do_rr = depth_next > cfg.rr_depth
                u_rr = s1(pix, smp, dims + D_RR)
                kill = do_rr & (u_rr >= q)
                throughput = jnp.where(
                    (do_rr & ~kill)[..., None],
                    throughput / jnp.maximum(q, 1e-6)[..., None], throughput)
                active = active & ~kill

            n_rays = st.n_rays + jnp.sum(nee_ok.astype(jnp.float32)) \
                + jnp.sum(active.astype(jnp.float32))
            return PathState(
                depth=depth_next,
                active=active,
                ray_o=next_o, ray_d=wo_world,
                throughput=throughput,
                li=li_acc,
                eta=eta,
                hit=hit2,
                prev_bsdf_pdf=bsdf_pdf,
                prev_delta=is_delta,
                emission_allowed=jnp.zeros((n,), bool),
                n_rays=n_rays,
                # the camera-hit Jacobian is consumed at depth 1; bounce
                # hits use the isotropic footprint
                duv_dx=jnp.zeros_like(st.duv_dx),
                duv_dy=jnp.zeros_like(st.duv_dy),
            )

        if differentiable:
            # fixed-length, rematerialized per bounce (reverse-mode
            # safe). The policy SAVES the tagged intersection results:
            # the backward replay recomputes shading (cheap, carries the
            # tangents) but never re-runs the closest-hit/any-hit Pallas
            # kernels (tangent-free, ~half the forward cost). Memory:
            # one Hit record + one occlusion mask per bounce per lane.
            ckpt_body = jax.checkpoint(
                lambda st: body(st, pixel_idx, sample_idx),
                policy=jax.checkpoint_policies.save_only_these_names(
                    "isect"))
            final, _ = jax.lax.scan(lambda st, _: (ckpt_body(st), None),
                                    state, None,
                                    length=max(cfg.max_depth - 1, 0))
        else:
            # staged-width wavefront: under RR most lanes die within a few
            # bounces, but every full-width bounce still pays full-width
            # shading + NEE + sorting (measured ~10 ms/bounce of dead-lane
            # overhead at 256²). Run the SAME body at n → n/4 → n/16
            # widths: each stage exits once the live count fits the next
            # width, lanes are gathered live-first (stable, preserving
            # Morton-ish coherence), and the sub-state is scattered back so
            # dropped lanes keep their accumulated radiance and any pending
            # emission (flushed below at full width).
            stage_caps = [n]
            import os as _os
            max_stages = int(_os.environ.get("HAIRPT_STAGES", "3"))
            if n >= 4096 and n_uniform_dims == 0:
                # deep-RR tails matter at north-star widths: at 1024² the
                # n/16 stage still runs 65k-wide queries for the last few
                # thousand live lanes × dozens of bounces, so the ladder
                # extends to n/256 when max_stages allows
                for f_ in (4, 16, 64, 256):
                    m_ = max(256, (-(-n // f_) // 256) * 256)
                    if m_ < stage_caps[-1] and len(stage_caps) < max_stages:
                        stage_caps.append(m_)

            def _lane(a, w):
                return hasattr(a, "ndim") and a.ndim >= 1 \
                    and a.shape[0] == w

            st_full = state
            for si_, w_ in enumerate(stage_caps):
                next_cap = stage_caps[si_ + 1] \
                    if si_ + 1 < len(stage_caps) else 0
                if w_ == n:
                    order_, sub = None, st_full
                    spix, ssmp = pixel_idx, sample_idx
                else:
                    key_ = jnp.where(st_full.active, jnp.uint32(0),
                                     jnp.uint32(1))
                    order_ = jnp.argsort(key_)[:w_]
                    sub = jax.tree_util.tree_map(
                        lambda a: a[order_] if _lane(a, n) else a,
                        st_full)
                    spix = pixel_idx[order_]
                    ssmp = sample_idx[order_]

                def cond_s(st, _nc=next_cap):
                    c = jnp.any(st.active) & (st.depth < cfg.max_depth)
                    if _nc > 0:
                        c = c & (jnp.sum(st.active) > _nc)
                    return c

                sub = jax.lax.while_loop(
                    cond_s, lambda st, p=spix, q=ssmp: body(st, p, q),
                    sub)
                if order_ is None:
                    st_full = sub
                else:
                    st_full = jax.tree_util.tree_map(
                        lambda f, g: f.at[order_].set(g)
                        if _lane(f, n) else g, st_full, sub)
            final = st_full

        # paths that terminated by depth but had a pending emitter/env hit:
        # the loop structure above accounts for emission at loop top, so the
        # final pending hit's emission must be added for rays that exited
        # with depth > max_depth while still active
        st = final
        pending = st.active
        d_in = st.ray_d
        li_acc = st.li
        miss = pending & ~st.hit.valid
        if arr.env is not None:
            lum_pdf = _pdf_emitter_hit(arr, cfg, st.hit, d_in)
            w = jnp.where(st.prev_delta, 1.0,
                          _mi_weight(st.prev_bsdf_pdf, lum_pdf))
            w = jnp.where(st.emission_allowed, 1.0, w)
            li_acc = li_acc + jnp.where(miss[..., None],
                                        st.throughput
                                        * _env_radiance(arr, d_in)
                                        * w[..., None], 0.0)
        if arr.area is not None:
            le = _emitter_radiance_at_hit(arr, st.hit, -d_in)
            lum_pdf = _pdf_emitter_hit(arr, cfg, st.hit, d_in)
            w = jnp.where(st.prev_delta, 1.0,
                          _mi_weight(st.prev_bsdf_pdf, lum_pdf))
            w = jnp.where(st.emission_allowed, 1.0, w)
            li_acc = li_acc + jnp.where((pending & st.hit.valid)[..., None],
                                        st.throughput * le * w[..., None],
                                        0.0)

        return li_acc, pos, final.n_rays

    return li


def render(scene: Scene, seed: int = 0, spp: int | None = None,
           wave_size: int | None = None, return_stats: bool = False,
           progress=None, flush_every: float = 0.0, flush_cb=None,
           checkpoint: str | None = None):
    """Full-frame render: loops sample waves, accumulates on the film.
    Returns the developed [H, W, 3] image (linear radiance).

    progress:    callable(done_spp, total_spp, elapsed_s) invoked per wave
                 (ProgressReporter parity, statistics.h:287)
    flush_every: seconds between flush_cb(partial_image) calls — the
                 reference's `-r sec` periodic partial-image flush
                 (mitsuba.cpp:107-127 FlushThread)
    checkpoint:  path to an .npz holding (image, weight, next_sample);
                 loaded if present, saved after every wave — crash/preempt
                 resume for long renders (the accumulators are explicit
                 values, so resume is exact)
    """
    import os
    import time as _time
    cfg = scene.config
    spp = spp if spp is not None else cfg.spp
    fl = scene.film
    n_pix = cfg.width * cfg.height

    li_fn = make_li_fn(scene)

    from .common import block_swizzle
    swz = block_swizzle(cfg.width, cfg.height)

    @jax.jit
    def wave(arr, ctw, sample_id, image, weight):
        # 8×8-block pixel order keeps each 64-ray intersector tile
        # spatially tight (see block_swizzle)
        pixel_idx = swz if swz is not None \
            else jnp.arange(n_pix, dtype=jnp.uint32)
        sample_idx = jnp.full((n_pix,), sample_id, jnp.uint32)
        radiance, pos, n_rays = li_fn(arr, pixel_idx, sample_idx,
                                      cam_to_world=ctw)
        radiance = jnp.nan_to_num(radiance, nan=0.0, posinf=0.0, neginf=0.0)
        image, weight = film_mod.splat_samples(fl, pos, radiance, image,
                                               weight)
        return image, weight, n_rays

    from ..utils import stats
    image, weight = film_mod.zeros(fl)
    total_rays = 0.0
    s_start = 0
    if checkpoint and os.path.exists(checkpoint):
        import numpy as _np
        ck = _np.load(checkpoint)
        if int(ck["spp"]) == spp and ck["image"].shape == image.shape:
            image = jnp.asarray(ck["image"])
            weight = jnp.asarray(ck["weight"])
            s_start = int(ck["next_sample"])
    t_begin = _time.time()
    t_flush = t_begin
    stats.start_timer("render")
    # motion blur: sample index s gets the stratified shutter time t_s and
    # the geometry re-posed host-side — identical array shapes, so the one
    # jitted wave serves every time (reference: per-ray time drawn in
    # [shutterOpen, shutterClose), sensor.cpp; here time is stratified
    # over sample indices instead, equivalent at spp samples/pixel)
    blur = scene.shutter[1] > scene.shutter[0] \
        and (scene.rebuild_geo is not None or scene.camera_anim is not None
             or scene.repose_inst is not None)
    for s in range(s_start, spp):
        arrs = scene.arrays
        ctw = scene.camera.to_world
        if blur:
            t_s = scene.shutter[0] + (s + 0.5) / spp \
                * (scene.shutter[1] - scene.shutter[0])
            if scene.rebuild_geo is not None:
                arrs = scene.rebuild_geo(t_s)
            if scene.repose_inst is not None:
                # animated instances: transforms are traced leaves, so a
                # re-pose is a few new [I,4,4] arrays — no BVH rebuild
                arrs = scene.repose_inst(arrs, t_s)
            if scene.camera_anim is not None:
                ctw = jnp.asarray(scene.camera_anim.eval(t_s), jnp.float32)
        image, weight, n_rays = wave(arrs, ctw,
                                     jnp.uint32(s + seed * 65536), image,
                                     weight)
        total_rays += float(n_rays)
        now = _time.time()
        if progress is not None:
            progress(s + 1, spp, now - t_begin)
        if checkpoint:
            import numpy as _np
            _np.savez(checkpoint, image=_np.asarray(image),
                      weight=_np.asarray(weight), next_sample=s + 1,
                      spp=spp)
        if flush_every > 0 and flush_cb is not None \
                and now - t_flush >= flush_every:
            flush_cb(film_mod.develop(image, weight))
            t_flush = now
    img = film_mod.develop(image, weight)
    # StatsCounter parity (statistics.h / path.cpp:24 avgPathLength):
    # integrators return counters as values; the host records them
    stats.stop_timer("Path tracer", "render", total_rays, "rays")
    stats.record("Path tracer", "Rays traced", total_rays)
    stats.record("Path tracer", "Camera samples", float(n_pix) * spp)
    stats.record("Path tracer", "Rays per camera sample", total_rays,
                 float(n_pix) * spp, kind="average")
    stats.record("Path tracer", "Sample waves", spp)
    if return_stats:
        return img, {"rays": total_rays}
    return img
