"""Bidirectional path tracer (wavefront, full Veach MIS).

Capability counterpart of the reference `bdpt` plugin + libbidir
(src/integrators/bdpt/*, src/libbidir/path.h PathVertex/PathEdge): eye and
light subpaths are generated as stacked SoA vertex arrays via lax.scan,
every (s, t) connection strategy is evaluated for the whole wavefront with
one visibility ray batch per strategy, and the balance/power-heuristic MIS
weight is computed with the standard pdf-ratio walk over the combined path
(Veach 10.2; same scoped pdfRev overrides as the reference's
Path::miWeight, src/libbidir/path.cpp).

Emitters: area lights AND environment emitters (envmap/sky/sunsky —
the hair scenes' illumination, reference bdpt_proc.cpp +
bidir/vertex.h infinite-light handling). Env light subpaths start on a
tangent disk of the scene bounding sphere with a delta emission
direction (the PBRT InfiniteAreaLight convention): the origin vertex is
delta (no s=1 connections — NEE-env transport is covered by the s=0
escape strategy and s>=2 connections from the first surface hit), its
pdfs are stored in SOLID ANGLE (both generation directions share the
measure, so the Veach pdf-ratio walk needs no special cases beyond the
junction overrides). Eye subpaths that ESCAPE the scene materialize an
env endpoint for the s=0 strategy with the env radiance. Pinhole
perspective camera; t=1 strategies splat through camera_importance.
Delta BSDF vertices participate with their discrete pdfs (connections
through them are skipped, as in the reference).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng
from ..core.math import Ray, dot, normalize
from ..film import film as film_mod
from ..models import sensors
from ..models.bsdf import registry as mat
from ..scene.scene import Scene
from .common import scene_intersect, scene_occluded, frame
from .path import _swept_params

INV_PI = 1.0 / np.pi


class VPath(NamedTuple):
    """Subpath vertex SoA, leading axis = vertex index (static D)."""
    p: jnp.ndarray        # [D, N, 3]
    ns: jnp.ndarray       # [D, N, 3] shading normal (world)
    ng: jnp.ndarray       # [D, N, 3] geometric normal
    sh_s: jnp.ndarray     # [D, N, 3] shading tangent
    sh_t: jnp.ndarray     # [D, N, 3]
    wi: jnp.ndarray       # [D, N, 3] world dir from previous vertex to this
    beta: jnp.ndarray     # [D, N, 3] throughput up to this vertex
    pdf_fwd: jnp.ndarray  # [D, N] area-measure pdf of generating the vertex
    pdf_rev: jnp.ndarray  # [D, N] area pdf from the opposite direction
    delta: jnp.ndarray    # [D, N] bool: sampled through a delta lobe
    valid: jnp.ndarray    # [D, N]
    mat_id: jnp.ndarray   # [D, N]
    uv: jnp.ndarray       # [D, N, 2]
    emitter_id: jnp.ndarray  # [D, N] (eye path: emissive hit)
    is_env: jnp.ndarray   # [D, N] env endpoint (escaped eye vertex /
    #                       env light origin); pdf_fwd there is SOLID
    #                       ANGLE, elsewhere area


def _g_term(pa, pb, nb):
    d = pb - pa
    d2 = jnp.maximum(jnp.sum(d * d, -1), 1e-12)
    dirn = d / jnp.sqrt(d2)[..., None]
    return jnp.abs(jnp.sum(nb * dirn, -1)) / d2, dirn, jnp.sqrt(d2)


def _to_area(pdf_w, p_from, p_to, n_to):
    """Solid-angle → area measure at the target vertex."""
    conv, _, _ = _g_term(p_from, p_to, n_to)
    return pdf_w * conv


def _vertex_frame(path: VPath, i):
    from ..core.math import Frame
    return Frame(s=path.sh_s[i], t=path.sh_t[i], n=path.ns[i])


def _bsdf_eval_pdf(scene, arr, path: VPath, i, wo_world):
    """(f·cos, pdf_ω, pdf_ω_reverse) at vertex i for outgoing wo_world."""
    fr = _vertex_frame(path, i)
    wi_l = fr.to_local(-path.wi[i])
    wo_l = fr.to_local(wo_world)
    gm = mat.gather(arr.materials, arr.checkers, path.mat_id[i], path.uv[i])
    f, pdf = mat.eval_pdf_mix(scene.active_kinds, arr.materials,
                              arr.checkers, path.mat_id[i], path.uv[i], gm,
                              wi_l, wo_l, arr.hair_tables)
    _, pdf_rev = mat.eval_pdf_mix(scene.active_kinds, arr.materials,
                                  arr.checkers, path.mat_id[i], path.uv[i],
                                  gm, wo_l, wi_l, arr.hair_tables)
    return f, pdf, pdf_rev


def _trace_subpath(scene, arr, o0, d0, beta0, pdf_fwd1_w, n_steps,
                   pixel_idx, sample_idx, dim0, mode):
    """March a subpath from (o0, d0); returns stacked vertex arrays for
    vertices 1..n_steps (the origin vertex 0 is handled by the caller).

    mode: 'eye' (importance transport) or 'light' (radiance transport).
    pdf_fwd1_w: solid-angle pdf of d0 (converted to area at vertex 1).
    """
    cfg = scene.config
    n = o0.shape[0]
    smode = cfg.sampler

    def body(carry, step):
        o, d, beta, pdf_dir_w, alive, prev_p = carry
        r = Ray(o=o, d=d, mint=jnp.zeros(n),
                maxt=jnp.where(alive, jnp.inf, 0.0))
        hit = scene_intersect(arr, r, cfg.traversal, cfg.block,
                              _swept_params(cfg))
        landed = alive & hit.valid
        escaped = alive & ~hit.valid   # env endpoint (eye s=0 strategy)

        wi_world = d
        two = arr.materials.twosided[jnp.maximum(hit.mat_id, 0)]
        flip = two & (dot(hit.sh_n, -wi_world) < 0)
        sh_n = jnp.where(flip[..., None], -hit.sh_n, hit.sh_n)
        sh_t = jnp.where(flip[..., None], -hit.sh_t, hit.sh_t)
        geo_n = jnp.where(flip[..., None], -hit.geo_n, hit.geo_n)
        fr = frame(hit)._replace(n=sh_n, t=sh_t)

        pdf_fwd = _to_area(pdf_dir_w, prev_p, hit.p, sh_n)

        gm = mat.gather(arr.materials, arr.checkers, hit.mat_id, hit.uv)
        dims = dim0 + step * 16
        u_l = rng.next_1d(smode, pixel_idx, sample_idx, dims + 0)
        u2 = rng.next_2d(smode, pixel_idx, sample_idx, dims + 1)
        u2b = rng.next_2d(smode, pixel_idx, sample_idx, dims + 3)
        wi_l = fr.to_local(-wi_world)
        wo_l, w_b, pdf_b, is_delta, _ = mat.sample_mix(
            scene.active_kinds, arr.materials, arr.checkers, hit.mat_id,
            hit.uv, gm, wi_l, u_l, u2, u2b, arr.hair_tables)
        wo_world = fr.to_world(wo_l)
        # reverse pdf: probability of sampling wi from wo at this vertex
        _, pdf_rev_w = mat.eval_pdf_mix(
            scene.active_kinds, arr.materials, arr.checkers, hit.mat_id,
            hit.uv, gm, wo_l, wi_l, arr.hair_tables)
        # delta lobes: keep the discrete pdfs. Solid-angle here; the
        # caller converts to area at the previous vertex (it owns the
        # previous vertex's normal).
        pdf_rev_w = jnp.where(is_delta, pdf_b, pdf_rev_w)

        beta2 = beta * w_b
        alive2 = landed & (jnp.max(jnp.abs(w_b), -1) > 0)

        vert = dict(p=hit.p, ns=sh_n, ng=geo_n, sh_s=fr.s, sh_t=fr.t,
                    wi=wi_world,
                    beta=jnp.where((landed | escaped)[..., None], beta,
                                   0.0),
                    # env endpoints keep the SOLID-ANGLE direction pdf
                    # (no surface to convert at); the MIS walk pairs it
                    # with the solid-angle env origin pdf
                    pdf_fwd=jnp.where(escaped, pdf_dir_w,
                                      jnp.where(landed, pdf_fwd, 0.0)),
                    pdf_rev_w=jnp.where(landed, pdf_rev_w, 0.0),
                    # escaped endpoints are delta so the un-samplable
                    # (1, t-1) NEE-env hypothetical leaves the MIS sum
                    delta=(is_delta & landed) | escaped, valid=landed,
                    mat_id=hit.mat_id, uv=hit.uv,
                    emitter_id=jnp.where(landed, hit.emitter_id, -1),
                    is_env=escaped,
                    pdf_next_w=pdf_b)

        o2 = hit.p + geo_n * jnp.where(dot(wo_world, geo_n) > 0,
                                       cfg.ray_eps,
                                       -cfg.ray_eps)[..., None]
        return (o2, wo_world, beta2, pdf_b, alive2, hit.p), vert

    init = (o0, d0, beta0, pdf_fwd1_w, jnp.ones(n, bool), o0)
    _, verts = jax.lax.scan(body, init, jnp.arange(n_steps))
    return verts


def _light_group_probs(scene, arr):
    """(p_env, p_area) light-subpath group selection probabilities —
    cfg.nee_probs renormalized over the groups BDPT samples."""
    pe_c, pa_c, _ = scene.config.nee_probs
    has_env = arr.env is not None
    has_area = arr.area is not None
    if has_env and has_area:
        tot = max(pe_c + pa_c, 1e-9)
        return pe_c / tot, pa_c / tot
    if has_env:
        return 1.0, 0.0
    return 0.0, 1.0


def generate_paths(scene: Scene, arr, pixel_idx, sample_idx, t_max: int,
                   s_max: int):
    """Build the eye and light subpaths. Returns (eye VPath with D=t_max
    vertices [camera at index 0], light VPath with D=s_max [emitter point
    at index 0])."""
    cfg = scene.config
    cam = scene.camera
    n = pixel_idx.shape[0]
    smode = cfg.sampler

    # ---- eye subpath ----
    px = (pixel_idx % cfg.width).astype(jnp.float32)
    py = (pixel_idx // cfg.width).astype(jnp.float32)
    jit2 = rng.next_2d(smode, pixel_idx, sample_idx, 0)
    pos = jnp.stack([px + jit2[..., 0], py + jit2[..., 1]], -1)
    ray = sensors.sample_ray(cam, pos, None)
    # pinhole direction pdf. One eye path is traced PER PIXEL, so the
    # direction density is W·H/(A cos³θ) — the per-pixel convention; the
    # per-film 1/(A cos³θ) under-counts by W·H and crushes every MIS
    # weight against the t=1 splat hypothetical.
    R = cam.to_world[:3, :3]
    fwd = R[:, 2]
    cos_cam = jnp.sum(ray.d * fwd, -1)
    area = 4.0 * cam.tan_half_fov ** 2 / cam.aspect
    pdf_cam_w = (cfg.width * cfg.height) \
        / jnp.maximum(area * cos_cam ** 3, 1e-9)

    ev = _trace_subpath(scene, arr, ray.o, ray.d,
                        jnp.ones((n, 3), jnp.float32), pdf_cam_w,
                        t_max - 1, pixel_idx, sample_idx, 100, "eye")

    # prepend the camera vertex
    def cat(v0, arrs):
        return jnp.concatenate([v0[None], arrs], axis=0)

    cam_p = jnp.broadcast_to(cam.to_world[:3, 3], (n, 3))
    z3 = jnp.zeros((n, 3), jnp.float32)
    eye = VPath(
        p=cat(cam_p, ev["p"]),
        ns=cat(jnp.broadcast_to(fwd, (n, 3)), ev["ns"]),
        ng=cat(jnp.broadcast_to(fwd, (n, 3)), ev["ng"]),
        sh_s=cat(z3, ev["sh_s"]), sh_t=cat(z3, ev["sh_t"]),
        wi=cat(z3, ev["wi"]),
        beta=cat(jnp.ones((n, 3), jnp.float32), ev["beta"]),
        pdf_fwd=cat(jnp.ones((n,), jnp.float32), ev["pdf_fwd"]),
        pdf_rev=cat(jnp.zeros((n,), jnp.float32),
                    jnp.zeros_like(ev["pdf_fwd"])),
        # the pinhole camera vertex is treated with pdfPos=1, not delta
        # (PBRT-style), so t=1 splatting competes in MIS with t>=2
        delta=cat(jnp.zeros((n,), bool), ev["delta"]),
        valid=cat(jnp.ones((n,), bool), ev["valid"]),
        mat_id=cat(jnp.zeros((n,), jnp.int32), ev["mat_id"]),
        uv=cat(jnp.zeros((n, 2), jnp.float32), ev["uv"]),
        emitter_id=cat(jnp.full((n,), -1, jnp.int32), ev["emitter_id"]),
        is_env=cat(jnp.zeros((n,), bool), ev["is_env"]),
    )
    # pdf_rev[i] (area) from the sampled-direction reverse pdfs: vertex
    # i's pdf_rev comes from vertex i+1's sampling, converted to area
    eye = _fill_pdf_rev(eye, ev["pdf_rev_w"], t_max)

    # ---- light subpath ----
    from ..core import warps
    from ..core.math import frame_from_normal, coordinate_system
    from ..models import emitters as em
    pe, pa = _light_group_probs(scene, arr)
    u_sel = rng.next_1d(smode, pixel_idx, sample_idx, 300)
    u_pos = rng.next_2d(smode, pixel_idx, sample_idx, 301)
    u_dir = rng.next_2d(smode, pixel_idx, sample_idx, 303)
    u_grp = rng.next_1d(smode, pixel_idx, sample_idx, 305)
    grp_env = u_grp < pe

    q = jnp.zeros((n, 3), jnp.float32)
    n_l = jnp.zeros((n, 3), jnp.float32).at[:, 2].set(1.0)
    d_emit = jnp.zeros((n, 3), jnp.float32).at[:, 2].set(1.0)
    pdf_fwd0 = jnp.ones((n,), jnp.float32)
    beta0_v = jnp.zeros((n, 3), jnp.float32)
    beta1 = jnp.zeros((n, 3), jnp.float32)
    pdf_dir_w = jnp.ones((n,), jnp.float32)
    li = jnp.full((n,), -1, jnp.int32)
    o_l = q
    delta0 = jnp.zeros((n,), bool)

    if arr.area is not None and pa > 0:
        area_l = arr.area
        nl = area_l.cdf.shape[0]
        li_a = jnp.clip(jnp.searchsorted(area_l.cdf, u_sel), 0, nl - 1)
        hi_cdf = area_l.cdf[li_a]
        lo_cdf = jnp.where(li_a > 0, area_l.cdf[jnp.maximum(li_a - 1, 0)],
                           0.0)
        prob_l = (hi_cdf - lo_cdf) * pa
        su = jnp.sqrt(jnp.maximum(u_pos[..., 0], 1e-12))
        b0 = 1.0 - su
        b1 = u_pos[..., 1] * su
        q_a = area_l.p0[li_a] + area_l.e1[li_a] * b0[..., None] \
            + area_l.e2[li_a] * b1[..., None]
        n_a = area_l.n[li_a]
        pdf_pos = prob_l / jnp.maximum(area_l.area[li_a], 1e-12)
        le = area_l.radiance[li_a]
        # cosine-weighted emission direction (diffuse area light,
        # reference: area.cpp sampleDirection)
        d_local = warps.square_to_cosine_hemisphere(u_dir)
        fr_l = frame_from_normal(n_a)
        d_a = fr_l.to_world(d_local)
        pdf_dir_a = jnp.maximum(d_local[..., 2], 1e-9) * INV_PI
        b1_a = le * (jnp.abs(d_local[..., 2])
                     / jnp.maximum(pdf_pos * pdf_dir_a, 1e-20))[..., None]
        m = (~grp_env)[..., None]
        q = jnp.where(m, q_a, q)
        n_l = jnp.where(m, n_a, n_l)
        d_emit = jnp.where(m, d_a, d_emit)
        pdf_fwd0 = jnp.where(~grp_env, pdf_pos, pdf_fwd0)
        beta0_v = jnp.where(m, le / jnp.maximum(pdf_pos,
                                                1e-20)[..., None],
                            beta0_v)
        beta1 = jnp.where(m, b1_a, beta1)
        pdf_dir_w = jnp.where(~grp_env, pdf_dir_a, pdf_dir_w)
        li = jnp.where(~grp_env, li_a, li)
        o_l = jnp.where(m, q_a + n_a * cfg.ray_eps, o_l)

    if arr.env is not None and pe > 0:
        # env origin: importance-sampled direction + tangent-disk point
        # (PBRT InfiniteAreaLight convention; same machinery as
        # ptracer/photon shooting). The origin vertex's pdf_fwd is the
        # SOLID-ANGLE direction density x group prob; its emission
        # direction is delta -> delta0 (no s=1 connections).
        from .photonmap import _scene_bsphere
        center, radius = _scene_bsphere(arr)
        d_env, le_env, pdf_env = em.env_sample(arr.env, u_pos)
        d_e = -d_env
        disk = warps.square_to_uniform_disk_concentric(u_dir) * radius
        s_a, t_a = coordinate_system(d_e)
        o_e = center - d_e * radius * 1.5 \
            + s_a * disk[..., 0:1] + t_a * disk[..., 1:2]
        b1_e = le_env * (jnp.pi * radius * radius
                         / jnp.maximum(pdf_env * pe, 1e-20))[..., None]
        m = grp_env[..., None]
        q = jnp.where(m, o_e, q)
        n_l = jnp.where(m, d_e, n_l)
        d_emit = jnp.where(m, d_e, d_emit)
        pdf_fwd0 = jnp.where(grp_env, pdf_env * pe, pdf_fwd0)
        beta0_v = jnp.where(m, 0.0, beta0_v)
        beta1 = jnp.where(m, b1_e, beta1)
        li = jnp.where(grp_env, -1, li)
        o_l = jnp.where(m, o_e, o_l)
        delta0 = delta0 | grp_env
        inv_pi_r2 = 1.0 / (jnp.pi * radius * radius)
    else:
        grp_env = jnp.zeros((n,), bool)
        inv_pi_r2 = 0.0

    lv = _trace_subpath(scene, arr, o_l, d_emit, beta1, pdf_dir_w,
                        s_max - 1, pixel_idx, sample_idx, 400, "light")
    light = VPath(
        p=cat(q, lv["p"]), ns=cat(n_l, lv["ns"]), ng=cat(n_l, lv["ng"]),
        sh_s=cat(z3, lv["sh_s"]), sh_t=cat(z3, lv["sh_t"]),
        wi=cat(z3, lv["wi"]),
        beta=cat(beta0_v, lv["beta"]),
        pdf_fwd=cat(pdf_fwd0, lv["pdf_fwd"]),
        pdf_rev=cat(jnp.zeros((n,), jnp.float32),
                    jnp.zeros_like(lv["pdf_fwd"])),
        delta=cat(delta0, lv["delta"]),
        valid=cat(jnp.ones((n,), bool), lv["valid"]),
        mat_id=cat(jnp.zeros((n,), jnp.int32), lv["mat_id"]),
        uv=cat(jnp.zeros((n, 2), jnp.float32), lv["uv"]),
        emitter_id=cat(li, lv["emitter_id"]),
        is_env=cat(grp_env, jnp.zeros_like(lv["valid"])),
    )
    light = _fill_pdf_rev(light, lv["pdf_rev_w"], s_max)
    if arr.env is not None and pe > 0:
        # env-lane measure fixes: y1's area pdf is cos/(pi R^2) (the
        # disk position density projected to the first surface hit,
        # PBRT Vertex::PdfLight for infinite lights); y0's reverse pdf
        # (eye side escaping towards the env) stays SOLID ANGLE
        cos1 = jnp.abs(jnp.sum(light.ns[1] * d_emit, -1))
        light = light._replace(
            pdf_fwd=light.pdf_fwd.at[1].set(
                jnp.where(grp_env & light.valid[1], cos1 * inv_pi_r2,
                          light.pdf_fwd[1])),
            pdf_rev=light.pdf_rev.at[0].set(
                jnp.where(grp_env & light.valid[1], lv["pdf_rev_w"][0],
                          light.pdf_rev[0])))
    return eye, light


def _fill_pdf_rev(path: VPath, pdf_rev_w, d_max):
    """pdf_rev[i] = (reverse solid-angle pdf sampled at vertex i+1)
    converted to area at vertex i."""
    pr = path.pdf_rev
    for i in range(0, d_max - 1):
        src = i + 1           # vertex whose sampling produced the reverse
        w = pdf_rev_w[i]      # emitted at scan step i (vertex i+1)
        conv = _to_area(w, path.p[src], path.p[i], path.ns[i])
        pr = pr.at[i].set(jnp.where(path.valid[src], conv, 0.0))
    return path._replace(pdf_rev=pr)


def _light_origin_pdfs(scene, arr, p_from, light_p, light_n, emitter_id):
    """(pdf of the light POINT in area measure — including the
    area-group selection probability — and the pdf of the emission
    direction towards p_from, solid angle + geometric pieces)."""
    area_l = arr.area
    _, pa = _light_group_probs(scene, arr)
    lum = jnp.asarray([0.212671, 0.715160, 0.072169])
    power = area_l.area * (area_l.radiance @ lum)
    prob = power * (pa / jnp.maximum(jnp.sum(power), 1e-12))
    li = jnp.maximum(emitter_id, 0)
    pdf_pos = prob[li] / jnp.maximum(area_l.area[li], 1e-12)
    d = p_from - light_p
    d2 = jnp.maximum(jnp.sum(d * d, -1), 1e-12)
    dirn = d / jnp.sqrt(d2)[..., None]
    cos_l = jnp.sum(light_n * dirn, -1)
    pdf_dir_w = jnp.maximum(cos_l, 0.0) * INV_PI
    # convert to area at p_from: needs |cos| there; caller multiplies —
    # return solid angle pdf + the geometric pieces instead
    return pdf_pos, pdf_dir_w, dirn, d2


def render_bdpt(scene: Scene, spp: int = 8, seed: int = 0, s_max: int = 4,
                t_max: int = 4, strategies=None):
    """Full BDPT render. Returns the developed [H, W, 3] image.

    strategies: optional set of (s, t) pairs — when given, only those
    strategies contribute (diagnostics / per-strategy tests); MIS
    weights are unchanged."""
    cfg = scene.config
    arr = scene.arrays
    cam = scene.camera
    fl = scene.film
    n_pix = cfg.width * cfg.height
    assert arr.area is not None or arr.env is not None, \
        "bdpt needs an area or environment emitter"

    def one_wave(arrs, sample_id, image, weight):
        pixel_idx = jnp.arange(n_pix, dtype=jnp.uint32)
        sample_idx = jnp.full((n_pix,), sample_id, jnp.uint32)
        n = n_pix
        eye, light = generate_paths(scene, arrs, pixel_idx, sample_idx,
                                    t_max, s_max)

        px = (pixel_idx % cfg.width).astype(jnp.float32) + 0.5
        py = (pixel_idx // cfg.width).astype(jnp.float32) + 0.5
        pix_pos = jnp.stack([px, py], -1)

        li_acc = jnp.zeros((n, 3), jnp.float32)
        splat_pos = []
        splat_val = []

        # ---------- s = 0: eye path hits an emitter / escapes to env --
        from .path import _env_radiance
        for t in range(2, t_max + 1):
            if t - 1 > cfg.max_depth:   # path edges = t-1 (mitsuba depth)
                continue
            if strategies is not None and (0, t) not in strategies:
                continue
            zi = t - 1
            w = _mis_weight(scene, arrs, eye, light, 0, t,
                            s_max=s_max, t_max=t_max)
            if arr.area is not None:
                em_id = eye.emitter_id[zi]
                on = eye.valid[zi] & (em_id >= 0)
                facing = dot(eye.ng[zi], -eye.wi[zi]) > 0
                le = arr.area.radiance[jnp.maximum(em_id, 0)]
                c = eye.beta[zi] * le
                li_acc = li_acc + jnp.where((on & facing)[..., None],
                                            c * w[..., None], 0.0)
            if arr.env is not None:
                # escaped eye endpoint: env radiance (bdpt analog of
                # the PT miss branch, path.py _env_radiance)
                esc = eye.is_env[zi]
                le_e = _env_radiance(arrs, eye.wi[zi])
                c_e = eye.beta[zi] * le_e
                li_acc = li_acc + jnp.where(esc[..., None],
                                            c_e * w[..., None], 0.0)

        # ---------- s >= 1, t >= 2: connections ----------
        for s in range(1, s_max + 1):
            for t in range(2, t_max + 1):
                if s + t - 1 > cfg.max_depth:   # edges = s+t-1
                    continue
                if strategies is not None and (s, t) not in strategies:
                    continue
                ys = s - 1
                zi = t - 1
                ok = eye.valid[zi] & light.valid[ys] \
                    & ~eye.delta[zi] & ~light.delta[ys]
                g_cos, dirn, dist = _g_term(eye.p[zi], light.p[ys],
                                            light.ns[ys])
                # eye-side f·cos towards the light vertex
                f_e, _, _ = _bsdf_eval_pdf(scene, arrs, eye, zi, dirn)
                # light-side value towards the eye vertex
                if s == 1:
                    cos_l = jnp.maximum(
                        jnp.sum(light.ns[ys] * (-dirn), -1), 0.0)
                    f_l = light.beta[ys] * cos_l[..., None]
                else:
                    f_l_b, _, _ = _bsdf_eval_pdf(scene, arrs, light, ys,
                                                 -dirn)
                    f_l = light.beta[ys] * f_l_b
                d2 = jnp.maximum(dist * dist, 1e-12)
                c = eye.beta[zi] * f_e * f_l / d2[..., None]
                ok = ok & (jnp.max(jnp.abs(c), -1) > 0)
                sh_o = eye.p[zi] + eye.ng[zi] * jnp.where(
                    dot(dirn, eye.ng[zi]) > 0, cfg.ray_eps,
                    -cfg.ray_eps)[..., None]
                shadow = Ray(o=sh_o, d=dirn, mint=jnp.zeros(n),
                             maxt=jnp.where(ok, dist - 2 * cfg.ray_eps,
                                            0.0))
                occ = scene_occluded(arrs, shadow, cfg.traversal,
                                     cfg.block, _swept_params(cfg))
                w = _mis_weight(scene, arrs, eye, light, s, t,
                                conn_dir=dirn, conn_dist=dist,
                                s_max=s_max, t_max=t_max)
                li_acc = li_acc + jnp.where(
                    (ok & ~occ)[..., None], c * w[..., None], 0.0)

        # ---------- t = 1: light path → camera splats ----------
        for s in range(2, s_max + 1):
            if s > cfg.max_depth:        # edges = s
                continue
            if strategies is not None and (s, 1) not in strategies:
                continue
            ys = s - 1
            film_pos, we, dist, d_cam, vis_ok = sensors.camera_importance(
                cam, light.p[ys])
            ok = light.valid[ys] & ~light.delta[ys] & vis_ok
            f_l, _, _ = _bsdf_eval_pdf(scene, arrs, light, ys, d_cam)
            c = light.beta[ys] * f_l * (we / jnp.maximum(dist * dist,
                                                         1e-12))[..., None]
            ok = ok & (jnp.max(jnp.abs(c), -1) > 0)
            sh_o = light.p[ys] + light.ng[ys] * jnp.where(
                dot(d_cam, light.ng[ys]) > 0, cfg.ray_eps,
                -cfg.ray_eps)[..., None]
            shadow = Ray(o=sh_o, d=d_cam, mint=jnp.zeros(n),
                         maxt=jnp.where(ok, dist - 2 * cfg.ray_eps, 0.0))
            occ = scene_occluded(arrs, shadow, cfg.traversal, cfg.block,
                                 _swept_params(cfg))
            w = _mis_weight(scene, arrs, eye, light, s, 1,
                            conn_dir=-d_cam, conn_dist=dist,
                            s_max=s_max, t_max=t_max)
            val = jnp.where((ok & ~occ)[..., None], c * w[..., None], 0.0)
            splat_pos.append(film_pos)
            splat_val.append(val)

        image, weight = film_mod.splat_samples(fl, pix_pos, li_acc, image,
                                               weight)
        return image, weight, splat_pos, splat_val

    def wave_fn(arrs, sample_id, image, weight, splat_img):
        image, weight, sp, sv = one_wave(arrs, sample_id, image, weight)
        for p_, v_ in zip(sp, sv):
            splat_img = film_mod.splat_add_only(fl, p_, v_ / spp,
                                                splat_img)
        return image, weight, splat_img

    wave = jax.jit(wave_fn)
    image, weight = film_mod.zeros(fl)
    splat_img = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    for si in range(spp):
        image, weight, splat_img = wave(arr, jnp.uint32(si + seed * 65536),
                                        image, weight, splat_img)
    return film_mod.develop(image, weight) + splat_img


def _mis_weight(scene, arr, eye: VPath, light: VPath, s: int, t: int,
                conn_dir=None, conn_dist=None, s_max=None, t_max=None):
    """Balance-heuristic MIS weight for strategy (s, t) — the pdf-ratio
    walk of Veach 10.2 with the four scoped pdfRev overrides at the
    connection (mirrors the reference's Path::miWeight and PBRT's
    MISWeight). conn_dir points eye-vertex → light-vertex.

    The denominator counts ONLY strategies the sampling loops actually
    generate under (s_max, t_max): t'=1 needs 2 <= s' <= s_max, s'=0
    needs t' <= t_max, connections need s' <= s_max and t' <= t_max.
    Counting an unsampled partition (e.g. (1,1) for a directly-visible
    emitter, or deep partitions beyond s_max/t_max) leaks its share of
    the weight and biases the estimate low — this is the generalized
    form of PBRT's `if (s + t == 2) return 1` special case, required
    because s_max/t_max here may be below max_depth."""
    n = eye.p.shape[1]
    zi = t - 1
    ys = s - 1

    # --- recomputed reverse pdfs at the junction -------------------------
    # pt.pdf_rev: pdf of generating the eye endpoint FROM the light side
    if s == 0:
        # from the light itself: PdfLightOrigin → position pdf of the
        # emitter surface the eye path hit (area lights) or the
        # SOLID-ANGLE env direction density x group prob (escaped
        # endpoints; pairs with the endpoint's solid-angle pdf_fwd)
        if arr.area is not None:
            pdf_pos, _, _, _ = _light_origin_pdfs(
                scene, arr, eye.p[max(zi - 1, 0)], eye.p[zi], eye.ns[zi],
                eye.emitter_id[zi])
        else:
            pdf_pos = jnp.zeros((n,), jnp.float32)
        if arr.env is not None:
            from ..models import emitters as em
            pe, _ = _light_group_probs(scene, arr)
            pdf_env = em.env_pdf(arr.env, eye.wi[zi]) * pe
            pt_rev = jnp.where(eye.is_env[zi], pdf_env, pdf_pos)
        else:
            pt_rev = pdf_pos
    elif s == 1:
        # light vertex emits towards the eye endpoint (area lights only
        # — env origins are delta and never appear in s=1 strategies)
        if arr.area is not None:
            _, pdf_dir_w, dirn, d2 = _light_origin_pdfs(
                scene, arr, eye.p[zi], light.p[ys], light.ns[ys],
                light.emitter_id[ys] if s == 1 else light.emitter_id[0])
            pt_rev = pdf_dir_w * jnp.abs(
                jnp.sum(eye.ns[zi] * dirn, -1)) / d2
        else:
            pt_rev = jnp.zeros((n,), jnp.float32)
    else:
        # pdf of the light vertex scattering towards the eye endpoint
        _, pdf_w_fwd, _ = _bsdf_eval_pdf(scene, arr, light, ys, -conn_dir)
        pt_rev = _to_area(pdf_w_fwd, light.p[ys], eye.p[zi], eye.ns[zi])

    # pt_minus.pdf_rev: eye endpoint scatters backwards
    if s == 0:
        # emission direction pdf from the hit emitter towards z_{t-2};
        # env endpoints use the tangent-disk position density projected
        # to z_{t-2}: cos / (pi R^2)
        if arr.area is not None:
            _, pdf_dir_w, dirn, d2 = _light_origin_pdfs(
                scene, arr, eye.p[zi - 1], eye.p[zi], eye.ns[zi],
                eye.emitter_id[zi])
            ptm_area = pdf_dir_w * jnp.abs(
                jnp.sum(eye.ns[zi - 1] * dirn, -1)) / d2
        else:
            ptm_area = jnp.zeros((n,), jnp.float32)
        if arr.env is not None:
            from .photonmap import _scene_bsphere
            _, radius = _scene_bsphere(arr)
            cos_prev = jnp.abs(jnp.sum(eye.ns[zi - 1] * eye.wi[zi], -1))
            ptm_env = cos_prev / (jnp.pi * radius * radius)
            ptm_rev = jnp.where(eye.is_env[zi], ptm_env, ptm_area)
        else:
            ptm_rev = ptm_area
    else:
        f_in = conn_dir  # incident at eye endpoint from the light side
        fr = _vertex_frame(eye, zi)
        wi_l = fr.to_local(f_in)
        wo_l = fr.to_local(-eye.wi[zi])
        gm = mat.gather(arr.materials, arr.checkers, eye.mat_id[zi],
                        eye.uv[zi])
        _, pdf_w = mat.eval_pdf_mix(scene.active_kinds, arr.materials,
                                    arr.checkers, eye.mat_id[zi],
                                    eye.uv[zi], gm, wi_l, wo_l,
                                    arr.hair_tables)
        ptm_rev = _to_area(pdf_w, eye.p[zi], eye.p[zi - 1],
                           eye.ns[zi - 1])

    # qs.pdf_rev / qs_minus.pdf_rev (only for s >= 1)
    if s >= 1:
        fr = _vertex_frame(eye, zi)
        wi_l = fr.to_local(-eye.wi[zi])
        wo_l = fr.to_local(conn_dir)
        gm = mat.gather(arr.materials, arr.checkers, eye.mat_id[zi],
                        eye.uv[zi])
        _, pdf_w = mat.eval_pdf_mix(scene.active_kinds, arr.materials,
                                    arr.checkers, eye.mat_id[zi],
                                    eye.uv[zi], gm, wi_l, wo_l,
                                    arr.hair_tables)
        if t == 1:
            # camera endpoint: directional importance pdf (per-pixel
            # convention, matching generate_paths' pdf_cam_w)
            cam = scene.camera
            R = cam.to_world[:3, :3]
            fwd = R[:, 2]
            cosc = jnp.abs(jnp.sum(conn_dir * fwd, -1))
            area = 4.0 * cam.tan_half_fov ** 2 / cam.aspect
            pdf_w = (scene.config.width * scene.config.height) \
                / jnp.maximum(area * cosc ** 3, 1e-9)
        qs_rev = _to_area(pdf_w, eye.p[zi], light.p[ys], light.ns[ys])
        if s >= 2:
            fr_l = _vertex_frame(light, ys)
            wi_l2 = fr_l.to_local(-conn_dir)
            wo_l2 = fr_l.to_local(-light.wi[ys])
            gm_l = mat.gather(arr.materials, arr.checkers,
                              light.mat_id[ys], light.uv[ys])
            _, pdf_w2 = mat.eval_pdf_mix(
                scene.active_kinds, arr.materials, arr.checkers,
                light.mat_id[ys], light.uv[ys], gm_l, wi_l2, wo_l2,
                arr.hair_tables)
            qsm_rev = _to_area(pdf_w2, light.p[ys], light.p[ys - 1],
                               light.ns[ys - 1])

    # --- pdf-ratio walks ---------------------------------------------------
    def remap(x):
        return jnp.where(x > 0, x, 1.0)

    s_cap = s_max if s_max is not None else 10 ** 9
    t_cap = t_max if t_max is not None else 10 ** 9

    sum_ri = jnp.zeros((n,), jnp.float32)
    # eye side: i = zi down to 1 — hypothetical strategy (s+t-i, i)
    ri = jnp.ones((n,), jnp.float32)
    for i in range(zi, 0, -1):
        rev = pt_rev if i == zi else (ptm_rev if i == zi - 1
                                      else eye.pdf_rev[i])
        ri = ri * remap(rev) / remap(eye.pdf_fwd[i])
        sp = s + t - i
        sampled = (sp <= s_cap) and (i >= 2 or sp >= 2)
        if not sampled:
            continue
        nodelta = ~eye.delta[i] & ~(eye.delta[i - 1] if i - 1 > 0
                                    else jnp.zeros((n,), bool))
        live = eye.valid[i]
        sum_ri = sum_ri + jnp.where(nodelta & live, ri, 0.0)
    # light side: i = ys down to 0 — hypothetical strategy (i, s+t-i)
    if s >= 1:
        ri = jnp.ones((n,), jnp.float32)
        for i in range(ys, -1, -1):
            if i == ys:
                rev = qs_rev
            elif i == ys - 1:
                rev = qsm_rev
            else:
                rev = light.pdf_rev[i]
            ri = ri * remap(rev) / remap(light.pdf_fwd[i])
            if s + t - i > t_cap:
                continue
            nodelta = ~light.delta[i] & ~(light.delta[i - 1] if i >= 1
                                          else jnp.zeros((n,), bool))
            if i == 0:
                # the i=0 term is the s'=0 hypothetical (the eye path
                # generates everything, escaping to the env): samplable
                # for env origins even though they are delta for
                # CONNECTIONS (the delta flag only kills s'=1)
                nodelta = nodelta | light.is_env[0]
            live = light.valid[i]
            sum_ri = sum_ri + jnp.where(nodelta & live, ri, 0.0)

    return 1.0 / (1.0 + sum_ri)
