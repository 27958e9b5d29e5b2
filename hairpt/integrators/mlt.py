"""Path-space Metropolis light transport with the full mutation set.

Capability counterpart of the reference `mlt` plugin
(src/integrators/mlt/*, libbidir mut_*.h): Markov chains over light
TRANSPORT TRAJECTORIES (not primary samples like pssmlt). The chain
state is a camera trajectory with its first K=4 surface vertices stored
explicitly (positions, frames, materials, per-vertex bounce weights
w_k = f·cos/p and decision pdfs p_k) plus per-prefix emission buckets;
everything deeper is retained through a scalar `w_rest` bucket that
mutations re-scale by throughput ratios. The chain targets
pi ~ lum(W)·q (the pushforward of PT value x density), the same hybrid
the lens-only version used, so every acceptance is a product of
re-evaluated decision densities, retained-coordinate Jacobians, and the
luminance ratio.

Mutations (reference parity):
  * LARGE STEP (Kelemen): fresh unidirectional trajectory;
    a = min(1, lum W_y / lum W_x). Ergodicity.
  * LENS PERTURBATION (mut_lens.h): gaussian image move, re-trace x1,
    reattach at the retained x2 (world) or retained first-bounce
    direction. a = [lum W_y · p1_y · J_y] / [lum W_x · p1_x · J_x].
  * CAUSTIC PERTURBATION (mut_caustic.h): for suffix pattern
    E-D-S-D (x1 diffuse seen by the eye, x2 specular, x3 non-specular),
    perturb the light-side direction d = dir(x3 -> x2) by a small
    exponentially-distributed angle, re-trace the chain TOWARD the eye
    (x3 -> y2 specular bounce -> y1), and reproject y1 through the
    sensor. The retained coordinates are (A(x3), d); the acceptance
    carries |d(pix, w0)/d(A3, d)| evaluated by finite differences of
    the chain map (the FD analog of mut_caustic's analytic pdf).
  * MANIFOLD PERTURBATION (mut_manifold.h, Jakob & Marschner 2012):
    for pattern E-D-D-S-D (x1, x2 non-specular, x3 specular, x4
    non-specular), perturb the outgoing direction at x1, land a new
    x2, and re-solve the specular x3 between x2 and the FIXED x4 with
    the batched manifold walk (integrators/manifold.py). The chain
    Jacobian |dA(x4)/dw(x2)| is the generalized geometric term.
  * MULTI-CHAIN PERTURBATION (mut_mchain.h, Veach): for pattern
    E-S-D-S-D, perturb the pixel, re-trace the first specular chain
    (retained delta branch), copy the retained outgoing direction at
    the middle diffuse vertex across the second chain, and re-attach
    the final diffuse vertex to the retained suffix. The retained
    coordinates coincide with the forward PT parameterization, so the
    acceptance is purely re-evaluated decision densities × luminance.
  * BIDIRECTIONAL MUTATION (mut_bidir.h, scoped): regrow ONE interior
    non-specular vertex: BSDF-sample a fresh direction at x1, land y2,
    reconnect to the retained x3. Proposal densities cancel against the
    BSDF pdf, leaving a = [lum W_y · p2_y · G_y · p3_y] / [x terms].
    (The reference samples variable-length replacement subpaths; the
    one-vertex case is the scoped equivalent — large steps provide the
    cross-length moves.)

Splat weights rgb(W)/lum(W) and the normalization b = E[lum W] are the
standard Kelemen two-stage machinery (shared with integrators/pssmlt.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng
from ..core.math import Ray, Frame, dot, normalize, coordinate_system
from ..film import film as film_mod
from ..models import sensors
from ..models.bsdf import registry as mat
from ..scene.scene import Scene
from .common import scene_intersect, scene_occluded, frame
from .path import _env_radiance, _swept_params

LUM = np.array([0.212671, 0.715160, 0.072169], np.float32)
K = 4                       # stored vertices x1..x4
DELTA_CHAIN_KINDS = (mat.CONDUCTOR, mat.DIELECTRIC, mat.THINDIELECTRIC)


def _lum(c):
    return c @ jnp.asarray(LUM)


def _san(a):
    return jnp.nan_to_num(a, nan=0.0, posinf=0.0, neginf=0.0)


class VertexRec(NamedTuple):
    """Stored surface vertex (enough to re-evaluate its BSDF later)."""
    p: jnp.ndarray       # [N, 3]
    geo_n: jnp.ndarray   # [N, 3]
    sh_n: jnp.ndarray    # [N, 3] (unflipped; twosided applied at eval)
    sh_s: jnp.ndarray
    sh_t: jnp.ndarray
    mat_id: jnp.ndarray  # [N]
    uv: jnp.ndarray      # [N, 2]
    valid: jnp.ndarray   # [N]
    em_id: jnp.ndarray   # [N] area-emitter id at this vertex (-1 = none)


class PathRec(NamedTuple):
    """Chain state: K stored vertices + emission buckets.

    Vertex arrays carry a leading K axis (v.p is [K, N, 3], ...).
    w[k] = bounce weight f·cos/p at vertex k (delta: incl. lobe choice),
    pdf[k] = density of the direction/lobe decision at vertex k,
    w_em[k] = emission collected AT vertex k (throughput-weighted,
    absolute), w_env[k] = env radiance collected when segment k escaped
    (segment 0 = the primary ray), w_rest = all terms from vertex K on.
    """
    pix: jnp.ndarray       # [N, 2]
    v: VertexRec           # fields [K, N, ...]
    v_delta: jnp.ndarray   # [K, N] sampled lobe at vertex was delta
    v_choice: jnp.ndarray  # [K, N] delta branch 0=reflect 1=transmit
    wo: jnp.ndarray        # [K, N, 3] sampled world direction at vertex k
    w: jnp.ndarray         # [K, N, 3]
    pdf: jnp.ndarray       # [K, N]
    w_em: jnp.ndarray      # [K, N, 3]
    w_env: jnp.ndarray     # [K, N, 3]
    w_rest: jnp.ndarray    # [N, 3]


def traj_w(t: PathRec):
    return (jnp.sum(t.w_em, 0) + jnp.sum(t.w_env, 0) + t.w_rest)


def _lane_gather(t: PathRec, pick) -> PathRec:
    """Index the LANE axis (axis 0 for pix/w_rest, axis 1 for the
    K-leading vertex arrays)."""
    g0 = lambda a: a[pick]
    g1 = lambda a: a[:, pick]
    return PathRec(pix=g0(t.pix), v=jax.tree.map(g1, t.v),
                   v_delta=g1(t.v_delta), v_choice=g1(t.v_choice),
                   wo=g1(t.wo), w=g1(t.w), pdf=g1(t.pdf),
                   w_em=g1(t.w_em), w_env=g1(t.w_env),
                   w_rest=g0(t.w_rest))


def _lane_select(mask, a_t: PathRec, b_t: PathRec) -> PathRec:
    """Per-lane select between two states (mask [N] bool -> a else b)."""
    n = mask.shape[0]

    def s0(a, b):
        return jnp.where(mask.reshape((n,) + (1,) * (a.ndim - 1)), a, b)

    def s1(a, b):
        return jnp.where(mask.reshape((1, n) + (1,) * (a.ndim - 2)),
                         a, b)

    return PathRec(pix=s0(a_t.pix, b_t.pix),
                   v=jax.tree.map(s1, a_t.v, b_t.v),
                   v_delta=s1(a_t.v_delta, b_t.v_delta),
                   v_choice=s1(a_t.v_choice, b_t.v_choice),
                   wo=s1(a_t.wo, b_t.wo), w=s1(a_t.w, b_t.w),
                   pdf=s1(a_t.pdf, b_t.pdf),
                   w_em=s1(a_t.w_em, b_t.w_em),
                   w_env=s1(a_t.w_env, b_t.w_env),
                   w_rest=s0(a_t.w_rest, b_t.w_rest))


def _vtx(t: PathRec, k: int) -> VertexRec:
    return jax.tree.map(lambda a: a[k], t.v)


def _set_vtx(v: VertexRec, k: int, new: VertexRec) -> VertexRec:
    return jax.tree.map(lambda a, b: a.at[k].set(b), v, new)


def _hit_to_vertex(hit, ok) -> VertexRec:
    okn = ok[..., None]
    return VertexRec(p=jnp.where(okn, hit.p, 0.0),
                     geo_n=jnp.where(okn, hit.geo_n, 0.0),
                     sh_n=jnp.where(okn, hit.sh_n, 0.0),
                     sh_s=jnp.where(okn, hit.sh_s, 0.0),
                     sh_t=jnp.where(okn, hit.sh_t, 0.0),
                     mat_id=hit.mat_id, uv=hit.uv, valid=ok,
                     em_id=jnp.where(ok & (hit.emitter_id >= 0),
                                     hit.emitter_id, -1))


def _eval_bsdf(arr, kinds, v: VertexRec, wi_world, wo_world):
    """BSDF eval (f·cos) + pdf at a stored vertex, twosided-aware."""
    two = arr.materials.twosided[jnp.maximum(v.mat_id, 0)]
    flip = two & (dot(v.sh_n, wi_world) < 0)
    n = jnp.where(flip[..., None], -v.sh_n, v.sh_n)
    t = jnp.where(flip[..., None], -v.sh_t, v.sh_t)
    fr = Frame(s=v.sh_s, t=t, n=n)
    wi = fr.to_local(wi_world)
    wo = fr.to_local(wo_world)
    gm = mat.gather(arr.materials, arr.checkers, v.mat_id, v.uv)
    return mat.eval_pdf_mix(kinds, arr.materials, arr.checkers, v.mat_id,
                            v.uv, gm, wi, wo, arr.hair_tables)


def _delta_bounce(arr, kinds, v: VertexRec, wi_world, choice):
    """Deterministic delta bounce at a stored/probed vertex: replays the
    stored reflect/transmit branch (v_choice) in canonical orientation.
    Returns (wo_world, weight f·cos/p [N,3], discrete pdf [N])."""
    two = arr.materials.twosided[jnp.maximum(v.mat_id, 0)]
    flip = two & (dot(v.sh_n, wi_world) < 0)
    n = jnp.where(flip[..., None], -v.sh_n, v.sh_n)
    t = jnp.where(flip[..., None], -v.sh_t, v.sh_t)
    fr = Frame(s=v.sh_s, t=t, n=n)
    wi = fr.to_local(wi_world)
    gm = mat.gather(arr.materials, arr.checkers, v.mat_id, v.uv)
    nl = wi.shape[0]
    u_lobe = jnp.where(choice == 1, 1.0, 0.0).astype(jnp.float32)
    u2 = jnp.full((nl, 2), 0.5, jnp.float32)
    wo, w, pdf, is_d, _ = mat.sample_mix(
        kinds, arr.materials, arr.checkers, v.mat_id, v.uv, gm, wi,
        u_lobe, u2, u2, arr.hair_tables)
    return fr.to_world(wo), _san(w), _san(pdf)


def _emitted(arr, v: VertexRec, towards):
    """One-sided Le of an area emitter at a vertex, towards `towards`."""
    if arr.area is None:
        return jnp.zeros(v.p.shape, jnp.float32)
    le = arr.area.radiance[jnp.maximum(v.em_id, 0)]
    on = (v.em_id >= 0) & (dot(v.geo_n, towards) > 0) & v.valid
    return jnp.where(on[..., None], le, 0.0)


def _offset_ray(p, geo_n, d, eps):
    return p + geo_n * jnp.where(dot(d, geo_n) > 0, eps, -eps)[..., None]


def _safe_ratio(new, old):
    """Elementwise new/old with 0/0 -> 0 (buckets are proportional to
    throughput, so zero-throughput lanes carry zero buckets)."""
    return _san(new / jnp.where(jnp.abs(old) < 1e-24, 1.0, old)) \
        * (jnp.abs(old) >= 1e-24)


def _perturb_dir(d, u2, theta1=1e-4, theta2=0.1):
    """Rotate d by an exponentially distributed angle in [theta1, theta2]
    with uniform azimuth (mut_caustic.h perturbation; symmetric)."""
    theta = theta2 * jnp.exp(-jnp.log(theta2 / theta1) * u2[:, 0])
    phi = 2.0 * jnp.pi * u2[:, 1]
    s, t = coordinate_system(d)
    sin_t = jnp.sin(theta)
    return normalize(d * jnp.cos(theta)[..., None]
                     + s * (sin_t * jnp.cos(phi))[..., None]
                     + t * (sin_t * jnp.sin(phi))[..., None])


def _record_path(scene: Scene, arr, pix_pos, salt) -> PathRec:
    """Unidirectional path trace (BSDF sampling only, no NEE; emission
    collected at EVERY hit exactly like the forward path tracer) that
    records the first K vertices and the emission buckets."""
    cfg = scene.config
    kinds = scene.active_kinds
    n = pix_pos.shape[0]
    idx = jnp.arange(n, dtype=jnp.uint32)
    ray = sensors.sample_ray(scene.camera, pix_pos, None)
    d_max = max(min(cfg.max_depth, 8), K)

    def body(carry, b):
        o, d, tp, alive = carry
        r = Ray(o=o, d=d, mint=jnp.zeros(n),
                maxt=jnp.where(alive, jnp.inf, 0.0))
        hit = scene_intersect(arr, r, cfg.traversal, cfg.block,
                              _swept_params(cfg), sort_rays=True)
        esc = alive & ~hit.valid
        w_env_b = jnp.where(esc[..., None], tp * _env_radiance(arr, d),
                            0.0)
        em_hit = alive & hit.valid & (hit.emitter_id >= 0)
        w_em_b = jnp.zeros((n, 3), jnp.float32)
        if arr.area is not None:
            le = arr.area.radiance[jnp.maximum(hit.emitter_id, 0)]
            facing = dot(hit.geo_n, -d) > 0
            w_em_b = jnp.where((em_hit & facing)[..., None], tp * le, 0.0)
        alive2 = alive & hit.valid

        wi_world = -d
        two = arr.materials.twosided[jnp.maximum(hit.mat_id, 0)]
        flip = two & (dot(hit.sh_n, wi_world) < 0)
        sh_n = jnp.where(flip[..., None], -hit.sh_n, hit.sh_n)
        sh_t = jnp.where(flip[..., None], -hit.sh_t, hit.sh_t)
        geo_n = jnp.where(flip[..., None], -hit.geo_n, hit.geo_n)
        fr = frame(hit)._replace(n=sh_n, t=sh_t)
        wi = fr.to_local(wi_world)
        gm = mat.gather(arr.materials, arr.checkers, hit.mat_id, hit.uv)
        u_l = rng.uniform_1d(idx, salt, b * 8 + 0)
        u2 = rng.uniform_2d(idx, salt, b * 8 + 1)
        u2b = rng.uniform_2d(idx, salt, b * 8 + 3)
        wo, w, pdf, is_delta, _ = mat.sample_mix(
            kinds, arr.materials, arr.checkers, hit.mat_id, hit.uv, gm,
            wi, u_l, u2, u2b, arr.hair_tables)
        wo_world = fr.to_world(wo)
        # transmit iff the local bounce crossed z=0
        choice = ((wo[..., 2] * wi[..., 2]) < 0).astype(jnp.int32)
        w = jnp.where(alive2[..., None], w, 0.0)
        tp2 = tp * jnp.where(alive2[..., None], w, 1.0)
        alive3 = alive2 & (jnp.max(jnp.abs(w), -1) > 0)
        o2 = _offset_ray(hit.p, geo_n, wo_world, cfg.ray_eps)
        rec = _hit_to_vertex(hit, alive & hit.valid)
        rec = rec._replace(em_id=jnp.where(em_hit, hit.emitter_id, -1))
        out = (rec, wo_world, _san(w), _san(pdf),
               is_delta & alive2, choice, _san(w_em_b), _san(w_env_b))
        return (o2, wo_world, tp2, alive3), out

    carry = (ray.o, ray.d, jnp.ones((n, 3), jnp.float32),
             jnp.ones((n,), bool))
    carry, (recs, wos, ws, pdfs, deltas, choices, w_em_s, w_env_s) = \
        jax.lax.scan(body, carry, jnp.arange(d_max, dtype=jnp.int32))
    total = jnp.sum(w_em_s, 0) + jnp.sum(w_env_s, 0)
    head = jnp.sum(w_em_s[:K], 0) + jnp.sum(w_env_s[:K], 0)
    return PathRec(pix=pix_pos,
                   v=jax.tree.map(lambda a: a[:K], recs),
                   v_delta=deltas[:K], v_choice=choices[:K],
                   wo=wos[:K], w=ws[:K], pdf=pdfs[:K],
                   w_em=_san(w_em_s[:K]), w_env=_san(w_env_s[:K]),
                   w_rest=_san(total - head))

# ---------------------------------------------------------------------------
# mutation steps
# ---------------------------------------------------------------------------

class _Ctx(NamedTuple):
    """Static per-render context shared by all mutation kernels."""
    scene: Scene
    arr: object
    kinds: tuple
    n: int
    idx: jnp.ndarray
    cam_o: jnp.ndarray
    seed: int
    lens_sigma: float


def _intersect(ctx: _Ctx, ray):
    cfg = ctx.scene.config
    return scene_intersect(ctx.arr, ray, cfg.traversal, cfg.block,
                           _swept_params(cfg), sort_rays=True)


def _occluded(ctx: _Ctx, ray):
    cfg = ctx.scene.config
    return scene_occluded(ctx.arr, ray, cfg.traversal, cfg.block,
                          _swept_params(cfg), sort_rays=True)


def _shadow(ctx: _Ctx, p, geo_n, q, active):
    """Occlusion of the open segment p -> q (origin offset at p)."""
    cfg = ctx.scene.config
    seg = q - p
    dist = jnp.linalg.norm(seg, axis=-1)
    d = seg / jnp.maximum(dist, 1e-12)[..., None]
    o = _offset_ray(p, geo_n, d, cfg.ray_eps)
    ray = Ray(o=o, d=d, mint=jnp.zeros(ctx.n),
              maxt=jnp.where(active, dist - 2 * cfg.ray_eps, 0.0))
    return _occluded(ctx, ray)


def _deep_scale(st: PathRec, k_from: int, ratio):
    """Scale every bucket with depth >= k_from by the [N,3] throughput
    ratio (w_em[k]/w_env[k] carry the product of bounce weights w_0..
    w_{k-1}, so a change at vertices < k_from re-scales them all)."""
    w_em = st.w_em
    w_env = st.w_env
    for k in range(k_from, K):
        w_em = w_em.at[k].set(w_em[k] * ratio)
        w_env = w_env.at[k].set(w_env[k] * ratio)
    return st._replace(w_em=w_em, w_env=w_env,
                       w_rest=st.w_rest * ratio)


def _chain_delta_kind(arr, mat_id):
    """Is this material a pure delta kind a chain may pass through?"""
    kind = arr.materials.kind[jnp.maximum(mat_id, 0)]
    ok = jnp.zeros(kind.shape, bool)
    for k in DELTA_CHAIN_KINDS:
        ok = ok | (kind == k)
    return ok


def _step_lens(ctx: _Ctx, st: PathRec, it, p_large: float):
    """Combined large-step / lens-perturbation kernel (mut_lens.h +
    Kelemen large steps). Per-lane coin picks large vs lens."""
    scene, arr, kinds, n, idx = (ctx.scene, ctx.arr, ctx.kinds, ctx.n,
                                 ctx.idx)
    cfg = scene.config
    W, H = cfg.width, cfg.height
    seed = ctx.seed
    l = _lum(traj_w(st))
    is_large = rng.uniform_1d(idx, jnp.uint32(seed + 3), it) < p_large

    # ---- large step ----
    u = rng.uniform_2d(idx, it * jnp.uint32(2654435761) + jnp.uint32(17),
                       0)
    pix_l = jnp.stack([u[:, 0] * W, u[:, 1] * H], -1)
    prop_l = _record_path(scene, arr, pix_l,
                          jnp.uint32(seed * 131) + it * 977 + 3)
    l_large = _lum(traj_w(prop_l))
    a_large = jnp.clip(l_large / jnp.maximum(l, 1e-12), 0.0, 1.0)
    a_large = jnp.where(l <= 0, 1.0, a_large)

    # ---- lens perturbation ----
    g = rng.uniform_2d(idx, jnp.uint32(seed + 5), it * 2)
    g2 = rng.uniform_2d(idx, jnp.uint32(seed + 6), it * 2)
    gauss = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(g[:, :1], 1e-12))) \
        * jnp.concatenate([jnp.cos(2 * jnp.pi * g2[:, :1]),
                           jnp.sin(2 * jnp.pi * g2[:, :1])], 1)
    pix_y = st.pix + gauss * (ctx.lens_sigma * W)
    in_film = (pix_y[:, 0] >= 0) & (pix_y[:, 0] < W) \
        & (pix_y[:, 1] >= 0) & (pix_y[:, 1] < H)
    ray_y = sensors.sample_ray(scene.camera, pix_y, None)
    hit_y = _intersect(ctx, ray_y)
    y_ok = hit_y.valid & in_film
    y1 = _hit_to_vertex(hit_y, y_ok)
    x1 = _vtx(st, 0)
    x2 = _vtx(st, 1)
    has_x2 = x2.valid
    deep = (jnp.sum(st.w_em[1:], 0) + jnp.sum(st.w_env[1:], 0)
            + st.w_rest)
    eligible = x1.valid & y_ok & (l > 0) \
        & (has_x2 | (_lum(st.w_env[1]) > 0))

    # retained coordinate: x2 (world) or w0 (direction)
    seg = x2.p - y1.p
    dist = jnp.linalg.norm(seg, axis=-1)
    d_y = jnp.where(has_x2[..., None],
                    seg / jnp.maximum(dist, 1e-12)[..., None], st.wo[0])
    seg_x = x2.p - x1.p
    dist_x = jnp.linalg.norm(seg_x, axis=-1)
    d_x = jnp.where(has_x2[..., None],
                    seg_x / jnp.maximum(dist_x, 1e-12)[..., None],
                    st.wo[0])
    wi_cam_y = normalize(jnp.broadcast_to(ctx.cam_o, y1.p.shape) - y1.p)
    wi_cam_x = normalize(jnp.broadcast_to(ctx.cam_o, x1.p.shape) - x1.p)
    f1y, p1y = _eval_bsdf(arr, kinds, y1, wi_cam_y, d_y)
    f1x, p1x = _eval_bsdf(arr, kinds, x1, wi_cam_x, d_x)
    # Jacobian solid-angle -> retained x2 area (1 for direction)
    j_y = jnp.where(has_x2, jnp.abs(dot(d_y, x2.geo_n))
                    / jnp.maximum(dist * dist, 1e-12), 1.0)
    j_x = jnp.where(has_x2, jnp.abs(dot(d_x, x2.geo_n))
                    / jnp.maximum(dist_x * dist_x, 1e-12), 1.0)
    occ = _shadow(ctx, y1.p, y1.geo_n, x2.p, eligible & has_x2)
    ok = eligible & ~(has_x2 & occ) & (p1y > 0) & (p1x > 0) \
        & (_lum(f1x) > 1e-18) & (j_x > 1e-18)

    w0y = _san(f1y / jnp.maximum(p1y, 1e-20)[..., None])
    rw1 = jnp.where(ok[..., None],
                    _safe_ratio(w0y, st.w[0]), 0.0)
    # x2's bounce weight under the changed incoming direction
    f2y, p2y = _eval_bsdf(arr, kinds, x2, -d_y, st.wo[1])
    w1y = _san(f2y / jnp.maximum(p2y, 1e-20)[..., None])
    ok = ok & (~has_x2 | ((p2y > 1e-12) & (st.pdf[1] > 1e-12)))
    rw2 = jnp.where((ok & has_x2)[..., None],
                    _safe_ratio(w1y, st.w[1]), 0.0)
    q2_ratio = jnp.where(ok & has_x2,
                         p2y / jnp.maximum(st.pdf[1], 1e-12), 1.0)

    em_y1 = _emitted(arr, y1, -ray_y.d)
    w_y = em_y1 \
        + jnp.where(has_x2[..., None],
                    rw1 * (st.w_em[1] + rw2 * (deep - st.w_em[1])),
                    rw1 * st.w_env[1])
    w_y = jnp.where(ok[..., None], w_y, 0.0)
    l_y = _lum(w_y)
    a_lens = jnp.clip(l_y * p1y * j_y * q2_ratio
                      / jnp.maximum(l * p1x * j_x, 1e-20), 0.0, 1.0)
    a_lens = jnp.where(ok, a_lens, 0.0)

    # assemble the lens proposal state
    v = _set_vtx(st.v, 0, y1)
    vd = st.v_delta.at[0].set(jnp.zeros((n,), bool))
    wo = st.wo.at[0].set(d_y)
    w = st.w.at[0].set(jnp.where(ok[..., None], w0y, st.w[0]))
    w = w.at[1].set(jnp.where((ok & has_x2)[..., None], w1y, w[1]))
    pdf = st.pdf.at[0].set(jnp.where(ok, p1y, st.pdf[0]))
    pdf = pdf.at[1].set(jnp.where(ok & has_x2, p2y, pdf[1]))
    w_em = st.w_em.at[0].set(em_y1)
    w_em = w_em.at[1].set(jnp.where(has_x2[..., None],
                                    rw1 * st.w_em[1], 0.0))
    w_env = st.w_env.at[0].set(jnp.zeros((n, 3), jnp.float32))
    w_env = w_env.at[1].set(jnp.where(has_x2[..., None], 0.0,
                                      rw1 * st.w_env[1]))
    r12 = rw1 * rw2
    for k in range(2, K):
        w_em = w_em.at[k].set(st.w_em[k] * r12)
        w_env = w_env.at[k].set(st.w_env[k] * r12)
    lens_state = st._replace(pix=pix_y, v=v, v_delta=vd, wo=wo, w=w,
                             pdf=pdf, w_em=w_em, w_env=w_env,
                             w_rest=st.w_rest * r12)

    a = jnp.where(is_large, a_large, a_lens)
    prop = _lane_select(is_large, prop_l, lens_state)
    return prop, a


def _caustic_probe(ctx: _Ctx, pix, w0dir, x1_gn, choice1, x3p, e3s, e3t,
                   d_base, eb1, eb2, active):
    """Propagate (pix, w0) through one specular bounce and report the
    chain-map outputs: tangent coords of the landing point around x3 and
    of the light-side direction around d_base. Used for the FD Jacobian
    |d(A3, d)/d(pix, w0)| of the caustic perturbation."""
    cfg = ctx.scene.config
    n = ctx.n
    ray = sensors.sample_ray(ctx.scene.camera, pix, None)
    h1 = _intersect(ctx, ray._replace(
        maxt=jnp.where(active, ray.maxt, 0.0)))
    o1 = _offset_ray(h1.p, h1.geo_n, w0dir, cfg.ray_eps)
    r1 = Ray(o=o1, d=w0dir, mint=jnp.zeros(n),
             maxt=jnp.where(active & h1.valid, jnp.inf, 0.0))
    h2 = _intersect(ctx, r1)
    v2 = _hit_to_vertex(h2, h2.valid)
    wo2, _, _ = _delta_bounce(ctx.arr, ctx.kinds, v2, -w0dir, choice1)
    o2 = _offset_ray(h2.p, h2.geo_n, wo2, cfg.ray_eps)
    r2 = Ray(o=o2, d=wo2, mint=jnp.zeros(n),
             maxt=jnp.where(active & h1.valid & h2.valid, jnp.inf, 0.0))
    h3 = _intersect(ctx, r2)
    ok = active & h1.valid & h2.valid & h3.valid \
        & _chain_delta_kind(ctx.arr, h2.mat_id)
    rel = h3.p - x3p
    a3 = jnp.stack([dot(rel, e3s), dot(rel, e3t)], -1)
    dvec = normalize(h2.p - h3.p)
    dd = jnp.stack([dot(dvec - d_base, eb1), dot(dvec - d_base, eb2)], -1)
    return a3, dd, ok


def _struct_caustic(st: PathRec, arr):
    """E-D-S-D pattern mask (positive-luminance states only)."""
    x1, x2, x3 = _vtx(st, 0), _vtx(st, 1), _vtx(st, 2)
    return x1.valid & ~st.v_delta[0] & x2.valid & st.v_delta[1] \
        & _chain_delta_kind(arr, x2.mat_id) & x3.valid \
        & ~st.v_delta[2] & (_lum(traj_w(st)) > 0)


def _struct_manifold(st: PathRec, arr):
    """E-D-D-S-D pattern mask (positive-luminance states only)."""
    x1, x2, x3, x4 = (_vtx(st, 0), _vtx(st, 1), _vtx(st, 2), _vtx(st, 3))
    return x1.valid & ~st.v_delta[0] & x2.valid & ~st.v_delta[1] \
        & x3.valid & st.v_delta[2] & _chain_delta_kind(arr, x3.mat_id) \
        & x4.valid & ~st.v_delta[3] & (_lum(traj_w(st)) > 0)


def _step_caustic(ctx: _Ctx, st: PathRec, it, sigma_scale: float = 1.0):
    """Caustic perturbation (mut_caustic.h) for pattern E-D-S-D."""
    scene, arr, kinds, n, idx = (ctx.scene, ctx.arr, ctx.kinds, ctx.n,
                                 ctx.idx)
    cfg = scene.config
    W, H = cfg.width, cfg.height
    seed = ctx.seed
    l = _lum(traj_w(st))
    x1, x2, x3 = _vtx(st, 0), _vtx(st, 1), _vtx(st, 2)
    struct = _struct_caustic(st, arr)

    # perturb the light-side chain direction d = dir(x3 -> x2)
    d_x = normalize(x2.p - x3.p)
    u2 = rng.uniform_2d(idx, jnp.uint32(seed + 21), it)
    th2 = 0.1 * sigma_scale
    d_y = _perturb_dir(d_x, u2, theta1=max(1e-4 * sigma_scale, 1e-7),
                       theta2=max(th2, 2e-7))

    # re-trace the chain toward the eye: x3 -> y2 (specular) -> y1
    o3 = _offset_ray(x3.p, x3.geo_n, d_y, cfg.ray_eps)
    r3 = Ray(o=o3, d=d_y, mint=jnp.zeros(n),
             maxt=jnp.where(struct, jnp.inf, 0.0))
    h2y = _intersect(ctx, r3)
    ok = struct & h2y.valid & _chain_delta_kind(arr, h2y.mat_id)
    y2 = _hit_to_vertex(h2y, ok)
    # bounce at y2 (incoming from x3) to find y1
    wo_rev, _, _ = _delta_bounce(arr, kinds, y2, -d_y, st.v_choice[1])
    o2 = _offset_ray(y2.p, y2.geo_n, wo_rev, cfg.ray_eps)
    r2 = Ray(o=o2, d=wo_rev, mint=jnp.zeros(n),
             maxt=jnp.where(ok, jnp.inf, 0.0))
    h1y = _intersect(ctx, r2)
    ok = ok & h1y.valid & ~_chain_delta_kind(arr, h1y.mat_id)
    y1 = _hit_to_vertex(h1y, ok)
    # reproject through the sensor + eye visibility
    pix_y, we, cdist, d_to_cam, vis = sensors.camera_importance(
        scene.camera, y1.p)
    in_film = vis & (pix_y[:, 0] >= 0) & (pix_y[:, 0] < W) \
        & (pix_y[:, 1] >= 0) & (pix_y[:, 1] < H)
    occ_eye = _shadow(ctx, y1.p, y1.geo_n,
                      jnp.broadcast_to(ctx.cam_o, y1.p.shape),
                      ok & in_film)
    ok = ok & in_film & ~occ_eye

    # canonical (eye-orientation) factors at the new vertices
    d01_y = normalize(y2.p - y1.p)            # y1 -> y2
    f0y, p0y = _eval_bsdf(arr, kinds, y1, d_to_cam, d01_y)
    w0y = _san(f0y / jnp.maximum(p0y, 1e-20)[..., None])
    wo1_y, w1y, pc1y = _delta_bounce(arr, kinds, y2, -d01_y,
                                     st.v_choice[1])
    # the canonical bounce must reproduce the chain segment y2 -> x3
    ok = ok & (dot(wo1_y, normalize(x3.p - y2.p)) > 0.999) \
        & (p0y > 0) & (pc1y > 0)
    # x3's bounce decision re-evaluated under the changed incoming dir
    f2y, p2y = _eval_bsdf(arr, kinds, x3, d_y, st.wo[2])
    w2y = _san(f2y / jnp.maximum(p2y, 1e-20)[..., None])
    ok = ok & (p2y > 1e-12) & (st.pdf[2] > 1e-12) & (st.pdf[0] > 1e-12) \
        & (st.pdf[1] > 1e-12)

    # FD Jacobian |d(A3, d)/d(pix, w0)| for both states
    e3s, e3t = x3.sh_s, x3.sh_t
    eb1, eb2 = coordinate_system(d_x)
    eps_p = 0.35
    eps_w = 1.5e-3

    def jac(pix0, w0, gn1, choice, db, active):
        base_a3, base_dd, okb = _caustic_probe(
            ctx, pix0, w0, gn1, choice, x3.p, e3s, e3t, db, eb1, eb2,
            active)
        cols = []
        okj = okb
        s_w, t_w = coordinate_system(w0)
        probes = [
            (pix0 + jnp.array([eps_p, 0.0], jnp.float32), w0, eps_p),
            (pix0 + jnp.array([0.0, eps_p], jnp.float32), w0, eps_p),
            (pix0, normalize(w0 + s_w * eps_w), eps_w),
            (pix0, normalize(w0 + t_w * eps_w), eps_w),
        ]
        for pp, ww, eps in probes:
            a3, dd, okp = _caustic_probe(ctx, pp, ww, gn1, choice, x3.p,
                                         e3s, e3t, db, eb1, eb2, active)
            cols.append(jnp.concatenate([(a3 - base_a3) / eps,
                                         (dd - base_dd) / eps], -1))
            okj = okj & okp
        m = jnp.stack(cols, -1)                   # [N, 4, 4]
        det = jnp.abs(jnp.linalg.det(m))
        return _san(det), okj

    j_y, ok_jy = jac(pix_y, d01_y, y1.geo_n, st.v_choice[1], d_x, ok)
    j_x, ok_jx = jac(st.pix, st.wo[0], x1.geo_n, st.v_choice[1], d_x,
                     struct)
    ok = ok & ok_jy & ok_jx & (j_y > 1e-16) & (j_x > 1e-16)

    # proposal buckets (absolute recompute up to x3, ratio beyond)
    em_y1 = _emitted(arr, y1, d_to_cam)
    em_y2 = _emitted(arr, y2, -d01_y) * w0y
    em_x3 = _emitted(arr, x3, d_y) * w0y * w1y
    tp_new = w0y * w1y * w2y
    tp_old = st.w[0] * st.w[1] * st.w[2]
    r3v = _safe_ratio(tp_new, tp_old)
    w_y = em_y1 + em_y2 + em_x3 \
        + (st.w_em[3] + st.w_env[3]) * r3v + st.w_rest * r3v
    w_y = jnp.where(ok[..., None], w_y, 0.0)
    l_y = _lum(w_y)

    num = l_y * p0y * pc1y * p2y / jnp.maximum(j_y, 1e-20)
    den = l * st.pdf[0] * st.pdf[1] * st.pdf[2] \
        / jnp.maximum(j_x, 1e-20)
    a = jnp.where(ok, jnp.clip(_san(num / jnp.maximum(den, 1e-24)),
                               0.0, 1.0), 0.0)

    # assemble proposal
    v = _set_vtx(st.v, 0, y1)
    v = _set_vtx(v, 1, y2)
    vd = st.v_delta.at[0].set(jnp.zeros((n,), bool))
    vd = vd.at[1].set(jnp.ones((n,), bool))
    wo = st.wo.at[0].set(d01_y)
    wo = wo.at[1].set(normalize(x3.p - y2.p))
    w = st.w.at[0].set(w0y).at[1].set(w1y).at[2].set(w2y)
    pdf = st.pdf.at[0].set(p0y).at[1].set(pc1y).at[2].set(p2y)
    w_em = st.w_em.at[0].set(em_y1).at[1].set(em_y2).at[2].set(em_x3)
    w_em = w_em.at[3].set(st.w_em[3] * r3v)
    zero3 = jnp.zeros((n, 3), jnp.float32)
    w_env = st.w_env.at[0].set(zero3).at[1].set(zero3).at[2].set(zero3)
    w_env = w_env.at[3].set(st.w_env[3] * r3v)
    prop = st._replace(pix=pix_y, v=v, v_delta=vd, wo=wo, w=w, pdf=pdf,
                       w_em=w_em, w_env=w_env, w_rest=st.w_rest * r3v)
    return prop, a


def _chain_eta(arr, v: VertexRec, choice, wi_world):
    """Relative IOR for the manifold-walk constraint at a stored specular
    vertex: 1 for reflection; for transmission eta_b/eta_a where side a
    is the (incoming) side of wi_world."""
    gm_eta = arr.materials.eta[jnp.maximum(v.mat_id, 0)]
    ext = dot(wi_world, v.sh_n) > 0
    eta_t = jnp.where(ext, gm_eta, 1.0 / jnp.maximum(gm_eta, 1e-6))
    return jnp.where(choice == 1, eta_t, 1.0)


def _step_manifold(ctx: _Ctx, st: PathRec, it, sigma: float = 0.05):
    """Manifold perturbation (mut_manifold.h) for pattern E-D-D-S-D:
    perturb the outgoing direction at x1, land y2 = trace(x1, w0'),
    re-solve the specular x3 between y2 and the fixed x4 with the
    manifold walk, reconnect to the retained x4."""
    from .manifold import walk, generalized_g
    scene, arr, kinds, n, idx = (ctx.scene, ctx.arr, ctx.kinds, ctx.n,
                                 ctx.idx)
    cfg = scene.config
    seed = ctx.seed
    l = _lum(traj_w(st))
    x1, x2, x3, x4 = (_vtx(st, 0), _vtx(st, 1), _vtx(st, 2), _vtx(st, 3))
    struct = _struct_manifold(st, arr)

    # perturb w0 and land the moved second vertex y2
    u2 = rng.uniform_2d(idx, jnp.uint32(seed + 31), it)
    w0_y = _perturb_dir(st.wo[0], u2, theta1=1e-4 * sigma / 0.05,
                        theta2=sigma)
    o1 = _offset_ray(x1.p, x1.geo_n, w0_y, cfg.ray_eps)
    r1 = Ray(o=o1, d=w0_y, mint=jnp.zeros(n),
             maxt=jnp.where(struct, jnp.inf, 0.0))
    h2y = _intersect(ctx, r1)
    ok = struct & h2y.valid & ~_chain_delta_kind(arr, h2y.mat_id)
    y2 = _hit_to_vertex(h2y, ok)

    # walk the specular vertex between y2 and the FIXED x4
    eta = _chain_eta(arr, x3, st.v_choice[2], normalize(x2.p - x3.p))
    hit3_init = h2y._replace(p=x3.p, sh_n=x3.sh_n,
                             valid=ok, geo_n=x3.geo_n)
    y3p, y3n, walked = walk(arr, cfg, y2.p, x4.p, hit3_init, eta=eta,
                            n_iters=8)
    ok = ok & walked
    # rebuild the solved vertex record (same surface/material as x3)
    sy, ty = coordinate_system(y3n)
    y3 = x3._replace(p=y3p, geo_n=y3n, sh_n=y3n, sh_s=sy, sh_t=ty,
                     valid=ok)
    occ34 = _shadow(ctx, y3.p, y3.geo_n, x4.p, ok)
    ok = ok & ~occ34

    # canonical factors along the changed portion
    wi_cam = normalize(jnp.broadcast_to(ctx.cam_o, x1.p.shape) - x1.p)
    f0y, p0y = _eval_bsdf(arr, kinds, x1, wi_cam, w0_y)
    w0y = _san(f0y / jnp.maximum(p0y, 1e-20)[..., None])
    d12 = normalize(y3.p - y2.p)
    f1y, p1y = _eval_bsdf(arr, kinds, y2, -w0_y, d12)
    w1y = _san(f1y / jnp.maximum(p1y, 1e-20)[..., None])
    wo2_y, w2y, pc2y = _delta_bounce(arr, kinds, y3, -d12,
                                     st.v_choice[2])
    d34 = normalize(x4.p - y3.p)
    ok = ok & (dot(wo2_y, d34) > 0.995) & (p0y > 0) & (p1y > 0) \
        & (pc2y > 0)
    f3y, p3y = _eval_bsdf(arr, kinds, x4, -d34, st.wo[3])
    w3y = _san(f3y / jnp.maximum(p3y, 1e-20)[..., None])
    ok = ok & (p3y > 1e-12) & (st.pdf[0] > 1e-12) & (st.pdf[1] > 1e-12) \
        & (st.pdf[2] > 1e-12) & (st.pdf[3] > 1e-12)

    # chain Jacobians |dA(x4)/dw(at y2/x2)| (generalized G)
    g_y = generalized_g(y2.p, x4.p, y3.p, y3n, eta)
    g_x = generalized_g(x2.p, x4.p, x3.p, x3.sh_n, eta)
    ok = ok & (g_y > 1e-16) & (g_x > 1e-16)

    # buckets: absolute through x4, ratio beyond
    em_y2 = _emitted(arr, y2, -w0_y) * w0y
    em_y3 = _emitted(arr, y3, -d12) * w0y * w1y
    em_x4 = _emitted(arr, x4, -d34) * w0y * w1y * w2y
    tp_new = w0y * w1y * w2y * w3y
    tp_old = st.w[0] * st.w[1] * st.w[2] * st.w[3]
    r4v = _safe_ratio(tp_new, tp_old)
    w_y = st.w_em[0] + em_y2 + em_y3 + em_x4 \
        + st.w_env[3] * _safe_ratio(w0y * w1y * w2y,
                                    st.w[0] * st.w[1] * st.w[2]) \
        + st.w_rest * r4v
    w_y = jnp.where(ok[..., None], w_y, 0.0)
    l_y = _lum(w_y)

    num = l_y * p0y * p1y * pc2y * p3y / jnp.maximum(g_y, 1e-20)
    den = l * st.pdf[0] * st.pdf[1] * st.pdf[2] * st.pdf[3] \
        / jnp.maximum(g_x, 1e-20)
    a = jnp.where(ok, jnp.clip(_san(num / jnp.maximum(den, 1e-24)),
                               0.0, 1.0), 0.0)

    v = _set_vtx(st.v, 1, y2)
    v = _set_vtx(v, 2, y3)
    wo = st.wo.at[0].set(w0_y).at[1].set(d12).at[2].set(d34)
    w = st.w.at[0].set(w0y).at[1].set(w1y).at[2].set(w2y).at[3].set(w3y)
    pdf = st.pdf.at[0].set(p0y).at[1].set(p1y).at[2].set(pc2y) \
        .at[3].set(p3y)
    w_em = st.w_em.at[1].set(em_y2).at[2].set(em_y3).at[3].set(em_x4)
    zero3 = jnp.zeros((n, 3), jnp.float32)
    w_env = st.w_env.at[1].set(zero3).at[2].set(zero3)
    w_env = w_env.at[3].set(st.w_env[3] * _safe_ratio(
        w0y * w1y * w2y, st.w[0] * st.w[1] * st.w[2]))
    prop = st._replace(v=v, wo=wo, w=w, pdf=pdf, w_em=w_em, w_env=w_env,
                       w_rest=st.w_rest * r4v)
    return prop, a


def _step_bidir(ctx: _Ctx, st: PathRec, it):
    """Scoped bidirectional mutation (mut_bidir.h): regrow ONE interior
    vertex. BSDF-sample a fresh direction at x1, land y2, reconnect to
    the retained x3; the proposal's BSDF pdf cancels in the ratio."""
    scene, arr, kinds, n, idx = (ctx.scene, ctx.arr, ctx.kinds, ctx.n,
                                 ctx.idx)
    cfg = scene.config
    seed = ctx.seed
    l = _lum(traj_w(st))
    x1, x2, x3 = _vtx(st, 0), _vtx(st, 1), _vtx(st, 2)
    struct = x1.valid & ~st.v_delta[0] & x2.valid & ~st.v_delta[1] \
        & x3.valid & (l > 0)

    # fresh BSDF direction at x1
    wi_cam = normalize(jnp.broadcast_to(ctx.cam_o, x1.p.shape) - x1.p)
    two = arr.materials.twosided[jnp.maximum(x1.mat_id, 0)]
    flip = two & (dot(x1.sh_n, wi_cam) < 0)
    nrm = jnp.where(flip[..., None], -x1.sh_n, x1.sh_n)
    tng = jnp.where(flip[..., None], -x1.sh_t, x1.sh_t)
    fr = Frame(s=x1.sh_s, t=tng, n=nrm)
    gm = mat.gather(arr.materials, arr.checkers, x1.mat_id, x1.uv)
    u_l = rng.uniform_1d(idx, jnp.uint32(seed + 41), it * 4)
    u2 = rng.uniform_2d(idx, jnp.uint32(seed + 42), it * 4 + 1)
    u2b = rng.uniform_2d(idx, jnp.uint32(seed + 43), it * 4 + 2)
    wo_l, w0y, p0y, is_d, _ = mat.sample_mix(
        kinds, arr.materials, arr.checkers, x1.mat_id, x1.uv, gm,
        fr.to_local(wi_cam), u_l, u2, u2b, arr.hair_tables)
    w0_y = fr.to_world(wo_l)
    w0y = _san(w0y)
    ok = struct & ~is_d & (p0y > 0) & (jnp.max(jnp.abs(w0y), -1) > 0)

    o1 = _offset_ray(x1.p, x1.geo_n, w0_y, cfg.ray_eps)
    r1 = Ray(o=o1, d=w0_y, mint=jnp.zeros(n),
             maxt=jnp.where(ok, jnp.inf, 0.0))
    h2y = _intersect(ctx, r1)
    ok = ok & h2y.valid
    y2 = _hit_to_vertex(h2y, ok)

    # reconnect y2 -> x3
    seg = x3.p - y2.p
    dist = jnp.linalg.norm(seg, axis=-1)
    d23_y = seg / jnp.maximum(dist, 1e-12)[..., None]
    occ = _shadow(ctx, y2.p, y2.geo_n, x3.p, ok)
    ok = ok & ~occ
    f1y, p1y = _eval_bsdf(arr, kinds, y2, -w0_y, d23_y)
    w1y = _san(f1y / jnp.maximum(p1y, 1e-20)[..., None])
    j_y = jnp.abs(dot(d23_y, x3.geo_n)) / jnp.maximum(dist * dist, 1e-12)
    d23_x = normalize(x3.p - x2.p)
    dist_x = jnp.linalg.norm(x3.p - x2.p, axis=-1)
    j_x = jnp.abs(dot(d23_x, x3.geo_n)) / jnp.maximum(dist_x * dist_x,
                                                      1e-12)
    # x3's decision re-evaluated under the changed incoming direction
    f2y, p2y = _eval_bsdf(arr, kinds, x3, -d23_y, st.wo[2])
    w2y = _san(f2y / jnp.maximum(p2y, 1e-20)[..., None])
    ok = ok & (p1y > 0) & (p2y > 1e-12) & (st.pdf[1] > 1e-12) \
        & (st.pdf[2] > 1e-12) & (j_y > 1e-16) & (j_x > 1e-16)

    em_y2 = _emitted(arr, y2, -w0_y) * w0y
    em_x3 = _emitted(arr, x3, -d23_y) * w0y * w1y
    tp3_new = w0y * w1y * w2y
    tp3_old = st.w[0] * st.w[1] * st.w[2]
    r3v = _safe_ratio(tp3_new, tp3_old)
    r2v = _safe_ratio(w0y * w1y, st.w[0] * st.w[1])
    w_y = st.w_em[0] + em_y2 + em_x3 \
        + (st.w_em[3] + st.w_env[3]) * r3v + st.w_env[2] * r2v \
        + st.w_rest * r3v
    w_y = jnp.where(ok[..., None], w_y, 0.0)
    l_y = _lum(w_y)

    num = l_y * p1y * j_y * p2y
    den = l * st.pdf[1] * j_x * st.pdf[2]
    a = jnp.where(ok, jnp.clip(_san(num / jnp.maximum(den, 1e-24)),
                               0.0, 1.0), 0.0)

    v = _set_vtx(st.v, 1, y2)
    vd = st.v_delta.at[1].set(jnp.zeros((n,), bool))
    wo = st.wo.at[0].set(w0_y).at[1].set(d23_y)
    w = st.w.at[0].set(w0y).at[1].set(w1y).at[2].set(w2y)
    pdf = st.pdf.at[0].set(p0y).at[1].set(p1y).at[2].set(p2y)
    w_em = st.w_em.at[1].set(em_y2).at[2].set(em_x3)
    w_em = w_em.at[3].set(st.w_em[3] * r3v)
    zero3 = jnp.zeros((n, 3), jnp.float32)
    w_env = st.w_env.at[1].set(zero3)
    w_env = w_env.at[2].set(st.w_env[2] * r2v)
    w_env = w_env.at[3].set(st.w_env[3] * r3v)
    prop = st._replace(v=v, v_delta=vd, wo=wo, w=w, pdf=pdf, w_em=w_em,
                       w_env=w_env, w_rest=st.w_rest * r3v)
    return prop, a


def _struct_mchain(st: PathRec, arr):
    """E-S-D-S-D pattern mask (positive-luminance states only):
    two separated single-bounce specular chains."""
    x1, x2, x3, x4 = (_vtx(st, 0), _vtx(st, 1), _vtx(st, 2), _vtx(st, 3))
    return x1.valid & st.v_delta[0] & _chain_delta_kind(arr, x1.mat_id) \
        & x2.valid & ~st.v_delta[1] \
        & x3.valid & st.v_delta[2] & _chain_delta_kind(arr, x3.mat_id) \
        & x4.valid & ~st.v_delta[3] & (_lum(traj_w(st)) > 0)


def _step_bidir2(ctx: _Ctx, st: PathRec, it):
    """Variable-length bidirectional mutation, length-2 class
    (mut_bidir.h samples variable-size replacement subpaths; the driver
    alternates this TWO-vertex regrow with _step_bidir's one-vertex
    class — each class is reversible within itself and the 50/50
    selection probability cancels in the acceptance ratio).

    BSDF-sample fresh directions at x1 AND at the newly landed y2,
    land y3, reconnect to the retained x4. The two sampled hops'
    proposal pdfs cancel against the canonical weights; the ratio
    carries the reconnection eval pdfs and Jacobians exactly as the
    one-vertex class does one index earlier."""
    scene, arr, kinds, n, idx = (ctx.scene, ctx.arr, ctx.kinds, ctx.n,
                                 ctx.idx)
    cfg = scene.config
    seed = ctx.seed
    l = _lum(traj_w(st))
    x1, x2, x3, x4 = _vtx(st, 0), _vtx(st, 1), _vtx(st, 2), _vtx(st, 3)
    struct = x1.valid & ~st.v_delta[0] & x2.valid & ~st.v_delta[1] \
        & x3.valid & ~st.v_delta[2] & x4.valid & (l > 0)

    # fresh BSDF direction at x1
    wi_cam = normalize(jnp.broadcast_to(ctx.cam_o, x1.p.shape) - x1.p)
    two = arr.materials.twosided[jnp.maximum(x1.mat_id, 0)]
    flip = two & (dot(x1.sh_n, wi_cam) < 0)
    nrm = jnp.where(flip[..., None], -x1.sh_n, x1.sh_n)
    tng = jnp.where(flip[..., None], -x1.sh_t, x1.sh_t)
    fr = Frame(s=x1.sh_s, t=tng, n=nrm)
    gm = mat.gather(arr.materials, arr.checkers, x1.mat_id, x1.uv)
    u_l = rng.uniform_1d(idx, jnp.uint32(seed + 44), it * 6)
    u2 = rng.uniform_2d(idx, jnp.uint32(seed + 45), it * 6 + 1)
    u2b = rng.uniform_2d(idx, jnp.uint32(seed + 46), it * 6 + 2)
    wo_l, w0y, p0y, is_d0, _ = mat.sample_mix(
        kinds, arr.materials, arr.checkers, x1.mat_id, x1.uv, gm,
        fr.to_local(wi_cam), u_l, u2, u2b, arr.hair_tables)
    w0_y = fr.to_world(wo_l)
    w0y = _san(w0y)
    ok = struct & ~is_d0 & (p0y > 0) & (jnp.max(jnp.abs(w0y), -1) > 0)

    o1 = _offset_ray(x1.p, x1.geo_n, w0_y, cfg.ray_eps)
    r1 = Ray(o=o1, d=w0_y, mint=jnp.zeros(n),
             maxt=jnp.where(ok, jnp.inf, 0.0))
    h2y = _intersect(ctx, r1)
    ok = ok & h2y.valid
    y2 = _hit_to_vertex(h2y, ok)

    # fresh BSDF direction at y2
    gm2 = mat.gather(arr.materials, arr.checkers, y2.mat_id, y2.uv)
    fr2 = Frame(s=y2.sh_s, t=y2.sh_t, n=y2.sh_n)
    u_l2 = rng.uniform_1d(idx, jnp.uint32(seed + 47), it * 6 + 3)
    u22 = rng.uniform_2d(idx, jnp.uint32(seed + 48), it * 6 + 4)
    u22b = rng.uniform_2d(idx, jnp.uint32(seed + 49), it * 6 + 5)
    wo_l2, w1y, p1y_s, is_d1, _ = mat.sample_mix(
        kinds, arr.materials, arr.checkers, y2.mat_id, y2.uv, gm2,
        fr2.to_local(-w0_y), u_l2, u22, u22b, arr.hair_tables)
    w1_y = fr2.to_world(wo_l2)
    w1y = _san(w1y)
    ok = ok & ~is_d1 & (p1y_s > 0) & (jnp.max(jnp.abs(w1y), -1) > 0)

    o2 = _offset_ray(y2.p, y2.geo_n, w1_y, cfg.ray_eps)
    r2 = Ray(o=o2, d=w1_y, mint=jnp.zeros(n),
             maxt=jnp.where(ok, jnp.inf, 0.0))
    h3y = _intersect(ctx, r2)
    ok = ok & h3y.valid
    y3 = _hit_to_vertex(h3y, ok)

    # reconnect y3 -> x4
    seg = x4.p - y3.p
    dist = jnp.linalg.norm(seg, axis=-1)
    d34_y = seg / jnp.maximum(dist, 1e-12)[..., None]
    occ = _shadow(ctx, y3.p, y3.geo_n, x4.p, ok)
    ok = ok & ~occ
    f2y, p2y = _eval_bsdf(arr, kinds, y3, -w1_y, d34_y)
    w2y = _san(f2y / jnp.maximum(p2y, 1e-20)[..., None])
    j_y = jnp.abs(dot(d34_y, x4.geo_n)) / jnp.maximum(dist * dist,
                                                      1e-12)
    d34_x = normalize(x4.p - x3.p)
    dist_x = jnp.linalg.norm(x4.p - x3.p, axis=-1)
    j_x = jnp.abs(dot(d34_x, x4.geo_n)) / jnp.maximum(dist_x * dist_x,
                                                      1e-12)
    # x4's decision re-evaluated under the changed incoming direction
    f3y, p3y = _eval_bsdf(arr, kinds, x4, -d34_y, st.wo[3])
    w3y = _san(f3y / jnp.maximum(p3y, 1e-20)[..., None])
    ok = ok & (p2y > 0) & (p3y > 1e-12) & (st.pdf[2] > 1e-12) \
        & (st.pdf[3] > 1e-12) & (j_y > 1e-16) & (j_x > 1e-16)

    em_y2 = _emitted(arr, y2, -w0_y) * w0y
    em_y3 = _emitted(arr, y3, -w1_y) * w0y * w1y
    em_x4 = _emitted(arr, x4, -d34_y) * w0y * w1y * w2y
    tp_new = w0y * w1y * w2y * w3y
    tp_old = st.w[0] * st.w[1] * st.w[2] * st.w[3]
    r4v = _safe_ratio(tp_new, tp_old)
    r3v = _safe_ratio(w0y * w1y * w2y, st.w[0] * st.w[1] * st.w[2])
    w_y = st.w_em[0] + em_y2 + em_y3 + em_x4 \
        + st.w_env[3] * r3v + st.w_rest * r4v
    w_y = jnp.where(ok[..., None], w_y, 0.0)
    l_y = _lum(w_y)

    num = l_y * p2y * j_y * p3y
    den = l * st.pdf[2] * j_x * st.pdf[3]
    a = jnp.where(ok, jnp.clip(_san(num / jnp.maximum(den, 1e-24)),
                               0.0, 1.0), 0.0)

    v = _set_vtx(st.v, 1, y2)
    v = _set_vtx(v, 2, y3)
    vd = st.v_delta.at[1].set(jnp.zeros((n,), bool))
    vd = vd.at[2].set(jnp.zeros((n,), bool))
    wo = st.wo.at[0].set(w0_y).at[1].set(w1_y).at[2].set(d34_y)
    w = st.w.at[0].set(w0y).at[1].set(w1y).at[2].set(w2y).at[3].set(w3y)
    pdf = st.pdf.at[0].set(p0y).at[1].set(p1y_s).at[2].set(p2y) \
        .at[3].set(p3y)
    w_em = st.w_em.at[1].set(em_y2).at[2].set(em_y3).at[3].set(em_x4)
    zero3 = jnp.zeros((n, 3), jnp.float32)
    w_env = st.w_env.at[1].set(zero3).at[2].set(zero3)
    w_env = w_env.at[3].set(st.w_env[3] * r3v)
    prop = st._replace(v=v, v_delta=vd, wo=wo, w=w, pdf=pdf, w_em=w_em,
                       w_env=w_env, w_rest=st.w_rest * r4v)
    return prop, a


def _step_mchain(ctx: _Ctx, st: PathRec, it):
    """Veach multi-chain perturbation (mut_mchain.h) scoped to the
    stored-vertex window: pattern E-S-D-S-D. The pixel is perturbed, the
    first specular chain re-traced (retained delta branch), the retained
    OUTGOING DIRECTION at the middle diffuse vertex is copied to cross
    the second specular chain (again with the retained branch), and the
    final diffuse vertex re-attaches to the retained deep suffix.

    The retained coordinates (pixel, ω at the middle vertex, delta
    branches) coincide with the forward path-tracing parameterization,
    so — unlike the caustic/manifold moves — no chain-map Jacobian is
    needed: the acceptance is the luminance ratio times the re-evaluated
    decision densities."""
    scene, arr, kinds, n, idx = (ctx.scene, ctx.arr, ctx.kinds, ctx.n,
                                 ctx.idx)
    cfg = scene.config
    W, H = cfg.width, cfg.height
    seed = ctx.seed
    l = _lum(traj_w(st))
    struct = _struct_mchain(st, arr)

    # gaussian pixel move (symmetric proposal, like the lens kernel)
    g = rng.uniform_2d(idx, jnp.uint32(seed + 61), it * 2)
    g2 = rng.uniform_2d(idx, jnp.uint32(seed + 62), it * 2)
    gauss = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(g[:, :1], 1e-12))) \
        * jnp.concatenate([jnp.cos(2 * jnp.pi * g2[:, :1]),
                           jnp.sin(2 * jnp.pi * g2[:, :1])], 1)
    pix_y = st.pix + gauss * (ctx.lens_sigma * W)
    in_film = (pix_y[:, 0] >= 0) & (pix_y[:, 0] < W) \
        & (pix_y[:, 1] >= 0) & (pix_y[:, 1] < H)
    ray_y = sensors.sample_ray(scene.camera, pix_y, None)
    h1 = _intersect(ctx, ray_y._replace(
        maxt=jnp.where(struct & in_film, ray_y.maxt, 0.0)))
    ok = struct & in_film & h1.valid & _chain_delta_kind(arr, h1.mat_id)
    y1 = _hit_to_vertex(h1, ok)

    # chain 1: delta bounce with the retained branch
    wo0, w0y, pc0y = _delta_bounce(arr, kinds, y1, -ray_y.d,
                                   st.v_choice[0])
    o1 = _offset_ray(y1.p, y1.geo_n, wo0, cfg.ray_eps)
    h2 = _intersect(ctx, Ray(o=o1, d=wo0, mint=jnp.zeros(n),
                             maxt=jnp.where(ok, jnp.inf, 0.0)))
    ok = ok & h2.valid & ~_chain_delta_kind(arr, h2.mat_id)
    y2 = _hit_to_vertex(h2, ok)

    # middle diffuse vertex: copy the retained outgoing direction
    d2 = st.wo[1]
    f2y, p2y = _eval_bsdf(arr, kinds, y2, -wo0, d2)
    w1y = _san(f2y / jnp.maximum(p2y, 1e-20)[..., None])
    o2 = _offset_ray(y2.p, y2.geo_n, d2, cfg.ray_eps)
    h3 = _intersect(ctx, Ray(o=o2, d=d2, mint=jnp.zeros(n),
                             maxt=jnp.where(ok, jnp.inf, 0.0)))
    ok = ok & h3.valid & _chain_delta_kind(arr, h3.mat_id)
    y3 = _hit_to_vertex(h3, ok)

    # chain 2: delta bounce with the retained branch
    wo3, w2y, pc2y = _delta_bounce(arr, kinds, y3, -d2, st.v_choice[2])
    o3 = _offset_ray(y3.p, y3.geo_n, wo3, cfg.ray_eps)
    h4 = _intersect(ctx, Ray(o=o3, d=wo3, mint=jnp.zeros(n),
                             maxt=jnp.where(ok, jnp.inf, 0.0)))
    ok = ok & h4.valid & ~_chain_delta_kind(arr, h4.mat_id)
    y4 = _hit_to_vertex(h4, ok)

    # final diffuse vertex re-attaches to the retained suffix direction
    f4y, p4y = _eval_bsdf(arr, kinds, y4, -wo3, st.wo[3])
    w3y = _san(f4y / jnp.maximum(p4y, 1e-20)[..., None])
    ok = ok & (pc0y > 0) & (p2y > 1e-12) & (pc2y > 0) & (p4y > 1e-12) \
        & (st.pdf[0] > 1e-12) & (st.pdf[1] > 1e-12) \
        & (st.pdf[2] > 1e-12) & (st.pdf[3] > 1e-12)

    em_y1 = _emitted(arr, y1, -ray_y.d)
    em_y2 = _emitted(arr, y2, -wo0) * w0y
    em_y3 = _emitted(arr, y3, -d2) * w0y * w1y
    em_y4 = _emitted(arr, y4, -wo3) * w0y * w1y * w2y
    r4 = _safe_ratio(w0y * w1y * w2y * w3y,
                     st.w[0] * st.w[1] * st.w[2] * st.w[3])
    w_y = em_y1 + em_y2 + em_y3 + em_y4 + st.w_rest * r4
    w_y = jnp.where(ok[..., None], w_y, 0.0)
    l_y = _lum(w_y)

    num = l_y * pc0y * p2y * pc2y * p4y
    den = l * st.pdf[0] * st.pdf[1] * st.pdf[2] * st.pdf[3]
    a = jnp.where(ok, jnp.clip(_san(num / jnp.maximum(den, 1e-24)),
                               0.0, 1.0), 0.0)

    v = st.v
    for k, yk in enumerate((y1, y2, y3, y4)):
        v = _set_vtx(v, k, yk)
    vd = st.v_delta.at[0].set(jnp.ones((n,), bool))
    vd = vd.at[1].set(jnp.zeros((n,), bool))
    vd = vd.at[2].set(jnp.ones((n,), bool))
    vd = vd.at[3].set(jnp.zeros((n,), bool))
    wo = st.wo.at[0].set(wo0).at[1].set(d2).at[2].set(wo3)
    w = st.w.at[0].set(w0y).at[1].set(w1y).at[2].set(w2y).at[3].set(w3y)
    pdf = st.pdf.at[0].set(pc0y).at[1].set(p2y).at[2].set(pc2y) \
        .at[3].set(p4y)
    w_em = st.w_em.at[0].set(em_y1).at[1].set(em_y2).at[2].set(em_y3) \
        .at[3].set(em_y4)
    zero3 = jnp.zeros((n, 3), jnp.float32)
    w_env = st.w_env
    for k in range(K):
        w_env = w_env.at[k].set(zero3)
    prop = st._replace(pix=pix_y, v=v, v_delta=vd, wo=wo, w=w, pdf=pdf,
                       w_em=w_em, w_env=w_env, w_rest=st.w_rest * r4)
    return prop, a


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def render_mlt(scene: Scene, n_chains: int = 1 << 14,
               n_mutations: int = 64, p_large: float = 0.3,
               lens_sigma: float = 0.03, seed: int = 0,
               n_boot: int = 16,
               mutations=("lens", "caustic", "manifold", "bidir",
                          "mchain")):
    """Path-space MLT render with the full mutation set.

    n_mutations counts Metropolis steps per chain across ALL mutation
    phases; the schedule interleaves lens(+large-step) rounds with the
    structure-specific perturbations listed in `mutations` (phases whose
    pattern never matches a scene simply reject and re-splat the current
    state, so they are safe to leave enabled)."""
    cfg = scene.config
    fl = scene.film
    kinds = scene.active_kinds
    n = n_chains
    arr = scene.arrays
    idx = jnp.arange(n, dtype=jnp.uint32)
    W, H = cfg.width, cfg.height
    ctx = _Ctx(scene=scene, arr=arr, kinds=kinds, n=n, idx=idx,
               cam_o=scene.camera.to_world[:3, 3], seed=seed,
               lens_sigma=lens_sigma)

    # schedule: each round = 1 step per enabled phase, lens always on
    phases = ["lens"] + [m for m in ("caustic", "manifold", "bidir",
                                     "mchain")
                         if m in mutations]
    steps_per_round = len(phases)
    n_rounds = max(n_mutations // steps_per_round, 1)
    total_steps = n_rounds * steps_per_round

    @jax.jit
    def run(arr):
        ctx2 = ctx._replace(arr=arr)
        idx_pool = jnp.arange(n * n_boot, dtype=jnp.uint32)
        u = rng.uniform_2d(idx_pool, jnp.uint32(seed * 7919 + 5), 0)
        pool_pix = jnp.stack([u[:, 0] * W, u[:, 1] * H], -1)
        pool = _record_path(scene, arr, pool_pix,
                            jnp.uint32(seed * 131 + 1))
        l_pool = _lum(traj_w(pool))
        b = jnp.mean(l_pool)
        cdf = jnp.cumsum(l_pool) / jnp.maximum(jnp.sum(l_pool), 1e-20)
        pick = jnp.clip(jnp.searchsorted(
            cdf, rng.uniform_1d(idx, jnp.uint32(seed + 9), 0)), 0,
            n * n_boot - 1)
        st = _lane_gather(pool, pick)
        splat = jnp.zeros((H, W, 3), jnp.float32)

        def mh_step(st, splat, prop, a, it, salt):
            """Shared accept/reject + Kelemen splats of both states."""
            w_x = traj_w(st)
            l = _lum(w_x)
            w_cur = jnp.where(l > 1e-12,
                              (1.0 - a) / jnp.maximum(l, 1e-12), 0.0)
            splat = film_mod.splat_add_only(fl, st.pix,
                                            w_x * w_cur[:, None], splat)
            w_p = traj_w(prop)
            l_p = _lum(w_p)
            wp = jnp.where(l_p > 1e-12, a / jnp.maximum(l_p, 1e-12), 0.0)
            splat = film_mod.splat_add_only(fl, prop.pix,
                                            w_p * wp[:, None], splat)
            acc = rng.uniform_1d(idx, salt, it) < a
            return _lane_select(acc, prop, st), splat

        def round_body(carry, r):
            st, splat = carry
            for ph_i, ph in enumerate(phases):
                it = r * steps_per_round + ph_i
                itu = it.astype(jnp.uint32)
                if ph == "lens":
                    prop, a = _step_lens(ctx2, st, itu, p_large)
                elif ph == "caustic":
                    prop, a = _step_caustic(ctx2, st, itu)
                elif ph == "manifold":
                    prop, a = _step_manifold(ctx2, st, itu)
                elif ph == "mchain":
                    prop, a = _step_mchain(ctx2, st, itu)
                else:
                    # variable-length bidirectional mutation: alternate
                    # the one-vertex and two-vertex regrow classes
                    # (mut_bidir.h's variable subpath sizes; each class
                    # is reversible and the deterministic alternation
                    # keeps detailed balance per class)
                    prop, a = jax.lax.cond(
                        (r % 2) == 1,
                        lambda: _step_bidir2(ctx2, st, itu),
                        lambda: _step_bidir(ctx2, st, itu))
                st, splat = mh_step(st, splat, prop, a, itu,
                                    jnp.uint32(seed + 4 + 13 * ph_i))
            return (st, splat), None

        (st, splat), _ = jax.lax.scan(
            round_body, (st, splat),
            jnp.arange(n_rounds, dtype=jnp.int32))
        scale = b * (W * H) / (n * total_steps)
        return splat * scale, b

    splat, b = run(arr)
    return jnp.asarray(splat)
