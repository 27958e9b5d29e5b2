"""Path-space Metropolis light transport.

Capability counterpart of the reference `mlt` plugin
(src/integrators/mlt/*, libbidir mutators): Markov chains over light
TRANSPORT TRAJECTORIES (not primary samples like pssmlt), mixing two
mutations:

  * LENS PERTURBATION (mut_lens.h): propose a nearby image point, re-trace
    the first vertex y1, and reattach the UNCHANGED remainder of the
    trajectory. The retained coordinates are either the second surface
    vertex x2 (world space) or — when the first bounce escaped — the
    bounce direction ω1. All factors beyond the first segment are reused
    through three stored buckets (see below), so the acceptance is a
    purely LOCAL ratio.
  * LARGE STEP: an independent fresh trajectory from the unidirectional
    path tracer; acceptance min(1, lum W_y / lum W_x) — this makes the
    lens-only kernel ergodic (Kelemen et al. 2002).

State & target. A state is a full camera trajectory with its PT sample
value W = Σ_prefix f/p (all emission events collected along the way,
exactly matching the path tracer's transport). The chain targets
π̃ ∝ lum(W)·q (the pushforward of value×density), under which
  - large step:  a = lum(W_y)/lum(W_x)
  - lens step:   a = [lum(W_y)·pdf_y1·J_y] / [lum(W_x)·pdf_x1·J_x]
    with J the solid-angle→retained-coordinate Jacobian (cosθ/d² towards
    a retained x2; 1 for a retained direction), and
      W_y = Le(y1) + rw1·(w_em2 + rw2·w_rest)          (x2 retained)
      W_y = Le(y1) + rw1'·w_env1                        (ω1 retained)
    where rw1 = (f·cos/pdf at y1)/(same at x1) and rw2 = the x2 BSDF
    value ratio under the changed incoming direction.
The splat weight rgb(W)/lum(W) and the normalization b = E[lum W] are the
standard Kelemen machinery (shared shape with integrators/pssmlt.py).

Not implemented from the reference's mutation set: bidirectional,
caustic, multi-chain and manifold perturbations (the manifold walk itself
lives in integrators/manifold.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng
from ..core.math import Ray, Frame, dot, normalize
from ..film import film as film_mod
from ..models import sensors
from ..models.bsdf import registry as mat
from ..scene.scene import Scene
from .common import scene_intersect, scene_occluded, frame
from .path import _env_radiance, _swept_params

LUM = np.array([0.212671, 0.715160, 0.072169], np.float32)


def _lum(c):
    return c @ jnp.asarray(LUM)


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


class TrajRec(NamedTuple):
    pix: jnp.ndarray      # [N, 2] continuous film position
    x1: VertexRec
    x2: VertexRec
    wo1: jnp.ndarray      # [N, 3] sampled world direction at x1 (= dir to
    #                       x2 when x2 is valid; the retained coordinate
    #                       when the first bounce escaped)
    wo2: jnp.ndarray      # [N, 3] sampled world direction at x2
    w_direct: jnp.ndarray  # [N, 3] emission at x1 / env at the first miss
    w_em2: jnp.ndarray     # [N, 3] emission at x2 (through x1's BSDF)
    w_env1: jnp.ndarray    # [N, 3] env after the first bounce (no x2)
    w_rest: jnp.ndarray    # [N, 3] everything beyond x2 (through its BSDF)


def traj_w(t: TrajRec):
    return t.w_direct + t.w_em2 + t.w_env1 + t.w_rest


def _eval_bsdf(arr, kinds, v: VertexRec, wi_world, wo_world):
    """BSDF eval·cos + pdf at a stored vertex, twosided-aware."""
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


def _emitted(arr, v: VertexRec, towards):
    """One-sided Le of an area emitter at a vertex, towards `towards`."""
    if arr.area is None:
        return jnp.zeros(v.p.shape, jnp.float32)
    le = arr.area.radiance[jnp.maximum(v.em_id, 0)]
    on = (v.em_id >= 0) & (dot(v.geo_n, towards) > 0) & v.valid
    return jnp.where(on[..., None], le, 0.0)


def _record_path(scene: Scene, arr, pix_pos, salt) -> TrajRec:
    """Unidirectional path trace (BSDF sampling only, no NEE; emission
    collected at EVERY hit exactly like the forward path tracer) that
    records the first two vertices and the emission buckets."""
    cfg = scene.config
    kinds = scene.active_kinds
    n = pix_pos.shape[0]
    idx = jnp.arange(n, dtype=jnp.uint32)
    ray = sensors.sample_ray(scene.camera, pix_pos, None)
    d_max = min(cfg.max_depth, 8)

    def body(carry, b):
        o, d, tp, alive, w_em, w_env = carry
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
        tp2 = tp * jnp.where(alive2[..., None], w, 1.0)
        alive3 = alive2 & (jnp.max(jnp.abs(w), -1) > 0)
        o2 = hit.p + geo_n * jnp.where(dot(wo_world, geo_n) > 0,
                                       cfg.ray_eps,
                                       -cfg.ray_eps)[..., None]
        ok_v = (alive & hit.valid)[..., None]
        rec = VertexRec(p=jnp.where(ok_v, hit.p, 0.0),
                        geo_n=jnp.where(ok_v, hit.geo_n, 0.0),
                        sh_n=jnp.where(ok_v, hit.sh_n, 0.0),
                        sh_s=jnp.where(ok_v, hit.sh_s, 0.0),
                        sh_t=jnp.where(ok_v, hit.sh_t, 0.0),
                        mat_id=hit.mat_id, uv=hit.uv,
                        valid=alive & hit.valid,
                        em_id=jnp.where(em_hit, hit.emitter_id, -1))
        return (o2, wo_world, tp2, alive3, w_em + w_em_b,
                w_env + w_env_b), (rec, wo_world, w_em_b, w_env_b)

    carry = (ray.o, ray.d, jnp.ones((n, 3), jnp.float32),
             jnp.ones((n,), bool), jnp.zeros((n, 3), jnp.float32),
             jnp.zeros((n, 3), jnp.float32))
    carry, (recs, wos, w_em_s, w_env_s) = jax.lax.scan(
        body, carry, jnp.arange(d_max, dtype=jnp.int32))
    x1 = jax.tree.map(lambda a: a[0], recs)
    x2 = jax.tree.map(lambda a: a[1], recs)
    total_em = carry[4]
    total_env = carry[5]
    # bucket split: direct = em at x1 + env at first miss; em2 = em at x2;
    # env1 = env at the second segment (no x2); rest = all deeper terms
    w_direct = w_em_s[0] + w_env_s[0]
    w_em2 = w_em_s[1]
    w_env1 = w_env_s[1]
    w_rest = total_em + total_env - w_direct - w_em2 - w_env1
    san = lambda a: jnp.nan_to_num(a, nan=0.0, posinf=0.0, neginf=0.0)
    return TrajRec(pix=pix_pos, x1=x1, x2=x2, wo1=wos[0], wo2=wos[1],
                   w_direct=san(w_direct), w_em2=san(w_em2),
                   w_env1=san(w_env1), w_rest=san(w_rest))


def render_mlt(scene: Scene, n_chains: int = 1 << 14,
               n_mutations: int = 64, p_large: float = 0.3,
               lens_sigma: float = 0.03, seed: int = 0,
               n_boot: int = 16):
    """Path-space MLT render (lens perturbation + large steps).
    lens_sigma: image-plane perturbation scale, fraction of the width;
    n_boot: ×n_chains trajectories in the b-normalization pool."""
    cfg = scene.config
    fl = scene.film
    kinds = scene.active_kinds
    n = n_chains
    arr = scene.arrays
    idx = jnp.arange(n, dtype=jnp.uint32)
    W, H = cfg.width, cfg.height
    cam_o = scene.camera.to_world[:3, 3]

    def fresh_pix(salt):
        u = rng.uniform_2d(idx, jnp.uint32(seed * 7919) + salt, 0)
        return jnp.stack([u[:, 0] * W, u[:, 1] * H], -1)

    def first_factor(x1: VertexRec, wo_world):
        """(f·cos, pdf) of the first bounce at a (possibly re-traced)
        first vertex."""
        wi_cam = normalize(jnp.broadcast_to(cam_o, x1.p.shape) - x1.p)
        return _eval_bsdf(arr, kinds, x1, wi_cam, wo_world)

    @jax.jit
    def run(arr):
        pools = [_record_path(scene, arr,
                              fresh_pix(jnp.uint32(1 + 7 * j)),
                              jnp.uint32(seed * 131 + 1 + j))
                 for j in range(n_boot)]
        pool = jax.tree.map(lambda *a: jnp.concatenate(a), *pools)
        l_pool = _lum(traj_w(pool))
        b = jnp.mean(l_pool)
        cdf = jnp.cumsum(l_pool) / jnp.maximum(jnp.sum(l_pool), 1e-20)
        pick = jnp.clip(jnp.searchsorted(
            cdf, rng.uniform_1d(idx, jnp.uint32(seed + 9), 0)), 0,
            n * n_boot - 1)
        st = jax.tree.map(lambda a: a[pick], pool)
        splat = jnp.zeros((H, W, 3), jnp.float32)

        def step(carry, it):
            st, splat = carry
            w_x = traj_w(st)
            l = _lum(w_x)
            is_large = rng.uniform_1d(idx, jnp.uint32(seed + 3),
                                      it) < p_large

            # ---- large step ----
            prop_l = _record_path(scene, arr,
                                  fresh_pix(it * jnp.uint32(2654435761)
                                            + jnp.uint32(17)),
                                  jnp.uint32(seed * 131) + it * 977 + 3)
            l_large = _lum(traj_w(prop_l))
            a_large = jnp.clip(l_large / jnp.maximum(l, 1e-12), 0.0, 1.0)
            a_large = jnp.where(l <= 0, 1.0, a_large)

            # ---- lens perturbation ----
            g = rng.uniform_2d(idx, jnp.uint32(seed + 5), it * 2)
            g2 = rng.uniform_2d(idx, jnp.uint32(seed + 6), it * 2)
            gauss = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(g[:, :1],
                                                        1e-12))) \
                * jnp.concatenate([jnp.cos(2 * jnp.pi * g2[:, :1]),
                                   jnp.sin(2 * jnp.pi * g2[:, :1])], 1)
            pix_y = st.pix + gauss * (lens_sigma * W)
            in_film = (pix_y[:, 0] >= 0) & (pix_y[:, 0] < W) \
                & (pix_y[:, 1] >= 0) & (pix_y[:, 1] < H)
            ray_y = sensors.sample_ray(scene.camera, pix_y, None)
            hit_y = scene_intersect(arr, ray_y, cfg.traversal, cfg.block,
                                    _swept_params(cfg), sort_rays=True)
            y_ok = hit_y.valid & in_film
            y1 = VertexRec(
                p=jnp.where(y_ok[..., None], hit_y.p, 0.0),
                geo_n=jnp.where(y_ok[..., None], hit_y.geo_n, 0.0),
                sh_n=jnp.where(y_ok[..., None], hit_y.sh_n, 0.0),
                sh_s=jnp.where(y_ok[..., None], hit_y.sh_s, 0.0),
                sh_t=jnp.where(y_ok[..., None], hit_y.sh_t, 0.0),
                mat_id=hit_y.mat_id, uv=hit_y.uv, valid=y_ok,
                em_id=jnp.where(y_ok & (hit_y.emitter_id >= 0),
                                hit_y.emitter_id, -1))
            has_x2 = st.x2.valid
            eligible = st.x1.valid & y_ok & (l > 0) \
                & (has_x2 | (_lum(st.w_env1) > 0))

            # retained coordinate: x2 (world) or ω1 (direction)
            seg = st.x2.p - y1.p
            dist = jnp.linalg.norm(seg, axis=-1)
            d_y = jnp.where(has_x2[..., None],
                            seg / jnp.maximum(dist, 1e-12)[..., None],
                            st.wo1)
            seg_x = st.x2.p - st.x1.p
            dist_x = jnp.linalg.norm(seg_x, axis=-1)
            d_x = jnp.where(has_x2[..., None],
                            seg_x / jnp.maximum(dist_x,
                                                1e-12)[..., None],
                            st.wo1)
            f1y, p1y = first_factor(y1, d_y)
            f1x, p1x = first_factor(st.x1, d_x)
            # Jacobian solid-angle → retained x2 area (1 for direction)
            j_y = jnp.where(has_x2, jnp.abs(dot(d_y, st.x2.geo_n))
                            / jnp.maximum(dist * dist, 1e-12), 1.0)
            j_x = jnp.where(has_x2, jnp.abs(dot(d_x, st.x2.geo_n))
                            / jnp.maximum(dist_x * dist_x, 1e-12), 1.0)
            # visibility y1 ↔ x2 (only for retained-x2 states)
            off = y1.geo_n * jnp.where(dot(d_y, y1.geo_n) > 0,
                                       cfg.ray_eps,
                                       -cfg.ray_eps)[..., None]
            sh = Ray(o=y1.p + off, d=d_y, mint=jnp.zeros(n),
                     maxt=jnp.where(eligible & has_x2,
                                    dist - 2 * cfg.ray_eps, 0.0))
            occ = scene_occluded(arr, sh, cfg.traversal, cfg.block,
                                 _swept_params(cfg), sort_rays=True)
            ok = eligible & ~(has_x2 & occ) & (p1y > 0) & (p1x > 0) \
                & (_lum(f1x) > 1e-18) & (j_x > 1e-18)

            rw1 = jnp.where(
                ok[..., None],
                (f1y / jnp.maximum(p1y, 1e-20)[..., None])
                / jnp.maximum(f1x / jnp.maximum(p1x, 1e-20)[..., None],
                              1e-20), 0.0)
            rw1 = jnp.nan_to_num(rw1, nan=0.0, posinf=0.0)
            # x2's sampling weight ratio under the changed incoming
            # direction: W's deeper terms carry f2/p2, and the trajectory
            # density q carries p2 — both re-evaluated at the new wi
            f2y, p2y = _eval_bsdf(arr, kinds, st.x2, -d_y, st.wo2)
            f2x, p2x = _eval_bsdf(arr, kinds, st.x2, -d_x, st.wo2)
            # the ω2 decision exists whenever x2 exists — its density is
            # part of q for EVERY retained-x2 state (gating it on
            # w_rest > 0 breaks balance for bounce→emitter states)
            ok = ok & (~has_x2 | ((p2x > 1e-12) & (p2y > 1e-12)))
            rw2 = jnp.where(
                (ok & has_x2)[..., None] & (_lum(f2x) > 1e-18)[..., None],
                (f2y / jnp.maximum(p2y, 1e-20)[..., None])
                / jnp.maximum(f2x / jnp.maximum(p2x,
                                                1e-20)[..., None],
                              1e-20), 0.0)
            rw2 = jnp.nan_to_num(rw2, nan=0.0, posinf=0.0)
            q2_ratio = jnp.where(ok & has_x2,
                                 p2y / jnp.maximum(p2x, 1e-12), 1.0)

            em_y1 = _emitted(arr, y1, -ray_y.d)
            w_y = em_y1 + jnp.where(
                has_x2[..., None],
                rw1 * (st.w_em2 + rw2 * st.w_rest),
                rw1 * st.w_env1)
            w_y = jnp.where(ok[..., None], w_y, 0.0)
            l_y = _lum(w_y)
            a_lens = jnp.clip(
                l_y * p1y * j_y * q2_ratio
                / jnp.maximum(l * p1x * j_x, 1e-20),
                0.0, 1.0)
            a_lens = jnp.where(ok, a_lens, 0.0)

            a = jnp.where(is_large, a_large, a_lens)
            l_prop = jnp.where(is_large, l_large, l_y)

            # Kelemen-weighted splats of both states
            w_cur = jnp.where(l > 1e-12, (1.0 - a) / jnp.maximum(l, 1e-12),
                              0.0)
            splat = film_mod.splat_add_only(fl, st.pix,
                                            w_x * w_cur[:, None], splat)
            prop_pix = jnp.where(is_large[:, None], prop_l.pix, pix_y)
            prop_rgb = jnp.where(is_large[:, None], traj_w(prop_l), w_y)
            w_p = jnp.where(l_prop > 1e-12,
                            a / jnp.maximum(l_prop, 1e-12), 0.0)
            splat = film_mod.splat_add_only(fl, prop_pix,
                                            prop_rgb * w_p[:, None],
                                            splat)

            acc = rng.uniform_1d(idx, jnp.uint32(seed + 4), it) < a

            def sel(large_v, lens_v, cur_v):
                pv = jnp.where(
                    is_large.reshape((n,) + (1,) * (large_v.ndim - 1)),
                    large_v, lens_v)
                return jnp.where(
                    acc.reshape((n,) + (1,) * (large_v.ndim - 1)),
                    pv, cur_v)

            lens_state = st._replace(
                pix=pix_y, x1=y1, wo1=d_y,
                w_direct=em_y1,
                w_em2=jnp.where(has_x2[..., None], rw1 * st.w_em2, 0.0),
                w_env1=jnp.where(has_x2[..., None], 0.0,
                                 rw1 * st.w_env1),
                w_rest=jnp.where(has_x2[..., None],
                                 rw1 * rw2 * st.w_rest, 0.0))
            st2 = jax.tree.map(sel, prop_l, lens_state, st)
            return (st2, splat), None

        (st, splat), _ = jax.lax.scan(
            step, (st, splat), jnp.arange(n_mutations, dtype=jnp.uint32))
        scale = b * (W * H) / (n * n_mutations)
        return splat * scale, b

    splat, b = run(arr)
    return jnp.asarray(splat)
