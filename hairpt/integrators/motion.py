"""Motion-vector AOV integrator.

Counterpart of the reference's `motion` plugin
(src/integrators/misc/motion.cpp): for every pixel it finds the primary
hit point at the frame time, advances that point to the target time with
the hit object's rigid animation, and reprojects it through the sensor at
the target time. Channel semantics follow the reference exactly
(motion.cpp plugin docs):

  R, G — screen-space motion in 2D *pixel* coordinates
  B    — change in distance from the observed 3D point to the camera
  untrackable pixels (no primary hit) → +inf

Path configurations (the reference's ``config`` string parameter,
motion.cpp: d / rd / ttd / trtd / trrtd ...):
  "d"   — motion of primary non-specular hit points (default)
  "rd"  — a non-specular point seen through ONE mirror reflection
  "ttd" — seen through a pair of refractions (through a glass object)
  "trtd"/"trrtd"/... — arbitrary delta chains: each config char names
          the delta branch (r = reflection, t = transmission) followed
          from the camera; the diffuse endpoint is advanced by its
          object's motion and EVERY chain vertex is re-solved with
          Gauss-Seidel sweeps of the batched manifold walk
          (integrators/manifold.py) — the reference's use of
          SpecularManifold in motion.cpp. Specular geometry is treated
          as static; hair segments are treated as static.

TPU design notes: one jitted wave over all pixels; the per-hit motion
matrix is a [4,4] gather from a tiny per-object table (O(#shapes) rows in
VMEM), so the whole pass is camera-ray intersection + a handful of FLOPs.
No filter splatting — motion vectors are point samples at pixel centers
(filtering across objects would average unrelated motions), matching the
reference's practice of rendering this AOV at 1 spp with a box filter.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.rng import next_2d
from ..models import sensors
from ..scene.scene import Scene
from .common import scene_intersect
from .aux_integrators import _swept_params


def _advance(motion, hit):
    """p1 = M_obj · p (identity for hair / objects without animation)."""
    if motion is None or motion.tri_obj is None:
        return hit.p
    obj = motion.tri_obj[jnp.maximum(hit.prim, 0)]
    m = motion.obj_m[jnp.where(hit.is_hair, 0, obj)]
    moved = jnp.einsum('nij,nj->ni', m[:, :3, :3], hit.p) + m[:, :3, 3]
    return jnp.where(hit.is_hair[..., None], hit.p, moved)


def render_motion(scene: Scene, spp: int = 1, config: str | None = None):
    """Returns an [H, W, 3] float32 image of (dx_px, dy_px, d_dist)."""
    from ..core.math import dot, Ray, normalize
    from ..models.bsdf import registry as mat

    cfg = scene.config
    config = config or getattr(cfg, "motion_config", "d")
    cam0 = scene.camera
    mt = scene.motion
    cam1 = mt.cam1 if mt is not None else cam0
    n_pix = cfg.width * cfg.height

    @jax.jit
    def wave(arrs, motion, acc, cnt, sample_id):
        pixel_idx = jnp.arange(n_pix, dtype=jnp.uint32)
        px = (pixel_idx % cfg.width).astype(jnp.float32)
        py = (pixel_idx // cfg.width).astype(jnp.float32)
        if spp > 1:
            sample_idx = jnp.full((n_pix,), sample_id, jnp.uint32)
            jit2 = next_2d(cfg.sampler, pixel_idx, sample_idx, 0)
        else:
            jit2 = jnp.full((n_pix, 2), 0.5, jnp.float32)
        pos0 = jnp.stack([px + jit2[..., 0], py + jit2[..., 1]], -1)
        ray = sensors.sample_ray(cam0, pos0, None)
        hit = scene_intersect(arrs, ray, cfg.traversal, cfg.block,
                              _swept_params(cfg))

        if config != "d":
            # specular chain config ('rd', 'ttd', 'trtd', 'trrtd', ...):
            # follow the chain of delta events named by the config chars
            # (r = reflection branch, t = transmission branch), advance
            # the diffuse endpoint, then solve for the t1 image point
            # that sees the advanced endpoint through the SAME delta
            # chain — the reference's use of SpecularManifold
            # (motion.cpp). TPU formulation: 2-D Newton directly on the
            # image position, retracing the whole chain per probe (the
            # chain map is deterministic); this converges quadratically
            # where per-vertex Gauss-Seidel relaxation contracts only
            # geometrically (~0.77/sweep for a thin slab).
            from .mlt import _delta_bounce, _hit_to_vertex
            from ..core.math import coordinate_system
            chars = config[:-1]

            def chain_trace(pos, cam):
                """Trace the delta chain from image pos. Returns the ray
                leaving the LAST chain vertex, the endpoint hit, ok."""
                r = sensors.sample_ray(cam, pos, None)
                okc = jnp.ones((n_pix,), bool)
                for c in chars:
                    h = scene_intersect(arrs, r, cfg.traversal,
                                        cfg.block, _swept_params(cfg))
                    kind = arrs.materials.kind[jnp.maximum(h.mat_id, 0)]
                    is_delta = (kind == mat.CONDUCTOR) \
                        | (kind == mat.DIELECTRIC) \
                        | (kind == mat.THINDIELECTRIC)
                    if c == "t":
                        is_delta = is_delta & (kind != mat.CONDUCTOR)
                    okc = okc & h.valid & is_delta & ~h.is_hair
                    choice = jnp.full((n_pix,), 1 if c == "t" else 0,
                                      jnp.int32)
                    v_i = _hit_to_vertex(h, okc)
                    d_n, _, _ = _delta_bounce(
                        arrs, scene.active_kinds, v_i, -r.d, choice)
                    o_n = h.p + h.geo_n * jnp.where(
                        dot(d_n, h.geo_n) > 0, cfg.ray_eps,
                        -cfg.ray_eps)[..., None]
                    r = Ray(o=o_n, d=d_n, mint=jnp.zeros(n_pix),
                            maxt=jnp.where(okc, jnp.inf, 0.0))
                h_end = scene_intersect(arrs, r, cfg.traversal,
                                        cfg.block, _swept_params(cfg))
                return r, h_end, okc

            r_end, end_hit, ok = chain_trace(pos0, cam0)
            ok = ok & end_hit.valid & ~end_hit.is_hair
            xd_t1 = _advance(motion, end_hit)

            # Newton on the t1 image position: drive the perpendicular
            # miss of the last-vertex ray past xd_t1 to zero.
            def miss(r_, sB, tB):
                e = xd_t1 - r_.o
                ep = e - dot(e, r_.d)[..., None] * r_.d
                return jnp.stack([dot(ep, sB), dot(ep, tB)], -1)

            pos = pos0
            d_px = 0.25
            for _ in range(7):
                rC, _, okC = chain_trace(pos, cam1)
                sB, tB = coordinate_system(rC.d)
                f0 = miss(rC, sB, tB)
                rU, _, okU = chain_trace(
                    pos + jnp.array([d_px, 0.0], jnp.float32), cam1)
                rV, _, okV = chain_trace(
                    pos + jnp.array([0.0, d_px], jnp.float32), cam1)
                fU = (miss(rU, sB, tB) - f0) / d_px
                fV = (miss(rV, sB, tB) - f0) / d_px
                det = fU[..., 0] * fV[..., 1] - fV[..., 0] * fU[..., 1]
                good = okC & okU & okV & (jnp.abs(det) > 1e-20)
                inv = 1.0 / jnp.where(good, det, 1.0)
                du = (-fV[..., 1] * f0[..., 0]
                      + fV[..., 0] * f0[..., 1]) * inv
                dv = (fU[..., 1] * f0[..., 0]
                      - fU[..., 0] * f0[..., 1]) * inv
                # trust region: at most 4 px per iteration
                mag = jnp.sqrt(du * du + dv * dv)
                sc = jnp.minimum(1.0, 4.0 / jnp.maximum(mag, 1e-12))
                step = jnp.stack([du * sc, dv * sc], -1)
                pos = jnp.where(good[..., None], pos + step, pos)

            rF, _, okF = chain_trace(pos, cam1)
            sB, tB = coordinate_system(rF.d)
            fF = miss(rF, sB, tB)
            dist1 = jnp.linalg.norm(xd_t1 - cam1.to_world[:3, 3],
                                    axis=-1)
            dist0 = jnp.linalg.norm(end_hit.p - cam0.to_world[:3, 3],
                                    axis=-1)
            chord = jnp.linalg.norm(xd_t1 - rF.o, axis=-1)
            converged = jnp.linalg.norm(fF, axis=-1) \
                < 1e-3 * jnp.maximum(chord, 1e-3)
            in_img = (pos[..., 0] >= 0) & (pos[..., 0] <= cfg.width) \
                & (pos[..., 1] >= 0) & (pos[..., 1] <= cfg.height)
            ok = ok & okF & converged & in_img
            pos1 = pos
        else:
            p1 = _advance(motion, hit)
            pos1, _, dist1, _, vis1 = sensors.camera_importance(cam1, p1)
            dist0 = jnp.sqrt(jnp.maximum(jnp.sum(
                (hit.p - cam0.to_world[:3, 3]) ** 2, -1), 1e-20))
            ok = hit.valid & vis1
        v = jnp.stack([pos1[..., 0] - pos0[..., 0],
                       pos1[..., 1] - pos0[..., 1],
                       dist1 - dist0], -1)
        v = jnp.where(ok[..., None], v, 0.0)
        return acc + v, cnt + ok.astype(jnp.float32)

    acc = jnp.zeros((n_pix, 3), jnp.float32)
    cnt = jnp.zeros((n_pix,), jnp.float32)
    for s in range(spp):
        acc, cnt = wave(scene.arrays, mt, acc, cnt, jnp.uint32(s))
    img = jnp.where(cnt[..., None] > 0, acc / jnp.maximum(cnt, 1.0)[..., None],
                    jnp.inf)
    return img.reshape(cfg.height, cfg.width, 3)
