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

Path configurations (the reference's ``time`` string parameter):
  "d"  — motion of primary non-specular hit points (default)
  "rd" — a non-specular point seen through ONE mirror reflection: the
         reflected endpoint is advanced by its object's motion and the
         specular vertex is re-solved with the manifold walk
         (integrators/manifold.py), exactly the reference's use of
         SpecularManifold in motion.cpp. The mirror itself is treated as
         static; longer chains (ttd/trtd) are not implemented. Hair
         segments are treated as static.

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
    from ..core.math import dot, Ray
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

        if config == "rd":
            from .manifold import walk
            # specular-flow: primary hit must be a mirror (conductor)
            kind = arrs.materials.kind[jnp.maximum(hit.mat_id, 0)]
            spec = hit.valid & (kind == mat.CONDUCTOR) & ~hit.is_hair
            # reflect and find the non-specular endpoint
            d_r = ray.d - 2.0 * dot(ray.d, hit.sh_n)[..., None] * hit.sh_n
            o_r = hit.p + hit.geo_n * jnp.where(
                dot(d_r, hit.geo_n) > 0, cfg.ray_eps,
                -cfg.ray_eps)[..., None]
            r2 = Ray(o=o_r, d=d_r, mint=jnp.zeros(n_pix),
                     maxt=jnp.where(spec, jnp.inf, 0.0))
            hit2 = scene_intersect(arrs, r2, cfg.traversal, cfg.block,
                                   _swept_params(cfg))
            ok = spec & hit2.valid
            x2_t1 = _advance(motion, hit2)
            # re-solve the specular vertex for (camera@t1 → x → x2@t1)
            cam1_o = jnp.broadcast_to(cam1.to_world[:3, 3], (n_pix, 3))
            hit_w = hit._replace(valid=ok)
            x1_t1, _, walked = walk(arrs, cfg, cam1_o, x2_t1, hit_w,
                                    n_iters=12)
            ok = ok & walked
            pos1, _, _, _, vis1 = sensors.camera_importance(cam1, x1_t1)
            dist1 = jnp.linalg.norm(x2_t1 - cam1.to_world[:3, 3], axis=-1)
            dist0 = jnp.linalg.norm(hit2.p - cam0.to_world[:3, 3], axis=-1)
            ok = ok & vis1
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
