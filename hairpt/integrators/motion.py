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

Scope: the reference's ``time="d"`` path configuration (motion of primary
non-specular hit points), which is also what its ``derivativesOnly``
first-order mode reduces to at a diffuse first hit. Specular-flow
configurations (``rd``/``ttd``/…, solved there with Manifold Exploration,
manifold.h) are not implemented; hair segments are treated as static.

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


def render_motion(scene: Scene, spp: int = 1):
    """Returns an [H, W, 3] float32 image of (dx_px, dy_px, d_dist)."""
    cfg = scene.config
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

        # advance the hit point: p1 = M_obj · p  (identity for hair / when
        # the object has no animation)
        p1 = hit.p
        if motion is not None and motion.tri_obj is not None:
            obj = motion.tri_obj[jnp.maximum(hit.prim, 0)]
            m = motion.obj_m[jnp.where(hit.is_hair, 0, obj)]
            moved = jnp.einsum('nij,nj->ni', m[:, :3, :3], hit.p) \
                + m[:, :3, 3]
            p1 = jnp.where(hit.is_hair[..., None], hit.p, moved)

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
