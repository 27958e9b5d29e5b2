"""Shared integrator machinery: scene intersection + shading records.

Replaces Scene::rayIntersect + Intersection/fillIntersectionRecord
(src/librender/scene.cpp:634-777, src/shapes/hair.cppp:825-862) with
batched SoA queries over the two flattened BVHs (triangles / hair).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.math import Ray, Frame, normalize, frame_from_normal, dot
from ..ops import intersect as isec
from ..ops import intersect_blocked as isec_blk
from ..ops import intersect_packed as ipk
from ..ops import intersect_swept as iswept
from ..ops import intersect_tiled as itiled
from ..scene.scene import SceneArrays


def block_swizzle(width: int, height: int, bw: int = 8, bh: int = 8):
    """Pixel processing order where each run of bw*bh consecutive lanes is
    a bw×bh screen block — the wavefront analog of the reference's 32×32
    RectangularWorkUnit blocks (src/librender/imageproc.cpp): consecutive
    rays then share nearby hair clusters, which is what the tile-routed
    intersector's per-tile candidate union (ops/intersect_tiled.py) needs
    to stay small. Returns a uint32 [width*height] permutation (lane →
    pixel id), or None when the resolution doesn't tile evenly."""
    if width % bw or height % bh:
        return None
    import numpy as np
    i = np.arange(width * height, dtype=np.uint32)
    per = bw * bh
    blk = i // per
    j = i % per
    bx = blk % (width // bw)
    by = blk // (width // bw)
    px = bx * bw + j % bw
    py = by * bh + j // bw
    # HOST array on purpose: this permutation is captured as a closure
    # constant by the jitted wave, and lowering embeds closure constants
    # by VALUE — a device-resident jnp array would be fetched back
    # device→host through the (slow) compile tunnel at every lower(),
    # which measured 30+ minutes at 1024² scale. numpy embeds directly.
    return np.asarray(py * width + px, np.uint32)


def _pad_ray(ray: Ray, block: int):
    n = ray.o.shape[0]
    pad = (-n) % block
    if pad == 0:
        return ray, n
    z3 = jnp.zeros((pad, 3), jnp.float32)
    return Ray(o=jnp.concatenate([ray.o, z3]),
               d=jnp.concatenate([ray.d, z3.at[:, 2].set(1.0)]),
               mint=jnp.concatenate([ray.mint, jnp.zeros(pad)]),
               maxt=jnp.concatenate([ray.maxt, jnp.zeros(pad)])), n


def _closest(bvh, geom, packed, leaf_fn, blk_fn, pk_fn, ray, traversal,
             block):
    if traversal == "packed":
        return ipk.closest_hit_packed(packed, pk_fn, ray)
    if traversal == "blocked":
        pray, n = _pad_ray(ray, block)
        t, prim = isec_blk.closest_hit_blocked(bvh, geom, blk_fn, 4, pray,
                                               block)
        return t[:n], prim[:n]
    return isec.closest_hit(bvh, geom, leaf_fn, 4, ray)


def _any(bvh, geom, packed, leaf_fn, blk_fn, pk_fn, ray, traversal, block):
    if traversal == "packed":
        return ipk.any_hit_packed(packed, pk_fn, ray)
    if traversal == "blocked":
        pray, n = _pad_ray(ray, block)
        occ = isec_blk.any_hit_blocked(bvh, geom, blk_fn, 4, pray, block)
        return occ[:n]
    return isec.any_hit(bvh, geom, leaf_fn, 4, ray)


class Hit(NamedTuple):
    valid: jnp.ndarray      # [N] bool
    t: jnp.ndarray          # [N]
    p: jnp.ndarray          # [N, 3]
    geo_n: jnp.ndarray      # [N, 3]
    sh_s: jnp.ndarray       # [N, 3] shading tangent (hair: fiber tangent)
    sh_t: jnp.ndarray       # [N, 3]
    sh_n: jnp.ndarray       # [N, 3] shading normal
    uv: jnp.ndarray         # [N, 2]
    mat_id: jnp.ndarray     # [N]
    emitter_id: jnp.ndarray  # [N] area light index or -1
    is_hair: jnp.ndarray    # [N] bool
    uv_density: jnp.ndarray  # [N] mip LOD factor (0 = no texture footprint)
    bary: jnp.ndarray       # [N, 2] triangle barycentrics (b1, b2)
    vcolor: jnp.ndarray     # [N, 3] interpolated vertex colors (default 1)
    prim: jnp.ndarray       # [N] BVH-sorted primitive id (tri table when
    #                         ~is_hair, hair table when is_hair; -1 = miss)


def frame(hit: Hit) -> Frame:
    return Frame(s=hit.sh_s, t=hit.sh_t, n=hit.sh_n)


def scene_intersect(arr: SceneArrays, ray: Ray, traversal: str = "packed",
                    block: int = 256, swept=None,
                    sort_rays: bool = False, compact: bool = True) -> Hit:
    """Closest hit against triangles and hair; builds the shading record."""
    n = ray.o.shape[0]
    inf = jnp.full((n,), jnp.inf, jnp.float32)
    t_tri, prim_tri = (inf, jnp.full((n,), -1, jnp.int32))
    if arr.tri is not None:
        t_tri, prim_tri = _closest(arr.tri_bvh, arr.tri, arr.tri_packed,
                                   isec.tri_intersect_block,
                                   isec_blk.tri_leaf_block,
                                   ipk.tri_leaf_eval, ray, traversal, block)
    t_hair, prim_hair = (inf, jnp.full((n,), -1, jnp.int32))
    if arr.hair is not None:
        hair_ray = ray._replace(maxt=jnp.minimum(ray.maxt, t_tri))
        if traversal in ("tiled", "tiled_sub") and arr.hair_swept is not None:
            c, k, _, _, q_max = swept[:5]
            short_t = swept[5] if len(swept) > 5 else 0.0
            t_hair, prim_hair = itiled.tiled_closest_hit(
                arr.hair_swept, hair_ray, c, k, q_max=q_max,
                subcull=(traversal == "tiled_sub"),
                sort_rays=sort_rays, compact=compact,
                short_t=short_t)
        elif traversal == "swept" and arr.hair_swept is not None:
            c, k, pmax, chunk = swept[:4]
            t_hair, prim_hair = iswept.swept_closest_hit(
                arr.hair_swept, hair_ray, c, k, p_max=pmax, chunk=chunk)
        else:
            t_hair, prim_hair = _closest(
                arr.hair_bvh, arr.hair, arr.hair_packed,
                isec.hair_intersect_block, isec_blk.hair_leaf_block,
                ipk.hair_leaf_eval, hair_ray,
                "packed" if traversal in ("swept", "tiled", "tiled_sub")
                else traversal,
                block)

    # two-level BVH instances (shared-geometry shapegroup/instance scenes)
    t_inst = inf
    prim_inst = jnp.full((n,), -1, jnp.int32)
    which_inst = jnp.full((n,), -1, jnp.int32)
    if arr.inst is not None:
        from ..ops import instancing as inst_mod
        iray = ray._replace(maxt=jnp.minimum(ray.maxt,
                                             jnp.minimum(t_tri, t_hair)))
        t_inst, prim_inst, which_inst = inst_mod.inst_closest_hit(
            arr.inst, iray)

    use_hair = t_hair < t_tri
    use_inst = (t_inst < t_hair) & (t_inst < t_tri)
    t = jnp.where(use_inst, t_inst, jnp.where(use_hair, t_hair, t_tri))
    valid = jnp.isfinite(t) & (t < ray.maxt) & ((prim_tri >= 0)
                                                | (prim_hair >= 0)
                                                | (prim_inst >= 0))
    use_hair = use_hair & ~use_inst
    p = ray.o + ray.d * t[..., None]

    # defaults
    geo_n = jnp.zeros((n, 3), jnp.float32).at[:, 2].set(1.0)
    sh_n = geo_n
    sh_s = jnp.zeros((n, 3), jnp.float32).at[:, 0].set(1.0)
    sh_t = jnp.zeros((n, 3), jnp.float32).at[:, 1].set(1.0)
    uv = jnp.zeros((n, 2), jnp.float32)
    mat_id = jnp.zeros((n,), jnp.int32)
    emitter_id = jnp.full((n,), -1, jnp.int32)
    uv_density = jnp.zeros((n,), jnp.float32)
    bary = jnp.zeros((n, 2), jnp.float32)
    vcolor = jnp.ones((n, 3), jnp.float32)

    if arr.tri is not None:
        i = jnp.maximum(prim_tri, 0)
        p0 = arr.tri.p0[i]
        e1 = arr.tri.e1[i]
        e2 = arr.tri.e2[i]
        gn = normalize(jnp.cross(e1, e2))
        # recompute barycentrics for the chosen triangle (cheap, exact)
        pv = jnp.cross(ray.d, e2)
        det = jnp.sum(e1 * pv, axis=-1)
        inv = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
        tv = ray.o - p0
        b1 = jnp.sum(tv * pv, axis=-1) * inv
        qv = jnp.cross(tv, e1)
        b2 = jnp.sum(ray.d * qv, axis=-1) * inv
        b0 = 1.0 - b1 - b2
        sh = arr.tri_shading
        ns = normalize(sh.n0[i] * b0[..., None] + sh.n1[i] * b1[..., None]
                       + sh.n2[i] * b2[..., None])
        uvi = sh.uv0[i] * b0[..., None] + sh.uv1[i] * b1[..., None] \
            + sh.uv2[i] * b2[..., None]
        # orient the geometric normal into the shading normal's hemisphere
        # (winding-robust; reference meshes guarantee consistent winding,
        # procedural stand-ins may not)
        gn = jnp.where((dot(gn, ns) < 0)[..., None], -gn, gn)
        f = frame_from_normal(ns)
        tri_sel = (~use_hair) & (~use_inst) & (prim_tri >= 0)
        m = tri_sel[..., None]
        geo_n = jnp.where(m, gn, geo_n)
        sh_n = jnp.where(m, ns, sh_n)
        sh_s = jnp.where(m, f.s, sh_s)
        sh_t = jnp.where(m, f.t, sh_t)
        uv = jnp.where(m, uvi, uv)
        mat_id = jnp.where(tri_sel, sh.mat_id[i], mat_id)
        emitter_id = jnp.where(tri_sel, sh.emitter_id[i], emitter_id)
        uv_density = jnp.where(tri_sel, sh.uv_density[i], uv_density)
        bary = jnp.where(m, jnp.stack([b1, b2], -1), bary)
        vcolor = jnp.where(m, sh.vc0[i] * b0[..., None]
                           + sh.vc1[i] * b1[..., None]
                           + sh.vc2[i] * b2[..., None], vcolor)

    if arr.hair is not None:
        i = jnp.maximum(prim_hair, 0)
        p0 = arr.hair.p0[i]
        p1 = arr.hair.p1[i]
        radius = arr.hair.radius[i]
        axis = normalize(p1 - p0)
        rel = p - p0
        nrad = normalize(rel - jnp.sum(axis * rel, -1, keepdims=True) * axis)
        tt = jnp.cross(nrad, axis)
        # snap the hit point back onto the cylinder (reference:
        # fillIntersectionRecord roundoff mitigation, hair.cpp:845-848)
        local_y = jnp.sum(tt * rel, axis=-1)
        local_z = jnp.sum(nrad * rel, axis=-1)
        shift = radius - jnp.sqrt(jnp.maximum(local_y ** 2 + local_z ** 2,
                                              0.0))
        p_snap = p + nrad * shift[..., None]
        hair_sel = use_hair & (prim_hair >= 0)
        m = hair_sel[..., None]
        p = jnp.where(m, p_snap, p)
        geo_n = jnp.where(m, nrad, geo_n)
        sh_n = jnp.where(m, nrad, sh_n)
        sh_s = jnp.where(m, axis, sh_s)
        sh_t = jnp.where(m, tt, sh_t)
        mat_id = jnp.where(hair_sel, arr.hair_mat_id[i], mat_id)

    if arr.inst is not None:
        from ..ops import instancing as inst_mod
        gn_i, ns_i, uv_i, mat_i, bary_i = inst_mod.inst_shading(
            arr.inst, ray, t, prim_inst, which_inst)
        f_i = frame_from_normal(ns_i)
        sel = use_inst & (prim_inst >= 0)
        m = sel[..., None]
        geo_n = jnp.where(m, jnp.where(
            (dot(gn_i, ns_i) < 0)[..., None], -gn_i, gn_i), geo_n)
        sh_n = jnp.where(m, ns_i, sh_n)
        sh_s = jnp.where(m, f_i.s, sh_s)
        sh_t = jnp.where(m, f_i.t, sh_t)
        uv = jnp.where(m, uv_i, uv)
        mat_id = jnp.where(sel, mat_i, mat_id)
        bary = jnp.where(m, bary_i, bary)

    return Hit(valid=valid, t=t, p=p, geo_n=geo_n, sh_s=sh_s, sh_t=sh_t,
               sh_n=sh_n, uv=uv, mat_id=mat_id, emitter_id=emitter_id,
               is_hair=use_hair & valid, uv_density=uv_density,
               bary=bary, vcolor=vcolor,
               prim=jnp.where(use_inst, prim_inst,
                              jnp.where(use_hair, prim_hair, prim_tri)))


def scene_occluded(arr: SceneArrays, ray: Ray, traversal: str = "packed",
                   block: int = 256, swept=None, sort_rays: bool = False,
                   compact: bool = True):
    n = ray.o.shape[0]
    occ = jnp.zeros((n,), bool)
    if arr.tri is not None:
        occ = occ | _any(arr.tri_bvh, arr.tri, arr.tri_packed,
                         isec.tri_intersect_block, isec_blk.tri_leaf_block,
                         ipk.tri_leaf_eval, ray,
                         "packed" if traversal in ("swept", "tiled",
                                                   "tiled_sub")
                         else traversal, block)
    if arr.hair is not None:
        ray2 = ray._replace(maxt=jnp.where(occ, 0.0, ray.maxt))
        if traversal in ("tiled", "tiled_sub") and arr.hair_swept is not None:
            c, k, _, _, q_max = swept[:5]
            short_t = swept[5] if len(swept) > 5 else 0.0
            # NOTE: a smaller any-hit slot cap (q=64) was tried and
            # measured CATASTROPHIC (6.1s vs 3.8s waves at 512²): an
            # UNOCCLUDED shadow ray must prove a miss against every
            # candidate, so a small cap forces many exact-overflow
            # completion passes. Full q_max keeps overflow rare.
            occ = occ | itiled.tiled_any_hit(arr.hair_swept, ray2, c, k,
                                             q_max=q_max,
                                             subcull=(traversal
                                                      == "tiled_sub"),
                                             sort_rays=sort_rays,
                                             compact=compact,
                                             short_t=short_t)
        elif traversal == "swept" and arr.hair_swept is not None:
            c, k, pmax, chunk = swept[:4]
            occ = occ | iswept.swept_any_hit(arr.hair_swept, ray2, c, k,
                                             p_max=pmax, chunk=chunk)
        else:
            occ = occ | _any(arr.hair_bvh, arr.hair, arr.hair_packed,
                             isec.hair_intersect_block,
                             isec_blk.hair_leaf_block,
                             ipk.hair_leaf_eval, ray2, traversal, block)
    if arr.inst is not None:
        from ..ops import instancing as inst_mod
        ray3 = ray._replace(maxt=jnp.where(occ, 0.0, ray.maxt))
        occ = occ | inst_mod.inst_any_hit(arr.inst, ray3)
    return occ
