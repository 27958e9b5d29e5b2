"""Block-shared BVH traversal — the TPU-native intersection path.

Per-ray stackless traversal (ops/intersect.py) needs per-lane gathers of
node/primitive data every step, which the TPU's vector unit executes as
slow scalarized loads. Here instead a *block* of B rays walks the tree
together (the VPU analog of the reference's 4-wide SSE ray packets,
include/mitsuba/render/triaccel.h:37 + skdtree.h:183):

- one node index per block → node fetch is a [num_blocks] gather (tiny);
- the slab test is dense [num_blocks, B] vector math against the block's
  shared box;
- a leaf's primitives are a contiguous run of `leaf_size` (BVH build sorts
  them), fetched as a [num_blocks, L] gather and tested against all B lanes
  as dense [num_blocks, B, L] math;
- the block descends if ANY lane intersects the node's box.

Cost model: work per block = union of nodes its rays need — efficient when
blocks are coherent (primary rays in pixel order, shadow rays to the sun).
For bounce rays, the integrator optionally re-sorts the wavefront by hit
position/direction before tracing (see integrators/path.py).

The whole wavefront advances in ONE `lax.while_loop` whose carry holds a
node index per block, so there is no vmap-of-while lockstep blow-up beyond
the slowest block.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import Ray
from .intersect import BVHArrays, TriGeom, HairGeom, INVALID


def _slab_test_block(o, inv_d, mint, maxt, bmin, bmax):
    """o, inv_d: [nb, B, 3]; bmin/bmax: [nb, 3] → hit [nb, B]."""
    t0 = (bmin[:, None, :] - o) * inv_d
    t1 = (bmax[:, None, :] - o) * inv_d
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    tf = tf * 1.00000024 + 1e-7
    return (tn <= tf) & (tf >= mint) & (tn <= maxt)


def tri_leaf_block(geom: TriGeom, idx, o, d, mint, maxt):
    """idx: [nb, L]; o/d: [nb, B, 3] → (t, hit) [nb, B, L]."""
    p0 = geom.p0[idx]          # [nb, L, 3]
    e1 = geom.e1[idx]
    e2 = geom.e2[idx]
    d_ = d[:, :, None, :]       # [nb, B, 1, 3]
    o_ = o[:, :, None, :]
    pvec = jnp.cross(d_, e2[:, None, :, :])            # [nb, B, L, 3]
    det = jnp.sum(e1[:, None] * pvec, axis=-1)          # [nb, B, L]
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    tvec = o_ - p0[:, None]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[:, None])
    v = jnp.sum(d_ * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[:, None] * qvec, axis=-1) * inv_det
    hit = (jnp.abs(det) >= 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) \
        & (t >= mint[..., None]) & (t <= maxt[..., None])
    return t, hit


def hair_leaf_block(geom: HairGeom, idx, o, d, mint, maxt):
    """Miter-cylinder test, blocked (math identical to
    intersect.hair_intersect_block / src/shapes/hair.cpp:485-542)."""
    p0 = geom.p0[idx]          # [nb, L, 3]
    p1 = geom.p1[idx]
    n0 = geom.n0[idx]
    n1 = geom.n1[idx]
    r = geom.radius[idx]       # [nb, L]

    seg = p1 - p0
    axis = seg * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(seg * seg, -1, keepdims=True), 1e-30))

    o_ = o[:, :, None, :]                               # [nb, B, 1, 3]
    d_ = d[:, :, None, :]
    ax = axis[:, None]                                  # [nb, 1, L, 3]
    rel_o = o_ - p0[:, None]
    proj_o = rel_o - jnp.sum(ax * rel_o, -1, keepdims=True) * ax
    proj_d = d_ - jnp.sum(ax * d_, -1, keepdims=True) * ax

    a = jnp.sum(proj_d * proj_d, axis=-1)               # [nb, B, L]
    b = jnp.sum(proj_o * proj_d, axis=-1)
    ok = a > 1e-18
    a_safe = jnp.where(ok, a, 1.0)
    t_mid = -b / a_safe
    q = proj_o + proj_d * t_mid[..., None]
    c_mid = jnp.sum(q * q, axis=-1) - (r[:, None] * r[:, None])
    disc = -c_mid / a_safe
    ok = ok & (disc >= 0.0)
    dt = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = t_mid - dt
    t_far = t_mid + dt

    def miter_ok(t):
        p = o_ + d_ * t[..., None]
        return (jnp.sum((p - p0[:, None]) * n0[:, None], axis=-1) >= 0.0) & \
               (jnp.sum((p - p1[:, None]) * n1[:, None], axis=-1) <= 0.0)

    near_ok = ok & (t_near >= mint[..., None]) & (t_near <= maxt[..., None]) \
        & miter_ok(t_near)
    far_ok = ok & (t_far >= mint[..., None]) & (t_far <= maxt[..., None]) \
        & miter_ok(t_far)
    t = jnp.where(near_ok, t_near, t_far)
    return t, near_ok | far_ok


def closest_hit_blocked(bvh: BVHArrays, geom, leaf_block_fn, leaf_size: int,
                        ray: Ray, block: int = 256):
    """Returns (t [N], prim [N]). N must be a multiple of `block`."""
    N = ray.o.shape[0]
    assert N % block == 0, (N, block)
    nb = N // block
    o = ray.o.reshape(nb, block, 3)
    d = ray.d.reshape(nb, block, 3)
    mint = ray.mint.reshape(nb, block)
    maxt0 = ray.maxt.reshape(nb, block)
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                            jnp.where(d >= 0, 1e-12, -1e-12), d)

    num_nodes = bvh.node_left.shape[0]
    sentinel = jnp.int32(num_nodes)
    offsets = jnp.arange(leaf_size, dtype=jnp.int32)

    def cond(state):
        node = state[0]
        return jnp.any(node != sentinel)

    def body(state):
        node, maxt, best_t, best_prim = state
        nz = jnp.minimum(node, num_nodes - 1)           # clamp for gathers
        done = node == sentinel
        bmin = bvh.node_min[nz]                         # [nb, 3]
        bmax = bvh.node_max[nz]
        left = bvh.node_left[nz]                        # [nb]
        count = bvh.node_count[nz]
        is_leaf = count >= 0

        hit_box = _slab_test_block(o, inv_d, mint, maxt, bmin, bmax)
        hit_box = hit_box & ~done[:, None]
        any_hit = jnp.any(hit_box, axis=-1)             # [nb]

        # leaf processing (masked): contiguous prim run [left, left+L)
        idx = left[:, None] + offsets[None, :]          # [nb, L]
        process = any_hit & is_leaf
        lane_valid = hit_box[:, :, None] \
            & (offsets[None, None, :] < count[:, None, None]) \
            & process[:, None, None]
        t, hit = leaf_block_fn(geom, idx, o, d, mint, maxt)
        hit = hit & lane_valid
        t_masked = jnp.where(hit, t, jnp.inf)
        t_best = jnp.min(t_masked, axis=-1)             # [nb, B]
        k = jnp.argmin(t_masked, axis=-1)
        new_hit = t_best < maxt
        maxt = jnp.where(new_hit, t_best, maxt)
        best_t = jnp.where(new_hit, t_best, best_t)
        prim_k = jnp.take_along_axis(idx, k.reshape(nb, -1), axis=1) \
            .reshape(nb, block)
        best_prim = jnp.where(new_hit, prim_k, best_prim)

        descend = any_hit & ~is_leaf
        nxt = jnp.where(descend, left, bvh.node_skip[nz])
        node = jnp.where(done, node, nxt)
        return node, maxt, best_t, best_prim

    init = (jnp.zeros((nb,), jnp.int32), maxt0,
            jnp.full((nb, block), jnp.inf, jnp.float32),
            jnp.full((nb, block), INVALID, jnp.int32))
    _, _, best_t, best_prim = jax.lax.while_loop(cond, body, init)
    return best_t.reshape(N), best_prim.reshape(N)


def any_hit_blocked(bvh: BVHArrays, geom, leaf_block_fn, leaf_size: int,
                    ray: Ray, block: int = 256):
    """Occlusion query; a block stops once every lane is occluded or
    traversal finishes."""
    N = ray.o.shape[0]
    assert N % block == 0
    nb = N // block
    o = ray.o.reshape(nb, block, 3)
    d = ray.d.reshape(nb, block, 3)
    mint = ray.mint.reshape(nb, block)
    maxt = ray.maxt.reshape(nb, block)
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                            jnp.where(d >= 0, 1e-12, -1e-12), d)
    # lanes with maxt <= mint don't need occlusion (degenerate shadow rays)
    initial_occ = maxt <= mint

    num_nodes = bvh.node_left.shape[0]
    sentinel = jnp.int32(num_nodes)
    offsets = jnp.arange(leaf_size, dtype=jnp.int32)

    def cond(state):
        node, occ = state
        return jnp.any(node != sentinel)

    def body(state):
        node, occ = state
        nz = jnp.minimum(node, num_nodes - 1)
        done = node == sentinel
        bmin = bvh.node_min[nz]
        bmax = bvh.node_max[nz]
        left = bvh.node_left[nz]
        count = bvh.node_count[nz]
        is_leaf = count >= 0

        live = ~occ
        hit_box = _slab_test_block(o, inv_d, mint, maxt, bmin, bmax) & live
        hit_box = hit_box & ~done[:, None]
        any_hit = jnp.any(hit_box, axis=-1)

        idx = left[:, None] + offsets[None, :]
        lane_valid = hit_box[:, :, None] \
            & (offsets[None, None, :] < count[:, None, None]) \
            & (any_hit & is_leaf)[:, None, None]
        t, hit = leaf_block_fn(geom, idx, o, d, mint, maxt)
        occ = occ | jnp.any(hit & lane_valid, axis=-1)

        all_occluded = jnp.all(occ | (maxt <= mint), axis=-1)
        descend = any_hit & ~is_leaf & ~all_occluded
        nxt = jnp.where(descend, left,
                        jnp.where(all_occluded, sentinel, bvh.node_skip[nz]))
        node = jnp.where(done, node, nxt)
        return node, occ

    _, occ = jax.lax.while_loop(cond, body,
                                (jnp.zeros((nb,), jnp.int32), initial_occ))
    return (occ & ~initial_occ).reshape(N)
