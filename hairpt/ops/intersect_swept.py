"""Two-phase cluster-sweep intersection — the high-throughput hair path.

Why: on TPU, gather bandwidth (~3-7 GB/s effective) caps any traversal that
fetches primitive data per ray-step; dense/contiguous reads run 100x
faster. So the query is split:

  Phase A (cull):  rays walk a SMALL packed BVH whose leaves are fixed-size
                   *clusters* of K spatially-adjacent segments. Each ray
                   records up to P_max candidate cluster ids (cheap: only
                   32-byte node rows are gathered; the tree has ~2N/K nodes).
  Phase B (test):  all (ray, cluster) pairs are sorted by cluster and padded
                   so every CHUNK of CH pairs references ONE cluster; a
                   chunk's K segments are then read as one contiguous row
                   block (dense!) and tested against its CH rays as
                   [CH, K] vector math. Results are unsorted back and
                   min-reduced per ray.

This converts the dominant data movement (segment fetch) from per-lane
gathers into contiguous block reads amortized over CH rays, and turns the
FLOPs into dense VPU work — the TPU-native analog of the reference's
SSE packet tracing (include/mitsuba/render/triaccel_sse.h), restructured
for a 1024-lane vector unit instead of 4-wide SSE.

Caveat: a ray records at most P_max clusters; overflow drops the farthest
candidates (build-time K controls how many clusters a ray can cross).
`phase_a_overflow` in the returned stats reports how often that happens.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import Ray
from . import bvh as bvh_mod
from .intersect_packed import PRIM_F, hair_pack_rows, _bitcast_i2f

INNER = 0x1F
MAX_LEAF_CLUSTERS = 4  # SAH builder cap for leaf_size=1


class SweptHair(NamedTuple):
    nodes: jnp.ndarray      # [M, 8] cluster-BVH (leaf meta → cluster index)
    cl_lo: jnp.ndarray      # [C, 3] cluster bounds (dense phase-A sweep)
    cl_hi: jnp.ndarray      # [C, 3]
    seg_rows: jnp.ndarray   # [C * K, PRIM_F] cluster-major packed segments
    seg_rows_t: jnp.ndarray  # [C, PRIM_F, K] transposed pallas DMA layout
    #                          w/ precomputed unit axis/sn1/r² rows (see
    #                          build_swept_hair)
    # 32-segment sub-cluster AABBs over the same rows (4×-tighter phase-A
    # culling granularity — see tiled_closest_hit(subcull=True))
    sub_lo: jnp.ndarray     # [C32, 3]
    sub_hi: jnp.ndarray     # [C32, 3]
    # static geometry of the layout (python ints kept out of the pytree):
    # K = seg_rows.shape[0] // n_clusters is carried via shapes below
    cluster_count: jnp.ndarray  # [] int32 == C (device scalar, unused in jit)


def _miter_seg_bounds(p0, p1, n0, n1, radius):
    """Exact per-segment AABBs of the miter-clipped cylinders.

    The accepted-hit region of the intersection kernel
    (pallas_tiled._cyl_test) is the infinite cylinder of radius r about
    the axis a=(p1-p0)/|..| clipped by the miter planes (p0,n0) and
    (p1,n1) — a convex body whose extreme point along any direction lies
    on one of the two cap ellipses.  The per-axis half-extent of the cap
    ellipse {v : v.n=0, |v-(v.a)a| <= r} is

        E_i = r/|n.a| * sqrt((1-b^2) g1^2 + 2 a b g1 g2 + (1-a^2) g2^2)

    with (u1,u2) an orthonormal basis of the plane, a=u1.a, b=u2.a and
    g=(u1_i, u2_i).  Result is clamped against the legacy conservative
    box (min(p0,p1) - 2r, max + 2r) so near-degenerate miters (n almost
    perpendicular to the axis) stay finite and never looser than before.

    TPU-first analog of the reference's cylinder-plane "fancy" AABB
    clipping (src/shapes/hair.cpp:239-444): closed-form cap-ellipse
    extents at cluster-build time instead of kd-split-plane clipping.
    Host-side numpy; runs once per scene build.
    """
    p0 = np.asarray(p0, np.float64)
    p1 = np.asarray(p1, np.float64)
    r = np.asarray(radius, np.float64)[:, None]
    ax = p1 - p0
    ax_len = np.sqrt(np.maximum((ax * ax).sum(-1, keepdims=True), 1e-30))
    ax = ax / ax_len

    def cap_extents(nrm):
        nrm = np.asarray(nrm, np.float64)
        nn = np.sqrt(np.maximum((nrm * nrm).sum(-1, keepdims=True), 1e-30))
        nrm = nrm / nn
        # u1 = normalize(n x e_k), e_k the axis least aligned with n
        k = np.argmin(np.abs(nrm), axis=-1)
        e = np.zeros_like(nrm)
        e[np.arange(len(k)), k] = 1.0
        u1 = np.cross(nrm, e)
        u1 /= np.sqrt(np.maximum((u1 * u1).sum(-1, keepdims=True), 1e-30))
        u2 = np.cross(nrm, u1)
        al = (u1 * ax).sum(-1, keepdims=True)       # u1.a
        be = (u2 * ax).sum(-1, keepdims=True)       # u2.a
        na = np.abs((nrm * ax).sum(-1, keepdims=True))
        quad = ((1.0 - be * be) * u1 * u1
                + 2.0 * al * be * u1 * u2
                + (1.0 - al * al) * u2 * u2)
        return (r / np.maximum(na, 1e-6)) * np.sqrt(np.maximum(quad, 0.0))

    e0 = cap_extents(n0)
    e1 = cap_extents(n1)
    lo = np.minimum(p0 - e0, p1 - e1)
    hi = np.maximum(p0 + e0, p1 + e1)
    # never looser than the legacy conservative box
    lo = np.maximum(lo, np.minimum(p0, p1) - 2.0 * r)
    hi = np.minimum(hi, np.maximum(p0, p1) + 2.0 * r)
    return lo.astype(np.float32), hi.astype(np.float32)


def build_swept_hair(p0, p1, n0, n1, radius, K: int = 64) -> SweptHair:
    """Host-side build. Inputs are the raw (unsorted) segment arrays."""
    assert K % 32 == 0, "cluster size must hold whole 32-seg sub-clusters"
    n = len(p0)
    lo, hi = _miter_seg_bounds(p0, p1, n0, n1, radius)
    centroid = 0.5 * (lo + hi)
    ext = np.maximum(centroid.max(0) - centroid.min(0), 1e-12)
    q = np.clip((centroid - centroid.min(0)) / ext * 1023.0, 0,
                1023).astype(np.uint32)
    order = np.argsort(bvh_mod.morton3(q), kind="stable")

    pad = (-n) % K
    if pad:
        order = np.concatenate([order, np.full(pad, -1)])
    C = len(order) // K

    def take(a, fill=0.0):
        out = np.full((len(order),) + a.shape[1:], fill, a.dtype)
        valid = order >= 0
        out[valid] = a[order[valid]]
        return out

    sp0, sp1 = take(p0), take(p1)
    sn0, sn1 = take(n0), take(n1)
    # degenerate padded segments: zero-length, zero radius → never hit
    srad = take(radius)
    sid = np.where(order >= 0, order, -1).astype(np.int32)

    # cluster bounds
    slo = np.where((order >= 0)[:, None], take(lo, 3e37), 3e37)
    shi = np.where((order >= 0)[:, None], take(hi, -3e37), -3e37)
    cl_lo = slo.reshape(C, K, 3).min(1)
    cl_hi = shi.reshape(C, K, 3).max(1)

    fb = bvh_mod.build(cl_lo, cl_hi, leaf_size=1)
    # the SAH builder may terminate with up to 4*leaf_size prims per leaf
    assert fb.node_count.max() <= MAX_LEAF_CLUSTERS, fb.node_count.max()
    corder = fb.prim_order  # tree-leaf position → original cluster id

    # reorder clusters (and their segment rows) into tree order so a leaf's
    # node_left IS the cluster table index
    rows = hair_pack_rows(sp0, sp1, sn0, sn1, srad, sid)
    rows = rows.reshape(C, K * PRIM_F)[corder].reshape(C * K, PRIM_F)

    m = fb.node_left.shape[0]
    is_leaf = fb.node_count >= 0
    meta = np.where(is_leaf,
                    (fb.node_left.astype(np.int64) << 5)
                    | np.minimum(fb.node_count, MAX_LEAF_CLUSTERS),
                    (fb.node_left.astype(np.int64) << 5) | INNER)
    nodes = np.zeros((m, 8), np.float32)
    nodes[:, 0:3] = fb.node_min
    nodes[:, 3:6] = fb.node_max
    nodes[:, 6] = _bitcast_i2f(meta.astype(np.int32))
    nodes[:, 7] = _bitcast_i2f(fb.node_skip)
    # Pallas DMA layout precomputes the per-segment terms the cylinder
    # test would otherwise recompute per (tile, slot) iteration — the
    # phase-B kernel is VPU-compute-bound (measured ~320 ns/slot-iter at
    # ~2 vreg-ops/cycle), so shaving the axis normalization + sn1 dot +
    # r² (~19 of ~75 VPU ops) comes straight off the bounce-wave time:
    #   0:3 p0 | 3:6 UNIT axis | 6:9 n0 | 9:12 n1 | 12 r
    #   13 sn1 = (p1-p0)·n1 | 14 r² | 15 id
    # (seg_rows keeps the original p0/p1 layout for the non-Pallas
    # traversals and the bounds builder above.)
    rows_k = rows.copy()
    seg_v = rows[:, 3:6].astype(np.float64) - rows[:, 0:3]
    seg_len = np.sqrt(np.maximum((seg_v * seg_v).sum(-1, keepdims=True),
                                 1e-30))
    rows_k[:, 3:6] = (seg_v / seg_len).astype(np.float32)
    rows_k[:, 13] = (seg_v * rows[:, 9:12].astype(np.float64))\
        .sum(-1).astype(np.float32)
    rows_k[:, 14] = rows[:, 12] * rows[:, 12]
    rows_t = rows_k.reshape(C, K, PRIM_F).transpose(0, 2, 1).copy()

    # 32-segment sub-cluster AABBs (same tree order): bounds recomputed
    # from the final rows so padding/degenerate slots stay empty
    SUBK = 32
    validf = rows[:, PRIM_F - 1].view(np.int32) >= 0
    elof, ehif = _miter_seg_bounds(rows[:, 0:3], rows[:, 3:6],
                                   rows[:, 6:9], rows[:, 9:12],
                                   rows[:, 12])
    slof = np.where(validf[:, None], elof, 3e37)
    shif = np.where(validf[:, None], ehif, -3e37)
    C32 = rows.shape[0] // SUBK
    sub_lo = slof.reshape(C32, SUBK, 3).min(1)
    sub_hi = shif.reshape(C32, SUBK, 3).max(1)

    return SweptHair(nodes=jnp.asarray(nodes),
                     cl_lo=jnp.asarray(cl_lo[corder], jnp.float32),
                     cl_hi=jnp.asarray(cl_hi[corder], jnp.float32),
                     seg_rows=jnp.asarray(rows),
                     seg_rows_t=jnp.asarray(rows_t),
                     sub_lo=jnp.asarray(sub_lo, jnp.float32),
                     sub_hi=jnp.asarray(sub_hi, jnp.float32),
                     cluster_count=jnp.int32(C))


# ---------------------------------------------------------------------------
# Phase A: record candidate clusters per ray
# ---------------------------------------------------------------------------

def _phase_a_dense(sw: SweptHair, ray: Ray, p_max: int,
                   c_chunk: int = 1024):
    """Gather-free cluster culling: slab-test every ray against every
    cluster AABB (dense [N, C] vector math) and keep the p_max *nearest*
    hit clusters per ray via chunked top-k. Overflow therefore drops the
    farthest candidates — almost always occluded for closest-hit queries.
    Returns (slots [N, p_max] cluster ids, cnt [N])."""
    N = ray.o.shape[0]
    C = sw.cl_lo.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(ray.d) < 1e-12,
                            jnp.where(ray.d >= 0, 1e-12, -1e-12), ray.d)
    o = ray.o
    mint = ray.mint
    maxt = ray.maxt

    cand_t = jnp.full((N, p_max), jnp.inf, jnp.float32)
    cand_i = jnp.full((N, p_max), -1, jnp.int32)

    n_chunks = (C + c_chunk - 1) // c_chunk
    for ci in range(n_chunks):
        lo = sw.cl_lo[ci * c_chunk:(ci + 1) * c_chunk]     # [Cc, 3]
        hi = sw.cl_hi[ci * c_chunk:(ci + 1) * c_chunk]
        # accumulate the slab interval per axis with [N, Cc] temporaries
        # (avoids [N, Cc, 3] materialization — 3x less memory traffic)
        tn = None
        tf = None
        for ax in range(3):
            a0 = (lo[None, :, ax] - o[:, None, ax]) * inv_d[:, None, ax]
            a1 = (hi[None, :, ax] - o[:, None, ax]) * inv_d[:, None, ax]
            lo_ax = jnp.minimum(a0, a1)
            hi_ax = jnp.maximum(a0, a1)
            tn = lo_ax if tn is None else jnp.maximum(tn, lo_ax)
            tf = hi_ax if tf is None else jnp.minimum(tf, hi_ax)
        tf = tf * 1.00000024 + 1e-7
        hit = (tn <= tf) & (tf >= mint[:, None]) & (tn <= maxt[:, None])
        t_enter = jnp.where(hit, jnp.maximum(tn, 0.0), jnp.inf)
        ids = jnp.arange(ci * c_chunk,
                         ci * c_chunk + lo.shape[0], dtype=jnp.int32)
        merged_t = jnp.concatenate([cand_t, t_enter], axis=1)
        merged_i = jnp.concatenate(
            [cand_i, jnp.broadcast_to(ids[None], t_enter.shape)], axis=1)
        if n_chunks == 1:
            # single chunk: extract hit slots with masked min-reduces —
            # far cheaper than a top_k sort. Overflow (> p_max hits) drops
            # the highest cluster indices.
            rank = jnp.cumsum(hit.astype(jnp.int32), axis=1)     # [N, Cc]
            col = jnp.broadcast_to(ids[None], hit.shape)
            BIGI = jnp.int32(2 ** 30)
            slots = []
            for j in range(p_max):
                sel = hit & (rank == j + 1)
                slots.append(jnp.min(jnp.where(sel, col, BIGI), axis=1))
            cand_i = jnp.stack(slots, axis=1)
            cand_i = jnp.where(cand_i >= BIGI, -1, cand_i)
            cnt = jnp.minimum(rank[:, -1], p_max)
            return cand_i, cnt
        neg_t, top_idx = jax.lax.top_k(-merged_t, p_max)
        cand_t = -neg_t
        cand_i = jnp.take_along_axis(merged_i, top_idx, axis=1)

    cand_i = jnp.where(jnp.isfinite(cand_t), cand_i, -1)
    cnt = jnp.sum((cand_i >= 0).astype(jnp.int32), axis=1)
    return cand_i, cnt


def _phase_a(sw: SweptHair, ray: Ray, p_max: int):
    num_nodes = sw.nodes.shape[0]
    sentinel = jnp.int32(num_nodes)
    iota = jnp.arange(p_max, dtype=jnp.int32)

    def one(o, d, mint, maxt):
        inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                                jnp.where(d >= 0, 1e-12, -1e-12), d)

        def cond(st):
            return st[0] != sentinel

        def body(st):
            node, cnt, slots = st
            row = sw.nodes[node]
            bmin = row[0:3]
            bmax = row[3:6]
            meta = jax.lax.bitcast_convert_type(row[6], jnp.int32)
            skip = jax.lax.bitcast_convert_type(row[7], jnp.int32)
            kind = meta & 0x1F
            child = meta >> 5
            is_leaf = kind != INNER

            t0 = (bmin - o) * inv_d
            t1 = (bmax - o) * inv_d
            tn = jnp.max(jnp.minimum(t0, t1))
            tf = jnp.min(jnp.maximum(t0, t1)) * 1.00000024 + 1e-7
            hit_box = (tn <= tf) & (tf >= mint) & (tn <= maxt)

            # a leaf holds `kind` (1..MAX_LEAF_CLUSTERS) contiguous clusters
            for k in range(MAX_LEAF_CLUSTERS):
                record = hit_box & is_leaf & (k < kind) & (cnt < p_max)
                slots = jnp.where(record & (iota == cnt), child + k, slots)
                cnt = cnt + record.astype(jnp.int32)

            node = jnp.where(hit_box & ~is_leaf, child, skip)
            return node, cnt, slots

        init = (jnp.int32(0), jnp.int32(0),
                jnp.full((p_max,), -1, jnp.int32))
        _, cnt, slots = jax.lax.while_loop(cond, body, init)
        return slots, cnt

    return jax.vmap(one)(ray.o, ray.d, ray.mint, ray.maxt)


# ---------------------------------------------------------------------------
# Phase B: cluster-major chunked testing
# ---------------------------------------------------------------------------

def _hair_test_chunk(rows, o, d, mint, maxt):
    """rows [K, PRIM_F]; o/d [CH, 3]; → per-ray (t [CH], pid [CH]) best."""
    p0 = rows[:, 0:3]
    p1 = rows[:, 3:6]
    n0 = rows[:, 6:9]
    n1 = rows[:, 9:12]
    r = rows[:, 12]
    pid = jax.lax.bitcast_convert_type(rows[:, PRIM_F - 1], jnp.int32)

    seg = p1 - p0
    axis = seg * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(seg * seg, -1, keepdims=True), 1e-30))

    o_ = o[:, None, :]               # [CH, 1, 3]
    d_ = d[:, None, :]
    ax = axis[None, :, :]            # [1, K, 3]
    rel_o = o_ - p0[None]
    proj_o = rel_o - jnp.sum(ax * rel_o, -1, keepdims=True) * ax
    proj_d = d_ - jnp.sum(ax * d_, -1, keepdims=True) * ax
    a = jnp.sum(proj_d * proj_d, -1)         # [CH, K]
    b = jnp.sum(proj_o * proj_d, -1)
    ok = a > 1e-18
    a_safe = jnp.where(ok, a, 1.0)
    t_mid = -b / a_safe
    q = proj_o + proj_d * t_mid[..., None]
    c_mid = jnp.sum(q * q, -1) - (r * r)[None]
    disc = -c_mid / a_safe
    ok = ok & (disc >= 0.0)
    dt = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = t_mid - dt
    t_far = t_mid + dt

    def miter_ok(t):
        p = o_ + d_ * t[..., None]
        return (jnp.sum((p - p0[None]) * n0[None], -1) >= 0.0) & \
               (jnp.sum((p - p1[None]) * n1[None], -1) <= 0.0)

    near_ok = ok & (t_near >= mint[:, None]) & (t_near <= maxt[:, None]) \
        & miter_ok(t_near)
    far_ok = ok & (t_far >= mint[:, None]) & (t_far <= maxt[:, None]) \
        & miter_ok(t_far)
    t = jnp.where(near_ok, t_near, t_far)
    hit = (pid[None] >= 0) & (near_ok | far_ok)

    t_m = jnp.where(hit, t, jnp.inf)
    k = jnp.argmin(t_m, axis=-1)             # [CH]
    tb = jnp.take_along_axis(t_m, k[:, None], axis=-1)[:, 0]
    pb = jnp.where(jnp.isfinite(tb), pid[k], -1)
    return tb, pb


def swept_closest_hit(sw: SweptHair, ray: Ray, n_clusters: int, K: int,
                      p_max: int = 24, chunk: int = 16, impl: str = "auto"):
    """Returns (t [N], original_prim_id [N]).

    n_clusters, K: static layout ints (seg_rows is [n_clusters*K, PRIM_F]).
    impl: 'pallas' (explicit-DMA phase-B kernel, TPU), 'xla', or 'auto'.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    N = ray.o.shape[0]
    slots, cnt = _phase_a_dense(sw, ray, p_max)   # [N, P], [N]

    P = N * p_max
    pair_c = slots.reshape(P)
    pair_ray = jnp.repeat(jnp.arange(N, dtype=jnp.int32), p_max)
    big = jnp.int32(n_clusters)                   # invalid key sorts last
    keys = jnp.where(pair_c < 0, big, pair_c)

    order = jnp.argsort(keys)
    sc = keys[order]
    sr = pair_ray[order]

    # per-cluster counts & chunk-padded destinations
    counts = jnp.bincount(sc, length=n_clusters + 1)   # last bin = invalid
    counts = counts[:-1]
    padded = ((counts + chunk - 1) // chunk) * chunk
    pad_off = jnp.concatenate([jnp.zeros(1, padded.dtype),
                               jnp.cumsum(padded)])[:-1]
    start = jnp.concatenate([jnp.zeros(1, counts.dtype),
                             jnp.cumsum(counts)])[:-1]
    pos = jnp.arange(P)
    valid_pair = sc < n_clusters
    sc_safe = jnp.minimum(sc, n_clusters - 1)
    rank = pos - start[sc_safe]
    dest = pad_off[sc_safe] + rank

    n_padded = int(np.ceil((N * p_max) / chunk) * chunk
                   + n_clusters * chunk)
    chunk_ray = jnp.full((n_padded,), -1, jnp.int32)
    chunk_ray = chunk_ray.at[jnp.where(valid_pair, dest, n_padded)].set(
        sr, mode="drop")
    chunk_cl = jnp.full((n_padded,), -1, jnp.int32)
    chunk_cl = chunk_cl.at[jnp.where(valid_pair, dest, n_padded)].set(
        sc, mode="drop")

    n_chunks = n_padded // chunk
    cr = chunk_ray.reshape(n_chunks, chunk)
    cc = jnp.max(chunk_cl.reshape(n_chunks, chunk), axis=1)   # [n_chunks]

    ray_o = ray.o
    ray_d = ray.d
    ray_mint = ray.mint
    ray_maxt = ray.maxt

    if impl == "pallas":
        from .pallas_phaseb import phase_b_pallas
        ridx = jnp.maximum(cr, 0)
        rays8 = jnp.stack([
            ray_o[ridx][..., 0], ray_o[ridx][..., 1], ray_o[ridx][..., 2],
            ray_d[ridx][..., 0], ray_d[ridx][..., 1], ray_d[ridx][..., 2],
            ray_mint[ridx],
            # dead lanes get maxt = -1 so nothing can hit
            jnp.where(cr >= 0, ray_maxt[ridx], -1.0),
        ], axis=1)                                     # [n_chunks, 8, CH]
        t_chunks, p_chunks = phase_b_pallas(
            cc, rays8, sw.seg_rows_t, K,
            interpret=(jax.default_backend() != "tpu"))
    else:
        def do_chunk(c_cluster, c_rays):
            rows = jax.lax.dynamic_slice(
                sw.seg_rows, (jnp.maximum(c_cluster, 0) * K, 0),
                (K, PRIM_F))
            ridx = jnp.maximum(c_rays, 0)
            o = ray_o[ridx]
            d = ray_d[ridx]
            mint = ray_mint[ridx]
            maxt = ray_maxt[ridx]
            tb, pb = _hair_test_chunk(rows, o, d, mint, maxt)
            live = (c_rays >= 0) & (c_cluster >= 0)
            return jnp.where(live, tb, jnp.inf), jnp.where(live, pb, -1)

        t_chunks, p_chunks = jax.vmap(do_chunk)(cc, cr)  # [n_chunks, chunk]
    t_flat = t_chunks.reshape(n_padded)
    p_flat = p_chunks.reshape(n_padded)

    # route results back: padded position → sorted pair → original pair
    t_sorted = t_flat[jnp.where(valid_pair, dest, n_padded - 1)]
    p_sorted = p_flat[jnp.where(valid_pair, dest, n_padded - 1)]
    t_sorted = jnp.where(valid_pair, t_sorted, jnp.inf)
    p_sorted = jnp.where(valid_pair, p_sorted, -1)
    # inverse permutation via scatter (cheaper than a second argsort)
    inv = jnp.zeros((P,), jnp.int32).at[order].set(
        jnp.arange(P, dtype=jnp.int32))
    t_pairs = t_sorted[inv].reshape(N, p_max)
    p_pairs = p_sorted[inv].reshape(N, p_max)

    k = jnp.argmin(t_pairs, axis=-1)
    best_t = jnp.take_along_axis(t_pairs, k[:, None], axis=-1)[:, 0]
    best_p = jnp.take_along_axis(p_pairs, k[:, None], axis=-1)[:, 0]
    best_p = jnp.where(jnp.isfinite(best_t), best_p, -1)
    return best_t, best_p


def swept_any_hit(sw: SweptHair, ray: Ray, n_clusters: int, K: int,
                  p_max: int = 24, chunk: int = 16):
    degenerate = ray.maxt <= ray.mint
    t, p = swept_closest_hit(sw, ray, n_clusters, K, p_max, chunk)
    return (p >= 0) & ~degenerate
