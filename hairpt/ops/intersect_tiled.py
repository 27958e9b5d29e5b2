"""Tile-routed cluster-sweep intersection — gather- and sort-free.

Round-1 profiling showed the pair-sorted cluster sweep
(ops/intersect_swept.py) spends 172 of 184 ms/query in routing: a
1.5M-element argsort (78ms), the per-pair ray gather (33ms) and the
result unsort (61ms); the actual Pallas segment tests cost 12ms. This
module removes all three by routing at TILE granularity:

  1. rays are grouped into tiles of TILE *consecutive* rays (camera rays
     are pixel-coherent; bounce waves can be Morton-resorted upstream),
  2. phase A computes each tile's candidate set = the UNION of its rays'
     cluster AABB hits — extracted into fixed slots by one batched
     per-tile sort on entry-t (no per-ray p_max drop: the union keeps
     every cluster any ray hit, up to q_max per tile, nearest first),
  3. the Pallas kernel (pallas_tiled.py) loops each tile over its slot
     list with double-buffered segment DMA; rays arrive as contiguous
     blocks (BlockSpec, not gather) and closest hits accumulate in the
     output block (no unsort).

Replaces the same reference machinery as intersect_swept: the per-hair
kd-tree + Havran traversal (src/shapes/hair.cpp:133-141,
include/mitsuba/render/sahkdtree3.h:178-306) and SSE packet tracing
(include/mitsuba/render/triaccel_sse.h), restructured for a vector
architecture where contiguous-block DMA is ~100x faster than gathers.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import Ray
from .intersect_swept import SweptHair  # same build artifact / layout


def _tile_cluster_mask(sw: SweptHair, ray: Ray, tile: int,
                       c_chunk: int = 2048, bounds=None):
    """Per-tile cluster culling. Returns
      mask   [T, C]  — does any ray of tile t enter cluster c's AABB
      te     [T, C]  — min over the tile's rays of the entry t (inf = miss)
      t_pmax [N]     — per ray, max entry t over ITS candidate clusters
                       (-1 if it has none); bounds when a ray is exhausted.
      octm   [T, C]  — int32, bit o set iff any ray of the tile's o-th
                       8-ray octet enters the cluster (phase-B skip bits)
    Dense slab tests, chunked over clusters. `bounds` overrides the
    (lo, hi) cluster AABB tables (sub-cluster granularity for tiled32)."""
    N = ray.o.shape[0]
    cl_lo, cl_hi = bounds if bounds is not None else (sw.cl_lo, sw.cl_hi)
    C = cl_lo.shape[0]
    T = N // tile
    inv_d = 1.0 / jnp.where(jnp.abs(ray.d) < 1e-12,
                            jnp.where(ray.d >= 0, 1e-12, -1e-12), ray.d)
    o = ray.o
    live = ray.maxt > ray.mint

    masks = []
    tes = []
    octs = []
    t_pmax = jnp.full((N,), -1.0, jnp.float32)
    n_chunks = (C + c_chunk - 1) // c_chunk
    for ci in range(n_chunks):
        lo = cl_lo[ci * c_chunk:(ci + 1) * c_chunk]     # [Cc, 3]
        hi = cl_hi[ci * c_chunk:(ci + 1) * c_chunk]
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
        hit = (tn <= tf) & (tf >= ray.mint[:, None]) \
            & (tn <= ray.maxt[:, None]) & live[:, None]
        t_in = jnp.where(hit, jnp.maximum(tn, 0.0), jnp.inf)   # [N, Cc]
        masks.append(hit.reshape(T, tile, -1).any(axis=1))
        hit_o = hit.reshape(T, tile // 8, 8, -1).any(axis=2)   # [T, 8, Cc]
        oc = jnp.zeros((T, hit_o.shape[-1]), jnp.int32)
        for ob in range(tile // 8):
            oc = oc | (hit_o[:, ob, :].astype(jnp.int32) << ob)
        octs.append(oc)
        te_c = jnp.where(jnp.isfinite(t_in), t_in,
                         jnp.inf).reshape(T, tile, -1).min(axis=1)
        # match cull_phase_a's bf16 te (truncated toward zero — valid
        # lower bound) so CPU/interpret runs exercise the exact same
        # routing invariants as the TPU Pallas path
        te_i = jax.lax.bitcast_convert_type(te_c, jnp.int32)
        te_c = jax.lax.bitcast_convert_type(
            te_i & jnp.int32(-65536), jnp.float32).astype(jnp.bfloat16)
        tes.append(te_c)
        t_pmax = jnp.maximum(
            t_pmax, jnp.max(jnp.where(hit, jnp.maximum(tn, 0.0), -1.0),
                            axis=1))
    if n_chunks > 1:
        return (jnp.concatenate(masks, axis=1),
                jnp.concatenate(tes, axis=1), t_pmax,
                jnp.concatenate(octs, axis=1))
    return masks[0], tes[0], t_pmax, octs[0]


def _cull_pallas(rays8, cl_lo, cl_hi, emit_oct: bool = False):
    """Pallas phase-A culling (pallas_tiled.cull_phase_a) over [C] AABBs,
    lane-padded to CULL_CH with empty boxes. Returns (te [T, C] with
    inf = miss, t_pmax [T, tile][, octm [T, C] octet-hit bits])."""
    from .pallas_tiled import cull_phase_a, CULL_CH
    C = cl_lo.shape[0]
    c_pad = -(-C // CULL_CH) * CULL_CH
    bounds = jnp.full((8, c_pad), 3e37, jnp.float32)
    bounds = bounds.at[3:6].set(-3e37)
    bounds = bounds.at[0:3, :C].set(cl_lo.T)
    bounds = bounds.at[3:6, :C].set(cl_hi.T)
    if emit_oct:
        te, tpmax, octm = cull_phase_a(rays8, bounds, emit_oct=True)
        return te[:, :C], tpmax, octm[:, :C]
    te, tpmax = cull_phase_a(rays8, bounds)
    return te[:, :C], tpmax




TE_BITS = 12            # quantized next-slot entry-t bound (high bits)
TE_INF = (1 << TE_BITS) - 1   # 4095 = +inf sentinel
CID_MASK = (1 << 20) - 1      # cluster id in the low 20 bits (C < 1M)


def _tile_slots(mask, te, q_max: int, return_bound: bool = False,
                oct=None):
    """Extract each tile's hit clusters into [T, q_max] packed slots
    ordered EXACTLY by entry t via one batched sort along the cluster
    axis (replaces an earlier 16-bin counting sort: the 16 [T, C] cumsums
    + scatters it needed were the largest fixed cost of a query — ~6 ms
    on a dead wave — while TPU's batched bitonic sort does the same job
    in well under a millisecond, with exact ordering as a bonus).

    Each packed slot int32 carries `cluster_id | (bq << 20)` where bq is
    the 12-bit floor-quantized suffix-min entry-t bound of all slots AFTER
    this one (floor ⇒ the dequantized value stays a valid lower bound;
    4095 = +inf). Packing both into one scalar-prefetch array keeps
    SMEM ≈ 0.5 MB. Returns (packed [T, q_max], cnt [T], tmin [T],
    tscale [T], overflow).

    return_bound: additionally return (te_last [T], cid_last [T],
    more [T]) — the LAST retained (entry-t, cluster-id) pair in the
    stable lexicographic order and whether clusters were dropped. Every
    dropped cluster is lexicographically after (te_last, cid_last), so a
    hit at t <= te_last is provably the closest (dropped-cluster hits
    happen at t >= their entry-t >= te_last); the exact-overflow loop in
    tiled_closest_hit routes the remainder in later passes."""
    T, C = mask.shape
    # te may arrive bfloat16 (cull_phase_a te_bf16, truncated toward
    # zero ⇒ still a valid lower bound): the sort runs on the narrow
    # dtype (the [T, C] traffic is the point), while the tmin/span/bq
    # quantization arithmetic is f32 (values cast exactly)
    te_f = jnp.where(mask, te, jnp.asarray(jnp.inf, te.dtype))
    tmin = jnp.min(te_f, axis=1, keepdims=True).astype(jnp.float32)
    tmin = jnp.where(jnp.isfinite(tmin), tmin, 0.0)
    tmax = jnp.max(jnp.where(mask, te, jnp.asarray(-jnp.inf, te.dtype)),
                   axis=1, keepdims=True).astype(jnp.float32)
    tmax = jnp.where(jnp.isfinite(tmax), tmax, 1.0)
    span = jnp.maximum(tmax - tmin, 1e-6)

    n_hit = jnp.sum(mask, axis=1)
    cnt = jnp.minimum(n_hit, q_max)
    overflow = jnp.sum((n_hit > q_max).astype(jnp.int32))
    cids = jax.lax.broadcasted_iota(jnp.int32, (T, C), 1)
    te_sorted, cid_sorted = jax.lax.sort((te_f, cids), dimension=1,
                                         num_keys=1)
    if C < q_max:   # fewer clusters than slots: pad with empty entries
        pad = q_max - C
        te_sorted = jnp.concatenate(
            [te_sorted, jnp.full((T, pad), jnp.inf, te_sorted.dtype)],
            axis=1)
        cid_sorted = jnp.concatenate(
            [cid_sorted, jnp.zeros((T, pad), jnp.int32)], axis=1)
    te_slot = te_sorted[:, :q_max]
    slots = cid_sorted[:, :q_max]
    # suffix-min bound of slots AFTER q: exact ordering ⇒ it's just the
    # next slot's entry t (clusters dropped past q_max are farther still)
    te_next = jnp.concatenate(
        [te_slot[:, 1:], jnp.full((T, 1), jnp.inf, te_slot.dtype)],
        axis=1).astype(jnp.float32)
    # floor-quantize to TE_BITS (round down preserves the lower bound)
    scale = (span / (TE_INF - 1))[:, 0]                      # [T]
    bq = jnp.floor((te_next - tmin) / span * (TE_INF - 1))
    bq = jnp.clip(bq, 0, TE_INF - 1).astype(jnp.int32)
    bq = jnp.where(jnp.isfinite(te_next), bq, TE_INF)
    packed = jnp.where(jnp.isfinite(te_slot), slots, 0) | (bq << 20)
    oct_slot = None
    if oct is not None:
        # per-slot octet bits, gathered through the same sorted order
        # (empty slots carry 0 — phase B skips every octet)
        oct_slot = jnp.where(
            jnp.isfinite(te_slot),
            jnp.take_along_axis(oct, jnp.minimum(slots, C - 1), axis=1),
            0)
    if return_bound:
        more = n_hit > q_max
        te_last = jnp.where(more, te_sorted[:, q_max - 1], jnp.inf)
        cid_last = jnp.where(more, cid_sorted[:, q_max - 1], 0)
        bound = (te_last, cid_last, more)
        if oct is not None:
            return packed, cnt, tmin[:, 0], scale, overflow, bound, \
                oct_slot
        return packed, cnt, tmin[:, 0], scale, overflow, bound
    if oct is not None:
        return packed, cnt, tmin[:, 0], scale, overflow, oct_slot
    return packed, cnt, tmin[:, 0], scale, overflow


def _octet_streams(mask, te, octm, q_max: int, qo: int, W: int):
    """Routing for the windowed octet-stream kernel (pallas_tiled
    stream_phase_b): extract tile slots in exact entry-t order (as
    _tile_slots), then compact each slot's octet-incidence bits into
    eight per-octet streams whose entries carry the slot index and the
    12-bit floor-quantized suffix bound of the SAME stream.

    qo must be <= q_max (enforced by the caller).
    Returns (cids [T, q_max], streams [T, 8, qo], off [T, n_win+1, 8],
    cnt [T], tmin [T], tscale [T], overflow, (te_l, cid_l, more)):
    the bound triple covers BOTH slot-level overflow (> q_max
    candidates) and stream truncation (> qo entries for some octet) —
    every dropped (slot, octet) incidence is lexicographically after
    (te_l, cid_l), so the exact-overflow completion loop can re-route
    the remainder (re-testing some already-covered octets is harmless:
    closest/any-hit merges are idempotent)."""
    T, C = mask.shape
    te_f = jnp.where(mask, te, jnp.asarray(jnp.inf, te.dtype))
    tmin = jnp.min(te_f, axis=1, keepdims=True).astype(jnp.float32)
    tmin = jnp.where(jnp.isfinite(tmin), tmin, 0.0)
    tmax = jnp.max(jnp.where(mask, te, jnp.asarray(-jnp.inf, te.dtype)),
                   axis=1, keepdims=True).astype(jnp.float32)
    tmax = jnp.where(jnp.isfinite(tmax), tmax, 1.0)
    span = jnp.maximum(tmax - tmin, 1e-6)
    scale = (span / (TE_INF - 1))[:, 0]

    n_hit = jnp.sum(mask, axis=1)
    cnt = jnp.minimum(n_hit, q_max)
    cids_full = jax.lax.broadcasted_iota(jnp.int32, (T, C), 1)
    te_sorted, cid_sorted = jax.lax.sort((te_f, cids_full), dimension=1,
                                         num_keys=1)
    if C < q_max:
        padn = q_max - C
        te_sorted = jnp.concatenate(
            [te_sorted, jnp.full((T, padn), jnp.inf, te_sorted.dtype)],
            axis=1)
        cid_sorted = jnp.concatenate(
            [cid_sorted, jnp.zeros((T, padn), jnp.int32)], axis=1)
    te_slot = te_sorted[:, :q_max]
    cids = cid_sorted[:, :q_max]
    valid_slot = jnp.isfinite(te_slot)
    cids = jnp.where(valid_slot, cids, 0)

    # per-slot octet bits through the sorted order
    oct_slot = jnp.where(
        valid_slot,
        jnp.take_along_axis(octm, jnp.minimum(cids, C - 1), axis=1), 0)

    # eight compacted streams: stable sort set-bit slot indices first
    qidx = jax.lax.broadcasted_iota(jnp.int32, (T, 8, q_max), 2)
    bits = ((oct_slot[:, None, :] >> jnp.arange(8)[None, :, None]) & 1) \
        .astype(bool)
    key = jnp.where(bits, qidx, (1 << 13) | qidx)
    key_sorted = jax.lax.sort(key.reshape(T * 8, q_max),
                              dimension=1).reshape(T, 8, q_max)
    stream_q = (key_sorted & 0xFFF)[:, :, :qo]
    valid_s = key_sorted[:, :, :qo] < (1 << 13)
    cnt8 = jnp.sum(bits, axis=2)                        # [T, 8]

    te_bc = jnp.broadcast_to(te_slot[:, None, :], (T, 8, q_max))
    te_ent = jnp.take_along_axis(te_bc, stream_q, axis=2)
    te_ent = jnp.where(valid_s, te_ent, jnp.asarray(jnp.inf,
                                                    te_ent.dtype))
    te_next = jnp.concatenate(
        [te_ent[:, :, 1:], jnp.full((T, 8, 1), jnp.inf, te_ent.dtype)],
        axis=2).astype(jnp.float32)
    bq = jnp.floor((te_next - tmin[:, :, None]) / span[:, :, None]
                   * (TE_INF - 1))
    bq = jnp.clip(bq, 0, TE_INF - 1).astype(jnp.int32)
    bq = jnp.where(jnp.isfinite(te_next), bq, TE_INF)
    streams = jnp.where(valid_s, stream_q | (bq << 12),
                        jnp.int32(TE_INF << 12))

    # per-window offsets (cumulative stream entries with q < w*W)
    n_win = (q_max + W - 1) // W
    thr = (jnp.arange(n_win + 1) * W).astype(jnp.int32)
    off = jnp.sum((stream_q[:, :, :, None] < thr[None, None, None, :])
                  & valid_s[:, :, :, None], axis=2)      # [T, 8, n_win+1]
    off = jnp.swapaxes(off, 1, 2).astype(jnp.int32)      # [T, n_win+1, 8]

    # completion bounds: slot-level overflow + per-octet truncation
    more_slot = n_hit > q_max
    te_l_slot = jnp.where(more_slot, te_sorted[:, q_max - 1], jnp.inf)
    cid_l_slot = jnp.where(more_slot, cid_sorted[:, q_max - 1], 0)
    trunc = cnt8 > qo                                    # [T, 8]
    last_q = jnp.where(trunc, stream_q[:, :, qo - 1], 0)
    te_l_oct = jnp.where(trunc, te_ent[:, :, qo - 1], jnp.inf)
    cid_l_oct = jnp.take_along_axis(cids, last_q, axis=1)  # [T, 8]
    cid_l_oct = jnp.where(trunc, cid_l_oct, 0)
    # lexicographic min over the 8 octet bounds, then vs the slot bound
    # (ties on te take the smallest cid so no dropped incidence can
    # precede the bound)
    te_l = te_l_oct.min(axis=1)
    cid_l = jnp.min(jnp.where(te_l_oct == te_l[:, None], cid_l_oct,
                              jnp.int32(2**30)), axis=1)
    cid_l = jnp.where(jnp.isfinite(te_l), cid_l, 0)
    take_slot = (te_l_slot < te_l) \
        | ((te_l_slot == te_l) & (cid_l_slot < cid_l))
    te_l = jnp.where(take_slot, te_l_slot, te_l)
    cid_l = jnp.where(take_slot, cid_l_slot, cid_l)
    more = more_slot | jnp.any(trunc, axis=1)
    te_l = jnp.where(more, te_l, jnp.inf)
    overflow = jnp.sum(more.astype(jnp.int32))
    return (cids, streams, off, cnt, tmin[:, 0], scale, overflow,
            (te_l, cid_l, more))


def _pad_rays(ray: Ray, tile: int):
    N = ray.o.shape[0]
    pad = (-N) % tile
    if pad == 0:
        return ray, N
    z3 = jnp.zeros((pad, 3), jnp.float32)
    return Ray(o=jnp.concatenate([ray.o, z3]),
               d=jnp.concatenate([ray.d, z3.at[:, 2].set(1.0)]),
               mint=jnp.concatenate([ray.mint, jnp.zeros(pad)]),
               maxt=jnp.concatenate([ray.maxt, jnp.full(pad, -1.0)])), N


def _morton_sort_rays(sw: SweptHair, ray: Ray):
    """Sort rays by (direction octant, origin Morton code) to restore
    tile coherence for bounce/shadow waves (camera waves are already
    pixel-coherent; the ~N-element argsort is far cheaper than the pair
    inflation of incoherent tiles). Dead rays (maxt<=mint) sort last so
    their tiles are skipped by the kernel. Returns (sorted ray, order)."""
    lo = jnp.min(sw.cl_lo, axis=0)
    hi = jnp.max(sw.cl_hi, axis=0)
    inv = 1.0 / jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip(((ray.o - lo) * inv) * 255.0, 0.0, 255.0).astype(jnp.uint32)
    m = jnp.zeros(ray.o.shape[:-1], jnp.uint32)
    for b in range(8):  # interleave 8 bits per axis
        for ax in range(3):
            m = m | (((q[..., ax] >> b) & 1) << (3 * b + ax))
    octant = ((ray.d[..., 0] > 0).astype(jnp.uint32)
              | ((ray.d[..., 1] > 0).astype(jnp.uint32) << 1)
              | ((ray.d[..., 2] > 0).astype(jnp.uint32) << 2))
    key = m | (octant << 24)
    key = jnp.where(ray.maxt > ray.mint, key, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key)
    ray_s = Ray(o=ray.o[order], d=ray.d[order], mint=ray.mint[order],
                maxt=ray.maxt[order])
    return ray_s, order


def tiled_closest_hit(sw: SweptHair, ray: Ray, n_clusters: int, K: int,
                      tile: int = 64, q_max: int = 128, impl: str = "auto",
                      return_overflow: bool = False, mode: str = "closest",
                      sort_rays: bool = False, subcull: bool = False,
                      two_round: int = 0, compact: bool = True,
                      resident: bool | None = None,
                      unroll: int | None = None,
                      exact_overflow: bool = True,
                      short_t: float = 0.0, octets: bool = False,
                      streams: bool = False, stream_qo: int | None = None,
                      stream_w: int = 64, stream_unroll: int = 4):
    """Closest hit over the cluster layout. Returns (t [N], prim_id [N]).

    n_clusters, K are the static cluster-layout ints; tile and q_max are
    routing knobs (q_max caps candidate clusters per tile — overflow drops
    the farthest entry-t clusters and is reported via return_overflow).
    mode='any' lets the kernel stop a tile as soon as every ray has found
    some hit (shadow queries). sort_rays restores coherence for bounce
    waves via a Morton/octant resort (results are unsorted back).
    subcull culls phase A against the 4×-tighter 32-segment sub-cluster
    AABBs and OR-reduces to cluster rows — fewer clusters reach the
    kernel at the cost of a denser slab test. (A kernel that DMA'd
    32-segment sub-clusters directly is impossible: Mosaic tiles HBM
    refs (1,128) too, folding 4 sub-rows per lane tile, so sub-128-lane
    DMA source slices are rejected — the tighter granularity has to live
    on the culling side.)
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() in ("tpu", "axon") \
            else "interpret"
    # env knobs resolved at THIS call's trace time. For direct kernel
    # calls (probes/tests) that is outside any jit; when
    # tiled_closest_hit is itself traced inside a jitted wave (e2e
    # renders), the value read here is frozen into that outer
    # compilation — change HAIRPT_UNROLL only between process starts,
    # or pass `unroll=` explicitly (ADVICE r3: env edits between
    # renders in one process do not retrace a cached wave)
    if unroll is None:
        # 8-slot unroll measured best on v5e (r3: 512² e2e wave 2270 →
        # 2159 ms vs unroll=4; closest-hit 2.35 → 2.41 Mrays/s)
        unroll = int(os.environ.get("HAIRPT_UNROLL", "8"))

    if streams and K < 128 and (impl == "pallas" or impl == "auto"):
        # Mosaic rejects DMA source slices narrower than 128 lanes; the
        # stream kernel always streams clusters from HBM, so sub-128
        # cluster widths keep the dense kernel (VMEM-resident there)
        streams = False
    if streams:
        if stream_qo is None:
            stream_qo = max(256, q_max // 4)
        # a per-octet stream can never hold more than q_max entries; a
        # larger qo would silently mis-shape the SMEM layout (jnp slice
        # clipping) and misalign every octet past the first
        stream_qo = min(stream_qo, q_max)

    if short_t > 0.0 and sort_rays:
        # SHORT-RAY-FIRST two-phase query for bounce/shadow waves: in
        # dense fur almost every secondary ray terminates within a few
        # cluster diameters of its origin, yet an UNclamped ray's
        # phase-A candidate set is every cluster along its whole line
        # (measured mean 731 clusters/tile for incoherent rays vs 82
        # for camera tiles). Phase 1 clamps maxt to short_t — the cull
        # only keeps clusters ENTERED within the clamp, so unions
        # collapse — and resolves the vast majority. Phase 2 re-runs
        # ONLY escaping rays (mint moved to the clamp, dead lanes
        # elsewhere) — the Morton dead-last sort + liveness compaction
        # inside the recursive call shrinks that pass to a fraction of
        # the wave width. Exact: a phase-1 hit t <= short_t is globally
        # closest; the phase-2 interval [short_t(1-1e-4), maxt] keeps
        # boundary-straddling clusters via the slab tf >= mint test.
        kw = dict(tile=tile, q_max=q_max, impl=impl, mode=mode,
                  sort_rays=True, subcull=subcull, compact=compact,
                  resident=resident, unroll=unroll,
                  exact_overflow=exact_overflow, short_t=0.0,
                  octets=octets, streams=streams, stream_qo=stream_qo,
                  stream_w=stream_w, stream_unroll=stream_unroll)
        ray1 = ray._replace(maxt=jnp.minimum(ray.maxt, short_t))
        t1, p1, ov1 = tiled_closest_hit(sw, ray1, n_clusters, K,
                                        return_overflow=True, **kw)
        unresolved = (p1 < 0) & (ray.maxt > short_t) \
            & (ray.maxt > ray.mint)
        ray2 = ray._replace(
            mint=jnp.maximum(ray.mint, short_t * (1.0 - 1e-4)),
            maxt=jnp.where(unresolved, ray.maxt, 0.0))
        t2, p2, ov2 = tiled_closest_hit(sw, ray2, n_clusters, K,
                                        return_overflow=True, **kw)
        hit1 = p1 >= 0
        t = jnp.where(hit1, t1, t2)
        p = jnp.where(hit1, p1, p2)
        if return_overflow:
            return t, p, ov1 + ov2
        return t, p
    order = None
    if sort_rays:
        ray, order = _morton_sort_rays(sw, ray)
    N = ray.o.shape[0]

    def _run(ray_in):
        """Full query pipeline on a ray array of ANY static length:
        pad → phase A cull → slot routing → phase B (+ optional
        two-round). Returns (t [len], p [len], overflow)."""
        ray_p, n_in = _pad_rays(ray_in, tile)
        Np = ray_p.o.shape[0]
        T = Np // tile

        rays8 = jnp.stack([
            ray_p.o[:, 0].reshape(T, tile), ray_p.o[:, 1].reshape(T, tile),
            ray_p.o[:, 2].reshape(T, tile),
            ray_p.d[:, 0].reshape(T, tile), ray_p.d[:, 1].reshape(T, tile),
            ray_p.d[:, 2].reshape(T, tile),
            ray_p.mint.reshape(T, tile), ray_p.maxt.reshape(T, tile),
        ], axis=1)                                         # [T, 8, tile]

        def one_pass(ray_q, rays8_q, q_cap):
            """phase A cull → slot routing → phase B, at slot cap q_cap,
            CHUNKED over tiles so the [T, C] cull/routing temporaries stay
            bounded at north-star scale (1024² × 8k clusters would
            otherwise materialize ~0.5 GB per buffer through the routing
            sort). Returns (t_tiles [T, tile], p_tiles [T, tile],
            overflow)."""
            cull_bounds = (sw.sub_lo, sw.sub_hi) if subcull \
                else (sw.cl_lo, sw.cl_hi)
            C_eff = cull_bounds[0].shape[0]
            from .pallas_tiled import tiled_phase_b
            # tile-chunk size: ~0.87 MB of SMEM slots for phase B (the
            # hardware SMEM budget is exactly 1 MB — leave slack for
            # GROUP_T padding rows + the cnt/tmin/tscale prefetch
            # arrays) and ≤ ~128 MB of [Tc, C] f32 cull temporaries
            # (larger exact-overflow q_caps would otherwise shrink
            # chunks and multiply per-chunk routing-sort overhead)
            if streams:
                # stream mode SMEM per tile: cid table + 8 per-octet
                # streams + window offsets
                n_win_s = (q_cap + stream_w - 1) // stream_w
                per_tile = (q_cap + 8 * stream_qo
                            + (n_win_s + 1) * 8) * 4
            else:
                slot_bytes = 8 if octets else 4   # packed + octet words
                per_tile = q_cap * slot_bytes
            t_chunk = max(1, ((1 << 20) * 7 // 8) // per_tile)
            t_chunk = min(t_chunk, max(1, (1 << 25) // max(C_eff, 1)))

            def chunk_fn(args):
                rays8_c, ray_flat = args
                ray_c = Ray(o=ray_flat[..., 0:3], d=ray_flat[..., 3:6],
                            mint=ray_flat[..., 6], maxt=ray_flat[..., 7])
                if impl == "pallas":
                    # phase A as a Pallas kernel: the jnp form streams
                    # [N, C] temporaries through HBM (51/60 ms per query)
                    if octets or streams:
                        te_s, t_pmax_t, oct_s = _cull_pallas(
                            rays8_c, cull_bounds[0], cull_bounds[1],
                            emit_oct=True)
                    else:
                        te_s, t_pmax_t = _cull_pallas(
                            rays8_c, cull_bounds[0], cull_bounds[1])
                        oct_s = None
                    mask_s = jnp.isfinite(te_s)
                else:
                    mask_s, te_s, t_pmax, oct_s = _tile_cluster_mask(
                        sw, ray_c, tile, bounds=cull_bounds)
                    if not (octets or streams):
                        oct_s = None
                    t_pmax_t = t_pmax.reshape(-1, tile)
                if subcull:
                    n_sub = K // 32   # sub-clusters per row (build: %32)
                    mask = mask_s.reshape(-1, n_clusters, n_sub).any(-1)
                    te = te_s.reshape(-1, n_clusters, n_sub).min(-1)
                    octm = None
                    if oct_s is not None:
                        oc3 = oct_s.reshape(-1, n_clusters, n_sub)
                        octm = oc3[:, :, 0]
                        for si_ in range(1, n_sub):
                            octm = octm | oc3[:, :, si_]
                else:
                    mask, te, octm = mask_s, te_s, oct_s
                C_full = mask.shape[1]
                any_mode = (mode == "any")
                octm_in = octm if octets else None

                if streams:
                    # windowed octet-stream phase B (pallas_tiled
                    # stream_phase_b): per-octet compacted slot lists,
                    # union-granularity window DMA
                    from .pallas_tiled import stream_phase_b

                    def run_streams(mask_k, rays8_k):
                        cids_s, strm, offs, cnt_s, tmn, tsc, ov_k, bnd = \
                            _octet_streams(mask_k, te, octm, q_cap,
                                           stream_qo, stream_w)
                        t2, p2 = stream_phase_b(
                            cids_s, strm, offs, cnt_s, tmn, tsc, rays8_k,
                            t_pmax_t, sw.seg_rows_t, K, q_cap, stream_qo,
                            stream_w, any_hit=any_mode,
                            interpret=(impl == "interpret"),
                            unroll=stream_unroll)
                        return t2, p2, ov_k, bnd

                    if not (exact_overflow
                            and (C_full > q_cap or C_full > stream_qo)):
                        t_c, p_c, ov, _ = run_streams(mask, rays8_c)
                        return t_c, p_c, ov

                    cids = jax.lax.broadcasted_iota(jnp.int32, mask.shape,
                                                    1)
                    Tc = mask.shape[0]
                    TILE_ = rays8_c.shape[2]

                    def _unresolved(t_k, p_k, te_l, more_k):
                        u = (p_k < 0) if any_mode \
                            else (t_k > te_l[:, None])
                        return u & more_k[:, None] \
                            & (te_l[:, None] <= t_pmax_t)

                    def ov_cond(carry):
                        t_k, p_k, te_l, cid_l, more_k, _, _ = carry
                        return jnp.any(_unresolved(t_k, p_k, te_l,
                                                   more_k))

                    def ov_body(carry):
                        t_k, p_k, te_l, cid_l, more_k, ov_acc, k_pass = \
                            carry
                        mask_k = mask & ((te > te_l[:, None])
                                         | ((te == te_l[:, None])
                                            & (cids > cid_l[:, None])))
                        rays8_k = rays8_c.at[:, 7, :].set(
                            jnp.minimum(rays8_c[:, 7, :], t_k))
                        t2, p2, ov_k, (te_l2, cid_l2, more2) = \
                            run_streams(mask_k, rays8_k)
                        better = t2 < t_k
                        ov_acc = jnp.where(k_pass == 0, ov_k, ov_acc)
                        return (jnp.where(better, t2, t_k),
                                jnp.where(better, p2, p_k),
                                te_l2, cid_l2, more2, ov_acc, k_pass + 1)

                    init = (jnp.full((Tc, TILE_), jnp.inf, jnp.float32),
                            jnp.full((Tc, TILE_), -1, jnp.int32),
                            jnp.full((Tc,), -jnp.inf, te.dtype),
                            jnp.full((Tc,), -1, jnp.int32),
                            jnp.ones((Tc,), bool),
                            jnp.int32(0), jnp.int32(0))
                    t_c, p_c, _, _, _, ov, _ = jax.lax.while_loop(
                        ov_cond, ov_body, init)
                    return t_c, p_c, ov

                if not (exact_overflow and C_full > q_cap):
                    # capacity covers every cluster: single pass, no
                    # completion machinery in the program at all
                    slots, cnt, tmin, tscale, ov, oct_sl = _tile_slots(
                        mask, te, q_cap, oct=octm) if octets else \
                        (*_tile_slots(mask, te, q_cap), None)
                    # ordered traversal: slots are sorted by tile
                    # entry-t with suffix-min bounds; the packed slot
                    # table is scalar-prefetched into SMEM.
                    t_c, p_c = tiled_phase_b(
                        slots, cnt, tmin, tscale, rays8_c,
                        t_pmax_t, sw.seg_rows_t, K, q_cap,
                        any_hit=any_mode,
                        interpret=(impl == "interpret"),
                        exit_every=1, resident=resident, unroll=unroll,
                        oct=oct_sl)
                    return t_c, p_c, ov

                # EXACT completion for q_cap overflow (the reference's
                # contract, hair.cpp:485-542, admits no dropped hits):
                # route + phase B run INSIDE one while_loop — the first
                # iteration IS the ordinary pass (bound = -inf), and
                # overflowing tiles re-route the clusters
                # lexicographically AFTER the last retained
                # (entry-t, cid) pair until every ray either holds a hit
                # at t <= the first dropped cluster's entry-t (provably
                # closest: dropped-cluster hits lie at t >= their
                # entry-t >= bound), has exhausted its own candidates
                # (personal t_pmax below the bound), or candidates ran
                # out. Terminates in <= ceil(C/q_cap) passes; ONE
                # phase-B instance in the program either way.
                cids = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1)
                Tc = mask.shape[0]
                TILE_ = rays8_c.shape[2]

                def _unresolved(t_k, p_k, te_l, more_k):
                    u = (p_k < 0) if any_mode \
                        else (t_k > te_l[:, None])
                    # per-ray candidate exhaustion: a ray whose max
                    # PERSONAL entry-t (t_pmax) is below the bound has
                    # no remaining candidates — its personal entry into
                    # any dropped cluster c satisfies entry_r(c) >=
                    # tile_te(c) >= te_l > t_pmax(r). Without this,
                    # unoccluded shadow rays would force completion
                    # passes over the whole cluster list.
                    return u & more_k[:, None] \
                        & (te_l[:, None] <= t_pmax_t)

                def ov_cond(carry):
                    t_k, p_k, te_l, cid_l, more_k, _, _ = carry
                    return jnp.any(_unresolved(t_k, p_k, te_l, more_k))

                def ov_body(carry):
                    t_k, p_k, te_l, cid_l, more_k, ov_acc, k_pass = carry
                    mask_k = mask & ((te > te_l[:, None])
                                     | ((te == te_l[:, None])
                                        & (cids > cid_l[:, None])))
                    if octets:
                        s2, c2, tm2, ts2, ov_k, \
                            (te_l2, cid_l2, more2), oct_sl = _tile_slots(
                                mask_k, te, q_cap, return_bound=True,
                                oct=octm_in)
                    else:
                        s2, c2, tm2, ts2, ov_k, \
                            (te_l2, cid_l2, more2) = _tile_slots(
                                mask_k, te, q_cap, return_bound=True)
                        oct_sl = None
                    rays8_k = rays8_c.at[:, 7, :].set(
                        jnp.minimum(rays8_c[:, 7, :], t_k))
                    t2, p2 = tiled_phase_b(
                        s2, c2, tm2, ts2, rays8_k, t_pmax_t,
                        sw.seg_rows_t, K, q_cap, any_hit=any_mode,
                        interpret=(impl == "interpret"),
                        exit_every=1, resident=resident, unroll=unroll,
                        oct=oct_sl)
                    better = t2 < t_k
                    ov_acc = jnp.where(k_pass == 0, ov_k, ov_acc)
                    return (jnp.where(better, t2, t_k),
                            jnp.where(better, p2, p_k),
                            te_l2, cid_l2, more2, ov_acc, k_pass + 1)

                init = (jnp.full((Tc, TILE_), jnp.inf, jnp.float32),
                        jnp.full((Tc, TILE_), -1, jnp.int32),
                        jnp.full((Tc,), -jnp.inf, te.dtype),
                        jnp.full((Tc,), -1, jnp.int32),
                        jnp.ones((Tc,), bool),
                        jnp.int32(0), jnp.int32(0))
                t_c, p_c, _, _, _, ov, _ = jax.lax.while_loop(
                    ov_cond, ov_body, init)
                return t_c, p_c, ov

            if T <= t_chunk:
                ray_flat = jnp.concatenate(
                    [ray_q.o, ray_q.d, ray_q.mint[:, None],
                     ray_q.maxt[:, None]], axis=-1)
                t_tiles, p_tiles, overflow = chunk_fn((rays8_q, ray_flat))
                return t_tiles, p_tiles, overflow
            # chunk over tiles via lax.map so the chunk body (cull +
            # routing sort + phase-B kernel) is compiled ONCE, not
            # unrolled T/t_chunk times (the unrolled form took the 1024²
            # megakernel's compile past 30 minutes)
            n_ch = -(-T // t_chunk)
            Tp = n_ch * t_chunk
            if Tp != T:
                padn = (Tp - T) * tile
                z3 = jnp.zeros((padn, 3), jnp.float32)
                ray_q = Ray(o=jnp.concatenate([ray_q.o, z3]),
                            d=jnp.concatenate([ray_q.d,
                                               z3.at[:, 2].set(1.0)]),
                            mint=jnp.concatenate(
                                [ray_q.mint, jnp.zeros(padn)]),
                            maxt=jnp.concatenate(
                                [ray_q.maxt, jnp.full(padn, -1.0)]))
                pad8 = jnp.zeros((Tp - T,) + rays8_q.shape[1:],
                                 jnp.float32)
                pad8 = pad8.at[:, 5].set(1.0).at[:, 7].set(-1.0)
                rays8_q = jnp.concatenate([rays8_q, pad8])
            ray_flat = jnp.concatenate(
                [ray_q.o, ray_q.d, ray_q.mint[:, None],
                 ray_q.maxt[:, None]], axis=-1)
            r8_ch = rays8_q.reshape((n_ch, t_chunk) + rays8_q.shape[1:])
            rf_ch = ray_flat.reshape(n_ch, t_chunk * tile, 8)
            t_ch, p_ch, ov_ch = jax.lax.map(chunk_fn, (r8_ch, rf_ch))
            t_tiles = t_ch.reshape(Tp, tile)[:T]
            p_tiles = p_ch.reshape(Tp, tile)[:T]
            return t_tiles, p_tiles, jnp.sum(ov_ch)

        if two_round > 0 and mode == "closest":
            # round 1: only each tile's nearest two_round clusters — most
            # rays find their closest hit immediately; round 2 re-culls
            # with the tightened per-ray maxt (a cluster whose entry t
            # exceeds the round-1 hit cannot contain a closer one), so the
            # surviving candidate unions collapse. Exact: the true closest
            # hit's cluster entry t is ≤ its distance ≤ the round-1 bound.
            t1_t, p1_t, _ = one_pass(ray_p, rays8, two_round)
            t1_flat = t1_t.reshape(Np)
            maxt2 = jnp.minimum(ray_p.maxt, t1_flat)
            ray_r2 = ray_p._replace(maxt=maxt2)
            rays8_r2 = rays8.at[:, 7, :].set(maxt2.reshape(T, tile))
            t2_t, p2_t, overflow = one_pass(ray_r2, rays8_r2, q_max)
            better = t2_t < t1_t
            t_tiles = jnp.where(better, t2_t, t1_t)
            p_tiles = jnp.where(better, p2_t, p1_t)
        else:
            t_tiles, p_tiles, overflow = one_pass(ray_p, rays8, q_max)
        return (t_tiles.reshape(Np)[:n_in], p_tiles.reshape(Np)[:n_in],
                overflow)

    # liveness-adaptive compaction: after the dead-last sort, mostly-dead
    # waves (deep bounces under RR) run the WHOLE pipeline — phase A grid,
    # [T, C] routing sort, phase B grid — on a statically-sliced prefix
    # whose capacity is picked by the live count. Fixed per-query cost
    # becomes ~proportional to liveness instead of to the wave width
    # (measured 10 ms/bounce of dead-wave overhead at 256², §depth-sweep).
    caps = []
    if order is not None and N >= 4 * tile and compact:
        for f in (4, 16):
            M = max(tile, (-(-N // f) // tile) * tile)   # ceil to tile
            if M < N and M not in caps:
                caps.append(M)
    if caps:
        live = jnp.sum(ray.maxt > ray.mint)

        def full_branch(ray_b):
            return _run(ray_b)

        def make_branch(M):
            def br(ray_b):
                sub = Ray(o=ray_b.o[:M], d=ray_b.d[:M],
                          mint=ray_b.mint[:M], maxt=ray_b.maxt[:M])
                t_m, p_m, ov = _run(sub)
                t_f = jnp.concatenate(
                    [t_m, jnp.full((N - M,), jnp.inf, jnp.float32)])
                p_f = jnp.concatenate(
                    [p_m, jnp.full((N - M,), -1, jnp.int32)])
                return t_f, p_f, ov
            return br

        branches = [full_branch] + [make_branch(M) for M in caps]
        idx = jnp.int32(0)
        for k_, M in enumerate(caps):
            idx = jnp.where(live <= M, jnp.int32(k_ + 1), idx)
        t, p, overflow = jax.lax.switch(idx, branches, ray)
    else:
        t, p, overflow = _run(ray)
    if order is not None:
        # inverse permutation via scatter
        inv = jnp.zeros((N,), jnp.int32).at[order].set(
            jnp.arange(N, dtype=jnp.int32))
        t = t[inv]
        p = p[inv]
    if return_overflow:
        return t, p, overflow
    return t, p


def tiled_any_hit(sw: SweptHair, ray: Ray, n_clusters: int, K: int,
                  tile: int = 64, q_max: int = 128, impl: str = "auto",
                  sort_rays: bool = False, subcull: bool = False,
                  compact: bool = True, resident: bool | None = None,
                  unroll: int | None = None, exact_overflow: bool = True,
                  short_t: float = 0.0, octets: bool = False,
                  streams: bool = False, stream_qo: int | None = None,
                  stream_w: int = 64, stream_unroll: int = 4):
    degenerate = ray.maxt <= ray.mint
    t, p = tiled_closest_hit(sw, ray, n_clusters, K, tile, q_max, impl,
                             mode="any", sort_rays=sort_rays,
                             subcull=subcull, compact=compact,
                             resident=resident, unroll=unroll,
                             exact_overflow=exact_overflow,
                             short_t=short_t, octets=octets,
                             streams=streams, stream_qo=stream_qo,
                             stream_w=stream_w,
                             stream_unroll=stream_unroll)
    return (p >= 0) & ~degenerate
