"""Pallas TPU kernel for tile-routed hair intersection (phase B').

Unlike pallas_phaseb (which consumes a cluster-sorted pair list built by a
1.5M-element argsort + gathers — 170ms of host-side routing per query),
this kernel keeps rays in their natural tile order: each grid program owns
GROUP_T tiles of TILE contiguous rays, reads each tile's candidate-cluster
list (scalar-prefetched), and loops over the list with double-buffered
HBM→VMEM segment DMA, accumulating per-ray closest hits in the output
block. No sort, no ray gather, no result unsort.

Layout contract (from intersect_tiled.tiled_closest_hit):
  slots    : [T * q_max] int32 cluster ids per tile (scalar prefetch)
  cnt      : [T] int32 live clusters per tile (scalar prefetch)
  rays8    : [T, 8, TILE] float32 (o.xyz, d.xyz, mint, maxt rows;
             dead lanes carry maxt < 0)
  seg_rows : [C, PRIM_F, K] float32 in HBM (cluster-major segment tiles)
Output:
  t_out    : [T, TILE] float32 (inf = miss)
  pid_out  : [T, TILE] int32   (-1 = miss)
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect_packed import PRIM_F

GROUP_T = 8  # tiles per pallas program ((8, 128) output tiling)


def _cyl_test_tm(rows, rays):
    """Dense miter-cylinder test: rows [PRIM_F, K] (one cluster's segments),
    rays [8, CH] → (t_m [CH, K] with inf = miss, pid_row [1, K]) —
    UNREDUCED so the kernel can defer the per-slot lane reduction to a
    [TILE, K] running min (merge = 3 VPU ops/slot vs ~16 for the
    reduce+select tail; the reduction happens once per early-exit check
    and once per tile instead of once per slot).

    Math identical to the reference HairShape::rayIntersect
    (src/shapes/hair.cpp:485-542): project the ray into the plane ⊥ segment
    axis, solve the recentered quadratic, accept roots between the miter
    planes — vectorized as [CH, K] component-wise VPU ops. The rows carry
    the build-time precomputed unit axis, sn1 = (p1−p0)·n1 and r² (see
    intersect_swept.build_swept_hair) — the kernel is VPU-compute-bound,
    so the ~19 per-slot-iteration ops those replace come straight off the
    bounce-wave time.
    """
    def seg(j):
        return rows[j][None, :]           # [1, K]

    def rayc(j):
        return rays[j][:, None]           # [CH, 1]

    p0x, p0y, p0z = seg(0), seg(1), seg(2)
    ax_, ay_, az_ = seg(3), seg(4), seg(5)
    n0x, n0y, n0z = seg(6), seg(7), seg(8)
    n1x, n1y, n1z = seg(9), seg(10), seg(11)
    sn1 = seg(13)                         # (p1−p0)·n1, [1, K]
    rr2 = seg(14)                         # r², [1, K]
    pid_row = pltpu.bitcast(rows[PRIM_F - 1][None, :], jnp.int32)

    ox, oy, oz = rayc(0), rayc(1), rayc(2)
    dx, dy, dz = rayc(3), rayc(4), rayc(5)
    mint2 = rayc(6)
    maxt2 = rayc(7)

    rx, ry, rz = ox - p0x, oy - p0y, oz - p0z
    ar = ax_ * rx + ay_ * ry + az_ * rz
    pox, poy, poz = rx - ar * ax_, ry - ar * ay_, rz - ar * az_
    ad = ax_ * dx + ay_ * dy + az_ * dz
    pdx, pdy, pdz = dx - ad * ax_, dy - ad * ay_, dz - ad * az_

    a = pdx * pdx + pdy * pdy + pdz * pdz
    b = pox * pdx + poy * pdy + poz * pdz
    ok = a > 1e-18
    a_safe = jnp.where(ok, a, 1.0)
    inv_a = 1.0 / a_safe          # one reciprocal replaces two divisions
    t_mid = -b * inv_a
    qx, qy, qz = pox + pdx * t_mid, poy + pdy * t_mid, poz + pdz * t_mid
    c_mid = qx * qx + qy * qy + qz * qz - rr2
    disc = -c_mid * inv_a
    ok = ok & (disc >= 0.0)
    dt = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = t_mid - dt
    t_far = t_mid + dt

    # miter-plane tests hoisted to t-linear form: h0(t) = (o + t·d − p0)·n0
    # = r·n0 + t·(d·n0); h1(t) = (r − (p1−p0))·n1 + t·(d·n1). Reuses the
    # r = o − p0 components computed above — saves ~15 [CH, K] VPU ops per
    # test vs re-evaluating the hit point for each root.
    on0 = rx * n0x + ry * n0y + rz * n0z
    dn0 = dx * n0x + dy * n0y + dz * n0z
    on1 = rx * n1x + ry * n1y + rz * n1z - sn1
    dn1 = dx * n1x + dy * n1y + dz * n1z

    def miter_ok(t):
        return (on0 + t * dn0 >= 0.0) & (on1 + t * dn1 <= 0.0)

    near_ok = ok & (t_near >= mint2) & (t_near <= maxt2) & miter_ok(t_near)
    far_ok = ok & (t_far >= mint2) & (t_far <= maxt2) & miter_ok(t_far)
    t = jnp.where(near_ok, t_near, t_far)
    hit = (pid_row >= 0) & (near_ok | far_ok)

    t_m = jnp.where(hit, t, jnp.inf)
    return t_m, pid_row


def _cyl_test(rows, rays):
    """Reduced form: (t_best [CH], pid_best [CH]) for this cluster."""
    t_m, pid_row = _cyl_test_tm(rows, rays)
    t_best = jnp.min(t_m, axis=-1)                          # [CH]
    is_best = (t_m <= t_best[:, None]) & jnp.isfinite(t_m)
    pid_best = jnp.max(jnp.where(is_best, pid_row, -1), axis=-1)
    return t_best, pid_best


def _cyl_test_mxu(rows, rays):
    """[Experimental, off by default: measured SLOWER than the VPU form on
    v5e (48.7 vs 31.6 ms on the furball probe) — eight tiny
    HIGHEST-precision matmuls cost more than the ~55 VPU ops they save,
    and the recentered expansion flips ~0.2% of grazing hits.]

    MXU-accelerated miter-cylinder test — same geometry as _cyl_test,
    restructured so all eight ray·segment dot-product families come from
    ONE [2·CH, 3] × [3, 4·K] matmul (the MXU does them nearly for free;
    the VPU residue drops from ~100 to ~45 ops per [CH, K] pair block).

    f32 robustness (the reference needed f64, hair.cpp:488): rays are
    advanced to their closest approach to the cluster centroid and the
    quadratic solved in recentered coordinates, so all quantities are
    O(cluster size) rather than O(scene size).
    """
    K = rows.shape[1]
    p0 = rows[0:3]                         # [3, K]
    a = rows[3:6]                          # [3, K] precomputed unit axis
    n0 = rows[6:9]
    n1 = rows[9:12]
    sn1_row = rows[13][None, :]            # (p1−p0)·n1
    rr2 = rows[14][None, :]                # r²
    pid_row = pltpu.bitcast(rows[PRIM_F - 1][None, :], jnp.int32)

    # cluster centroid (mean of segment starts) for recentering
    centroid = jnp.mean(p0, axis=1)                          # [3]
    p0c = p0 - centroid[:, None]
    o_raw = rays[0:3]                      # [3, CH]
    d3 = rays[3:6]                         # [3, CH]
    mint2 = rays[6][:, None]               # [CH, 1]
    maxt2 = rays[7][:, None]
    oc = o_raw - centroid[:, None]         # [3, CH] origin rel. centroid
    # advance each ray to its closest approach to the centroid
    t_c = -jnp.sum(oc * d3, axis=0)        # [CH]
    o3 = oc + d3 * t_c[None, :]            # [3, CH], |o3| ~ cluster size

    # eight small MXU matmuls [CH, 3] x [3, K] (Mosaic rejects vector
    # concats with mismatched sublane offsets, so no [3, 4K] packing)
    def mm(lhs3, rhs3):
        return jax.lax.dot_general(
            lhs3, rhs3, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)     # [CH, K]

    o_a, o_p0, o_n0, o_n1 = mm(o3, a), mm(o3, p0c), mm(o3, n0), mm(o3, n1)
    d_a, d_p0, d_n0, d_n1 = mm(d3, a), mm(d3, p0c), mm(d3, n0), mm(d3, n1)

    # per-segment constants ([1, K] cheap VPU rows)
    pa = jnp.sum(p0c * a, 0)[None, :]
    pn0 = jnp.sum(p0c * n0, 0)[None, :]
    # (p1−centroid)·n1 = (p0−centroid)·n1 + (p1−p0)·n1
    p1n1 = jnp.sum(p0c * n1, 0)[None, :] + sn1_row
    p0sq = jnp.sum(p0c * p0c, 0)[None, :]
    # per-ray constants ([CH, 1])
    o_d = jnp.sum(o3 * d3, 0)[:, None]
    o_sq = jnp.sum(o3 * o3, 0)[:, None]
    d_sq = jnp.sum(d3 * d3, 0)[:, None]

    ar = o_a - pa
    ad = d_a
    A = d_sq - ad * ad
    B = (o_d - d_p0) - ad * ar
    Cc = (o_sq - 2.0 * o_p0 + p0sq) - ar * ar - rr2
    disc = B * B - A * Cc
    ok = (A > 1e-18) & (disc >= 0.0)
    inv_a = 1.0 / jnp.where(A > 1e-18, A, 1.0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    tc2 = t_c[:, None]
    t_near = (-B - sq) * inv_a + tc2       # back to full ray parameter
    t_far = (-B + sq) * inv_a + tc2

    on0 = o_n0 - pn0 - tc2 * d_n0          # h0 at t: on0 + t*d_n0
    on1 = o_n1 - p1n1 - tc2 * d_n1

    def miter_ok(t):
        return (on0 + t * d_n0 >= 0.0) & (on1 + t * d_n1 <= 0.0)

    near_ok = ok & (t_near >= mint2) & (t_near <= maxt2) & miter_ok(t_near)
    far_ok = ok & (t_far >= mint2) & (t_far <= maxt2) & miter_ok(t_far)
    t = jnp.where(near_ok, t_near, t_far)
    hit = (pid_row >= 0) & (near_ok | far_ok)

    t_m = jnp.where(hit, t, jnp.inf)
    t_best = jnp.min(t_m, axis=-1)
    is_best = t_m <= t_best[:, None]
    pid_best = jnp.max(jnp.where(is_best & hit, pid_row, -1), axis=-1)
    return t_best, pid_best


def _cyl_test_oct(rows, rays_o):
    """Octet cylinder test: rows [PRIM_F, K] (one cluster), rays_o
    [8, 8] = 8 rays on SUBLANES x 8 ray components on lanes (the
    ray-major layout the cull kernel uses) → (t_best [8, 1],
    pid_best [8, 1]). One [8, K] vreg per intermediate — the minimal
    VPU tile — so skipping inactive octets (cull's oct bits) removes
    their compute entirely instead of masking it."""
    def seg(j):
        return rows[j][None, :]           # [1, K]

    def rayc(j):
        return rays_o[:, j:j + 1]         # [8, 1]

    p0x, p0y, p0z = seg(0), seg(1), seg(2)
    ax_, ay_, az_ = seg(3), seg(4), seg(5)
    n0x, n0y, n0z = seg(6), seg(7), seg(8)
    n1x, n1y, n1z = seg(9), seg(10), seg(11)
    sn1 = seg(13)
    rr2 = seg(14)
    pid_row = pltpu.bitcast(rows[PRIM_F - 1][None, :], jnp.int32)

    ox, oy, oz = rayc(0), rayc(1), rayc(2)
    dx, dy, dz = rayc(3), rayc(4), rayc(5)
    mint2 = rayc(6)
    maxt2 = rayc(7)

    rx, ry, rz = ox - p0x, oy - p0y, oz - p0z
    ar = ax_ * rx + ay_ * ry + az_ * rz
    pox, poy, poz = rx - ar * ax_, ry - ar * ay_, rz - ar * az_
    ad = ax_ * dx + ay_ * dy + az_ * dz
    pdx, pdy, pdz = dx - ad * ax_, dy - ad * ay_, dz - ad * az_

    a = pdx * pdx + pdy * pdy + pdz * pdz
    b = pox * pdx + poy * pdy + poz * pdz
    ok = a > 1e-18
    a_safe = jnp.where(ok, a, 1.0)
    inv_a = 1.0 / a_safe
    t_mid = -b * inv_a
    qx, qy, qz = pox + pdx * t_mid, poy + pdy * t_mid, poz + pdz * t_mid
    c_mid = qx * qx + qy * qy + qz * qz - rr2
    disc = -c_mid * inv_a
    ok = ok & (disc >= 0.0)
    dt = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = t_mid - dt
    t_far = t_mid + dt

    on0 = rx * n0x + ry * n0y + rz * n0z
    dn0 = dx * n0x + dy * n0y + dz * n0z
    on1 = rx * n1x + ry * n1y + rz * n1z - sn1
    dn1 = dx * n1x + dy * n1y + dz * n1z

    def miter_ok(t):
        return (on0 + t * dn0 >= 0.0) & (on1 + t * dn1 <= 0.0)

    near_ok = ok & (t_near >= mint2) & (t_near <= maxt2) \
        & miter_ok(t_near)
    far_ok = ok & (t_far >= mint2) & (t_far <= maxt2) & miter_ok(t_far)
    t = jnp.where(near_ok, t_near, t_far)
    hit = (pid_row >= 0) & (near_ok | far_ok)

    t_m = jnp.where(hit, t, jnp.inf)
    t_best = jnp.min(t_m, axis=-1, keepdims=True)           # [8, 1]
    is_best = t_m <= t_best
    pid_best = jnp.max(jnp.where(is_best & hit, pid_row, -1), axis=-1,
                       keepdims=True)
    return t_best, pid_best


TE_BITS = 12
TE_INF = (1 << TE_BITS) - 1
CID_MASK = (1 << 20) - 1


def _tiled_kernel_oct(slots_ref,        # scalar prefetch [T*q_max] packed
                      cnt_ref,          # scalar prefetch [T]
                      tmin_ref,         # scalar prefetch [T]
                      tscale_ref,       # scalar prefetch [T]
                      oct_ref,          # scalar prefetch [T*q_max] octet
                      #                   bits per slot (bit o = octet o
                      #                   enters this slot's cluster)
                      rays_ref,         # VMEM [GROUP_T, TILE, 8] ray-major
                      tpmax_ref,        # VMEM [GROUP_T, TILE, 1]
                      seg_rows_hbm,     # HBM [C, PRIM_F, K] (or VMEM)
                      t_out_ref,        # VMEM [GROUP_T, TILE, 1]
                      pid_out_ref,      # VMEM [GROUP_T, TILE, 1]
                      seg_vmem=None,
                      sems=None,
                      *, q_max: int, any_hit: bool, n_buf: int = 2,
                      resident: bool = False):
    """Octet-skipping phase B: like _tiled_kernel, but each slot only
    tests the 8-ray octets whose cull bit is set. Real bounce waves
    measured a mean 64-ray tile union of 188 clusters vs 13 per ray —
    a ~14x dense-test redundancy; per-octet unions are ~3.4x smaller
    than tile unions, and the DMA stays amortized across the whole
    tile. Ray/output layout is ray-major ([TILE, 8] / [TILE, 1]) so an
    octet is a SUBLANE slice (8-aligned, Mosaic-legal) — lane slicing
    below 128 would be rejected."""
    i = pl.program_id(0)

    t_out_ref[...] = jnp.full(t_out_ref.shape, jnp.inf, jnp.float32)
    pid_out_ref[...] = jnp.full(pid_out_ref.shape, -1, jnp.int32)

    for g in range(GROUP_T):
        t_glob = i * GROUP_T + g
        n_q = cnt_ref[t_glob]

        def cid(q):
            return slots_ref[t_glob * q_max + q] & CID_MASK

        def dma(buf_slot, q):
            return pltpu.make_async_copy(
                seg_rows_hbm.at[cid(q)], seg_vmem.at[buf_slot],
                sems.at[buf_slot])

        @pl.when(n_q > 0)
        def _():
            if not resident:
                for w in range(n_buf - 1):
                    if w == 0:
                        dma(0, 0).start()
                    else:
                        @pl.when(w < n_q)
                        def _(w=w):
                            dma(w, w).start()
            t_pmax = tpmax_ref[g]                    # [TILE, 1]
            tmin = tmin_ref[t_glob]
            tscale = tscale_ref[t_glob]

            def resolved(q):
                packed = slots_ref[t_glob * q_max + q]
                bq = (packed >> 20) & TE_INF
                te_next = jnp.where(bq == TE_INF, jnp.inf,
                                    tmin + bq.astype(jnp.float32) * tscale)
                best = t_out_ref[g]                  # [TILE, 1]
                if any_hit:
                    done_ray = jnp.isfinite(best) | (te_next > t_pmax)
                else:
                    done_ray = (best <= te_next) | (te_next > t_pmax)
                return jnp.all(done_ray)

            def cond(carry):
                q, done = carry
                return jnp.logical_not(done) & (q < n_q)

            def body(carry):
                q, _ = carry
                if resident:
                    rows = seg_rows_hbm[cid(q)]
                else:
                    @pl.when(q + n_buf - 1 < n_q)
                    def _():
                        dma((q + n_buf - 1) % n_buf, q + n_buf - 1).start()
                    pltpu.make_async_copy(
                        seg_vmem.at[q % n_buf], seg_vmem.at[q % n_buf],
                        sems.at[q % n_buf]).wait()
                    rows = seg_vmem[q % n_buf]
                m8 = oct_ref[t_glob * q_max + q]
                for ob in range(8):
                    @pl.when(((m8 >> ob) & 1) != 0)
                    def _(ob=ob):
                        rays_o = rays_ref[g, 8 * ob:8 * (ob + 1), :]
                        t_o, p_o = _cyl_test_oct(rows, rays_o)
                        prev = t_out_ref[g, 8 * ob:8 * (ob + 1), :]
                        better = t_o < prev
                        t_out_ref[g, 8 * ob:8 * (ob + 1), :] = \
                            jnp.where(better, t_o, prev)
                        prev_p = pid_out_ref[g, 8 * ob:8 * (ob + 1), :]
                        pid_out_ref[g, 8 * ob:8 * (ob + 1), :] = \
                            jnp.where(better, p_o, prev_p)
                return q + 1, resolved(q)

            q_end, _ = jax.lax.while_loop(cond, body,
                                          (jnp.int32(0), jnp.bool_(False)))
            if not resident:
                for w in range(n_buf - 1):
                    @pl.when(q_end + w < n_q)
                    def _(w=w):
                        pltpu.make_async_copy(
                            seg_vmem.at[(q_end + w) % n_buf],
                            seg_vmem.at[(q_end + w) % n_buf],
                            sems.at[(q_end + w) % n_buf]).wait()


def _tiled_kernel(slots_ref,            # scalar prefetch [T * q_max] packed
                  cnt_ref,              # scalar prefetch [T]
                  tmin_ref,             # scalar prefetch [T]
                  tscale_ref,           # scalar prefetch [T]
                  rays_ref,             # VMEM [GROUP_T, 8, TILE]
                  tpmax_ref,            # VMEM [GROUP_T, TILE]
                  seg_rows_hbm,         # HBM  [C, PRIM_F, K] (or VMEM if
                                        # resident — then scratch args absent)
                  t_out_ref,            # VMEM [GROUP_T, TILE]
                  pid_out_ref,          # VMEM [GROUP_T, TILE]
                  seg_vmem=None,        # scratch VMEM [n_buf, PRIM_F, K]
                  sems=None,            # DMA semaphores [n_buf]
                  run_t=None,           # scratch VMEM [TILE, K] running t
                  run_pid=None,         # scratch VMEM [TILE, K] running pid
                  *, q_max: int, any_hit: bool, exit_every: int = 1,
                  nop: bool = False, mxu: bool = False, n_buf: int = 2,
                  resident: bool = False, unroll: int = 1):
    i = pl.program_id(0)

    t_out_ref[...] = jnp.full(t_out_ref.shape, jnp.inf, jnp.float32)
    pid_out_ref[...] = jnp.full(pid_out_ref.shape, -1, jnp.int32)

    for g in range(GROUP_T):
        t_glob = i * GROUP_T + g
        n_q = cnt_ref[t_glob]

        def cid(q):
            return slots_ref[t_glob * q_max + q] & CID_MASK

        def dma(buf_slot, q):
            return pltpu.make_async_copy(
                seg_rows_hbm.at[cid(q)], seg_vmem.at[buf_slot],
                sems.at[buf_slot])

        @pl.when(n_q > 0)
        def _():
            if not resident:
                # warm the pipeline: up to n_buf-1 slots in flight
                for w in range(n_buf - 1):
                    if w == 0:
                        dma(0, 0).start()
                    else:
                        @pl.when(w < n_q)
                        def _(w=w):
                            dma(w, w).start()
            TILE_R = rays_ref.shape[2]
            rays = rays_ref[g]                       # [8, TILE]
            t_pmax = tpmax_ref[g]                    # [TILE]
            tmin = tmin_ref[t_glob]
            tscale = tscale_ref[t_glob]

            # tile-resolved check after processing slot q: every ray either
            # found a hit no remaining cluster can beat (best_t <= the
            # suffix-min entry bound packed in slot q's high bits) or has
            # no remaining candidates (bound > its own last entry t)
            def resolved(q, best):
                packed = slots_ref[t_glob * q_max + q]
                bq = (packed >> 20) & TE_INF
                te_next = jnp.where(bq == TE_INF, jnp.inf,
                                    tmin + bq.astype(jnp.float32) * tscale)
                if any_hit:
                    done_ray = jnp.isfinite(best) | (te_next > t_pmax)
                else:
                    done_ray = (best <= te_next) | (te_next > t_pmax)
                return jnp.all(done_ray)

            def cond(carry):
                q, done = carry
                return jnp.logical_not(done) & (q < n_q)

            def body(carry):
                q, _ = carry
                if unroll > 1 and not nop and not mxu:
                    # k-slot unroll: independent cylinder tests per
                    # iteration interleave their dependency chains (the
                    # sqrt→cmp→select tail otherwise leaves the VPU idle;
                    # measured 34→23 ms on the furball camera wave at k=2).
                    # Works for BOTH the VMEM-resident table and the
                    # non-resident DMA pipeline (needs n_buf > unroll so
                    # the k in-iteration reads never collide with the
                    # k in-flight prefetches; enforced in tiled_phase_b).
                    # The per-slot lane reduction is DEFERRED: each slot
                    # merges its unreduced [TILE, K] t matrix into a
                    # running min (3 VPU ops) and the reduce runs once
                    # per exit check + once per tile.
                    for k in range(unroll):
                        if resident:
                            qk = jnp.minimum(q + k, n_q - 1)
                            rows = seg_rows_hbm[cid(qk)]
                        else:
                            nxt = q + k + n_buf - 1

                            @pl.when(nxt < n_q)
                            def _(nxt=nxt):
                                dma(nxt % n_buf, nxt).start()
                            if k > 0:
                                @pl.when(q + k < n_q)
                                def _(k=k):
                                    pltpu.make_async_copy(
                                        seg_vmem.at[(q + k) % n_buf],
                                        seg_vmem.at[(q + k) % n_buf],
                                        sems.at[(q + k) % n_buf]).wait()
                            else:
                                pltpu.make_async_copy(
                                    seg_vmem.at[q % n_buf],
                                    seg_vmem.at[q % n_buf],
                                    sems.at[q % n_buf]).wait()
                            rows = seg_vmem[(q + k) % n_buf]
                        t_mk, pid_row = _cyl_test_tm(rows, rays)
                        if k > 0:
                            # drop duplicates past the end of the list
                            t_mk = jnp.where(q + k < n_q, t_mk, jnp.inf)
                        prev = run_t[...]
                        better = t_mk < prev
                        run_t[...] = jnp.where(better, t_mk, prev)
                        if not any_hit:
                            # occlusion queries only consume (pid >= 0):
                            # skip the per-slot pid merge and synthesize
                            # the flag from best-t finiteness at the end
                            run_pid[...] = jnp.where(
                                better,
                                jnp.broadcast_to(pid_row, better.shape),
                                run_pid[...])
                    q_next = jnp.minimum(q + unroll, n_q)
                    return q_next, resolved(q_next - 1,
                                            jnp.min(run_t[...], axis=-1))
                if resident:
                    rows = seg_rows_hbm[cid(q)]      # VMEM dynamic slice
                else:
                    @pl.when(q + n_buf - 1 < n_q)
                    def _():
                        dma((q + n_buf - 1) % n_buf, q + n_buf - 1).start()
                    pltpu.make_async_copy(
                        seg_vmem.at[q % n_buf], seg_vmem.at[q % n_buf],
                        sems.at[q % n_buf]).wait()
                    rows = seg_vmem[q % n_buf]
                if nop:
                    # DMA/loop-overhead probe: touch the data, skip math
                    t_out_ref[g] = jnp.minimum(t_out_ref[g],
                                               rows[0, :TILE_R])
                else:
                    test = _cyl_test_mxu if mxu else _cyl_test
                    tq, pq = test(rows, rays)
                    prev_t = t_out_ref[g]
                    better = tq < prev_t
                    t_out_ref[g] = jnp.where(better, tq, prev_t)
                    pid_out_ref[g] = jnp.where(better, pq, pid_out_ref[g])
                done = jax.lax.cond(
                    (q + 1) % exit_every == 0,
                    lambda: resolved(q, t_out_ref[g]),
                    lambda: jnp.bool_(False)) if exit_every > 1 \
                    else resolved(q, t_out_ref[g])
                return q + 1, done

            deferred = unroll > 1 and not nop and not mxu
            if deferred:
                run_t[...] = jnp.full(run_t.shape, jnp.inf, jnp.float32)
                if not any_hit:
                    run_pid[...] = jnp.full(run_pid.shape, -1, jnp.int32)
            q_end, _ = jax.lax.while_loop(cond, body,
                                          (jnp.int32(0), jnp.bool_(False)))
            if deferred:
                rt = run_t[...]
                best = jnp.min(rt, axis=-1)                  # [TILE]
                t_out_ref[g] = best
                if any_hit:
                    pid_out_ref[g] = jnp.where(jnp.isfinite(best), 0, -1)
                else:
                    is_best = (rt <= best[:, None]) & jnp.isfinite(rt)
                    pid_out_ref[g] = jnp.max(
                        jnp.where(is_best, run_pid[...], -1), axis=-1)
            # prefetched-but-unconsumed DMAs (early exit) must be drained
            # so the next tile's reuse of the buffer slots doesn't mismatch
            if not resident:
                for w in range(n_buf - 1):
                    @pl.when(q_end + w < n_q)
                    def _(w=w):
                        pltpu.make_async_copy(
                            seg_vmem.at[(q_end + w) % n_buf],
                            seg_vmem.at[(q_end + w) % n_buf],
                            sems.at[(q_end + w) % n_buf]).wait()


# NOTE: a kernel that DMA'd 32-segment sub-clusters directly (4 packed
# per [PRIM_F, 128] test block) was built and rejected: Mosaic tiles
# HBM memrefs (1,128) as well, folding 4 sub-rows into one lane tile,
# so DMA source slices narrower than 128 lanes fail to compile
# ("Slice shape along dimension 2 must be aligned to tiling (128)").
# The 4x-tighter 32-segment granularity lives in phase-A culling instead
# (intersect_tiled.tiled_closest_hit(subcull=True)).


# ---------------------------------------------------------------------------
# WINDOWED OCTET-STREAM phase B.
#
# The dense kernel tests each tile-union slot against ALL 64 rays, but a
# bounce-wave slot is entered by only ~2.3 of the tile's eight 8-ray
# octets (measured: tile unions 188 vs per-ray candidate lists of 13 —
# tools/eval_clustering.py models 5.3x less work at octet granularity
# with per-octet early exit). An earlier octet-SKIPPING kernel lost
# 2.9x to branch-serialized single-vreg predication; this formulation
# avoids both failure modes:
#
#   * compute walks PER-OCTET compacted slot streams — eight static
#     sublane slices, unconditional k-unrolled [8,128] chains
#     (prototyped at parity-or-better per-vreg throughput vs the dense
#     form, tools/proto_pairblock.py),
#   * DMA stays at UNION granularity: slots are fetched once per tile
#     into a double-buffered W-slot VMEM window ring, batch-issued a
#     window ahead (a per-stream-entry DMA measured a ~140 ns scalar
#     floor — 2x the whole compute budget of a stream entry),
#   * each octet carries its own suffix-min entry bound (quantized into
#     the stream entry) and per-ray t_pmax, so octets exit
#     independently; fully-resolved tiles skip remaining windows
#     (including their DMA).
#
# Replaces the same reference machinery as the dense kernel (Havran
# traversal sahkdtree3.h:178-306 + SSE packets triaccel_sse.h), at the
# granularity the reference's per-ray recursion gets for free.
# ---------------------------------------------------------------------------

STREAM_QBITS = 12
STREAM_QMASK = (1 << STREAM_QBITS) - 1


def _stream_kernel(cids_ref,      # SMEM [T * q_max] slot cluster ids
                   streams_ref,   # SMEM [T * 8 * qo] packed q | bq<<12
                   off_ref,       # SMEM [T * (n_win+1) * 8] stream offsets
                   cnt_ref,       # SMEM [T] live slots per tile
                   tmin_ref,      # SMEM [T]
                   tscale_ref,    # SMEM [T]
                   rays_ref,      # VMEM [GROUP_T, TILE, 8] ray-major
                   tpmax_ref,     # VMEM [GROUP_T, TILE, 1]
                   seg_rows_hbm,  # ANY  [C, PRIM_F, K]
                   t_out_ref,     # VMEM [GROUP_T, TILE, 1]
                   pid_out_ref,   # VMEM [GROUP_T, TILE, 1]
                   seg_win=None,  # VMEM scratch [2, W, PRIM_F, K]
                   sems=None,     # DMA sems [2] counted / [2, W] per-slot
                   *, q_max: int, qo: int, n_win: int, W: int,
                   any_hit: bool, unroll: int = 4,
                   counted_sems: bool = True):
    i = pl.program_id(0)
    t_out_ref[...] = jnp.full(t_out_ref.shape, jnp.inf, jnp.float32)
    pid_out_ref[...] = jnp.full(pid_out_ref.shape, -1, jnp.int32)

    for g in range(GROUP_T):
        t_glob = i * GROUP_T + g
        n_slots = cnt_ref[t_glob]
        nw = (n_slots + W - 1) // W
        tmin = tmin_ref[t_glob]
        tscale = tscale_ref[t_glob]

        def issue(w):
            """Batch-start the DMA of window w's slots into buf w % 2.
            counted_sems: every copy of the window signals ONE shared
            per-buffer DMA semaphore — DMA sems count transfer sizes,
            so the consumer can wait the WHOLE window with a single
            window-shaped wait (a per-slot wait chain measured ~140
            ns/slot of serialized scalar time — more than a stream
            entry's whole compute). Partial last windows pad with
            duplicate-cluster copies so every window signals exactly
            W slots' worth."""
            lo = w * W
            hi = jnp.minimum(lo + W, n_slots)

            def body(q, _):
                cid = cids_ref[t_glob * q_max
                               + jnp.minimum(q, n_slots - 1)]
                dst = seg_win.at[w % 2, q - lo]
                sem = sems.at[w % 2] if counted_sems \
                    else sems.at[w % 2, q - lo]
                pltpu.make_async_copy(seg_rows_hbm.at[cid], dst,
                                      sem).start()
                return 0

            jax.lax.fori_loop(lo, lo + W if counted_sems else hi,
                              body, 0)

        def wait_win(w):
            if counted_sems:
                # one wait for the whole window: the W copies' size
                # signals sum to exactly this window-slice's size
                pltpu.make_async_copy(
                    seg_win.at[w % 2], seg_win.at[w % 2],
                    sems.at[w % 2]).wait()
                return
            lo = w * W
            hi = jnp.minimum(lo + W, n_slots)

            def body(q, _):
                pltpu.make_async_copy(
                    seg_win.at[w % 2, q - lo], seg_win.at[w % 2, q - lo],
                    sems.at[w % 2, q - lo]).wait()
                return 0

            jax.lax.fori_loop(lo, hi, body, 0)

        @pl.when(n_slots > 0)
        def _():
            issue(0)
            t_pmax = tpmax_ref[g]                     # [TILE, 1]

            def oct_stream(w, oc, done_oc):
                """Process octet oc's stream entries inside window w.
                Returns its updated done flag (scalar bool). A done
                octet (done_oc True) falls straight through the while
                condition and returns True — no branch needed. The
                LAST stream entry carries an infinite suffix bound, so
                stream exhaustion resolves through the same check."""
                base = t_glob * 8 * qo + oc * qo
                off_base = t_glob * (n_win + 1) * 8
                lo_j = off_ref[off_base + w * 8 + oc]
                hi_j = off_ref[off_base + (w + 1) * 8 + oc]
                rays_o = rays_ref[g, 8 * oc:8 * (oc + 1), :]
                tpm_o = t_pmax[8 * oc:8 * (oc + 1), :]

                def bound_of(j):
                    e = streams_ref[base + j]
                    bq = (e >> STREAM_QBITS) & TE_INF
                    return jnp.where(bq == TE_INF, jnp.inf,
                                     tmin + bq.astype(jnp.float32)
                                     * tscale)

                def resolved(j):
                    te_next = bound_of(j)
                    best = t_out_ref[g, 8 * oc:8 * (oc + 1), :]
                    if any_hit:
                        d = jnp.isfinite(best) | (te_next > tpm_o)
                    else:
                        d = (best <= te_next) | (te_next > tpm_o)
                    return jnp.all(d)

                def cond(carry):
                    j, done = carry
                    return jnp.logical_not(done) & (j < hi_j)

                def body(carry):
                    j, _ = carry
                    t_u = None
                    p_u = None
                    for k in range(unroll):
                        jj = jnp.minimum(j + k, hi_j - 1)
                        e = streams_ref[base + jj]
                        wloc = (e & STREAM_QMASK) - w * W
                        rows = seg_win[w % 2, wloc]
                        tq, pq = _cyl_test_oct(rows, rays_o)
                        if k > 0:
                            tq = jnp.where(j + k < hi_j, tq, jnp.inf)
                        if t_u is None:
                            t_u, p_u = tq, pq
                        else:
                            take = tq < t_u
                            t_u = jnp.where(take, tq, t_u)
                            p_u = jnp.where(take, pq, p_u)
                    prev = t_out_ref[g, 8 * oc:8 * (oc + 1), :]
                    better = t_u < prev
                    t_out_ref[g, 8 * oc:8 * (oc + 1), :] = \
                        jnp.where(better, t_u, prev)
                    prev_p = pid_out_ref[g, 8 * oc:8 * (oc + 1), :]
                    pid_out_ref[g, 8 * oc:8 * (oc + 1), :] = \
                        jnp.where(better, p_u, prev_p)
                    j_next = jnp.minimum(j + unroll, hi_j)
                    return j_next, resolved(j_next - 1)

                _, done_now = jax.lax.while_loop(cond, body,
                                                 (lo_j, done_oc))
                return done_now

            def w_cond(carry):
                w = carry[0]
                dones = carry[1:]
                all_done = dones[0]
                for dflag in dones[1:]:
                    all_done = all_done & dflag
                return (w < nw) & jnp.logical_not(all_done)

            def w_body(carry):
                w = carry[0]
                dones = list(carry[1:])

                @pl.when(w + 1 < nw)
                def _():
                    issue(w + 1)
                wait_win(w)
                for oc in range(8):
                    dones[oc] = oct_stream(w, oc, dones[oc])
                return tuple([w + 1] + dones)

            init = tuple([jnp.int32(0)] + [jnp.bool_(False)] * 8)
            final = jax.lax.while_loop(w_cond, w_body, init)
            w_end = final[0]
            # drain the window that may still be in flight (issued for
            # w_end but never waited because the loop exited early)
            @pl.when(w_end < nw)
            def _():
                wait_win(w_end)


@functools.partial(jax.jit,
                   static_argnames=("K", "q_max", "qo", "W", "any_hit",
                                    "interpret", "unroll"))
def stream_phase_b(cids, streams, off, cnt, tmin, tscale, rays8, t_pmax,
                   seg_rows, K: int, q_max: int, qo: int, W: int,
                   any_hit: bool = False, interpret: bool = False,
                   unroll: int = 4):
    """Run the windowed octet-stream kernel.

    cids    [T, q_max]        slot cluster ids (tile entry-t order)
    streams [T, 8, qo]        packed q | bound<<12 per octet stream
    off     [T, n_win+1, 8]   per-window stream offsets
    cnt     [T]               live slots per tile
    rays8   [T, 8, TILE], t_pmax [T, TILE], seg_rows [C, PRIM_F, K]
    → (t [T, TILE], pid [T, TILE])."""
    T, _, TILE = rays8.shape
    n_win = (q_max + W - 1) // W
    pad = (-T) % GROUP_T
    if pad:
        cids = jnp.concatenate([cids, jnp.zeros((pad, q_max), jnp.int32)])
        streams = jnp.concatenate(
            [streams, jnp.zeros((pad, 8, qo), jnp.int32)])
        off = jnp.concatenate(
            [off, jnp.zeros((pad, n_win + 1, 8), jnp.int32)])
        cnt = jnp.concatenate([cnt, jnp.zeros((pad,), jnp.int32)])
        tmin = jnp.concatenate([tmin, jnp.zeros((pad,), jnp.float32)])
        tscale = jnp.concatenate([tscale, jnp.ones((pad,), jnp.float32)])
        rays8 = jnp.concatenate(
            [rays8, jnp.zeros((pad, 8, TILE), jnp.float32)])
        t_pmax = jnp.concatenate(
            [t_pmax, jnp.full((pad, TILE), -1.0, jnp.float32)])
    T_pad = T + pad
    rays_t = jnp.swapaxes(rays8, 1, 2)               # [T, TILE, 8]
    tpm = t_pmax[..., None]                          # [T, TILE, 1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(T_pad // GROUP_T,),
        in_specs=[
            pl.BlockSpec((GROUP_T, TILE, 8), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP_T, TILE, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((GROUP_T, TILE, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP_T, TILE, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, W, PRIM_F, K), jnp.float32),
            # real TPU: one counted semaphore per window buffer;
            # interpret mode keeps per-slot waits (semaphore_wait with
            # a dynamic count is a Mosaic-level primitive)
            pltpu.SemaphoreType.DMA((2,)) if not interpret
            else pltpu.SemaphoreType.DMA((2, W)),
        ],
    )
    t, pid = pl.pallas_call(
        functools.partial(_stream_kernel, q_max=q_max, qo=qo,
                          n_win=n_win, W=W, any_hit=any_hit,
                          unroll=unroll, counted_sems=not interpret),
        out_shape=(jax.ShapeDtypeStruct((T_pad, TILE, 1), jnp.float32),
                   jax.ShapeDtypeStruct((T_pad, TILE, 1), jnp.int32)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(cids.reshape(-1), streams.reshape(-1), off.reshape(-1), cnt,
      tmin, tscale, rays_t, tpm, seg_rows)
    return t[:T, :, 0], pid[:T, :, 0]


# ---------------------------------------------------------------------------
# phase-A culling kernel: per-tile ray-vs-cluster-AABB slab tests.
#
# The jnp formulation materializes [N, C] f32 intermediates (150 MB+ per
# temporary at 256² x 563 clusters) — profiled at 51 of the 60 ms of a
# closest-hit query, ~50x slower than its flop count (HBM-bound). Here
# the cluster bounds table ([8, C] ≈ tens of KB) is VMEM-resident, each
# grid program owns GROUP_T tiles of rays, and the [TILE, CH] slab tests
# live entirely in registers; only the [T, C] per-tile reductions (te,
# ~2 MB) ever reach HBM.
# ---------------------------------------------------------------------------

CULL_CH = 512   # cluster lanes per register block


def _cull_kernel(rays_ref,     # VMEM [GROUP_T, TILE, 8] (ray-major)
                 bounds_ref,   # VMEM [8, C_pad] (lo.xyz, hi.xyz rows)
                 te_ref,       # out VMEM [GROUP_T, C_pad] (inf = miss)
                 tpmax_ref,    # out VMEM [GROUP_T, TILE, 1]
                 oct_ref=None,  # out VMEM [GROUP_T, C_pad] i32 (only when
                 #               emit_oct): bit o = any ray of 8-ray
                 #               octet o enters cluster (phase-B octet
                 #               skip bits — measured SLOWER than the
                 #               dense form on v5e, kept for study)
                 *, c_pad: int, emit_oct: bool = False):
    # every intermediate stays 2-D: Mosaic rejects 1-D→2-D vector
    # reshapes (vector<64xi1> → 64x1), so ray components are sliced as
    # [TILE, 1] columns and reductions keep dims
    inf = jnp.float32(jnp.inf)
    for g in range(GROUP_T):
        r = rays_ref[g]                          # [TILE, 8]
        o = [r[:, j:j + 1] for j in range(3)]    # [TILE, 1] each
        inv_d = []
        for j in range(3):
            dj = r[:, 3 + j:4 + j]
            dj = jnp.where(jnp.abs(dj) < 1e-12,
                           jnp.where(dj >= 0, 1e-12, -1e-12), dj)
            inv_d.append(1.0 / dj)
        mint = r[:, 6:7]
        maxt = r[:, 7:8]
        # dead rays (maxt <= mint, incl. tile padding) must never hit
        maxt_eff = jnp.where(maxt > mint, maxt, -inf)

        # fully-dead tiles (common at deep bounces — the Morton resort
        # groups dead lanes last) skip the slab math entirely
        te_ref[g:g + 1, :] = jnp.full((1, c_pad), inf, te_ref.dtype)
        tpmax_ref[g] = jnp.full(mint.shape, -1.0, jnp.float32)
        if emit_oct:
            oct_ref[g:g + 1, :] = jnp.zeros((1, c_pad), jnp.int32)

        @pl.when(jnp.any(maxt > mint))
        def _(o=o, inv_d=inv_d, mint=mint, maxt_eff=maxt_eff):
            tpmax = jnp.full(mint.shape, -1.0, jnp.float32)   # [TILE, 1]
            for c0 in range(0, c_pad, CULL_CH):
                tn = None
                tf = None
                for ax in range(3):
                    lo = bounds_ref[ax:ax + 1, c0:c0 + CULL_CH]  # [1, CH]
                    hi = bounds_ref[ax + 3:ax + 4, c0:c0 + CULL_CH]
                    a0 = (lo - o[ax]) * inv_d[ax]               # [TILE, CH]
                    a1 = (hi - o[ax]) * inv_d[ax]
                    lo_ax = jnp.minimum(a0, a1)
                    hi_ax = jnp.maximum(a0, a1)
                    tn = lo_ax if tn is None else jnp.maximum(tn, lo_ax)
                    tf = hi_ax if tf is None else jnp.minimum(tf, hi_ax)
                tf = tf * 1.00000024 + 1e-7
                hit = (tn <= tf) & (tf >= mint) & (tn <= maxt_eff)
                tn0 = jnp.maximum(tn, 0.0)
                t_in = jnp.where(hit, tn0, inf)            # [TILE, CH]
                te_min = jnp.min(t_in, axis=0, keepdims=True)
                if te_ref.dtype == jnp.bfloat16:
                    # truncate toward zero (te >= 0 ⇒ rounds DOWN, so
                    # the value stays a valid entry-t lower bound; inf
                    # maps to inf) — halves the te matrix HBM traffic
                    # through the write + the routing sort reads
                    te_i = jax.lax.bitcast_convert_type(te_min, jnp.int32)
                    te_min = jax.lax.bitcast_convert_type(
                        te_i & jnp.int32(-65536), jnp.float32)
                te_ref[g:g + 1, c0:c0 + CULL_CH] = \
                    te_min.astype(te_ref.dtype)
                if emit_oct:
                    # per-octet hit bits (sublane-sliced 8-row reduces)
                    oc = jnp.zeros((1, CULL_CH), jnp.int32)
                    n_oct = hit.shape[0] // 8
                    for ob in range(n_oct):
                        any_o = jnp.any(hit[8 * ob:8 * (ob + 1), :],
                                        axis=0, keepdims=True)
                        oc = oc | (any_o.astype(jnp.int32) << ob)
                    oct_ref[g:g + 1, c0:c0 + CULL_CH] = oc
                tpmax = jnp.maximum(
                    tpmax, jnp.max(jnp.where(hit, tn0, -1.0), axis=1,
                                   keepdims=True))
            tpmax_ref[g] = tpmax


@functools.partial(jax.jit, static_argnames=("interpret", "emit_oct",
                                             "te_bf16"))
def cull_phase_a(rays8, bounds, interpret: bool = False,
                 emit_oct: bool = False, te_bf16: bool = True):
    """Tile-level cluster culling. rays8 [T, 8, TILE]; bounds [8, C_pad]
    (C_pad a multiple of CULL_CH; padded slots lo=+big, hi=-big).
    Returns (te [T, C_pad] with inf = miss, t_pmax [T, TILE]) plus the
    octet-bit matrix when emit_oct (an extra [T, C] HBM write — only
    the octet phase-B variant wants it).

    te_bf16: emit te truncated-toward-zero to bfloat16 (ROADMAP §1a).
    Exactness is preserved by construction: truncation keeps every
    entry a LOWER bound of the true entry t, the routing sort orders by
    the truncated values, and the suffix-min / completion bounds are
    lower bounds of truncated values — so early exit and overflow
    completion remain conservative. Halves the dominant [T, C] HBM
    traffic of phase A + routing."""
    T, _, R = rays8.shape
    c_pad = bounds.shape[1]
    rays_t = jnp.swapaxes(rays8, 1, 2)           # [T, TILE, 8]
    pad = (-T) % GROUP_T
    if pad:
        rays_t = jnp.concatenate(
            [rays_t, jnp.zeros((pad, R, 8), jnp.float32)
             .at[:, :, 7].set(-1.0)])
    T_pad = T + pad
    te_dtype = jnp.bfloat16 if te_bf16 else jnp.float32
    out_specs = [
        pl.BlockSpec((GROUP_T, c_pad), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((GROUP_T, R, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((T_pad, c_pad), te_dtype),
                 jax.ShapeDtypeStruct((T_pad, R, 1), jnp.float32)]
    if emit_oct:
        out_specs.append(pl.BlockSpec((GROUP_T, c_pad), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((T_pad, c_pad), jnp.int32))
    out = pl.pallas_call(
        functools.partial(_cull_kernel, c_pad=c_pad, emit_oct=emit_oct),
        grid=(T_pad // GROUP_T,),
        in_specs=[
            pl.BlockSpec((GROUP_T, R, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(rays_t, bounds)
    if emit_oct:
        te, tpmax, octm = out
        return te[:T], tpmax[:T, :, 0], octm[:T]
    te, tpmax = out
    return te[:T], tpmax[:T, :, 0]

# segment tables at most this large are pinned whole in VMEM (v5e has
# ~16 MB); above it the kernel streams clusters with double-buffered DMA
VMEM_RESIDENT_BYTES = 10 * 1024 * 1024


def tiled_phase_b(slots, cnt, tmin, tscale, rays8, t_pmax, seg_rows,
                  K: int, q_max: int, any_hit: bool = False,
                  interpret: bool = False, exit_every: int = 1,
                  nop: bool = False, mxu: bool = False, n_buf: int = 2,
                  resident: bool | None = None, unroll: int = 1,
                  oct=None):
    """Run the tiled kernel. slots [T, q_max] (packed cluster|bound),
    cnt/tmin/tscale [T], rays8 [T, 8, TILE], t_pmax [T, TILE],
    seg_rows [C, PRIM_F, K] → (t [T, TILE], pid [T, TILE]).

    resident=None auto-pins the whole segment table in VMEM when it fits
    (≤ VMEM_RESIDENT_BYTES) — per-slot cluster access becomes a VMEM
    dynamic slice instead of a latency-bound HBM DMA.

    The resident/env resolution happens HERE, outside the jit boundary,
    so setting HAIRPT_FORCE_NONRESIDENT between same-signature calls is
    honored (the resolved value is a static arg of the jitted impl —
    each value gets its own compilation, never a stale cache hit)."""
    if resident is None:
        resident = seg_rows.size * 4 <= VMEM_RESIDENT_BYTES
        if os.environ.get("HAIRPT_FORCE_NONRESIDENT") == "1":
            resident = False    # test/probe knob: exercise the DMA path
            #                     on tables that would fit VMEM
    if oct is not None:
        return _tiled_phase_b_oct_impl(slots, cnt, tmin, tscale, oct,
                                       rays8, t_pmax, seg_rows, K=K,
                                       q_max=q_max, any_hit=any_hit,
                                       interpret=interpret, n_buf=n_buf,
                                       resident=bool(resident))
    return _tiled_phase_b_impl(slots, cnt, tmin, tscale, rays8, t_pmax,
                               seg_rows, K=K, q_max=q_max, any_hit=any_hit,
                               interpret=interpret, exit_every=exit_every,
                               nop=nop, mxu=mxu, n_buf=n_buf,
                               resident=bool(resident), unroll=unroll)


@functools.partial(jax.jit,
                   static_argnames=("K", "q_max", "any_hit", "interpret",
                                    "n_buf", "resident"))
def _tiled_phase_b_oct_impl(slots, cnt, tmin, tscale, oct, rays8, t_pmax,
                            seg_rows, K: int, q_max: int, any_hit: bool,
                            interpret: bool, n_buf: int, resident: bool):
    """Octet-skipping phase B (see _tiled_kernel_oct). Caller-facing
    layout matches the dense impl (rays8 [T, 8, TILE], t_pmax [T, TILE]);
    the ray-major transpose happens here."""
    T, _, TILE = rays8.shape
    n_buf = max(n_buf, 2)
    pad = (-T) % GROUP_T
    if pad:
        slots = jnp.concatenate([slots, jnp.zeros((pad, q_max), jnp.int32)])
        oct = jnp.concatenate([oct, jnp.zeros((pad, q_max), jnp.int32)])
        cnt = jnp.concatenate([cnt, jnp.zeros((pad,), jnp.int32)])
        tmin = jnp.concatenate([tmin, jnp.zeros((pad,), jnp.float32)])
        tscale = jnp.concatenate([tscale, jnp.ones((pad,), jnp.float32)])
        rays8 = jnp.concatenate(
            [rays8, jnp.zeros((pad, 8, TILE), jnp.float32)])
        t_pmax = jnp.concatenate(
            [t_pmax, jnp.full((pad, TILE), -1.0, jnp.float32)])
    T_pad = T + pad
    rays_t = jnp.swapaxes(rays8, 1, 2)               # [T, TILE, 8]
    tpm = t_pmax[..., None]                          # [T, TILE, 1]

    C = seg_rows.shape[0]
    if resident:
        seg_spec = pl.BlockSpec((C, PRIM_F, K), lambda i, *_: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        scratch = []
    else:
        seg_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        scratch = [
            pltpu.VMEM((n_buf, PRIM_F, K), jnp.float32),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(T_pad // GROUP_T,),
        in_specs=[
            pl.BlockSpec((GROUP_T, TILE, 8), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP_T, TILE, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            seg_spec,
        ],
        out_specs=[
            pl.BlockSpec((GROUP_T, TILE, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP_T, TILE, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
    )
    t, pid = pl.pallas_call(
        functools.partial(_tiled_kernel_oct, q_max=q_max, any_hit=any_hit,
                          n_buf=n_buf, resident=resident),
        out_shape=(jax.ShapeDtypeStruct((T_pad, TILE, 1), jnp.float32),
                   jax.ShapeDtypeStruct((T_pad, TILE, 1), jnp.int32)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(slots.reshape(-1), cnt, tmin, tscale, oct.reshape(-1), rays_t, tpm,
      seg_rows)
    return t[:T, :, 0], pid[:T, :, 0]


@functools.partial(jax.jit,
                   static_argnames=("K", "q_max", "any_hit", "interpret",
                                    "exit_every", "nop", "mxu", "n_buf",
                                    "resident", "unroll"))
def _tiled_phase_b_impl(slots, cnt, tmin, tscale, rays8, t_pmax, seg_rows,
                        K: int, q_max: int, any_hit: bool,
                        interpret: bool, exit_every: int,
                        nop: bool, mxu: bool, n_buf: int,
                        resident: bool, unroll: int):
    T, _, TILE = rays8.shape
    if not resident and unroll > 1:
        # the unrolled DMA pipeline reads `unroll` buffers per iteration
        # while `unroll` prefetches are in flight — keep them disjoint
        n_buf = max(n_buf, unroll + 1)

    pad = (-T) % GROUP_T
    if pad:
        slots = jnp.concatenate(
            [slots, jnp.zeros((pad, q_max), jnp.int32)])
        cnt = jnp.concatenate([cnt, jnp.zeros((pad,), jnp.int32)])
        tmin = jnp.concatenate([tmin, jnp.zeros((pad,), jnp.float32)])
        tscale = jnp.concatenate([tscale, jnp.ones((pad,), jnp.float32)])
        rays8 = jnp.concatenate(
            [rays8, jnp.zeros((pad, 8, TILE), jnp.float32)])
        t_pmax = jnp.concatenate(
            [t_pmax, jnp.full((pad, TILE), -1.0, jnp.float32)])
    T_pad = T + pad

    C = seg_rows.shape[0]
    deferred = unroll > 1 and not nop and not mxu
    run_scratch = [pltpu.VMEM((TILE, K), jnp.float32),
                   pltpu.VMEM((TILE, K), jnp.int32)] if deferred else []
    if resident:
        seg_spec = pl.BlockSpec((C, PRIM_F, K), lambda i, *_: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        scratch = run_scratch
    else:
        seg_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        scratch = [
            pltpu.VMEM((n_buf, PRIM_F, K), jnp.float32),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ] + run_scratch
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T_pad // GROUP_T,),
        in_specs=[
            pl.BlockSpec((GROUP_T, 8, TILE), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP_T, TILE), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            seg_spec,
        ],
        out_specs=[
            pl.BlockSpec((GROUP_T, TILE), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP_T, TILE), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
    )
    kern = functools.partial(_tiled_kernel, q_max=q_max, any_hit=any_hit,
                             exit_every=exit_every, nop=nop, mxu=mxu,
                             n_buf=n_buf, resident=resident, unroll=unroll)
    if resident and deferred:
        # resident mode has no seg_vmem/sems scratch: the two run
        # buffers arrive as the FIRST positional scratch refs — route
        # them to the right keyword slots
        base = kern

        def kern(*args):
            return base(*args[:-2], run_t=args[-2], run_pid=args[-1])
    t, pid = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((T_pad, TILE), jnp.float32),
                   jax.ShapeDtypeStruct((T_pad, TILE), jnp.int32)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(slots.reshape(-1), cnt, tmin, tscale, rays8, t_pmax, seg_rows)
    return t[:T], pid[:T]
