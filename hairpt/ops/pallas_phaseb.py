"""Pallas TPU kernel for the cluster-sweep phase B (segment testing).

The XLA formulation of phase B (ops/intersect_swept.py) fetches each
chunk's K segment rows with vmap(dynamic_slice), which XLA lowers to slow
gathers (~3-7 GB/s effective). This kernel instead issues an explicit
double-buffered HBM→VMEM DMA per chunk — contiguous block reads at HBM
bandwidth — and runs the [CH, K] miter-cylinder tests as dense VPU math.

Layout contract (produced by intersect_swept.swept_closest_hit):
  seg_rows_t : [C, PRIM_F, K] float32 in HBM (per-cluster 16xK tiles —
               lane-aligned for K=128)
  chunk_cl   : [n_chunks] int32 cluster id per chunk (-1 = dead chunk)
  chunk_rays : [n_chunks, 8, CH] float32 (o.xyz, d.xyz, mint, maxt rows)
Output:
  t_out      : [n_chunks, CH] float32 (inf = miss)
  pid_out    : [n_chunks, CH] int32   (-1 = miss)

K and CH should be multiples of the VPU tile (lane dim 128 ideal; K=128,
CH=64 works well). Falls back to interpret mode off-TPU so the same code
path is testable on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect_packed import PRIM_F


GROUP = 8  # chunks per pallas program (satisfies (8, 128) tiling)


def _phaseb_kernel(chunk_cl_ref,          # scalar prefetch [n_chunks]
                   chunk_rays_ref,        # VMEM [GROUP, 8, CH]
                   seg_rows_hbm,          # HBM  [C, PRIM_F, K]
                   t_out_ref,             # VMEM [GROUP, CH]
                   pid_out_ref,           # VMEM [GROUP, CH]
                   seg_vmem,              # scratch VMEM [2, PRIM_F, K]
                   sems,                  # DMA semaphores [2]
                   *, K: int):
    i = pl.program_id(0)

    def dma(slot, g):
        cluster = chunk_cl_ref[i * GROUP + g]
        base = jnp.maximum(cluster, 0)
        return pltpu.make_async_copy(
            seg_rows_hbm.at[base], seg_vmem.at[slot],
            sems.at[slot])

    # fully-dead programs (all GROUP chunks dead — the padded tail after the
    # cluster-sorted live region) write misses and skip DMA/compute
    any_live = chunk_cl_ref[i * GROUP] >= 0
    for g in range(1, GROUP):
        any_live = any_live | (chunk_cl_ref[i * GROUP + g] >= 0)

    @pl.when(jnp.logical_not(any_live))
    def _():
        t_out_ref[...] = jnp.full(t_out_ref.shape, jnp.inf, jnp.float32)
        pid_out_ref[...] = jnp.full(pid_out_ref.shape, -1, jnp.int32)

    @pl.when(any_live)
    def _():
        dma(0, 0).start()
        for g in range(GROUP):
            # double-buffer: prefetch the next chunk's segments
            if g + 1 < GROUP:
                dma((g + 1) % 2, g + 1).start()
            _phaseb_one(chunk_cl_ref, chunk_rays_ref, t_out_ref,
                        pid_out_ref, seg_vmem, sems, i, g, g % 2, K)


def _phaseb_one(chunk_cl_ref, chunk_rays_ref, t_out_ref, pid_out_ref,
                seg_vmem, sems, i, g, slot, K):
    cluster = chunk_cl_ref[i * GROUP + g]
    live = cluster >= 0

    rays = chunk_rays_ref[g]              # [8, CH]

    # wait for this chunk's DMA (reconstructed descriptor carries the same
    # semaphore + byte count as the copy started in the caller)
    pltpu.make_async_copy(seg_vmem.at[slot], seg_vmem.at[slot],
                          sems.at[slot]).wait()
    rows = seg_vmem[slot]                 # [PRIM_F, K]

    # component-wise layout: every working array is [CH, K] (lane dim = K)
    def seg_col(j):
        return rows[j][None, :]           # [1, K]

    def ray_col(j):
        return rays[j][:, None]           # [CH, 1]

    p0x, p0y, p0z = seg_col(0), seg_col(1), seg_col(2)
    ax_, ay_, az_ = seg_col(3), seg_col(4), seg_col(5)
    n0x, n0y, n0z = seg_col(6), seg_col(7), seg_col(8)
    n1x, n1y, n1z = seg_col(9), seg_col(10), seg_col(11)
    sn1 = seg_col(13)                     # (p1−p0)·n1, precomputed
    rr2 = seg_col(14)                     # r², precomputed
    pid_row = pltpu.bitcast(rows[PRIM_F - 1][None, :], jnp.int32)

    ox, oy, oz = ray_col(0), ray_col(1), ray_col(2)
    dx, dy, dz = ray_col(3), ray_col(4), ray_col(5)
    mint2 = ray_col(6)
    maxt2 = ray_col(7)

    rx, ry, rz = ox - p0x, oy - p0y, oz - p0z
    ar = ax_ * rx + ay_ * ry + az_ * rz
    pox, poy, poz = rx - ar * ax_, ry - ar * ay_, rz - ar * az_
    ad = ax_ * dx + ay_ * dy + az_ * dz
    pdx, pdy, pdz = dx - ad * ax_, dy - ad * ay_, dz - ad * az_

    a = pdx * pdx + pdy * pdy + pdz * pdz
    b = pox * pdx + poy * pdy + poz * pdz
    ok = a > 1e-18
    a_safe = jnp.where(ok, a, 1.0)
    t_mid = -b / a_safe
    qx, qy, qz = pox + pdx * t_mid, poy + pdy * t_mid, poz + pdz * t_mid
    c_mid = qx * qx + qy * qy + qz * qz - rr2
    disc = -c_mid / a_safe
    ok = ok & (disc >= 0.0)
    dt = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = t_mid - dt
    t_far = t_mid + dt

    def miter_ok(t):
        px, py, pz = ox + dx * t, oy + dy * t, oz + dz * t
        h0 = (px - p0x) * n0x + (py - p0y) * n0y + (pz - p0z) * n0z
        # (p − p1)·n1 = (p − p0)·n1 − (p1−p0)·n1
        h1 = (px - p0x) * n1x + (py - p0y) * n1y + (pz - p0z) * n1z \
            - sn1
        return (h0 >= 0.0) & (h1 <= 0.0)

    near_ok = ok & (t_near >= mint2) & (t_near <= maxt2) & miter_ok(t_near)
    far_ok = ok & (t_far >= mint2) & (t_far <= maxt2) & miter_ok(t_far)
    t = jnp.where(near_ok, t_near, t_far)
    hit = (pid_row >= 0) & (near_ok | far_ok) & live

    t_m = jnp.where(hit, t, jnp.inf)
    t_best = jnp.min(t_m, axis=-1)                          # [CH]
    is_best = t_m <= t_best[:, None]
    # one-hot select of the pid (avoids vector-indexed gather in Mosaic)
    pid_best = jnp.max(jnp.where(is_best & hit, pid_row, -1), axis=-1)
    t_out_ref[g] = t_best
    pid_out_ref[g] = pid_best


@functools.partial(jax.jit, static_argnames=("K", "interpret"))
def phase_b_pallas(chunk_cl, chunk_rays, seg_rows, K: int,
                   interpret: bool = False):
    """Run the phase-B kernel. Returns (t [n_chunks, CH], pid [...])."""
    n_chunks, _, CH = chunk_rays.shape

    # pad the chunk count to a multiple of GROUP
    pad = (-n_chunks) % GROUP
    if pad:
        chunk_cl = jnp.concatenate(
            [chunk_cl, jnp.full((pad,), -1, jnp.int32)])
        filler = jnp.zeros((pad, 8, CH), jnp.float32)
        filler = filler.at[:, 7, :].set(-1.0)
        chunk_rays = jnp.concatenate([chunk_rays, filler])
    n_padded = n_chunks + pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_padded // GROUP,),
        in_specs=[
            pl.BlockSpec((GROUP, 8, CH), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((GROUP, CH), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, CH), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, PRIM_F, K), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    t, pid = pl.pallas_call(
        functools.partial(_phaseb_kernel, K=K),
        out_shape=(jax.ShapeDtypeStruct((n_padded, CH), jnp.float32),
                   jax.ShapeDtypeStruct((n_padded, CH), jnp.int32)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(chunk_cl, chunk_rays, seg_rows)
    return t[:n_chunks], pid[:n_chunks]
