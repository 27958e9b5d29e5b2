"""Prototype: octet-pair phase-B mechanics on real TPU.

De-risks the two mechanisms the CSR-at-octet-granularity kernel needs
before building it for real:

  1. dynamic SUBLANE slicing of the ray block / output block at an
     8-aligned offset taken from an SMEM scalar (the compacted pair
     stream tells each step WHICH octet it serves),
  2. eight UNCONDITIONAL interleaved [8,128] cylinder-test dependency
     chains per iteration (the octet-skipping kernel's 2.9x loss came
     from eight @pl.when-predicated blocks — branches kill VPU
     pipelining; pure dataflow should pipeline like the k-slot unroll).

Benchmarks three kernels over identical synthetic work:
  dense   — the production [64,128] form, U slots per tile
  pairs   — 8 interleaved [8,128] chains per iteration, P pairs per
            tile with octet ids from SMEM (P = work-equivalent U*8/R
            for redundancy R)
Throughput parity per vreg-op ==> the pair kernel wins end-to-end by
its work ratio. Usage: python tools/proto_pairblock.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hairpt.ops.intersect_packed import PRIM_F
from hairpt.ops.pallas_tiled import _cyl_test, GROUP_T

TILE = 64


def _cyl_test_oct8(rows, rays_o):
    """[8,128] miter-cylinder test (copy of the production math with
    rays on sublanes). rows [PRIM_F, K]; rays_o [8, 8] ray-major."""
    def seg(j):
        return rows[j][None, :]

    def rayc(j):
        return rays_o[:, j:j + 1]

    p0x, p0y, p0z = seg(0), seg(1), seg(2)
    p1x, p1y, p1z = seg(3), seg(4), seg(5)
    n0x, n0y, n0z = seg(6), seg(7), seg(8)
    n1x, n1y, n1z = seg(9), seg(10), seg(11)
    rr = seg(12)
    pid_row = pltpu.bitcast(rows[PRIM_F - 1][None, :], jnp.int32)
    ox, oy, oz = rayc(0), rayc(1), rayc(2)
    dx, dy, dz = rayc(3), rayc(4), rayc(5)
    mint2, maxt2 = rayc(6), rayc(7)
    sx, sy, sz = p1x - p0x, p1y - p0y, p1z - p0z
    inv_len = jax.lax.rsqrt(jnp.maximum(sx * sx + sy * sy + sz * sz,
                                        1e-30))
    ax_, ay_, az_ = sx * inv_len, sy * inv_len, sz * inv_len
    rx, ry, rz = ox - p0x, oy - p0y, oz - p0z
    ar = ax_ * rx + ay_ * ry + az_ * rz
    pox, poy, poz = rx - ar * ax_, ry - ar * ay_, rz - ar * az_
    ad = ax_ * dx + ay_ * dy + az_ * dz
    pdx, pdy, pdz = dx - ad * ax_, dy - ad * ay_, dz - ad * az_
    a = pdx * pdx + pdy * pdy + pdz * pdz
    b = pox * pdx + poy * pdy + poz * pdz
    ok = a > 1e-18
    inv_a = 1.0 / jnp.where(ok, a, 1.0)
    t_mid = -b * inv_a
    qx, qy, qz = pox + pdx * t_mid, poy + pdy * t_mid, poz + pdz * t_mid
    c_mid = qx * qx + qy * qy + qz * qz - rr * rr
    disc = -c_mid * inv_a
    ok = ok & (disc >= 0.0)
    dt = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near, t_far = t_mid - dt, t_mid + dt
    on0 = rx * n0x + ry * n0y + rz * n0z
    dn0 = dx * n0x + dy * n0y + dz * n0z
    sn1 = sx * n1x + sy * n1y + sz * n1z
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
    t_best = jnp.min(t_m, axis=-1, keepdims=True)
    is_best = t_m <= t_best
    pid_best = jnp.max(jnp.where(is_best & hit, pid_row, -1), axis=-1,
                       keepdims=True)
    return t_best, pid_best


def dense_kernel(cnt_ref, rays_ref, segs_ref, t_ref, p_ref, *, U):
    i = pl.program_id(0)
    t_ref[...] = jnp.full(t_ref.shape, jnp.inf, jnp.float32)
    p_ref[...] = jnp.full(p_ref.shape, -1, jnp.int32)
    for g in range(GROUP_T):
        rays = rays_ref[g]

        def body(q, _):
            rows = segs_ref[q]
            tq, pq = _cyl_test(rows, rays)
            prev = t_ref[g]
            better = tq < prev
            t_ref[g] = jnp.where(better, tq, prev)
            p_ref[g] = jnp.where(better, pq, p_ref[g])
            return 0

        jax.lax.fori_loop(0, cnt_ref[i * GROUP_T + g], body, 0)


def stream_kernel(pairs_ref,    # SMEM [T * P] packed slot stream
                  off_ref,      # SMEM [T * 9] per-octet stream offsets
                  rays_ref,     # VMEM [GROUP_T, TILE, 8] ray-major
                  segs_ref,     # VMEM [U, PRIM_F, 128] resident table
                  t_ref,        # VMEM [GROUP_T, TILE, 1]
                  p_ref,        # VMEM [GROUP_T, TILE, 1]
                  seg_vmem=None, sems=None,
                  *, P, unroll: int = None, n_buf: int = 0):
    if unroll is None:
        unroll = int(os.environ.get('PROTO_UNROLL', '8'))
    """Octet-major streams: each 8-ray octet walks its OWN compacted
    slot list — static sublane slices, ray operands loaded once, k
    unconditional interleaved [8,128] chains per iteration. n_buf > 0
    switches to the per-entry DMA pipeline (segs_ref in ANY/HBM)."""
    i = pl.program_id(0)
    t_ref[...] = jnp.full(t_ref.shape, jnp.inf, jnp.float32)
    p_ref[...] = jnp.full(p_ref.shape, -1, jnp.int32)
    dma_mode = n_buf > 0
    for g in range(GROUP_T):
        t_glob = i * GROUP_T + g
        for oc in range(8):
            lo = off_ref[t_glob * 9 + oc]
            hi = off_ref[t_glob * 9 + oc + 1]
            n_s = hi - lo
            rays_o = rays_ref[g, 8 * oc:8 * (oc + 1), :]

            def dma(j, oc=oc, lo=lo):
                return pltpu.make_async_copy(
                    segs_ref.at[pairs_ref[t_glob * P + lo + j]],
                    seg_vmem.at[j % n_buf], sems.at[j % n_buf])

            if dma_mode:
                for w in range(n_buf - 1):
                    if w == 0:
                        dma(0).start()
                    else:
                        @pl.when(w < n_s)
                        def _(w=w):
                            dma(w).start()

            def body(j, carry, oc=oc, lo=lo, rays_o=rays_o):
                t_b, p_b = carry
                for k in range(unroll):
                    if dma_mode:
                        nxt = j * unroll + k + n_buf - 1

                        @pl.when(nxt < n_s)
                        def _(nxt=nxt):
                            dma(nxt).start()
                        pltpu.make_async_copy(
                            seg_vmem.at[(j * unroll + k) % n_buf],
                            seg_vmem.at[(j * unroll + k) % n_buf],
                            sems.at[(j * unroll + k) % n_buf]).wait()
                        rows = seg_vmem[(j * unroll + k) % n_buf]
                    else:
                        pk = pairs_ref[t_glob * P + lo + j * unroll + k]
                        rows = segs_ref[pk]
                    if os.environ.get('PROTO_NOP') == '1':
                        t_b = jnp.minimum(t_b, rows[0:1, 0:8].T * 1e-30)
                    else:
                        tq, pq = _cyl_test_oct8(rows, rays_o)
                        better = tq < t_b
                        t_b = jnp.where(better, tq, t_b)
                        p_b = jnp.where(better, pq, p_b)
                return t_b, p_b

            n_it = n_s // unroll
            t0 = jnp.full((8, 1), jnp.inf, jnp.float32)
            p0 = jnp.full((8, 1), -1, jnp.int32)
            t_b, p_b = jax.lax.fori_loop(0, n_it, body, (t0, p0))
            t_ref[g, 8 * oc:8 * (oc + 1), :] = t_b
            p_ref[g, 8 * oc:8 * (oc + 1), :] = p_b


def main():
    T = int(os.environ.get('PROTO_T', '4096'))
    U = int(os.environ.get('PROTO_U', '96'))            # slots per tile (dense)
    R = 3.0           # modeled pair redundancy: pairs = U*8/R
    P = int(U * 8 / R)
    P -= P % 8
    rng = np.random.default_rng(0)
    segs = rng.normal(size=(U, PRIM_F, 128)).astype(np.float32)
    segs[:, 12] = np.abs(segs[:, 12]) * 0.01
    segs[:, PRIM_F - 1] = np.frombuffer(
        np.arange(U * 128, dtype=np.int32).tobytes(),
        dtype=np.float32).reshape(U, 128)
    rays8 = rng.normal(size=(T, 8, TILE)).astype(np.float32)
    rays8[:, 6] = 0.0
    rays8[:, 7] = 100.0
    cnt = np.full(T, U, np.int32)
    # per-octet streams: 8 lists of P/8 slots each, concatenated
    pairs = np.empty((T, P), np.int32)
    offs = np.empty((T, 9), np.int32)
    per = P // 8
    per -= per % 8
    for t in range(T):
        offs[t] = np.arange(9) * per
        for oc in range(8):
            sl = rng.integers(0, U, per)
            sl.sort()
            pairs[t, oc * per:(oc + 1) * per] = sl

    dev = jax.devices()[0]
    print(f"[proto] device {dev.platform}, T={T} U={U} P={P}")

    rays_t = jnp.asarray(np.swapaxes(rays8, 1, 2))   # [T, TILE, 8]

    dense = pl.pallas_call(
        functools.partial(dense_kernel, U=U),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T // GROUP_T,),
            in_specs=[
                pl.BlockSpec((GROUP_T, 8, TILE), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((U, PRIM_F, 128), lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((GROUP_T, TILE), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((GROUP_T, TILE), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ]),
        out_shape=(jax.ShapeDtypeStruct((T, TILE), jnp.float32),
                   jax.ShapeDtypeStruct((T, TILE), jnp.int32)),
    )
    def make_pairk(n_buf):
        if n_buf:
            seg_spec = pl.BlockSpec(memory_space=pltpu.ANY)
            scratch = [pltpu.VMEM((n_buf, PRIM_F, 128), jnp.float32),
                       pltpu.SemaphoreType.DMA((n_buf,))]
        else:
            seg_spec = pl.BlockSpec((U, PRIM_F, 128),
                                    lambda i, *_: (0, 0, 0),
                                    memory_space=pltpu.VMEM)
            scratch = []
        return pl.pallas_call(
            functools.partial(stream_kernel, P=P, n_buf=n_buf),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(T // GROUP_T,),
                in_specs=[
                    pl.BlockSpec((GROUP_T, TILE, 8),
                                 lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    seg_spec,
                ],
                out_specs=[
                    pl.BlockSpec((GROUP_T, TILE, 1),
                                 lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((GROUP_T, TILE, 1),
                                 lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                scratch_shapes=scratch),
            out_shape=(jax.ShapeDtypeStruct((T, TILE, 1), jnp.float32),
                       jax.ShapeDtypeStruct((T, TILE, 1), jnp.int32)),
        )

    pairk = make_pairk(0)
    pairk_dma = make_pairk(int(os.environ.get('PROTO_NBUF', '9')))

    segs_j = jnp.asarray(segs)
    rays8_j = jnp.asarray(rays8)
    REP = int(os.environ.get("PROTO_REP", "16"))

    @jax.jit
    def run_dense():
        def it(_, acc):
            t, _p = dense(jnp.asarray(cnt), rays8_j, segs_j)
            return acc + jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))
        return jax.lax.fori_loop(0, REP, it, 0.0),

    @jax.jit
    def run_pairs():
        def it(_, acc):
            t, _p = pairk(jnp.asarray(pairs.reshape(-1)),
                          jnp.asarray(offs.reshape(-1)), rays_t, segs_j)
            return acc + jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))
        return jax.lax.fori_loop(0, REP, it, 0.0),

    # DMA variant: pairs reference a BIG HBM table (production scale) so
    # every stream entry costs one [PRIM_F,128] async copy
    C_big = 7680
    segs_big = jnp.asarray(
        np.tile(segs, (C_big // U, 1, 1)))

    pairs_big = pairs + (np.arange(T)[:, None] * 977) % (C_big - U)

    @jax.jit
    def run_pairs_dma():
        def it(_, acc):
            t, _p = pairk_dma(jnp.asarray(pairs_big.reshape(-1)),
                              jnp.asarray(offs.reshape(-1)), rays_t,
                              segs_big)
            return acc + jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))
        return jax.lax.fori_loop(0, REP, it, 0.0),

    for name, fn in [("dense", run_dense), ("pairs", run_pairs),
                     ("pairs_dma", run_pairs_dma)]:
        try:
            out = fn()
            _ = float(out[0])   # value-fetch barrier
        except Exception as e:
            print(f"[proto] {name} FAILED: {type(e).__name__}: "
                  f"{str(e)[:500]}")
            continue
        ts = []
        for _ in range(5):
            t0 = time.time()
            out = fn()
            _ = float(out[0])
            ts.append(time.time() - t0)
        best = min(ts)
        # vreg-ops proxy: dense does U * 8 vregs, pairs P * 1
        vregs = (U * 8 if name == "dense" else P) * T * REP
        print(f"[proto] {name}: {best*1e3:7.2f} ms "
              f"({vregs/best/1e9:6.3f} Gvreg-iter/s)")


if __name__ == "__main__":
    main()
