"""Offline (numpy) sweep: tile size x cluster size K -> tested segments.

Estimates the tiled intersector's phase-B work for the furball camera wave
without TPU compiles: for each (tile, K), tested-segments per ray =
(sum over tiles of union-candidate clusters) * K * tile / N_rays, and the
kernel iteration count = total pairs. Also prints a rough time model:
  t = pairs * (c0 + c1 * tile * K)   [c0 ~ fixed per-iteration cost]
calibrated on the measured point (tile=64, K=128): 19827 pairs -> 24.7ms.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from bench import build_scene
from hairpt.models import sensors as sens_mod
from hairpt.integrators.common import block_swizzle
from hairpt.ops import bvh as bvh_mod

res = 256
scene = build_scene(1.0, res, 4, 8)
sw = scene.arrays.hair_swept
rows = np.asarray(sw.seg_rows)      # [C*K0, PRIM_F] morton/tree order
K0 = 128
C0 = rows.shape[0] // K0
# recover per-segment bounds in the packed (tree) order
p0 = rows[:, 0:3]; p1 = rows[:, 3:6]; r = rows[:, 12:13]
valid = rows[:, -1].view(np.int32) >= 0
lo = np.minimum(p0, p1) - 2 * r
hi = np.maximum(p0, p1) + 2 * r
lo[~valid] = 3e37; hi[~valid] = -3e37

pix = np.asarray(block_swizzle(res, res, 8, 8))
cpos = np.stack([(pix % res).astype(np.float32) + 0.5,
                 (pix // res).astype(np.float32) + 0.5], -1)
import jax.numpy as jnp
ray = sens_mod.sample_ray(scene.camera, jnp.asarray(cpos), None)
o = np.asarray(ray.o); d = np.asarray(ray.d)
N = o.shape[0]
inv_d = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)

print(f"N={N} segments={valid.sum()} (padded {rows.shape[0]})")
meas_pairs, meas_ms = 19827, 24.7
c1 = None

for K in (32, 64, 128):
    # sub-clusters: consecutive K segments of the morton order
    C = rows.shape[0] // K
    cl_lo = lo.reshape(C, K, 3).min(1)
    cl_hi = hi.reshape(C, K, 3).max(1)
    live_c = (cl_hi >= cl_lo).all(-1)
    for tile in (16, 32, 64, 128):
        T = N // tile
        SUB = 8           # estimate on every 8th tile, scale back up
        pairs = 0
        step = 64
        tids = list(range(0, T, SUB))
        for b0 in range(0, len(tids), step):
            batch = tids[b0:b0 + step]
            idx = np.concatenate([np.arange(t * tile, (t + 1) * tile)
                                  for t in batch])
            oo = o[idx]; ii = inv_d[idx]
            tn = np.full((oo.shape[0], C), -np.inf, np.float32)
            tf = np.full((oo.shape[0], C), np.inf, np.float32)
            for ax in range(3):
                a0 = (cl_lo[None, :, ax] - oo[:, None, ax]) * ii[:, None, ax]
                a1 = (cl_hi[None, :, ax] - oo[:, None, ax]) * ii[:, None, ax]
                tn = np.maximum(tn, np.minimum(a0, a1))
                tf = np.minimum(tf, np.maximum(a0, a1))
            hit = (tn <= tf * 1.0000002 + 1e-7) & (tf >= 0) & live_c[None]
            union = hit.reshape(-1, tile, C).any(1)
            pairs += int(union.sum())
        pairs *= SUB
        segs_per_ray = pairs * K / N
        # iteration work model: lanes = tile rows x 128 lanes; a K<128
        # cluster wastes (128-K) lanes unless 128/K are packed per iter
        packs = max(1, 128 // K)
        iters = int(np.ceil(pairs / packs))
        work = iters * (tile / 64)       # [64,128]-test equivalents
        if c1 is None and K == 128 and tile == 64:
            c1 = meas_ms / work if abs(pairs - meas_pairs) < 5000 else None
        print(f"K={K:4d} tile={tile:4d}: pairs={pairs:7d} "
              f"segs/ray={segs_per_ray:7.0f} iters(pack{packs})={iters:7d} "
              f"work={work:9.0f}")

print(f"\ncalibration c1 = {c1} ms per [64,128] test-equivalent")
