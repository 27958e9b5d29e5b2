"""Stage-by-stage timing of the cluster-sweep intersector on the bench
furball workload. Each stage is jitted separately so we can attribute
wall time (first call = compile, discarded).

Run:  python tools/profile_swept.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from bench import build_scene
from hairpt.core.math import Ray
from hairpt.models import sensors as sens_mod
from hairpt.ops import intersect_swept as sw_mod
from hairpt.ops.intersect_packed import PRIM_F


def timeit(f, *args, reps=5, label=""):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"  {label:42s} {dt * 1e3:9.2f} ms")
    return out, dt


def main():
    res = int(os.environ.get("BENCH_RES", "256"))
    scene = build_scene(1.0, res, 4, 8)
    cfg = scene.config
    sw = scene.arrays.hair_swept
    n_clusters, K = cfg.swept_c, cfg.swept_k
    p_max, chunk = cfg.swept_pmax, cfg.swept_chunk
    print(f"backend={jax.default_backend()} C={n_clusters} K={K} "
          f"p_max={p_max} chunk={chunk}")

    n_pix = res * res
    pix = jnp.arange(n_pix, dtype=jnp.uint32)
    cpos = jnp.stack([(pix % res).astype(jnp.float32) + 0.5,
                      (pix // res).astype(jnp.float32) + 0.5], -1)
    ray = sens_mod.sample_ray(scene.camera, cpos, None)
    N = n_pix

    # ---- stage 1: phase A dense ----
    f_a = jax.jit(lambda s, r: sw_mod._phase_a_dense(s, r, p_max))
    (slots, cnt), dt_a = timeit(f_a, sw, ray, label="phase A dense cull")
    cnt_np = np.asarray(cnt)
    print(f"    candidates/ray: mean {cnt_np.mean():.2f} max {cnt_np.max()} "
          f"p50 {np.percentile(cnt_np, 50):.0f} p99 "
          f"{np.percentile(cnt_np, 99):.0f} overflow "
          f"{(cnt_np >= p_max).mean() * 100:.2f}%")

    # ---- stage 2: pair sort + chunk building ----
    def f_sort(slots, ray):
        P = N * p_max
        pair_c = slots.reshape(P)
        pair_ray = jnp.repeat(jnp.arange(N, dtype=jnp.int32), p_max)
        big = jnp.int32(n_clusters)
        keys = jnp.where(pair_c < 0, big, pair_c)
        order = jnp.argsort(keys)
        sc = keys[order]
        sr = pair_ray[order]
        counts = jnp.bincount(sc, length=n_clusters + 1)[:-1]
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
        cc = jnp.max(chunk_cl.reshape(n_chunks, chunk), axis=1)
        return cr, cc, dest, valid_pair, order

    f_sort_j = jax.jit(f_sort)
    (cr, cc, dest, valid_pair, order), dt_s = timeit(
        f_sort_j, slots, ray, label="pair argsort + chunk build")
    cc_np = np.asarray(cc)
    print(f"    chunks: total {cc_np.shape[0]} live {(cc_np >= 0).sum()}")

    # ---- stage 3: rays8 gather ----
    def f_rays8(cr, ray):
        ridx = jnp.maximum(cr, 0)
        return jnp.stack([
            ray.o[ridx][..., 0], ray.o[ridx][..., 1], ray.o[ridx][..., 2],
            ray.d[ridx][..., 0], ray.d[ridx][..., 1], ray.d[ridx][..., 2],
            ray.mint[ridx],
            jnp.where(cr >= 0, ray.maxt[ridx], -1.0),
        ], axis=1)

    f_rays8_j = jax.jit(f_rays8)
    rays8, dt_r = timeit(f_rays8_j, cr, ray, label="rays8 gather/stack")

    # ---- stage 4: pallas phase B ----
    from hairpt.ops.pallas_phaseb import phase_b_pallas
    interp = jax.default_backend() not in ("tpu", "axon")
    f_b = jax.jit(lambda cc, rays8, rows: phase_b_pallas(
        cc, rays8, rows, K, interpret=interp))
    (t_chunks, p_chunks), dt_b = timeit(
        f_b, cc, rays8, sw.seg_rows_t, label="pallas phase B")

    # ---- stage 5: unsort + reduce ----
    def f_un(t_chunks, p_chunks, dest, valid_pair, order):
        P = N * p_max
        n_padded = t_chunks.shape[0] * t_chunks.shape[1]
        t_flat = t_chunks.reshape(n_padded)
        p_flat = p_chunks.reshape(n_padded)
        t_sorted = t_flat[jnp.where(valid_pair, dest, n_padded - 1)]
        p_sorted = p_flat[jnp.where(valid_pair, dest, n_padded - 1)]
        t_sorted = jnp.where(valid_pair, t_sorted, jnp.inf)
        p_sorted = jnp.where(valid_pair, p_sorted, -1)
        inv = jnp.zeros((P,), jnp.int32).at[order].set(
            jnp.arange(P, dtype=jnp.int32))
        t_pairs = t_sorted[inv].reshape(N, p_max)
        p_pairs = p_sorted[inv].reshape(N, p_max)
        k = jnp.argmin(t_pairs, axis=-1)
        best_t = jnp.take_along_axis(t_pairs, k[:, None], axis=-1)[:, 0]
        best_p = jnp.take_along_axis(p_pairs, k[:, None], axis=-1)[:, 0]
        return best_t, jnp.where(jnp.isfinite(best_t), best_p, -1)

    f_un_j = jax.jit(f_un)
    (bt, bp), dt_u = timeit(f_un_j, t_chunks, p_chunks, dest, valid_pair,
                            order, label="unsort + min-reduce")

    # ---- full fused query for comparison ----
    f_full = jax.jit(lambda s, r: sw_mod.swept_closest_hit(
        s, r, n_clusters, K, p_max=p_max, chunk=chunk))
    (ft, fp), dt_f = timeit(f_full, sw, ray, label="FULL fused query")

    total = dt_a + dt_s + dt_r + dt_b + dt_u
    print(f"\n  sum of stages: {total * 1e3:.2f} ms; fused: {dt_f * 1e3:.2f} ms")
    print(f"  fused Mrays/s: {N / dt_f / 1e6:.3f}")
    # consistency
    assert np.array_equal(np.asarray(fp), np.asarray(bp)), "mismatch!"
    print("  stagewise result == fused result")


if __name__ == "__main__":
    main()
