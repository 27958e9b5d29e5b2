"""Phase breakdown of a BOUNCE-wave closest-hit query on furball.

The r2 breakdown (probe_ns_breakdown) covered the coherent camera wave;
bounce waves have 5-10x larger tile unions and dominate e2e time, but
their phase A / routing / phase B split was never measured. This probe
builds realistic bounce rays (origins at true camera hit points,
uniform sphere directions — the worst-case incoherent population),
Morton-sorts them as production does, and times each pipeline stage on
one tile chunk plus the full query.

Usage: BENCH_RES=512 BENCH_QUALITY=14 python tools/probe_bounce_phase.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from bench import build_scene
from hairpt.models import sensors as sens_mod
from hairpt.ops import intersect_tiled as tl
from hairpt.ops import pallas_tiled as pt
from hairpt.core import rng
from hairpt.core.math import Ray


def barrier(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


def timed(fn, *args, reps=5):
    out = fn(*args)
    barrier((out[0] if isinstance(out, tuple) else out).astype("float32"))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        barrier((out[0] if isinstance(out, tuple) else out).astype("float32"))
        ts.append(time.time() - t0)
    return min(ts), out


def main():
    res = int(os.environ.get("BENCH_RES", "512"))
    quality = float(os.environ.get("BENCH_QUALITY", "14"))
    t0 = time.time()
    scene = build_scene(quality, res, 4, 8, (rng.SOBOL_QMC, 9, res))
    cfg = scene.config
    sw = scene.arrays.hair_swept
    C, K = cfg.swept_c, cfg.swept_k
    q_max = cfg.tiled_q
    N = res * res
    print(f"[bp] scene built ({time.time()-t0:.0f}s): C={C} K={K} "
          f"q={q_max} N={N}", flush=True)

    pix = jnp.arange(N, dtype=jnp.uint32)
    pos = jnp.stack([(pix % res).astype(jnp.float32) + 0.5,
                     (pix // res).astype(jnp.float32) + 0.5], -1)
    cam_ray = sens_mod.sample_ray(scene.camera, pos, None)

    import functools

    @functools.partial(jax.jit, static_argnames=("sort",))
    def closest(ray, sort):
        return tl.tiled_closest_hit(sw, ray, C, K, q_max=q_max,
                                    sort_rays=sort)

    t_cam, (tc, pc) = timed(lambda r: closest(r, sort=False), cam_ray)
    hitm = jnp.isfinite(tc)
    print(f"[bp] camera query: {t_cam*1e3:8.1f} ms "
          f"({float(jnp.mean(hitm))*100:.0f}% hit)", flush=True)

    # bounce rays: origins at hit points (misses reuse a hit origin),
    # uniform sphere directions
    hp = cam_ray.o + cam_ray.d * jnp.where(hitm, tc, 0.0)[:, None]
    hp = jnp.where(hitm[:, None], hp, hp[jnp.argmax(hitm)][None, :])
    u = rng.next_2d(7, pix, jnp.zeros_like(pix), 0)
    z = 1.0 - 2.0 * u[:, 0]
    r_ = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * u[:, 1]
    bd = jnp.stack([r_ * jnp.cos(phi), z, r_ * jnp.sin(phi)], -1)
    bray = Ray(o=hp, d=bd, mint=jnp.full((N,), 1e-3, jnp.float32),
               maxt=jnp.full((N,), jnp.inf, jnp.float32))

    t_b, (tb, pb) = timed(lambda r: closest(r, sort=True), bray)
    print(f"[bp] bounce query (full, sorted): {t_b*1e3:8.1f} ms "
          f"({float(jnp.mean(jnp.isfinite(tb)))*100:.0f}% hit)",
          flush=True)

    if os.environ.get("BP_STREAMS", "1") == "1":
        s_w = int(os.environ.get("BP_W", "64"))
        s_ur = int(os.environ.get("BP_UNROLL", "4"))
        s_qo = int(os.environ.get("BP_QO", "0")) or None

        @jax.jit
        def closest_streams(ray):
            return tl.tiled_closest_hit(sw, ray, C, K, q_max=q_max,
                                        sort_rays=True, streams=True,
                                        stream_w=s_w, stream_unroll=s_ur,
                                        stream_qo=s_qo)
        t_bs, (tbs, pbs) = timed(closest_streams, bray)
        match = float(jnp.mean(jnp.isclose(
            jnp.where(pbs >= 0, tbs, 0.0), jnp.where(pb >= 0, tb, 0.0),
            rtol=1e-5, atol=1e-7)))
        print(f"[bp] bounce query STREAMS:        {t_bs*1e3:8.1f} ms "
              f"(t-match {match*100:.2f}%)", flush=True)

    # shadow rays toward the sun — the production NEE population
    # (a uniform-direction any-hit measures an unrepresentative
    # exhaustion pathology: tangential rays graze thousands of
    # clusters)
    sun = jnp.asarray([-0.376047, 0.758426, 0.532333])
    sun = sun / jnp.linalg.norm(sun)
    sray = Ray(o=hp, d=jnp.broadcast_to(sun, (N, 3)),
               mint=jnp.full((N,), 1e-3, jnp.float32),
               maxt=jnp.full((N,), jnp.inf, jnp.float32))
    @jax.jit
    def anyhit_dense(ray):
        return tl.tiled_any_hit(sw, ray, C, K, q_max=q_max,
                                sort_rays=True)
    ta, tba = timed(anyhit_dense, sray)
    print(f"[bp] sun shadow ANY-hit query:    {ta*1e3:8.1f} ms "
          f"({float(jnp.mean(tba))*100:.0f}% occluded)", flush=True)
    if os.environ.get("BP_STREAMS", "1") == "1":
        @jax.jit
        def anyhit_streams(ray):
            return tl.tiled_any_hit(sw, ray, C, K, q_max=q_max,
                                    sort_rays=True, streams=True,
                                    stream_w=s_w, stream_unroll=s_ur,
                                    stream_qo=s_qo)
        tas, tbas = timed(anyhit_streams, sray)
        agree = float(jnp.mean(tbas == tba))
        print(f"[bp] sun shadow ANY-hit STREAMS:  {tas*1e3:8.1f} ms "
              f"(agree {agree*100:.2f}%)", flush=True)

    # ---- stage timing on one chunk of sorted bounce rays ----
    @jax.jit
    def msort(r):
        s_, o_ = tl._morton_sort_rays(sw, r)
        return s_.o, s_.d, s_.mint, s_.maxt
    so, sd, smin, smax = msort(bray)
    sray = Ray(o=so, d=sd, mint=smin, maxt=smax)
    t_sort, _ = timed(lambda r: msort(r)[0], bray)
    if os.environ.get("BP_STAGES", "0") != "1":
        print(f"[bp]   (morton sort full wave: {t_sort*1e3:.1f} ms)")
        return
    Tc = int(os.environ.get("BP_CHUNK", "96"))
    tile = 64
    n_c = Tc * tile
    ray_c = Ray(o=sray.o[:n_c], d=sray.d[:n_c], mint=sray.mint[:n_c],
                maxt=sray.maxt[:n_c])
    rays8 = jnp.stack([
        ray_c.o[:, 0].reshape(Tc, tile), ray_c.o[:, 1].reshape(Tc, tile),
        ray_c.o[:, 2].reshape(Tc, tile),
        ray_c.d[:, 0].reshape(Tc, tile), ray_c.d[:, 1].reshape(Tc, tile),
        ray_c.d[:, 2].reshape(Tc, tile),
        ray_c.mint.reshape(Tc, tile), ray_c.maxt.reshape(Tc, tile)],
        axis=1)

    @jax.jit
    def cull(r8):
        te, tpm = tl._cull_pallas(r8, sw.cl_lo, sw.cl_hi)
        return te, tpm

    t_cull, (te, tpm) = timed(cull, rays8)

    @jax.jit
    def route(te_in):
        mask = jnp.isfinite(te_in)
        return tl._tile_slots(mask, te_in, q_max)

    t_route, (slots, cnt, tmin, tscale, ov) = timed(route, te)

    @jax.jit
    def phase_b(sl, cn, tm, ts, r8, tpm_in):
        return pt.tiled_phase_b(sl, cn, tm, ts, r8, tpm_in,
                                sw.seg_rows_t, K, q_max)

    t_pb, (tq, pq) = timed(phase_b, slots, cnt, tmin, tscale, rays8, tpm)

    @jax.jit
    def phase_b_any(sl, cn, tm, ts, r8, tpm_in):
        return pt.tiled_phase_b(sl, cn, tm, ts, r8, tpm_in,
                                sw.seg_rows_t, K, q_max, any_hit=True)

    t_pba, _ = timed(phase_b_any, slots, cnt, tmin, tscale, rays8, tpm)

    n_chunks = (N // tile) / Tc
    print(f"[bp] per-{Tc}-tile-chunk stages (x{n_chunks:.0f} chunks "
          f"= full wave):", flush=True)
    print(f"[bp]   morton sort (full wave): {t_sort*1e3:8.1f} ms")
    print(f"[bp]   phase A cull:  {t_cull*1e3:8.1f} ms "
          f"(x{n_chunks:.0f} = {t_cull*n_chunks*1e3:7.1f})")
    print(f"[bp]   slot routing:  {t_route*1e3:8.1f} ms "
          f"(x{n_chunks:.0f} = {t_route*n_chunks*1e3:7.1f})")
    print(f"[bp]   phase B:       {t_pb*1e3:8.1f} ms "
          f"(x{n_chunks:.0f} = {t_pb*n_chunks*1e3:7.1f})")
    print(f"[bp]   phase B any:   {t_pba*1e3:8.1f} ms "
          f"(x{n_chunks:.0f} = {t_pba*n_chunks*1e3:7.1f})")
    cnt_np = np.asarray(cnt)
    print(f"[bp]   tile candidates: mean {cnt_np.mean():.0f} "
          f"p50 {np.percentile(cnt_np, 50):.0f} "
          f"p99 {np.percentile(cnt_np, 99):.0f} max {cnt_np.max()} "
          f"overflow {int(ov)}")


if __name__ == "__main__":
    main()
