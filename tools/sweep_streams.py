"""Sweep the octet-stream phase-B knobs (W window, unroll, qo) on the
production bounce-ray population — one scene build, many configs.

The r4 default-knob measurement (tools/probe_bounce_phase.py) put
streams=True at 682 ms vs 623 ms dense on the 512^2 bounce closest
query: the offline 5.3x compute model does not survive the kernel's
per-[8,128]-vreg pipeline depth at unroll=4. This sweep checks whether
deeper unroll / wider windows close that gap before the default flips.

Usage: BENCH_RES=512 BENCH_QUALITY=14 python tools/sweep_streams.py
  SWEEP="64:8,64:16,128:8" (W:unroll pairs; qo fixed = q_max)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from bench import build_scene
from hairpt.models import sensors as sens_mod
from hairpt.ops import intersect_tiled as tl
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
        barrier((out[0] if isinstance(out, tuple) else out)
                .astype("float32"))
        ts.append(time.time() - t0)
    return min(ts), out


def main():
    res = int(os.environ.get("BENCH_RES", "512"))
    quality = float(os.environ.get("BENCH_QUALITY", "14"))
    sweep = os.environ.get("SWEEP", "64:8,64:16,128:8")
    t0 = time.time()
    scene = build_scene(quality, res, 4, 8, (rng.SOBOL_QMC, 9, res))
    cfg = scene.config
    sw = scene.arrays.hair_swept
    C, K = cfg.swept_c, cfg.swept_k
    q_max = cfg.tiled_q
    N = res * res
    print(f"[ss] scene built ({time.time()-t0:.0f}s): C={C} K={K} "
          f"q={q_max} N={N}", flush=True)

    pix = jnp.arange(N, dtype=jnp.uint32)
    pos = jnp.stack([(pix % res).astype(jnp.float32) + 0.5,
                     (pix // res).astype(jnp.float32) + 0.5], -1)
    cam_ray = sens_mod.sample_ray(scene.camera, pos, None)

    @jax.jit
    def dense(ray):
        return tl.tiled_closest_hit(sw, ray, C, K, q_max=q_max,
                                    sort_rays=True)
    t_cam, (tc, pc) = timed(dense, cam_ray)
    hitm = jnp.isfinite(tc)
    hp = cam_ray.o + cam_ray.d * jnp.where(hitm, tc, 0.0)[:, None]
    hp = jnp.where(hitm[:, None], hp, hp[jnp.argmax(hitm)][None, :])
    u = rng.next_2d(7, pix, jnp.zeros_like(pix), 0)
    z = 1.0 - 2.0 * u[:, 0]
    r_ = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * u[:, 1]
    bd = jnp.stack([r_ * jnp.cos(phi), z, r_ * jnp.sin(phi)], -1)
    bray = Ray(o=hp, d=bd, mint=jnp.full((N,), 1e-3, jnp.float32),
               maxt=jnp.full((N,), jnp.inf, jnp.float32))

    t_b, (tb, pb) = timed(dense, bray)
    print(f"[ss] bounce DENSE: {t_b*1e3:8.1f} ms", flush=True)

    for pair in sweep.split(","):
        w_s, ur_s = pair.split(":")
        w, ur = int(w_s), int(ur_s)

        @jax.jit
        def streams(ray, w=w, ur=ur):
            return tl.tiled_closest_hit(sw, ray, C, K, q_max=q_max,
                                        sort_rays=True, streams=True,
                                        stream_w=w, stream_unroll=ur)
        try:
            t_s, (ts_, ps_) = timed(streams, bray)
        except Exception as e:
            print(f"[ss] W={w} unroll={ur}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            continue
        match = float(jnp.mean(jnp.isclose(
            jnp.where(ps_ >= 0, ts_, 0.0), jnp.where(pb >= 0, tb, 0.0),
            rtol=1e-5, atol=1e-7)))
        print(f"[ss] W={w:4d} unroll={ur:3d}: {t_s*1e3:8.1f} ms "
              f"(t-match {match*100:.2f}%)", flush=True)


if __name__ == "__main__":
    main()
