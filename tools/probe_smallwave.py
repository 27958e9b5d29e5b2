"""Fixed-cost profile of closest/any-hit queries at SMALL widths.

The staged-width ladder re-launches bounce queries at n/4, n/16 (and
n/64, n/256 when HAIRPT_STAGES>3) as RR kills lanes; with maxDepth 65
the tail runs dozens of narrow queries, so their FIXED cost (phase-A
grid + [T, C] routing sort + completion machinery) multiplies. This
probe times the full tiled_closest_hit/any_hit at widths 256k..4k on
bounce-ray populations to expose the floor.

Usage: BENCH_RES=512 BENCH_QUALITY=14 python tools/probe_smallwave.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import functools

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
    t0 = time.time()
    scene = build_scene(quality, res, 4, 8, (rng.SOBOL_QMC, 9, res))
    cfg = scene.config
    sw = scene.arrays.hair_swept
    C, K = cfg.swept_c, cfg.swept_k
    q_max = cfg.tiled_q
    N = res * res
    print(f"[sm] scene built ({time.time()-t0:.0f}s): C={C} K={K} "
          f"q={q_max}", flush=True)

    pix = jnp.arange(N, dtype=jnp.uint32)
    pos = jnp.stack([(pix % res).astype(jnp.float32) + 0.5,
                     (pix // res).astype(jnp.float32) + 0.5], -1)
    cam_ray = sens_mod.sample_ray(scene.camera, pos, None)

    @jax.jit
    def closest_full(ray):
        return tl.tiled_closest_hit(sw, ray, C, K, q_max=q_max,
                                    sort_rays=True)
    _, (tc, pc) = timed(closest_full, cam_ray)
    hitm = jnp.isfinite(tc)
    hp = cam_ray.o + cam_ray.d * jnp.where(hitm, tc, 0.0)[:, None]
    hp = jnp.where(hitm[:, None], hp, hp[jnp.argmax(hitm)][None, :])
    u = rng.next_2d(7, pix, jnp.zeros_like(pix), 0)
    z = 1.0 - 2.0 * u[:, 0]
    r_ = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * u[:, 1]
    bd = jnp.stack([r_ * jnp.cos(phi), z, r_ * jnp.sin(phi)], -1)

    for w in (N, N // 4, N // 16, N // 64, N // 256):
        ray_w = Ray(o=hp[:w], d=bd[:w],
                    mint=jnp.full((w,), 1e-3, jnp.float32),
                    maxt=jnp.full((w,), jnp.inf, jnp.float32))

        @functools.partial(jax.jit, static_argnames=("any_mode",))
        def q(ray, any_mode):
            if any_mode:
                return tl.tiled_any_hit(sw, ray, C, K, q_max=q_max,
                                        sort_rays=True)
            return tl.tiled_closest_hit(sw, ray, C, K, q_max=q_max,
                                        sort_rays=True)
        t_c, _ = timed(lambda r: q(r, False), ray_w)
        t_a, _ = timed(lambda r: q(r, True), ray_w)
        print(f"[sm] width {w:7d}: closest {t_c*1e3:7.1f} ms "
              f"({w/t_c/1e6:6.2f} Mrays/s)   any {t_a*1e3:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
