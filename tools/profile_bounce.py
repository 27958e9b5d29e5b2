"""Component-level timing of one path-tracing bounce on the furball scene.

Times, on realistic bounce-wave ray distributions:
  - closest-hit, coherent (camera wave)
  - Morton/octant sort alone
  - closest-hit, incoherent (bounce wave), sorted + unsorted
  - any-hit (shadow wave towards the sun cone), sorted
  - full li() wave (for the residual = shading + NEE + film)

Run: JAX_PLATFORMS=axon python tools/profile_bounce.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def timeit(f, *a, n=5, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    res = int(os.environ.get("BENCH_RES", "256"))
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import build_scene
    from hairpt.integrators.common import scene_intersect, scene_occluded
    from hairpt.integrators import path as path_int
    from hairpt.core.math import Ray
    from hairpt.ops import intersect_tiled as itiled
    from hairpt.models import sensors

    scene = build_scene(1.0, res, 4, 8)
    arr = scene.arrays
    cfg = scene.config
    sw = arr.hair_swept
    swept = (cfg.swept_c, cfg.swept_k, cfg.swept_pmax, cfg.swept_chunk,
             cfg.tiled_q)
    n = res * res
    print(f"N = {n} rays, {arr.hair.p0.shape[0]} segments", file=sys.stderr)

    # camera wave
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % res).astype(jnp.float32) + 0.5
    py = (pix // res).astype(jnp.float32) + 0.5
    cam_ray = sensors.sample_ray(scene.camera, jnp.stack([px, py], -1))

    f_closest = jax.jit(lambda r: scene_intersect(
        arr, r, cfg.traversal, cfg.block, swept, sort_rays=False).t)
    f_closest_sorted = jax.jit(lambda r: scene_intersect(
        arr, r, cfg.traversal, cfg.block, swept, sort_rays=True).t)
    t_cam = timeit(f_closest, cam_ray)
    print(f"closest coherent: {t_cam*1e3:8.1f} ms  "
          f"{n/t_cam/1e6:6.2f} Mrays/s")

    # bounce wave: origins = camera hit points, random cosine-ish dirs
    hit = jax.jit(lambda r: scene_intersect(arr, r, cfg.traversal, cfg.block,
                                            swept))(cam_ray)
    rs = np.random.RandomState(0)
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.where(np.asarray(hit.valid)[:, None], np.asarray(hit.p),
                 np.asarray(cam_ray.o))
    alive = np.asarray(hit.valid)
    bounce = Ray(o=jnp.asarray(o), d=jnp.asarray(d),
                 mint=jnp.full(n, 1e-3),
                 maxt=jnp.where(jnp.asarray(alive), jnp.inf, 0.0))
    frac = float(alive.mean())
    print(f"bounce wave: {frac*100:.0f}% lanes alive")

    f_sort = jax.jit(lambda r: itiled._morton_sort_rays(sw, r)[0].o)
    t_sort = timeit(f_sort, bounce)
    print(f"morton sort alone: {t_sort*1e3:8.1f} ms")

    t_b_uns = timeit(f_closest, bounce)
    print(f"closest bounce unsorted: {t_b_uns*1e3:8.1f} ms  "
          f"{n*frac/t_b_uns/1e6:6.2f} Mrays(alive)/s")
    t_b_sort = timeit(f_closest_sorted, bounce)
    print(f"closest bounce sorted:   {t_b_sort*1e3:8.1f} ms  "
          f"{n*frac/t_b_sort/1e6:6.2f} Mrays(alive)/s")

    # shadow wave towards the sun (one direction, tight cone)
    sun_d = np.array([-0.376047, 0.758426, 0.532333], np.float32)
    sun_d /= np.linalg.norm(sun_d)
    shadow = Ray(o=jnp.asarray(o), d=jnp.broadcast_to(jnp.asarray(sun_d),
                                                      (n, 3)),
                 mint=jnp.full(n, 1e-3),
                 maxt=jnp.where(jnp.asarray(alive), jnp.inf, 0.0))
    f_any = jax.jit(lambda r: scene_occluded(arr, r, cfg.traversal,
                                             cfg.block, swept,
                                             sort_rays=True))
    t_shadow = timeit(f_any, shadow)
    print(f"any-hit shadow sorted:   {t_shadow*1e3:8.1f} ms  "
          f"{n*frac/t_shadow/1e6:6.2f} Mrays(alive)/s")
    f_any_u = jax.jit(lambda r: scene_occluded(arr, r, cfg.traversal,
                                               cfg.block, swept,
                                               sort_rays=False))
    t_shadow_u = timeit(f_any_u, shadow)
    print(f"any-hit shadow unsorted: {t_shadow_u*1e3:8.1f} ms  "
          f"{n*frac/t_shadow_u/1e6:6.2f} Mrays(alive)/s")

    # full wave
    li_fn = path_int.make_li_fn(scene)
    f_li = jax.jit(lambda s: li_fn(arr, pix, jnp.full((n,), s, jnp.uint32))[0])
    t_li = timeit(f_li, jnp.uint32(1), n=3)
    nr = float(jax.jit(lambda s: li_fn(arr, pix,
                                       jnp.full((n,), s, jnp.uint32))[2])(
        jnp.uint32(1)))
    print(f"full li wave: {t_li*1e3:8.1f} ms  ({nr:.0f} rays → "
          f"{nr/t_li/1e6:6.2f} Mrays/s)")
    depth = cfg.max_depth
    est = t_cam + (depth - 1) * t_b_sort + depth * t_shadow
    print(f"traversal-only estimate for depth {depth}: {est*1e3:8.1f} ms "
          f"→ shading+film residual ≈ {(t_li-est)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
