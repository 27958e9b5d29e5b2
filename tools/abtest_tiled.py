"""Trustworthy A/B timing of tiled closest-hit variants.

The tunnel backend serves repeated identical computations from a result
cache, so each timed repetition here uses a DIFFERENT ray set (distinct
pixel jitter per rep, pre-generated on device) — every call is a real
execution. Variants are selected via env:

  AB_VARIANTS=base,subcull,tile32,q64,two8   (comma list)
  BENCH_RES, BENCH_QUALITY as in bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from bench import build_scene
from hairpt.models import sensors as sens_mod
from hairpt.ops import intersect_tiled as tl_mod
from hairpt.core import rng

REPS = 8


def make_rays(scene, res, rep):
    n_pix = res * res
    pix = jnp.arange(n_pix, dtype=jnp.uint32)
    jit2 = rng.next_2d(1, pix, jnp.full((n_pix,), rep, jnp.uint32), 0)
    pos = jnp.stack([(pix % res).astype(jnp.float32) + jit2[:, 0],
                     (pix // res).astype(jnp.float32) + jit2[:, 1]], -1)
    return sens_mod.sample_ray(scene.camera, pos, None)


def main():
    res = int(os.environ.get("BENCH_RES", "256"))
    quality = float(os.environ.get("BENCH_QUALITY", "1.0"))
    scene = build_scene(quality, res, 4, 8)
    cfg = scene.config
    sw = scene.arrays.hair_swept
    C, K = cfg.swept_c, cfg.swept_k
    N = res * res
    rays = [make_rays(scene, res, r) for r in range(REPS)]
    for r in rays:
        jax.block_until_ready(r.o)
    print(f"backend={jax.default_backend()} C={C} K={K} N={N}",
          flush=True)

    variants = os.environ.get("AB_VARIANTS", "base").split(",")

    def run_variant(name):
        # composable variant spec: parts joined by '+', e.g.
        # "tile32+sub+two8" → tile=32, subcull, two_round=8
        kw = dict(tile=64, q_max=128)
        for part in name.split("+"):
            if part == "base":
                pass
            elif part == "sub":
                kw.update(subcull=True)
            elif part.startswith("tile"):
                kw.update(tile=int(part[4:]))
            elif part.startswith("q"):
                kw.update(q_max=int(part[1:]))
            elif part.startswith("two"):
                kw.update(two_round=int(part[3:]))
            else:
                raise SystemExit(f"unknown variant part {part}")

        def f(ray):
            return tl_mod.tiled_closest_hit(sw, ray, C, K, **kw)

        fj = jax.jit(f)
        out = fj(rays[0])
        jax.block_until_ready(out)
        # timed: one pass over distinct ray sets
        t0 = time.time()
        for r in range(REPS):
            out = fj(rays[r])
        jax.block_until_ready(out)
        dt = (time.time() - t0) / REPS
        t, p = out
        hits = int((np.asarray(p) >= 0).sum())
        print(f"  {name:12s} {dt * 1e3:8.2f} ms  "
              f"{N / dt / 1e6:7.3f} Mrays/s  hits={hits}", flush=True)
        return dt

    for v in variants:
        run_variant(v)




def dead_probe():
    """Fixed cost of a query on a mostly-dead wave: rays with maxt<mint
    except a small live fraction. AB_LIVE=0.02 etc."""
    res = int(os.environ.get("BENCH_RES", "256"))
    live_frac = float(os.environ.get("AB_LIVE", "0.02"))
    scene = build_scene(1.0, res, 4, 8)
    cfg = scene.config
    sw = scene.arrays.hair_swept
    C, K = cfg.swept_c, cfg.swept_k
    N = res * res
    rays = []
    for r in range(REPS):
        ry = make_rays(scene, res, r)
        u = rng.uniform_1d(jnp.arange(N, dtype=jnp.uint32),
                           jnp.uint32(r + 77), 0)
        dead = u > live_frac
        ry = ry._replace(maxt=jnp.where(dead, -1.0, ry.maxt))
        rays.append(ry)
        jax.block_until_ready(ry.maxt)
    from hairpt.ops import intersect_tiled as tl
    for sort in (False, True):
        def f(ray):
            return tl.tiled_closest_hit(sw, ray, C, K, tile=64, q_max=128,
                                        sort_rays=sort)
        fj = jax.jit(f)
        jax.block_until_ready(fj(rays[0]))
        t0 = time.time()
        for r in range(REPS):
            out = fj(rays[r])
        jax.block_until_ready(out)
        dt = (time.time() - t0) / REPS
        print(f"  dead-wave live={live_frac} sort={sort}: "
              f"{dt * 1e3:.2f} ms", flush=True)
    # morton sort alone
    from hairpt.ops.intersect_tiled import _morton_sort_rays
    fs = jax.jit(lambda ray: _morton_sort_rays(sw, ray)[0].o)
    jax.block_until_ready(fs(rays[0]))
    t0 = time.time()
    for r in range(REPS):
        out = fs(rays[r])
    jax.block_until_ready(out)
    print(f"  morton sort alone: {(time.time() - t0) / REPS * 1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    if os.environ.get("AB_DEAD"):
        dead_probe()
    else:
        main()
