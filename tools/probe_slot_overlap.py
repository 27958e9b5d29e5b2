"""Measure how much of the bounce-tile cluster union is tile-AABB
LOOSENESS vs genuine per-ray disjointness.

The phase-A cull tests the TILE's swept volume against cluster AABBs;
BASELINE.md r3 measured 188 candidate clusters per bounce tile vs 13
per ray (14×). A per-slot ray-overlap pre-test in the kernel can skip
exactly the clusters that NO ray in the tile overlaps — i.e. the gap
between the tile union and the OR of per-ray slab masks. This probe
computes both on the production-sorted bounce population:

  union_or    = mean per-tile |∪_ray slab(ray, cluster)|
  per_ray     = mean per-ray |slab(ray, cluster)|

If union_or ≪ 188, a @pl.when slot skip is worth kernel work.
Usage: BENCH_RES=512 python tools/probe_slot_overlap.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from bench import build_scene
from hairpt.models import sensors as sens_mod
from hairpt.ops import intersect_tiled as tl
from hairpt.core import rng
from hairpt.core.math import Ray

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))


def main():
    res = int(os.environ.get("BENCH_RES", "512"))
    quality = float(os.environ.get("BENCH_QUALITY", "14"))
    scene = build_scene(quality, res, 4, 8, (rng.SOBOL_QMC, 9, res))
    cfg = scene.config
    sw = scene.arrays.hair_swept
    C = cfg.swept_c
    N = res * res
    print(f"[ov] C={C} N={N}", flush=True)

    pix = jnp.arange(N, dtype=jnp.uint32)
    pos = jnp.stack([(pix % res).astype(jnp.float32) + 0.5,
                     (pix // res).astype(jnp.float32) + 0.5], -1)
    cam_ray = sens_mod.sample_ray(scene.camera, pos, None)
    tc, _ = tl.tiled_closest_hit(sw, cam_ray, C, cfg.swept_k,
                                 q_max=cfg.tiled_q)
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
    # production sort
    sray, _ = tl._morton_sort_rays(sw, bray)

    # per-ray slab masks in tile chunks
    TILE = 64
    T = N // TILE
    lo = sw.cl_lo
    hi = sw.cl_hi

    @jax.jit
    def tile_stats(o, d, mint, maxt):
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        t0 = (lo[None, :, :] - o[:, None, :]) * inv[:, None, :]
        t1 = (hi[None, :, :] - o[:, None, :]) * inv[:, None, :]
        tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), mint[:, None])
        tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), -1), maxt[:, None])
        m = tn <= tf                     # [TILE, C]
        per_ray = jnp.sum(m, axis=1)     # [TILE]
        union = jnp.any(m, axis=0)       # [C]
        return jnp.sum(per_ray), jnp.sum(union)

    # also: shadow population (sun direction)
    sun = jnp.asarray([-0.376047, 0.758426, 0.532333])
    sun = sun / jnp.linalg.norm(sun)

    for name, rr in (("bounce", sray),
                     ("shadow", Ray(o=sray.o,
                                    d=jnp.broadcast_to(sun, (N, 3)),
                                    mint=sray.mint, maxt=sray.maxt))):
        tot_ray = 0.0
        tot_union = 0.0
        n_tiles = min(T, 512)            # sample 512 tiles
        step = max(T // n_tiles, 1)
        for ti in range(0, n_tiles * step, step):
            s = slice(ti * TILE, (ti + 1) * TILE)
            pr, un = tile_stats(rr.o[s], rr.d[s], rr.mint[s], rr.maxt[s])
            tot_ray += float(pr)
            tot_union += float(un)
        print(f"[ov] {name}: per-ray {tot_ray / (n_tiles * TILE):8.1f}  "
              f"OR-union/tile {tot_union / n_tiles:8.1f}", flush=True)


if __name__ == "__main__":
    main()
