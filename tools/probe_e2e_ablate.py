"""Decompose the non-intersection e2e wave time by ablation.

Round-2 verdict: closest-hit runs at 2.38 Mrays/s but e2e forward is
0.42-0.50 — >60% of wave time sits OUTSIDE the intersection kernel and
was never attributed. This probe times one 1-spp wave of the furball
workload under each ablation (path.make_li_fn(ablate=...)) and prints
the wall-time deltas, which attribute the residual to NEE/shadow,
shading, the sampler, and the bounce resort.

Usage: PROBE_RES=512 PROBE_DEPTH=65 python tools/probe_e2e_ablate.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    res = int(os.environ.get("PROBE_RES", "512"))
    depth = int(os.environ.get("PROBE_DEPTH", "65"))
    quality = float(os.environ.get("PROBE_QUALITY", "14.0"))
    variants = os.environ.get(
        "PROBE_VARIANTS",
        "full,pcg,nonee,noshadow,cheapshade,nosort,stage1").split(",")

    import jax
    import jax.numpy as jnp
    from hairpt.core import rng as rng_mod
    from hairpt.integrators import path as path_int
    from hairpt.film import film as film_mod
    import bench

    m_res = max(1, int(np.ceil(np.log2(res))))
    sobol_mode = (rng_mod.SOBOL_QMC, m_res, res)

    t0 = time.time()
    scene = bench.build_scene(quality, res, 64, depth, sobol_mode)
    print(f"[ab] scene {int(scene.arrays.hair.p0.shape[0])} segs, "
          f"{res}x{res} depth {depth} (built {time.time()-t0:.0f}s)",
          flush=True)
    scene_pcg = scene._replace(config=__import__("dataclasses").replace(
        scene.config, sampler=1))
    fl = scene.film
    n_pix = res * res

    def barrier(x):
        return float(jnp.sum(x))

    from hairpt.integrators.common import block_swizzle
    swz = block_swizzle(res, res)

    def run_variant(name):
        import dataclasses
        ablate = []
        sc = scene
        for part in name.split("+"):
            if part == "pcg":
                sc = sc._replace(config=dataclasses.replace(
                    sc.config, sampler=1))
            elif part == "stage1":
                os.environ["HAIRPT_STAGES"] = "1"
            elif part.startswith("stages"):
                os.environ["HAIRPT_STAGES"] = part[6:]
            elif part.startswith("d") and part[1:].isdigit():
                sc = sc._replace(config=dataclasses.replace(
                    sc.config, max_depth=int(part[1:])))
            elif part.startswith("subq"):
                sc = sc._replace(config=dataclasses.replace(
                    sc.config, traversal="tiled_sub",
                    tiled_q=int(part[4:])))
            elif part.startswith("q") and part[1:].isdigit():
                sc = sc._replace(config=dataclasses.replace(
                    sc.config, tiled_q=int(part[1:])))
            elif part == "sub":
                sc = sc._replace(config=dataclasses.replace(
                    sc.config, traversal="tiled_sub"))
            elif part == "noshort":
                sc = sc._replace(config=dataclasses.replace(
                    sc.config, tiled_short=-1.0))
            elif part.startswith("short"):
                sc = sc._replace(config=dataclasses.replace(
                    sc.config, tiled_short=sc.config.tiled_short
                    * float(part[5:]) / 4.0))
            elif part != "full":
                ablate.append(part)
        ablate = tuple(ablate)
        li_fn = path_int.make_li_fn(sc, ablate=ablate)

        @jax.jit
        def wave(arr, sample_id, image, weight):
            pixel_idx = swz if swz is not None \
                else jnp.arange(n_pix, dtype=jnp.uint32)
            sample_idx = jnp.full((n_pix,), sample_id, jnp.uint32)
            radiance, pos, n_rays = li_fn(arr, pixel_idx, sample_idx)
            radiance = jnp.nan_to_num(radiance, nan=0.0, posinf=0.0,
                                      neginf=0.0)
            image, weight = film_mod.splat_samples(fl, pos, radiance,
                                                   image, weight)
            return image, weight, n_rays

        image, weight = film_mod.zeros(fl)
        arrs = sc.arrays
        t0 = time.time()
        image, weight, n_rays = wave(arrs, jnp.uint32(0), image, weight)
        barrier(weight)
        t_compile = time.time() - t0
        t0 = time.time()
        reps = 3
        for s in range(1, reps + 1):
            image, weight, n_rays = wave(arrs, jnp.uint32(s), image,
                                         weight)
        barrier(weight)
        dt = (time.time() - t0) / reps
        if name.startswith("stage"):
            os.environ.pop("HAIRPT_STAGES", None)
        print(f"[ab] {name:12s}: {dt*1e3:7.0f} ms/wave "
              f"({float(n_rays)/1e6:.2f} Mrays → "
              f"{float(n_rays)/dt/1e6:.2f} Mrays/s; "
              f"compile {t_compile:.0f}s)", flush=True)
        return dt

    base = None
    for v in variants:
        dt = run_variant(v.strip())
        if v.strip() == "full":
            base = dt
        elif base is not None:
            print(f"[ab]   Δ vs full: {(base-dt)*1e3:+.0f} ms", flush=True)


if __name__ == "__main__":
    main()
