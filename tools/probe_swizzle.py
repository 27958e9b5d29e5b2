"""TPU probe: tile size × pixel order effects on the tiled intersector."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from bench import build_scene
from hairpt.models import sensors as sens_mod
from hairpt.ops import intersect_tiled as tl_mod
from hairpt.integrators.common import block_swizzle


def timeit(f, *args, reps=10, label=""):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"  {label:44s} {dt * 1e3:9.2f} ms", flush=True)
    return out, dt


def main():
    res = int(os.environ.get("BENCH_RES", "256"))
    scene = build_scene(1.0, res, 4, 8)
    cfg = scene.config
    sw = scene.arrays.hair_swept
    C, K = cfg.swept_c, cfg.swept_k
    n_pix = res * res
    N = n_pix
    print(f"backend={jax.default_backend()} C={C} K={K} N={N}", flush=True)

    def rays_for(order):
        pix = order if order is not None \
            else jnp.arange(n_pix, dtype=jnp.uint32)
        cpos = jnp.stack([(pix % res).astype(jnp.float32) + 0.5,
                          (pix // res).astype(jnp.float32) + 0.5], -1)
        return sens_mod.sample_ray(scene.camera, cpos, None)

    configs = [
        ("raster tile=64", None, 64, 128),
        ("8x8-block tile=64", block_swizzle(res, res, 8, 8), 64, 128),
        ("16x8-block tile=128", block_swizzle(res, res, 16, 8), 128, 128),
        ("8x8x2-block tile=128", block_swizzle(res, res, 8, 8), 128, 128),
    ]
    out0 = None
    for label, order, tile, qm in configs:
        ray = rays_for(order)
        pairs = jax.jit(lambda s, r, t=tile: tl_mod._tile_cluster_mask(
            s, tl_mod._pad_rays(r, t)[0], t)[0].sum())(sw, ray)
        f = jax.jit(lambda s, r, t=tile, q=qm: tl_mod.tiled_closest_hit(
            s, r, C, K, tile=t, q_max=q))
        (tt, pp), dt = timeit(f, sw, ray, label=label)
        print(f"    pairs={int(pairs)}  -> {N / dt / 1e6:.3f} Mrays/s",
              flush=True)
        hits = int((np.asarray(pp) >= 0).sum())
        if order is not None:
            inv = np.zeros(N, np.int64)
            inv[np.asarray(order)] = np.arange(N)
            pp_r = np.asarray(pp)[inv]
        else:
            pp_r = np.asarray(pp)
        if out0 is None:
            out0 = pp_r
        print(f"    hits={hits} pid_match_vs_first="
              f"{(pp_r == out0).mean():.4f}", flush=True)


if __name__ == "__main__":
    main()
