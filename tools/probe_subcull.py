"""TPU probe: tiled cluster culling vs subcull (32-seg sub-AABB phase A).

The tunnel backend serves REPEATED identical computations from a result
cache (~0.05 ms), so every timed repetition perturbs ray.mint by a tiny
unique epsilon to force real execution.
"""
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

REPS = 8
_rs = np.random.RandomState(int(time.time()) % 2 ** 31)


def timeit(f, sw, ray, label=""):
    # time-seeded perturbations: the tunnel caches results ACROSS
    # processes, so deterministic epsilons get served from cache
    variants = [ray._replace(mint=ray.mint + np.float32(
        1e-6 * (1 + _rs.rand()) * (k + 1))) for k in range(REPS)]
    out = f(sw, ray)
    jax.block_until_ready(out)
    ts = []
    for k in range(REPS):
        t0 = time.time()
        out = f(sw, variants[k])
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    dt = float(np.median(ts))
    per = " ".join(f"{t*1e3:.1f}" for t in ts)
    print(f"  {label:36s} {dt * 1e3:9.2f} ms   [{per}]", flush=True)
    return out, dt


def main():
    res = int(os.environ.get("BENCH_RES", "256"))
    scene = build_scene(1.0, res, 4, 8)
    cfg = scene.config
    sw = scene.arrays.hair_swept
    C, K = cfg.swept_c, cfg.swept_k
    n_pix = res * res
    N = n_pix
    pix = block_swizzle(res, res, 8, 8)
    cpos = jnp.stack([(pix % res).astype(jnp.float32) + 0.5,
                      (pix // res).astype(jnp.float32) + 0.5], -1)
    ray = sens_mod.sample_ray(scene.camera, cpos, None)
    print(f"backend={jax.default_backend()} C={C} K={K} "
          f"C32={sw.sub_lo.shape[0]} N={N}", flush=True)

    f_t = jax.jit(lambda s, r: tl_mod.tiled_closest_hit(s, r, C, K,
                                                        q_max=128))
    (t0_, p0_), dt0 = timeit(f_t, sw, ray, label="tiled (baseline)")
    print(f"    -> {N / dt0 / 1e6:.3f} Mrays/s", flush=True)

    for qm in (96, 128):
        f_s = jax.jit(lambda s, r, q=qm: tl_mod.tiled_closest_hit(
            s, r, C, K, q_max=q, subcull=True, return_overflow=True))
        (t1_, p1_, ovf), dt1 = timeit(f_s, sw, ray,
                                      label=f"tiled subcull q={qm}")
        print(f"    -> {N / dt1 / 1e6:.3f} Mrays/s  overflow={int(ovf)}",
              flush=True)
        hit0 = np.asarray(p0_) >= 0
        hit1 = np.asarray(p1_) >= 0
        both = hit0 & hit1
        print(f"    hits {hit1.sum()} vs {hit0.sum()}; pid match "
              f"{(np.asarray(p1_)[both] == np.asarray(p0_)[both]).mean():.4f}",
              flush=True)

    # any-hit (shadow) comparison
    f_a = jax.jit(lambda s, r: tl_mod.tiled_any_hit(s, r, C, K, q_max=128))
    _, dta = timeit(f_a, sw, ray, label="tiled any-hit")
    f_a32 = jax.jit(lambda s, r: tl_mod.tiled_any_hit(s, r, C, K, q_max=128,
                                                      subcull=True))
    _, dta32 = timeit(f_a32, sw, ray, label="tiled subcull any-hit")
    print(f"    any-hit {N/dta/1e6:.3f} -> {N/dta32/1e6:.3f} Mrays/s",
          flush=True)


if __name__ == "__main__":
    main()
