"""TPU timing of the tile-routed intersector vs the pair-sorted one."""
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
from hairpt.ops import intersect_swept as sw_mod


def timeit(f, *args, reps=5, label=""):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"  {label:38s} {dt * 1e3:9.2f} ms")
    return out, dt


def main():
    res = int(os.environ.get("BENCH_RES", "256"))
    scene = build_scene(1.0, res, 4, 8)
    cfg = scene.config
    sw = scene.arrays.hair_swept
    C, K = cfg.swept_c, cfg.swept_k
    n_pix = res * res
    pix = jnp.arange(n_pix, dtype=jnp.uint32)
    cpos = jnp.stack([(pix % res).astype(jnp.float32) + 0.5,
                      (pix // res).astype(jnp.float32) + 0.5], -1)
    ray = sens_mod.sample_ray(scene.camera, cpos, None)
    N = n_pix
    print(f"backend={jax.default_backend()} C={C} K={K} N={N}")

    # stage timings for tiled
    f_mask = jax.jit(lambda s, r: tl_mod._tile_cluster_mask(s, r, 64)[:3])
    (mask, te, t_pmax), _ = timeit(f_mask, sw, ray,
                                   label="tile mask (phase A + OR)")
    f_slots = jax.jit(lambda m, t: tl_mod._tile_slots(m, t, 128))
    (slots, cnt, tmin, tscale, ovf), _ = timeit(f_slots, mask, te,
                                                label="slot extraction")
    print(f"    live pairs {int(np.asarray(cnt).sum())} overflow {int(ovf)}")

    for qm in (128,):
        f_t = jax.jit(lambda s, r: tl_mod.tiled_closest_hit(
            s, r, C, K, tile=64, q_max=qm))
        (tt, tp), dt = timeit(f_t, sw, ray, label=f"FULL tiled q_max={qm}")
        print(f"    tiled Mrays/s: {N / dt / 1e6:.3f}")

    f_s = jax.jit(lambda s, r: sw_mod.swept_closest_hit(
        s, r, C, K, p_max=cfg.swept_pmax, chunk=cfg.swept_chunk))
    (st, sp), dt = timeit(f_s, sw, ray, label="FULL swept (old)")
    print(f"    swept Mrays/s: {N / dt / 1e6:.3f}")

    tt, tp, st, sp = map(np.asarray, (tt, tp, st, sp))
    both = (tp >= 0) & (sp >= 0)
    print(f"  hits tiled {(tp>=0).sum()} swept {(sp>=0).sum()} "
          f"hitmask diff {((tp>=0)!=(sp>=0)).sum()} "
          f"pid match {(tp[both]==sp[both]).mean():.4f}")


if __name__ == "__main__":
    main()
