"""TPU probe: per-iteration overhead split of the tiled kernel.

Runs the resident kernel with nop=True (touch data, skip math) vs normal
on the furball camera wave -> per-slot overhead vs math cost.
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
from hairpt.ops.pallas_tiled import tiled_phase_b
from hairpt.integrators.common import block_swizzle


def timeit(f, *args, reps=10, label=""):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"  {label:40s} {dt * 1e3:9.2f} ms", flush=True)
    return out, dt


def main():
    res = 256
    scene = build_scene(1.0, res, 4, 8)
    cfg = scene.config
    sw = scene.arrays.hair_swept
    C, K = cfg.swept_c, cfg.swept_k
    n_pix = res * res
    pix = block_swizzle(res, res, 8, 8)
    cpos = jnp.stack([(pix % res).astype(jnp.float32) + 0.5,
                      (pix // res).astype(jnp.float32) + 0.5], -1)
    ray = sens_mod.sample_ray(scene.camera, cpos, None)

    tile, q_max = 64, 128
    ray_p, _ = tl_mod._pad_rays(ray, tile)
    T = ray_p.o.shape[0] // tile
    mask, te, t_pmax = jax.jit(
        lambda s, r: tl_mod._tile_cluster_mask(s, r, tile)[:3])(sw, ray_p)
    slots, cnt, tmin, tscale, ovf = jax.jit(
        lambda m, t: tl_mod._tile_slots(m, t, q_max))(mask, te)
    rays8 = jnp.stack([
        ray_p.o[:, 0].reshape(T, tile), ray_p.o[:, 1].reshape(T, tile),
        ray_p.o[:, 2].reshape(T, tile),
        ray_p.d[:, 0].reshape(T, tile), ray_p.d[:, 1].reshape(T, tile),
        ray_p.d[:, 2].reshape(T, tile),
        ray_p.mint.reshape(T, tile), ray_p.maxt.reshape(T, tile),
    ], axis=1)
    tp = t_pmax.reshape(T, tile)
    pairs = int(np.asarray(cnt).sum())
    print(f"pairs={pairs}", flush=True)

    for label, kw in [
        ("resident nop (overhead only)", dict(resident=True, nop=True)),
        ("resident full", dict(resident=True)),
        ("stream n_buf=2 nop", dict(resident=False, n_buf=2, nop=True)),
    ]:
        f = jax.jit(lambda s, c, rm, rs, r8, tpm, sr, kw=kw: tiled_phase_b(
            s, c, rm, rs, r8, tpm, sr, K, q_max,
            exit_every=10 ** 6, **kw))
        _, dt = timeit(f, slots, cnt, tmin, tscale, rays8, tp,
                       sw.seg_rows_t, label=label)
        print(f"    -> {dt * 1e6 / pairs:.3f} us/pair", flush=True)


if __name__ == "__main__":
    main()
