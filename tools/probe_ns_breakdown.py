"""Phase breakdown at north-star scale: times phase-A cull, routing sort,
and phase B separately on the 1M-segment furball at 1024².
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    fibers = int(os.environ.get("PROBE_FIBERS", "84000"))
    res = int(os.environ.get("PROBE_RES", "1024"))
    q = int(os.environ.get("PROBE_Q", "256"))
    k = 128
    tile = 64

    import jax
    import jax.numpy as jnp
    from hairpt.scene import hairgen
    from hairpt.ops import intersect_tiled as tl_mod
    from hairpt.ops.pallas_tiled import tiled_phase_b
    from hairpt.models import sensors as sens_mod
    from hairpt.scene.scene import SceneBuilder
    from hairpt.models.bsdf import registry as mat
    from hairpt.models import emitters as em
    from hairpt.film.film import Film
    from hairpt.models.sensors import Camera
    from hairpt.core.math import Ray

    fs = hairgen.gen_furball(n_fibers=fibers, radius=0.00216667)
    b = SceneBuilder()
    m = b.add_material(kind=mat.ROUGHPLASTIC, alpha=0.2, eta=1.55, dist=0,
                       diffuse=(0.143016, 0.0156076, 1.80928e-05))
    b.add_fibers(fs, m)
    b.env = em.bake_sunsky((-0.376047, 0.758426, 0.532333), turbidity=3.0,
                           sky_scale=5.0, sun_scale=19.0912,
                           sun_radius_scale=37.9165, res=64)
    cam_to_world = np.array([
        [-0.704024, 0.0939171, 0.703939, -10.6677],
        [1.05829e-08, 0.991217, -0.132245, 14.3141],
        [-0.710177, -0.0931033, -0.69784, 10.2879],
        [0, 0, 0, 1]])
    cam = Camera.perspective(cam_to_world, 35.0, res, res)
    scene = b.build(cam, Film.make(res, res, "tent"), spp=4, max_depth=8,
                    sampler=1, traversal="tiled", swept_k=k, tiled_q=q)
    sw = scene.arrays.hair_swept
    C = int(sw.cl_lo.shape[0])
    print(f"[bk] segments={int(scene.arrays.hair.p0.shape[0])} "
          f"clusters={C}", flush=True)

    n_pix = res * res
    pix = jnp.arange(n_pix, dtype=jnp.uint32)
    cpos = jnp.stack([(pix % res).astype(jnp.float32) + 0.5,
                      (pix // res).astype(jnp.float32) + 0.5], -1)
    ray = sens_mod.sample_ray(scene.camera, cpos, None)
    N = n_pix
    T = N // tile
    rays8 = jnp.stack([
        ray.o[:, 0].reshape(T, tile), ray.o[:, 1].reshape(T, tile),
        ray.o[:, 2].reshape(T, tile),
        ray.d[:, 0].reshape(T, tile), ray.d[:, 1].reshape(T, tile),
        ray.d[:, 2].reshape(T, tile),
        ray.mint.reshape(T, tile), ray.maxt.reshape(T, tile),
    ], axis=1)

    def timeit(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        print(f"[bk] {name}: {dt*1e3:.0f} ms", flush=True)
        return out

    # stage timings in the SAME tile-chunked form as one_pass (a direct
    # all-tiles phase-B call would blow the 1 MB SMEM slot budget)
    t_chunk = max(1, (1 << 17) // q)
    t_chunk = min(t_chunk, max(1, (1 << 25) // C))
    n_ch = T // t_chunk
    assert n_ch * t_chunk == T, (T, t_chunk)
    r8_ch = rays8.reshape((n_ch, t_chunk) + rays8.shape[1:])
    print(f"[bk] t_chunk={t_chunk} n_ch={n_ch}", flush=True)

    # phase A cull alone
    f_cull = jax.jit(lambda r8c: jax.lax.map(
        lambda r8: tl_mod._cull_pallas(r8, sw.cl_lo, sw.cl_hi)[:2], r8c))
    te, tpmax = timeit("phaseA cull", f_cull, r8_ch)

    # cull + routing
    def cull_route(r8):
        te, tpm, _o = tl_mod._cull_pallas(r8, sw.cl_lo, sw.cl_hi)
        mask = jnp.isfinite(te)
        return tl_mod._tile_slots(mask, te, q) + (tpm,)
    f_route = jax.jit(lambda r8c: jax.lax.map(cull_route, r8c))
    slots, cnt, tmin, tscale, ov, tpm = timeit("phaseA+routing", f_route,
                                               r8_ch)
    print(f"[bk] mean slots/tile: "
          f"{float(jnp.mean(cnt.astype(jnp.float32))):.1f} "
          f"overflow {int(jnp.sum(ov))}", flush=True)

    # phase B alone (on precomputed routing)
    def phase_b(args):
        slots, cnt, tmin, tscale, r8, tpm = args
        return tiled_phase_b(slots, cnt, tmin, tscale, r8, tpm,
                             sw.seg_rows_t, k, q, any_hit=False,
                             exit_every=1, unroll=3)
    f_b = jax.jit(lambda *a: jax.lax.map(phase_b, a[0]))
    timeit("phaseB", f_b, (slots, cnt, tmin, tscale, r8_ch, tpm))

    # full query
    ccfg = scene.config
    f_full = jax.jit(lambda s, r: tl_mod.tiled_closest_hit(
        s, r, ccfg.swept_c, ccfg.swept_k, q_max=q))
    timeit("full query", f_full, sw, ray)


if __name__ == "__main__":
    sys.exit(main())
