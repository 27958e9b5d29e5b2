"""North-star scale probe: ~1M-segment furball, 1024² camera rays.

Measures closest-hit throughput + slot overflow at the real furball scale
(/root/reference/models/furball/scene.xml: 1024², 64 spp, maxDepth 65;
 /root/reference/models/curly-hair/gdb.txt shows ~2.37M segments).

  PROBE_FIBERS=84000 PROBE_RES=1024 PROBE_Q=128 python tools/probe_northstar.py
"""
import os
import sys
import time

import numpy as np


def main():
    fibers = int(os.environ.get("PROBE_FIBERS", "84000"))
    res = int(os.environ.get("PROBE_RES", "1024"))
    q = int(os.environ.get("PROBE_Q", "128"))
    k = int(os.environ.get("PROBE_K", "128"))

    import jax
    import jax.numpy as jnp
    from hairpt.scene import hairgen
    from hairpt.ops import intersect_swept as sw_mod
    from hairpt.ops import intersect_tiled as tl_mod
    from hairpt.models.sensors import Camera
    from hairpt.models import sensors as sens_mod

    dev = jax.devices()[0]
    print(f"[probe] device: {dev.platform} {dev.device_kind}", flush=True)

    t0 = time.time()
    fs = hairgen.gen_furball(n_fibers=fibers, radius=0.00216667)
    n_seg = fs.p0.shape[0] if hasattr(fs, "p0") else None
    print(f"[probe] fiber gen: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    from hairpt.scene.scene import SceneBuilder
    from hairpt.models.bsdf import registry as mat
    b = SceneBuilder()
    m = b.add_material(kind=mat.ROUGHPLASTIC, alpha=0.2, eta=1.55, dist=0,
                       diffuse=(0.143016, 0.0156076, 1.80928e-05))
    b.add_fibers(fs, m)
    from hairpt.models import emitters as em
    b.env = em.bake_sunsky((-0.376047, 0.758426, 0.532333), turbidity=3.0,
                           sky_scale=5.0, sun_scale=19.0912,
                           sun_radius_scale=37.9165, res=256)
    cam_to_world = np.array([
        [-0.704024, 0.0939171, 0.703939, -10.6677],
        [1.05829e-08, 0.991217, -0.132245, 14.3141],
        [-0.710177, -0.0931033, -0.69784, 10.2879],
        [0, 0, 0, 1]])
    from hairpt.film.film import Film
    cam = Camera.perspective(cam_to_world, 35.0, res, res)
    scene = b.build(cam, Film.make(res, res, "tent"), spp=4, max_depth=8,
                    sampler=1, traversal="tiled", swept_k=k,
                    tiled_q=q)
    sw = scene.arrays.hair_swept
    n_seg = int(scene.arrays.hair.p0.shape[0])
    C = int(sw.cl_lo.shape[0])
    seg_mb = sw.seg_rows_t.size * 4 / 1e6
    print(f"[probe] build: {time.time()-t0:.1f}s  segments={n_seg} "
          f"clusters={C} K={k} seg_table={seg_mb:.0f} MB", flush=True)

    n_pix = res * res
    pix = jnp.arange(n_pix, dtype=jnp.uint32)
    cpos = jnp.stack([(pix % res).astype(jnp.float32) + 0.5,
                      (pix // res).astype(jnp.float32) + 0.5], -1)
    cray = sens_mod.sample_ray(scene.camera, cpos, None)
    ccfg = scene.config

    configs = [dict(q_max=q)]
    extra = os.environ.get("PROBE_SWEEP", "")
    if extra:
        for tok in extra.split(";"):
            kv = dict(x.split("=") for x in tok.split(",") if x)
            cfg = dict(q_max=int(kv.get("q", q)),
                       subcull=kv.get("sub", "0") == "1",
                       two_round=int(kv.get("tr", "0")))
            configs.append(cfg)
    t_ref = None
    for cfg in configs:
        f_ch = jax.jit(lambda s, r, c=cfg: tl_mod.tiled_closest_hit(
            s, r, ccfg.swept_c, ccfg.swept_k, return_overflow=True, **c))
        t0 = time.time()
        t, p, ov = f_ch(sw, cray)
        jax.block_until_ready(t)
        t_compile = time.time() - t0
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            t, p, ov = f_ch(sw, cray)
        jax.block_until_ready(t)
        dt = time.time() - t0
        mrays = reps * n_pix / dt / 1e6
        hit_frac = float(jnp.mean((p >= 0).astype(jnp.float32)))
        if t_ref is None:
            t_ref = t
            diff = 0
        else:
            diff = int(jnp.sum((jnp.abs(t - t_ref) > 1e-4)
                               & (jnp.isfinite(t) | jnp.isfinite(t_ref))))
        print(f"[probe] {cfg}: {mrays:.2f} Mrays/s "
              f"({dt/reps*1e3:.0f} ms/query, hit {hit_frac:.3f}, "
              f"overflow {int(ov)}, compile {t_compile:.0f}s, "
              f"diff_vs_first {diff})", flush=True)


if __name__ == "__main__":
    sys.exit(main())
