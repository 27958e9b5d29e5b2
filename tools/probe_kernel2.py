import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from bench import build_scene
from hairpt.models import sensors as sens_mod
from hairpt.ops import intersect_tiled as tl
from hairpt.ops.pallas_tiled import tiled_phase_b

def timeit(f, *args, reps=10, label=""):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"  {label:40s} {dt*1e3:8.2f} ms")
    return out, dt

res = 256
scene = build_scene(1.0, res, 4, 8)
cfg = scene.config
sw = scene.arrays.hair_swept
C, K = cfg.swept_c, cfg.swept_k
n_pix = res * res
pix = jnp.arange(n_pix, dtype=jnp.uint32)
cpos = jnp.stack([(pix % res).astype(jnp.float32) + 0.5,
                  (pix // res).astype(jnp.float32) + 0.5], -1)
ray = sens_mod.sample_ray(scene.camera, cpos, None)
q_max = 128
ray_p, N = tl._pad_rays(ray, 64)
T = ray_p.o.shape[0] // 64
mask, te, t_pmax, octm = tl._tile_cluster_mask(sw, ray_p, 64)
slots, cnt, tmin, tscale, ovf = tl._tile_slots(mask, te, q_max)
rays8 = jnp.stack([ray_p.o[:, i].reshape(T, 64) for i in range(3)]
                  + [ray_p.d[:, i].reshape(T, 64) for i in range(3)]
                  + [ray_p.mint.reshape(T, 64), ray_p.maxt.reshape(T, 64)],
                  axis=1)
t_pm = t_pmax.reshape(T, 64)
print(f"pairs={int(np.asarray(cnt).sum())}")
res_map = {}
for label, kw in [
    ("nop", dict(nop=True, exit_every=10**6)),
    ("VPU full", dict(nop=False, exit_every=10**6, mxu=False)),
    ("MXU full", dict(nop=False, exit_every=10**6, mxu=True)),
    ("VPU full (rep)", dict(nop=False, exit_every=10**6, mxu=False)),
]:
    f = jax.jit(lambda s, c, tm, ts, r8, tp, rows, kw=kw: tiled_phase_b(
        s, c, tm, ts, r8, tp, rows, K, q_max, **kw))
    out, dt = timeit(f, slots, cnt, tmin, tscale, rays8, t_pm,
                     sw.seg_rows_t, label=label)
    res_map[label] = out
# consistency VPU vs MXU
tv, pv = map(np.asarray, res_map["VPU full"])
tm_, pm_ = map(np.asarray, res_map["MXU full"])
hv, hm = pv >= 0, pm_ >= 0
print(f"hits vpu {hv.sum()} mxu {hm.sum()} mask diff {(hv!=hm).sum()}")
both = hv & hm
print("pid match:", (pv[both]==pm_[both]).mean(),
      "max t diff:", np.abs(tv[both]-tm_[both]).max())
