"""Measure the differentiable train-step (fwd+bwd) at the TRUE
north-star film size (VERDICT r2 #2: the BASELINE.json metric is
Mrays/s/chip on furball fwd+bwd, previously only measured at 512²).

  PROBE_BWD_RES=1024 PROBE_BWD_DEPTH=6 python tools/probe_bwd.py

Depth stays the documented gradient-mode depth (6): RR is disabled in
differentiable mode and the detached estimator's gradients are
shade-local, so depth-65 contributes noise, not signal, to material
gradients (see integrators/path.make_li_fn differentiable notes).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    res = int(os.environ.get("PROBE_BWD_RES", "1024"))
    depth = int(os.environ.get("PROBE_BWD_DEPTH", "6"))
    quality = float(os.environ.get("PROBE_BWD_QUALITY", "14.0"))

    import jax
    import jax.numpy as jnp
    import bench
    from hairpt.integrators import path as path_int

    t0 = time.time()
    scene = bench.build_scene(quality, res, 4, depth, 1)
    print(f"[bwd] scene {int(scene.arrays.hair.p0.shape[0])} segs "
          f"{res}² depth {depth} (built {time.time()-t0:.0f}s)",
          flush=True)
    li_d = path_int.make_li_fn(scene, differentiable=True)
    arr = scene.arrays
    n_pix = res * res

    def loss_fn(arr_in, diffuse, sample_id):
        mats = arr_in.materials._replace(
            diffuse=jnp.broadcast_to(diffuse,
                                     arr_in.materials.diffuse.shape))
        arr2 = arr_in._replace(materials=mats)
        pixel_idx = jnp.arange(n_pix, dtype=jnp.uint32)
        sample_idx = jnp.full((n_pix,), sample_id, jnp.uint32)
        radiance, pos, n_rays = li_d(arr2, pixel_idx, sample_idx)
        radiance = jnp.nan_to_num(radiance, nan=0.0, posinf=0.0,
                                  neginf=0.0)
        return jnp.mean(radiance), n_rays

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, argnums=1,
                                         has_aux=True))

    def barrier(x):
        # through the axon tunnel block_until_ready can return before
        # the computation lands; a value fetch is the reliable barrier
        return float(jnp.sum(x))
    p0 = jnp.asarray([0.143016, 0.0156076, 1.80928e-05], jnp.float32)
    t0 = time.time()
    (lv, n_rays), g = grad_fn(arr, p0, jnp.uint32(0))
    barrier(g)
    print(f"[bwd] compile+first step: {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    reps = 3
    for s in range(1, reps + 1):
        (lv, n_rays), g = grad_fn(arr, p0, jnp.uint32(s))
    barrier(g)
    dt = (time.time() - t0) / reps
    assert np.isfinite(np.asarray(g)).all()
    print(f"[bwd] fwd+bwd {res}² depth {depth}: {dt*1e3:.0f} ms/step, "
          f"{float(n_rays)/1e6:.2f} Mrays fwd → "
          f"{float(n_rays)/dt/1e6:.2f} Mrays/s (|g|={np.abs(g).sum():.2e})",
          flush=True)


if __name__ == "__main__":
    main()
