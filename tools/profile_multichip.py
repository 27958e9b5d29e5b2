"""Capture a jax.profiler trace of the sharded train step on the
8-virtual-device CPU mesh (VERDICT r2 #8: demonstrate the backward
gradient psum overlapping compute; inspect with xprof/tensorboard).
Writes artifacts/traces/multichip/."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax           # noqa: E402
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np       # noqa: E402


def main():
    from hairpt.film.film import Film
    from hairpt.models.sensors import Camera
    from hairpt.core.math import matrix_lookat
    from hairpt.models import emitters as em
    from hairpt.models.bsdf import registry as mat
    from hairpt.scene.scene import SceneBuilder
    from hairpt.scene import hairgen
    from hairpt.parallel import mesh as pmesh

    b = SceneBuilder()
    m = b.add_material(kind=mat.MARSCHNER, sigma_a=(0.4, 0.6, 0.8),
                       beta_r=0.1)
    fs = hairgen.gen_furball(n_fibers=200, n_segs=5, radius=0.02, seed=2,
                             center=(0, 0, 0), core_r=0.6, fiber_len=0.8)
    b.add_fibers(fs, m)
    b.env = em.make_constant((0.7, 0.8, 0.9))
    cam = Camera.perspective(matrix_lookat((0, 0.4, -4), (0, 0, 0),
                                           (0, 1, 0)), 45.0, 64, 64)
    scene = b.build(cam, Film.make(64, 64, "tent"), spp=1, max_depth=3,
                    sampler=1, swept_k=32)
    mesh = pmesh.default_mesh(8)
    target = jnp.zeros((64, 64, 3), jnp.float32)
    step = pmesh.make_train_step(scene, mesh, target, spp=1, lr=0.05)
    params = {"sigma_a": scene.arrays.materials.sigma_a,
              "beta_r": scene.arrays.materials.beta_r}
    params, loss = step(params, jnp.uint32(0))    # compile
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "traces", "multichip")
    os.makedirs(out, exist_ok=True)
    with jax.profiler.trace(out):
        for s in range(1, 3):
            params, loss = step(params, jnp.uint32(s))
        jax.block_until_ready(params)
    print(f"loss={float(loss):.5f}; trace written to {out}")


if __name__ == "__main__":
    main()
