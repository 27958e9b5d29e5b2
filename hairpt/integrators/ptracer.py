"""Adjoint particle tracer: light paths splatted through the camera.

Capability counterpart of the reference `ptracer` plugin
(src/integrators/ptracer/*, CaptureParticleWorker): light subpaths are
generated with the BDPT machinery and every vertex (including the
emitter point itself) is connected to the pinhole camera with a
visibility ray and splatted via camera_importance. Single-strategy —
unbiased on its own, no MIS needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import Ray, dot
from ..film import film as film_mod
from ..models import sensors
from ..scene.scene import Scene
from .common import scene_occluded
from .path import _swept_params
from .bdpt import generate_paths, _bsdf_eval_pdf


def render_ptracer(scene: Scene, n_paths: int = 1 << 15, spp_norm=None,
                   s_max: int = 5, seed: int = 0):
    """Particle-traced render (camera side only). n_paths light subpaths
    per wave; the number of waves is chosen so total work ≈ the film's
    spp budget."""
    cfg = scene.config
    arr = scene.arrays
    cam = scene.camera
    fl = scene.film
    assert arr.area is not None, "ptracer needs area lights"
    n_waves = max(1, (cfg.width * cfg.height * cfg.spp) // (4 * n_paths))

    def one_wave(arrs, wave_id, splat_img):
        idx = jnp.arange(n_paths, dtype=jnp.uint32)
        smp = jnp.full((n_paths,), wave_id, jnp.uint32)
        # t_max=2 keeps the (unused) eye subpath tiny
        _, light = generate_paths(scene, arrs, idx, smp, 2, s_max)
        n = n_paths

        for s in range(1, s_max + 1):
            ys = s - 1
            film_pos, we, dist, d_cam, vis_ok = sensors.camera_importance(
                cam, light.p[ys])
            ok = light.valid[ys] & vis_ok
            if s == 1:
                # direct emission towards the camera
                cos_l = jnp.maximum(jnp.sum(light.ns[ys] * d_cam, -1), 0.0)
                f_l = light.beta[ys] * cos_l[..., None]
            else:
                ok = ok & ~light.delta[ys]
                f_b, _, _ = _bsdf_eval_pdf(scene, arrs, light, ys, d_cam)
                f_l = light.beta[ys] * f_b
            c = f_l * (we / jnp.maximum(dist * dist, 1e-12))[..., None]
            ok = ok & (jnp.max(jnp.abs(c), -1) > 0)
            sh_o = light.p[ys] + light.ng[ys] * jnp.where(
                dot(d_cam, light.ng[ys]) > 0, cfg.ray_eps,
                -cfg.ray_eps)[..., None]
            shadow = Ray(o=sh_o, d=d_cam, mint=jnp.zeros(n),
                         maxt=jnp.where(ok, dist - 2 * cfg.ray_eps, 0.0))
            occ = scene_occluded(arrs, shadow, cfg.traversal, cfg.block,
                                 _swept_params(cfg))
            val = jnp.where((ok & ~occ)[..., None], c, 0.0)
            splat_img = film_mod.splat_add_only(fl, film_pos, val,
                                                splat_img)
        return splat_img

    wave = jax.jit(one_wave)
    splat_img = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    for w in range(n_waves):
        splat_img = wave(arr, jnp.uint32(w + seed * 65536), splat_img)
    # each path contributes measurement estimates; normalize by path count
    # and spread over the pixel grid (see bdpt t=1 splats)
    return splat_img * (cfg.width * cfg.height) / (n_paths * n_waves)
