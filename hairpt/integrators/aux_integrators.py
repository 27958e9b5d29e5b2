"""Auxiliary integrators: ambient occlusion, field extraction, direct.

References: src/integrators/direct/ao.cpp (`ao`), src/integrators/misc/
field.cpp (`field`), src/integrators/direct/direct.cpp (`direct` — the
max_depth=2 configuration of the path tracer, re-exported here by name).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core import rng, warps
from ..core.math import Ray, dot
from ..film import film as film_mod
from ..models import sensors
from ..scene.scene import Scene
from . import path as path_int
from .common import scene_intersect, scene_occluded, frame
from .path import _swept_params


def render_direct(scene: Scene, seed: int = 0, spp=None):
    """MIS direct illumination (emitter + BSDF sampling)."""
    scene = scene._replace(config=dataclasses.replace(scene.config,
                                                      max_depth=2))
    return path_int.render(scene, seed=seed, spp=spp)


def render_ao(scene: Scene, spp: int = 16, ray_length: float = -1.0,
              seed: int = 0):
    """Ambient occlusion: cosine-hemisphere visibility average."""
    cfg = scene.config
    arr = scene.arrays
    cam = scene.camera
    n_pix = cfg.width * cfg.height
    fl = scene.film
    max_len = jnp.inf if ray_length <= 0 else ray_length

    @jax.jit
    def wave(arrs, sample_id, image, weight):
        pixel_idx = jnp.arange(n_pix, dtype=jnp.uint32)
        sample_idx = jnp.full((n_pix,), sample_id, jnp.uint32)
        px = (pixel_idx % cfg.width).astype(jnp.float32)
        py = (pixel_idx // cfg.width).astype(jnp.float32)
        jit2 = rng.next_2d(cfg.sampler, pixel_idx, sample_idx, 0)
        pos = jnp.stack([px + jit2[..., 0], py + jit2[..., 1]], -1)
        ray = sensors.sample_ray(cam, pos, None)
        hit = scene_intersect(arrs, ray, cfg.traversal, cfg.block,
                              _swept_params(cfg))

        fr = frame(hit)
        u2 = rng.next_2d(cfg.sampler, pixel_idx, sample_idx, 4)
        wo = fr.to_world(warps.square_to_cosine_hemisphere(u2))
        n_or = jnp.where(dot(hit.sh_n, -ray.d)[..., None] < 0,
                         -hit.geo_n, hit.geo_n)
        shadow = Ray(o=hit.p + n_or * cfg.ray_eps,
                     d=wo,
                     mint=jnp.zeros(n_pix),
                     maxt=jnp.where(hit.valid, max_len, 0.0))
        occ = scene_occluded(arrs, shadow, cfg.traversal, cfg.block,
                             _swept_params(cfg))
        vis = jnp.where(hit.valid, (~occ).astype(jnp.float32), 1.0)
        radiance = jnp.broadcast_to(vis[..., None], (n_pix, 3))
        return film_mod.splat_samples(fl, pos, radiance, image, weight)

    image, weight = film_mod.zeros(fl)
    for s in range(spp):
        image, weight = wave(arr, jnp.uint32(s + seed * 65536), image,
                             weight)
    return film_mod.develop(image, weight)


FIELDS = ("distance", "position", "geoNormal", "shNormal", "uv", "albedo",
          "primIndex")


def render_field(scene: Scene, field: str = "shNormal", spp: int = 1):
    """Extract a geometric field as an image (AOVs)."""
    assert field in FIELDS, field
    cfg = scene.config
    cam = scene.camera
    n_pix = cfg.width * cfg.height
    fl = scene.film

    @jax.jit
    def wave(arrs, sample_id, image, weight):
        from ..models.bsdf import registry as mat
        pixel_idx = jnp.arange(n_pix, dtype=jnp.uint32)
        sample_idx = jnp.full((n_pix,), sample_id, jnp.uint32)
        px = (pixel_idx % cfg.width).astype(jnp.float32)
        py = (pixel_idx // cfg.width).astype(jnp.float32)
        jit2 = rng.next_2d(cfg.sampler, pixel_idx, sample_idx, 0)
        pos = jnp.stack([px + jit2[..., 0], py + jit2[..., 1]], -1)
        ray = sensors.sample_ray(cam, pos, None)
        hit = scene_intersect(arrs, ray, cfg.traversal, cfg.block,
                              _swept_params(cfg))
        if field == "distance":
            v = jnp.broadcast_to(jnp.where(hit.valid, hit.t, 0.0)[..., None],
                                 (n_pix, 3))
        elif field == "position":
            v = hit.p
        elif field == "geoNormal":
            v = hit.geo_n
        elif field == "shNormal":
            v = hit.sh_n
        elif field == "uv":
            v = jnp.concatenate([hit.uv, jnp.zeros((n_pix, 1))], -1)
        elif field == "albedo":
            gm = mat.gather(arrs.materials, arrs.checkers, hit.mat_id,
                            hit.uv)
            v = gm.diffuse
        else:  # primIndex
            v = jnp.broadcast_to(hit.mat_id[..., None].astype(jnp.float32),
                                 (n_pix, 3))
        v = jnp.where(hit.valid[..., None], v, 0.0)
        return film_mod.splat_samples(fl, pos, v, image, weight)

    image, weight = film_mod.zeros(fl)
    for s in range(spp):
        image, weight = wave(scene.arrays, jnp.uint32(s), image, weight)
    return film_mod.develop(image, weight)


def render_adaptive(scene: Scene, base_spp: int = 8, extra_spp: int = 24,
                    fraction: float = 0.25, seed: int = 0):
    """Adaptive sampling (reference: src/integrators/misc/adaptive.cpp):
    after a base pass, the noisiest `fraction` of pixels — by a two-buffer
    variance estimate — receive `extra_spp` additional samples. Wavefront
    formulation: the refinement pass is a fixed-size top-K pixel subset, so
    shapes stay static for jit."""
    cfg = scene.config
    fl = scene.film
    n_pix = cfg.width * cfg.height
    li = path_int.make_li_fn(scene)

    @jax.jit
    def wave(arrs, pixel_idx, sample_id, image, weight):
        sample_idx = jnp.full(pixel_idx.shape, sample_id, jnp.uint32)
        radiance, pos, _ = li(arrs, pixel_idx, sample_idx)
        radiance = jnp.nan_to_num(radiance, nan=0.0, posinf=0.0, neginf=0.0)
        return film_mod.splat_samples(fl, pos, radiance, image, weight)

    all_pix = jnp.arange(n_pix, dtype=jnp.uint32)
    img_a, wt_a = film_mod.zeros(fl)
    img_b, wt_b = film_mod.zeros(fl)
    half = max(base_spp // 2, 1)
    for s in range(half):
        img_a, wt_a = wave(scene.arrays, all_pix,
                           jnp.uint32(s + seed * 65536), img_a, wt_a)
    for s in range(half, 2 * half):
        img_b, wt_b = wave(scene.arrays, all_pix,
                           jnp.uint32(s + seed * 65536), img_b, wt_b)

    a = film_mod.develop(img_a, wt_a)
    b = film_mod.develop(img_b, wt_b)
    # two-buffer variance proxy, relative to brightness (tonemapped-ish)
    err = jnp.sum(jnp.abs(a - b), axis=-1) \
        / jnp.maximum(jnp.sum(a + b, axis=-1), 1e-3)
    k = max(int(n_pix * fraction), 1)
    _, hot = jax.lax.top_k(err.reshape(-1), k)
    hot = hot.astype(jnp.uint32)

    image = img_a + img_b
    weight = wt_a + wt_b
    for s in range(2 * half, 2 * half + extra_spp):
        image, weight = wave(scene.arrays, hot,
                             jnp.uint32(s + seed * 65536), image, weight)
    return film_mod.develop(image, weight)


def render_multichannel(scene: Scene, channels=("radiance", "shNormal",
                                                "distance", "albedo"),
                        spp: int = 8, seed: int = 0):
    """Render several channels of the same scene (reference:
    src/integrators/misc/multichannel.cpp). Returns {name: image}."""
    out = {}
    for ch in channels:
        if ch == "radiance":
            out[ch] = path_int.render(scene, seed=seed, spp=spp)
        elif ch == "ao":
            out[ch] = render_ao(scene, spp=spp, seed=seed)
        else:
            out[ch] = render_field(scene, ch)
    return out
