"""Inverse rendering: optimize BSDF/scene parameters from target images.

A NEW capability relative to the reference (which is forward-only C++; see
SURVEY.md §0) required by the north-star furball config: gradients of pixel
values w.r.t. Marschner absorption/roughness and diffuse reflectance flow
through the differentiable render path (`make_li_fn(differentiable=True)`),
including re-running the azimuthal table precompute *inside* the jitted
step so σ_a/β gradients reach it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..film import film as film_mod
from ..models.bsdf import hair as hair_bsdf
from ..models.bsdf import registry as mat
from ..scene.scene import Scene
from . import path as path_int


def recompute_hair_tables(materials: mat.MaterialTable, marschner_rows):
    """Rebuild the Marschner azimuthal tables from the (possibly updated)
    material parameters — differentiable w.r.t. sigma_a / beta_r / eta."""
    if not marschner_rows:
        return None
    vals, ws, lws = [], [], []
    for r in marschner_rows:
        v = hair_bsdf.precompute_azimuthal(materials.sigma_a[r],
                                           materials.beta_r[r],
                                           materials.eta[r])
        w, lw = hair_bsdf.azimuthal_sampling_tables(
            jax.lax.stop_gradient(v))  # sampling tables stay detached
        vals.append(v); ws.append(w); lws.append(lw)
    return mat.HairTables(values=jnp.stack(vals), weights=jnp.stack(ws),
                          lobe_weight=jnp.stack(lws))


def apply_params(scene: Scene, params: dict):
    """Override material-table fields from a params dict
    (keys: any MaterialTable field, e.g. 'diffuse', 'sigma_a', 'beta_r')."""
    mats = scene.arrays.materials._replace(**params)
    ht = scene.arrays.hair_tables
    if scene.marschner_rows and ({"sigma_a", "beta_r", "eta"} & set(params)):
        ht = recompute_hair_tables(mats, scene.marschner_rows)
    return scene.arrays._replace(materials=mats, hair_tables=ht)


def render_image(scene: Scene, params: dict, spp: int, seed: int = 0):
    """Differentiable low-spp render with the given parameter overrides."""
    arrays = apply_params(scene, params)
    li = path_int.make_li_fn(scene, differentiable=True)
    cfg = scene.config
    n_pix = cfg.width * cfg.height
    image, weight = film_mod.zeros(scene.film)
    for s in range(spp):
        pixel_idx = jnp.arange(n_pix, dtype=jnp.uint32)
        sample_idx = jnp.full((n_pix,), s + seed * 65536, jnp.uint32)
        radiance, pos, _ = li(arrays, pixel_idx, sample_idx)
        image, weight = film_mod.splat_samples(scene.film, pos, radiance,
                                               image, weight)
    return film_mod.develop(image, weight)


def loss_fn(scene: Scene, params: dict, target, spp: int, seed: int = 0):
    img = render_image(scene, params, spp, seed)
    return jnp.mean((img - target) ** 2)


def fit(scene: Scene, target, params0: dict, steps: int = 32,
        lr: float = 0.05, spp: int = 2, verbose: bool = False):
    """Adam loop over the selected parameters. Returns (params, losses)."""
    import optax
    opt = optax.adam(lr)
    state = opt.init(params0)

    @jax.jit
    def step(params, state, seed):
        l, g = jax.value_and_grad(
            lambda p: loss_fn(scene, p, target, spp, seed))(params)
        updates, state = opt.update(g, state)
        params = jax.tree.map(lambda x, u: x + u, params, updates)
        # physical clamps
        if "sigma_a" in params:
            params["sigma_a"] = jnp.clip(params["sigma_a"], 0.0, 10.0)
        if "beta_r" in params:
            params["beta_r"] = jnp.clip(params["beta_r"], 0.02, 1.0)
        if "diffuse" in params:
            params["diffuse"] = jnp.clip(params["diffuse"], 0.0, 1.0)
        return params, state, l

    params = params0
    losses = []
    for i in range(steps):
        params, state, l = step(params, state, jnp.uint32(i))
        losses.append(float(l))
        if verbose:
            print(f"step {i}: loss {float(l):.6f}")
    return params, losses
