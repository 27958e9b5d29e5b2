"""Primary-sample-space Metropolis light transport (Kelemen-style).

Capability counterpart of the reference `pssmlt` plugin
(src/integrators/pssmlt/*, PSSMLTSampler small/large mutations over the
ReplayableSampler's primary samples). TPU-native redesign: one Markov
chain PER LANE — tens of thousands of independent chains advance in
lockstep, each full-path luminance evaluation being one wavefront trace
through the standard path `li` with explicit primary samples
(make_li_fn(n_uniform_dims=...)). Start-up bias is handled the standard
way: chains are seeded from a stratified large-step pool and the image is
scaled by the pool's mean luminance b.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng
from ..film import film as film_mod
from ..scene.scene import Scene
from . import path as path_int

LUM = np.array([0.212671, 0.715160, 0.072169], np.float32)


def _luminance(c):
    return c @ jnp.asarray(LUM)


def n_pss_dims(cfg):
    """2 (pixel) + camera jitter/aperture + 16 per bounce."""
    return 2 + path_int.DIM_BASE + path_int.DIM_STRIDE * max(
        cfg.max_depth - 1, 1)


def make_eval_u(scene: Scene):
    """Primary-sample-space path evaluator shared by pssmlt/erpt:
    u [N, n_dims] → (pos [N,2], rgb [N,3], lum [N])."""
    cfg = scene.config
    n_dims = n_pss_dims(cfg)
    li_fn = path_int.make_li_fn(scene, n_uniform_dims=n_dims - 2)

    def eval_u(arr, u):
        n = u.shape[0]
        px = jnp.clip(u[:, 0] * cfg.width, 0, cfg.width - 1e-3)
        py = jnp.clip(u[:, 1] * cfg.height, 0, cfg.height - 1e-3)
        pix = (py.astype(jnp.uint32) * cfg.width
               + px.astype(jnp.uint32))
        # camera jitter dims read u[2:4]; make them reproduce px/py's
        # fractional position inside the pixel
        uu = u[:, 2:]
        uu = uu.at[:, path_int.DIM_CAM_POS].set(px - jnp.floor(px))
        uu = uu.at[:, path_int.DIM_CAM_POS + 1].set(py - jnp.floor(py))
        rgb, pos, _ = li_fn(arr, pix, jnp.zeros(n, jnp.uint32), uu)
        rgb = jnp.nan_to_num(rgb, nan=0.0, posinf=0.0, neginf=0.0)
        return pos, rgb, _luminance(rgb)

    return eval_u, n_dims


def render_pssmlt(scene: Scene, n_chains: int = 1 << 14,
                  n_mutations: int = 64, p_large: float = 0.3,
                  sigma: float = 0.014, seed: int = 0):
    """Metropolis render. Returns the developed [H, W, 3] image.

    n_chains lanes × n_mutations Metropolis steps; p_large = large-step
    probability (reference default 0.3); sigma = small-step size."""
    cfg = scene.config
    fl = scene.film
    n = n_chains
    eval_u, n_dims = make_eval_u(scene)

    arr = scene.arrays
    idx = jnp.arange(n, dtype=jnp.uint32)

    def fresh(it, salt):
        cols = []
        for ddim in range(n_dims):
            cols.append(rng.uniform_1d(idx, jnp.uint32(seed * 7919 + salt),
                                       it * n_dims + ddim))
        return jnp.stack(cols, axis=1)

    @jax.jit
    def run(arr):
        # seed pool: one large-step sample per chain; b = E[lum].
        # Chains are reseeded from the pool ∝ luminance so the initial
        # states follow the stationary distribution π ∝ L (kills the
        # start-up bias of uniform seeding; reference: pssmlt.cpp seeds
        # from a luminance-resampled pool too).
        u_pool = fresh(jnp.uint32(0), 1)
        pos_pl, rgb_pl, l_pl = eval_u(arr, u_pool)
        b = jnp.mean(l_pl)
        cdf = jnp.cumsum(l_pl) / jnp.maximum(jnp.sum(l_pl), 1e-20)
        u_pick = rng.uniform_1d(idx, jnp.uint32(seed + 9), 0)
        pick = jnp.clip(jnp.searchsorted(cdf, u_pick), 0, n - 1)
        u0 = u_pool[pick]
        pos0 = pos_pl[pick]
        rgb0 = rgb_pl[pick]
        l0 = l_pl[pick]

        splat = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

        def step(carry, it):
            u, pos, rgb, l, splat = carry
            u_large = fresh(it + 1, 2)
            # small step: gaussian perturbation, wrapped to [0,1)
            g1 = rng.uniform_1d(idx[:, None] * 131 + jnp.arange(n_dims)[
                None, :].astype(jnp.uint32), jnp.uint32(seed), it * 3 + 1)
            g2 = rng.uniform_1d(idx[:, None] * 131 + jnp.arange(n_dims)[
                None, :].astype(jnp.uint32), jnp.uint32(seed), it * 3 + 2)
            gauss = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(g1, 1e-12))) \
                * jnp.cos(2 * jnp.pi * g2)
            u_small = jnp.mod(u + sigma * gauss, 1.0)
            is_large = rng.uniform_1d(idx, jnp.uint32(seed + 3),
                                      it) < p_large
            u_prop = jnp.where(is_large[:, None], u_large, u_small)

            pos_p, rgb_p, l_p = eval_u(arr, u_prop)
            a = jnp.clip(l_p / jnp.maximum(l, 1e-12), 0.0, 1.0)
            a = jnp.where(l <= 0, 1.0, a)

            # Kelemen-weighted splats of both states
            w_cur = (1.0 - a) / jnp.maximum(l, 1e-12)
            w_prop = a / jnp.maximum(l_p, 1e-12)
            splat = film_mod.splat_add_only(
                fl, pos, rgb * jnp.where(l > 0, w_cur, 0.0)[:, None],
                splat)
            splat = film_mod.splat_add_only(
                fl, pos_p, rgb_p * jnp.where(l_p > 0, w_prop, 0.0)[:, None],
                splat)

            acc = rng.uniform_1d(idx, jnp.uint32(seed + 4), it) < a
            u = jnp.where(acc[:, None], u_prop, u)
            pos = jnp.where(acc[:, None], pos_p, pos)
            rgb = jnp.where(acc[:, None], rgb_p, rgb)
            l = jnp.where(acc, l_p, l)
            return (u, pos, rgb, l, splat), None

        carry = (u0, pos0, rgb0, l0, splat)
        (u, pos, rgb, l, splat), _ = jax.lax.scan(
            step, carry, jnp.arange(n_mutations, dtype=jnp.uint32))
        # scale: each pixel's estimate = b × mean over samples, spread
        # over the whole image (n_chains × n_mutations samples for
        # W×H pixels)
        scale = b * (cfg.width * cfg.height) / (n * n_mutations)
        return splat * scale, b

    splat, b = run(arr)
    return jnp.asarray(splat)
