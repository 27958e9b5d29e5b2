"""Energy-redistribution path tracing (Cline et al. 2005).

Capability counterpart of the reference `erpt` plugin
(src/integrators/erpt/*): ordinary path-traced seed samples have their
energy redistributed by short Metropolis chains of small primary-space
mutations. One seed/chain per lane; every mutation deposits the seed's
share of energy at the chain's current image position.

Estimator (per seed with luminance L_seed, K mutations):
  deposit at each visited state x_i:  (C(x_i)/L(x_i)) · L_seed / K
which preserves the seed's expected energy while spreading it over the
path-space neighbourhood (lower variance on caustic-like features).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rng
from ..film import film as film_mod
from ..scene.scene import Scene
from .pssmlt import make_eval_u, _luminance


def render_erpt(scene: Scene, n_seeds: int = 1 << 14,
                n_mutations: int = 16, sigma: float = 0.014,
                seed: int = 0):
    cfg = scene.config
    fl = scene.film
    n = n_seeds
    eval_u, n_dims = make_eval_u(scene)
    arr = scene.arrays
    idx = jnp.arange(n, dtype=jnp.uint32)

    def fresh(it, salt):
        cols = [rng.uniform_1d(idx, jnp.uint32(seed * 131 + salt),
                               it * n_dims + d) for d in range(n_dims)]
        return jnp.stack(cols, axis=1)

    @jax.jit
    def run(arr):
        u0 = fresh(jnp.uint32(0), 1)
        pos0, rgb0, l0 = eval_u(arr, u0)
        splat = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
        l_seed = l0

        def step(carry, it):
            u, pos, rgb, l, splat = carry
            g1 = rng.uniform_1d(idx[:, None] * 131 + jnp.arange(n_dims)[
                None, :].astype(jnp.uint32), jnp.uint32(seed + 5),
                it * 2 + 1)
            g2 = rng.uniform_1d(idx[:, None] * 131 + jnp.arange(n_dims)[
                None, :].astype(jnp.uint32), jnp.uint32(seed + 5),
                it * 2 + 2)
            gauss = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(g1, 1e-12))) \
                * jnp.cos(2 * jnp.pi * g2)
            u_prop = jnp.mod(u + sigma * gauss, 1.0)
            pos_p, rgb_p, l_p = eval_u(arr, u_prop)
            a = jnp.clip(l_p / jnp.maximum(l, 1e-12), 0.0, 1.0)
            acc = rng.uniform_1d(idx, jnp.uint32(seed + 6), it) < a
            u = jnp.where(acc[:, None], u_prop, u)
            pos = jnp.where(acc[:, None], pos_p, pos)
            rgb = jnp.where(acc[:, None], rgb_p, rgb)
            l = jnp.where(acc, l_p, l)
            # equal-deposition: the current state deposits the seed's share
            dep = jnp.where((l > 1e-12)[:, None],
                            rgb / jnp.maximum(l, 1e-12)[:, None]
                            * (l_seed / n_mutations)[:, None], 0.0)
            splat = film_mod.splat_add_only(fl, pos, dep, splat)
            return (u, pos, rgb, l, splat), None

        carry = (u0, pos0, rgb0, l0, splat)
        (_, _, _, _, splat), _ = jax.lax.scan(
            step, carry, jnp.arange(n_mutations, dtype=jnp.uint32))
        scale = (cfg.width * cfg.height) / n
        return splat * scale

    return jnp.asarray(run(arr))
