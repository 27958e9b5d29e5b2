"""Energy-redistribution path tracing (Cline et al. 2005).

Capability counterpart of the reference `erpt` plugin
(src/integrators/erpt/*): path-traced seed samples have their energy
redistributed by short Metropolis chains of small primary-space
mutations, depositing EQUAL energy quanta (Cline §5: chains are started
proportionally to seed energy and every deposit carries the same fixed
amount — this, not per-seed shares, is what kills the fat tail of
bright seeds such as directly-visible emitters).

Estimator: a pool of m uniform primary samples estimates the mean image
luminance b = E[l]; n chains start at pool entries resampled ∝ l
(stratified CDF pick, the Kelemen bootstrap); each of the K mutation
steps Rao-Blackwellizes the accept decision by splatting both states
  (1-a) · (C(x)/L(x)) · b/K   and   a · (C(y)/L(y)) · b/K
so every deposit has luminance exactly b/K. Final scale W·H/n makes the
image total-luminance-exact against the pool estimate.
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
        # stratify the image-plane dims over pixels (lane i covers pixel
        # i mod W·H, jittered): the normalization b = mean(l) is otherwise
        # dominated by Poisson noise in the count of uniform samples that
        # land on small bright features (a directly-visible lamp shifts
        # b — and the whole render's scale — by ±20% at 8k samples)
        npix = cfg.width * cfg.height
        pix = idx % npix
        ux = ((pix % cfg.width).astype(jnp.float32) + u0[:, 0]) \
            / cfg.width
        uy = ((pix // cfg.width).astype(jnp.float32) + u0[:, 1]) \
            / cfg.height
        u0 = u0.at[:, 0].set(ux).at[:, 1].set(uy)
        pos0, rgb0, l0 = eval_u(arr, u0)
        splat = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
        # equal-quanta chain starts: resample the pool ∝ luminance
        b = jnp.mean(l0)
        cdf = jnp.cumsum(l0) / jnp.maximum(jnp.sum(l0), 1e-20)
        u_r = rng.uniform_1d(idx, jnp.uint32(seed * 131 + 3), 0)
        strat = (idx.astype(jnp.float32) + u_r) / n
        pick = jnp.clip(jnp.searchsorted(cdf, strat), 0, n - 1)
        u0 = u0[pick]
        pos0 = pos0[pick]
        rgb0 = rgb0[pick]
        l0 = l0[pick]
        l_seed = jnp.broadcast_to(b, l0.shape)

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
            # Rao-Blackwellized equal-deposition (Cline et al. §5.1):
            # integrate out the accept decision by splatting BOTH states,
            # weighted (1-a) / a — same expectation as depositing at the
            # post-transition state, much lower variance near bright
            # features (e.g. directly-visible emitters).
            share = l_seed / n_mutations
            dep_c = jnp.where((l > 1e-12)[:, None],
                              rgb / jnp.maximum(l, 1e-12)[:, None]
                              * ((1.0 - a) * share)[:, None], 0.0)
            dep_p = jnp.where((l_p > 1e-12)[:, None],
                              rgb_p / jnp.maximum(l_p, 1e-12)[:, None]
                              * (a * share)[:, None], 0.0)
            splat = film_mod.splat_add_only(fl, pos, dep_c, splat)
            splat = film_mod.splat_add_only(fl, pos_p, dep_p, splat)
            acc = rng.uniform_1d(idx, jnp.uint32(seed + 6), it) < a
            u = jnp.where(acc[:, None], u_prop, u)
            pos = jnp.where(acc[:, None], pos_p, pos)
            rgb = jnp.where(acc[:, None], rgb_p, rgb)
            l = jnp.where(acc, l_p, l)
            return (u, pos, rgb, l, splat), None

        carry = (u0, pos0, rgb0, l0, splat)
        (_, _, _, _, splat), _ = jax.lax.scan(
            step, carry, jnp.arange(n_mutations, dtype=jnp.uint32))
        scale = (cfg.width * cfg.height) / n
        return splat * scale

    return jnp.asarray(run(arr))
