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
    stacked = jnp.stack(vals)
    return mat.HairTables(values=stacked, weights=jnp.stack(ws),
                          lobe_weight=jnp.stack(lws),
                          values_quad=hair_bsdf.quad_pack(stacked))


def apply_params_arrays(arrays, params: dict, marschner_rows):
    """Override material-table fields on a SceneArrays from a params dict
    (keys: any MaterialTable field, e.g. 'diffuse', 'sigma_a', 'beta_r')."""
    mats = arrays.materials._replace(**params)
    ht = arrays.hair_tables
    if marschner_rows and ({"sigma_a", "beta_r", "eta"} & set(params)):
        ht = recompute_hair_tables(mats, marschner_rows)
    return arrays._replace(materials=mats, hair_tables=ht)


def apply_params(scene: Scene, params: dict):
    return apply_params_arrays(scene.arrays, params, scene.marschner_rows)


def make_prb_loss_grad(scene: Scene, loss_fn=None):
    """Path-replay-backprop loss+gradient at the params level: O(1)
    memory in depth, so gradients run at the workload's true maxDepth
    (65) where the scan-AD mode's per-bounce checkpoints cannot fit.

    Returns f(arrays_base, params, pixel_idx, sample_idx, *loss_args)
        -> (loss, d_params). Chain rule: PRB returns cotangents w.r.t.
    (float material fields, hair tables); the outer vjp through
    apply_params_arrays carries them to σ_a/β_R/diffuse (including
    through the differentiable azimuthal-table precompute)."""
    import jax
    from . import prb
    gradf = prb.make_prb_grad_fn(scene, loss_fn=loss_fn)
    rows = scene.marschner_rows

    def f(arrays_base, params, pixel_idx, sample_idx, *loss_args):
        def theta_of(p):
            return prb.float_theta(apply_params_arrays(arrays_base, p,
                                                       rows))
        theta, vjp_outer = jax.vjp(theta_of, params)
        arrs = arrays_base._replace(
            materials=arrays_base.materials._replace(**theta[0]),
            hair_tables=theta[1])
        (loss, _L), d_theta = gradf(arrs, pixel_idx, sample_idx,
                                    *loss_args)
        (d_params,) = vjp_outer(d_theta)
        return loss, d_params

    return f


def make_render_fn(scene: Scene, spp: int, antithetic: bool = False):
    """Build a jittable differentiable renderer.

    Returns render(arrays_base, params, seed) -> image [H,W,3]. The scene
    arrays and target are ARGUMENTS, never closure constants — lowering
    embeds closure constants by value, which fetches device arrays back
    through the compile tunnel (minutes per array; cf. bench.py).

    antithetic: each sample index renders a (u, 1−u)-mirrored pair of
    the BSDF-sampling dims and averages them — first-order sampling
    noise in the lobe-width direction cancels, which removes the
    gradient-noise rectification that biased recovered β_R upward
    (VERDICT r4 #5). Costs 2 waves per sample."""
    lis = [path_int.make_li_fn(scene, differentiable=True)]
    if antithetic:
        lis.append(path_int.make_li_fn(scene, differentiable=True,
                                       antithetic=antithetic))
    cfg = scene.config
    n_pix = cfg.width * cfg.height
    fl = scene.film
    rows = scene.marschner_rows

    def render(arrays_base, params, seed):
        arrays = apply_params_arrays(arrays_base, params, rows)
        image, weight = film_mod.zeros(fl)
        for s in range(spp):
            pixel_idx = jnp.arange(n_pix, dtype=jnp.uint32)
            sample_idx = (jnp.full((n_pix,), s, jnp.uint32)
                          + seed.astype(jnp.uint32) * 65536)
            for li in lis:
                radiance, pos, _ = li(arrays, pixel_idx, sample_idx)
                radiance = jnp.nan_to_num(radiance, nan=0.0, posinf=0.0,
                                          neginf=0.0)
                image, weight = film_mod.splat_samples(fl, pos, radiance,
                                                       image, weight)
        return film_mod.develop(image, weight)

    return render


def render_image(scene: Scene, params: dict, spp: int, seed: int = 0):
    """Differentiable low-spp render with the given parameter overrides."""
    render = jax.jit(make_render_fn(scene, spp))
    return render(scene.arrays, params, jnp.uint32(seed))


def loss_fn(scene: Scene, params: dict, target, spp: int, seed: int = 0):
    img = render_image(scene, params, spp, seed)
    return jnp.mean((img - target) ** 2)


def fit(scene: Scene, target, params0: dict, steps: int = 32,
        lr: float = 0.05, spp: int = 2, verbose: bool = False,
        checkpoint_dir: str | None = None, checkpoint_every: int = 8,
        loss_kind: str = "mse", decay_steps: int | None = None,
        antithetic: bool = False):
    """Adam loop over the selected parameters. Returns (params, losses).

    checkpoint_dir: if set, the (params, opt_state, step) pytree is
    checkpointed with orbax every `checkpoint_every` steps and the loop
    resumes from the latest step on restart — the long-run resilience
    counterpart of the film .npz checkpoints in `render()` (reference
    has no equivalent; its renders are single-shot C++ jobs)."""
    import optax
    import time

    # resolve checkpoint state FIRST: the cosine-decay horizon is stored
    # in the checkpoint so a resumed fit (even one called with a larger
    # `steps`) continues the SAME schedule unless decay_steps explicitly
    # overrides it, and losses from pre-resume steps are carried over so
    # the returned history covers the whole run (ADVICE r2)
    start = 0
    mngr = None
    prior_losses: list[float] = []
    ckpt_horizon = None
    if checkpoint_dir:
        import json
        import os
        import orbax.checkpoint as ocp
        ckdir = os.path.abspath(checkpoint_dir)
        mngr = ocp.CheckpointManager(ckdir,
                                     options=ocp.CheckpointManagerOptions(
                                         max_to_keep=2))
        latest = mngr.latest_step()
        if latest is not None:
            start = latest + 1
            meta_path = os.path.join(ckdir, f"meta_{latest}.json")
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    meta = json.load(f)
                ckpt_horizon = meta.get("horizon")
                prior_losses = list(meta.get("losses", []))

    if decay_steps is not None:
        horizon = decay_steps
    elif ckpt_horizon is not None:
        horizon = ckpt_horizon
    else:
        horizon = steps
    # cosine decay to lr/10: the MC gradient noise floor dominates late
    # steps — annealing lets the params settle instead of random-walking
    opt = optax.adam(optax.cosine_decay_schedule(lr, max(horizon, 1),
                                                 alpha=0.1))
    state = opt.init(params0)
    if loss_kind == "cross":
        render = make_render_fn(scene, max(1, spp // 2),
                                antithetic=antithetic)
    else:
        render = make_render_fn(scene, spp, antithetic=antithetic)

    # r5: the relative normalization must NOT use the raw noisy target —
    # 1/(t²+ε) is correlated with the (A−t)(B−t) residual in dark noisy
    # pixels, and that correlation biased the cross loss toward
    # over-smoothed params (measured: the biased loss scored the WRONG
    # β 2× better than truth; a 16-step box-blurred normalizer flips the
    # ordering to truth by 29%). The blur keeps the dark-REGION
    # upweighting (hair absorption tint) while decorrelating per-pixel
    # noise.
    if loss_kind == "cross":
        import numpy as _np
        tb = _np.asarray(target)
        for _ in range(16):
            tb = (tb + _np.roll(tb, 1, 0) + _np.roll(tb, -1, 0)
                  + _np.roll(tb, 1, 1) + _np.roll(tb, -1, 1)) / 5.0
        wnorm = jnp.asarray(1.0 / (tb ** 2 + 1e-2), jnp.float32)
    else:
        wnorm = None

    @jax.jit
    def step(arrays_base, target, params, state, seed):
        def loss(p):
            if loss_kind == "cross":
                # two-sample cross estimator: E[(A−t)(B−t)] =
                # (E[img]−t)² for INDEPENDENT renders A, B — removes the
                # Var(img) term that plain MC-MSE minimizes alongside the
                # true error (at low spp that term dominates and pushes
                # roughness up, since wider lobes smooth the noise).
                a = render(arrays_base, p, seed * 2)
                bimg = render(arrays_base, p, seed * 2 + 1)
                d2 = (a - target) * (bimg - target)
                return jnp.mean(d2 * wnorm)
            img = render(arrays_base, p, seed)
            d2 = (img - target) ** 2
            if loss_kind == "relative":
                # relative MSE: normalizes per-pixel by brightness so
                # dark-region color information (hair absorption tint)
                # is not drowned by bright-sky residual variance
                d2 = d2 / (jax.lax.stop_gradient(img) ** 2 + 1e-2)
            return jnp.mean(d2)
        l, g = jax.value_and_grad(loss)(params)
        # a single degenerate MC sample (grazing fresnel, zero-pdf lane)
        # can inject a NaN into the whole gradient; one poisoned step
        # then sticks every parameter at NaN forever. Sanitize — the
        # sanitized estimator stays unbiased a.e.
        g = jax.tree.map(
            lambda x: jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0),
            g)
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
    arrays_base = scene.arrays
    losses = list(prior_losses)
    trace = []      # per-step param snapshots (host floats) — lets the
    #                 caller tail-average away the MC random walk
    if mngr is not None and start > 0:
        import orbax.checkpoint as ocp
        restored = mngr.restore(
            start - 1, args=ocp.args.StandardRestore(
                {"params": params, "opt_state": state}))
        params, state = restored["params"], restored["opt_state"]
        if verbose:
            print(f"resumed from checkpoint step {start - 1} "
                  f"(horizon {horizon}, {len(prior_losses)} prior losses)")
    for i in range(start, steps):
        t0 = time.time()
        params, state, l = step(arrays_base, target, params, state,
                                jnp.uint32(i))
        losses.append(float(l))
        import numpy as _np
        trace.append({k: _np.asarray(v).copy() for k, v in params.items()})
        if verbose:
            print(f"step {i}: loss {float(l):.6f} "
                  f"({time.time() - t0:.1f}s)")
        if mngr is not None and ((i + 1) % checkpoint_every == 0
                                 or i == steps - 1):
            import json
            import os
            import orbax.checkpoint as ocp
            mngr.save(i, args=ocp.args.StandardSave(
                {"params": params, "opt_state": state}))
            with open(os.path.join(os.path.abspath(checkpoint_dir),
                                   f"meta_{i}.json"), "w") as f:
                json.dump({"horizon": horizon, "losses": losses}, f)
    if mngr is not None:
        mngr.wait_until_finished()
    fit.last_trace = trace
    return params, losses
