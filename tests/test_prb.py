"""Path-replay backprop (integrators/prb.py) — gradient parity.

PRB computes the SAME detached-sampling gradient estimator as the
scan-AD differentiable mode (path.make_li_fn(differentiable=True)), but
with O(1) memory in depth. With RR disabled and identical sampler state
the two must agree to float tolerance on every parameter.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from hairpt.integrators import inverse as inv
from hairpt.integrators import path as path_int


def _scene(depth=4):
    scene = ge._tiny_furball_scene(width=12, height=12, n_fibers=120,
                                   max_depth=depth)
    # disable RR so the scan-AD estimator (which never applies RR) and
    # PRB (which replays RR decisions) share the exact same estimator
    return scene._replace(config=dataclasses.replace(scene.config,
                                                     rr_depth=999))


PARAMS0 = {
    "sigma_a": None,   # filled per-scene from the material table
    "beta_r": None,
    "diffuse": None,
}


def _params(scene):
    m = scene.arrays.materials
    return {"sigma_a": m.sigma_a, "beta_r": m.beta_r, "diffuse": m.diffuse}


def _scan_grad(scene, params, pixel_idx, sample_idx):
    li = path_int.make_li_fn(scene, differentiable=True)
    rows = scene.marschner_rows

    def loss(p):
        arrs = inv.apply_params_arrays(scene.arrays, p, rows)
        radiance, _, _ = li(arrs, pixel_idx, sample_idx)
        return jnp.mean(radiance)

    return jax.value_and_grad(loss)(params)


@pytest.mark.slow
@pytest.mark.parametrize("depth", [3, 5])
def test_prb_matches_scan_ad(depth):
    scene = _scene(depth)
    n = scene.config.width * scene.config.height
    pixel_idx = jnp.arange(n, dtype=jnp.uint32)
    sample_idx = jnp.zeros((n,), jnp.uint32)
    params = _params(scene)

    l_scan, g_scan = _scan_grad(scene, params, pixel_idx, sample_idx)

    prb_fn = inv.make_prb_loss_grad(scene)
    l_prb, g_prb = prb_fn(scene.arrays, params, pixel_idx, sample_idx)

    np.testing.assert_allclose(float(l_prb), float(l_scan), rtol=1e-4)
    for k in params:
        a = np.asarray(g_scan[k])
        b = np.asarray(g_prb[k])
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, atol=5e-3,
                                   err_msg=k)


@pytest.mark.slow
def test_prb_deep_path_finite_and_consistent():
    """Depth 16 with RR enabled: the gradient stays finite and the
    sigma_a component keeps the same sign/magnitude ballpark as the
    depth-6 estimate (depth-insensitivity of the detached estimator)."""
    base = ge._tiny_furball_scene(width=12, height=12, n_fibers=120,
                                  max_depth=6)
    deep = base._replace(config=dataclasses.replace(base.config,
                                                    max_depth=16))
    n = base.config.width * base.config.height
    pixel_idx = jnp.arange(n, dtype=jnp.uint32)
    params = _params(base)

    g6 = inv.make_prb_loss_grad(base)(
        base.arrays, params, pixel_idx, jnp.zeros((n,), jnp.uint32))[1]
    g16 = inv.make_prb_loss_grad(deep)(
        deep.arrays, params, pixel_idx, jnp.zeros((n,), jnp.uint32))[1]
    for k in params:
        assert np.isfinite(np.asarray(g16[k])).all(), k
    # dominant component direction agrees
    a = np.asarray(g6["sigma_a"]).ravel()
    b = np.asarray(g16["sigma_a"]).ravel()
    assert np.dot(a, b) > 0
