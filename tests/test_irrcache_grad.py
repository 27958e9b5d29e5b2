"""Ward irradiance-gradient extrapolation (reference irrcache.cpp parity).

The reference's irradiance cache extrapolates each record along
translational/rotational gradients before interpolation
(src/librender/irrcache.cpp:196-207; gradients computed by
HemisphereSampler::process, :60-145). These tests check the TPU
port's gradients carry real signal: off-record queries interpolated
WITH gradient extrapolation must beat the plain Ward-weighted
interpolation against a densely-estimated ground truth.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from test_bdpt import _box_scene


@pytest.mark.slow
def test_gradient_extrapolation_beats_plain_interpolation():
    from hairpt.integrators import irrcache

    scene = _box_scene(res=8)
    grid = (6, 12)

    # cache records along the floor toward the bright back wall
    # (measured E profile: 0.09 -> 0.18 over z in [1, 2.8] — the
    # strongest smooth indirect gradient in the box)
    zs = np.arange(0.8, 2.5, 0.6)
    cpos = np.stack([np.full_like(zs, -0.5), np.full_like(zs, 1e-3),
                     zs], -1).astype(np.float32)
    cnrm = np.tile(np.asarray([[0.0, 1.0, 0.0]], np.float32),
                   (len(zs), 1))
    e_c, r_g, t_g = irrcache.estimate_irradiance(
        scene, jnp.asarray(cpos), jnp.asarray(cnrm), grid=grid,
        gradients=True, seed=3)
    e_c, r_g, t_g = map(np.asarray, (e_c, r_g, t_g))
    assert np.isfinite(e_c).all() and np.isfinite(t_g).all() \
        and np.isfinite(r_g).all()
    assert (e_c > 0).any()

    # off-record query points: 0.2 of the spacing away from each record
    qpos = cpos.copy()
    qpos[:, 2] += 0.18
    e_true = np.asarray(irrcache.estimate_irradiance(
        scene, jnp.asarray(qpos), jnp.asarray(cnrm), grid=grid,
        seed=3)[0])

    # Ward-weighted interpolation with the reference's validity cutoff
    # (records beyond weight 1/kappa rejected; same normals everywhere)
    r_norm = 0.25
    kappa = 2.0
    diff = qpos[:, None] - cpos[None]                       # [Q, M, 3]
    d = np.linalg.norm(diff, axis=-1)
    arg = d / r_norm + 1e-4
    w = np.where(arg < kappa, 1.0 / arg, 0.0)
    assert (w.sum(1) > 0).all()
    e_plain = (w @ e_c) / w.sum(1, keepdims=True)

    # gradient extrapolation: records share the normal, so the
    # rotational term vanishes and E'_i = E_i + diff·tGrad_i
    e_rec = e_c[None] + np.einsum("qma,mac->qmc", diff, t_g)
    e_rec = np.maximum(e_rec, 0.0)
    e_grad = np.einsum("qm,qmc->qc", w, e_rec) / w.sum(1, keepdims=True)

    err_plain = np.abs(e_plain - e_true).mean()
    err_grad = np.abs(e_grad - e_true).mean()
    # the gradient-extrapolated interpolation must be strictly closer
    # to the dense estimate (VERDICT r3 #7 done-criterion)
    assert err_grad < err_plain, (err_grad, err_plain)


@pytest.mark.fast
def test_rotational_gradient_tilted_record():
    """A record on the red-wall side: re-evaluating the same point with
    a slightly rotated normal must be predicted by the rotational
    gradient better than by assuming E constant."""
    from hairpt.integrators import irrcache

    scene = _box_scene(res=8)
    grid = (6, 12)
    pos = np.asarray([[-1.0, 1e-3, 1.0]], np.float32)
    nrm = np.asarray([[0.0, 1.0, 0.0]], np.float32)
    e0, r_g, _t = irrcache.estimate_irradiance(
        scene, jnp.asarray(pos), jnp.asarray(nrm), grid=grid,
        gradients=True, seed=5)
    e0, r_g = np.asarray(e0), np.asarray(r_g)

    ang = 0.15
    nrm2 = np.asarray([[np.sin(ang), np.cos(ang), 0.0]], np.float32)
    e1 = np.asarray(irrcache.estimate_irradiance(
        scene, jnp.asarray(pos), jnp.asarray(nrm2), grid=grid,
        seed=5)[0])

    cross_n = np.cross(nrm[0], nrm2[0])
    e_pred = np.maximum(e0[0] + cross_n @ r_g[0], 0.0)
    err_const = np.abs(e0[0] - e1[0]).mean()
    err_rot = np.abs(e_pred - e1[0]).mean()
    assert np.isfinite(e_pred).all()
    # rotating the hemisphere changes which cells see the bright lamp;
    # the rotational gradient must capture the first-order change
    assert err_rot < err_const, (err_rot, err_const, e0[0], e1[0])
