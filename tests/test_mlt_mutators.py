"""MLT mutation set (integrators/mlt.py): caustic / manifold / bidir
perturbations on a mirror box, validated by consistency against the
forward path tracer (the reference's own MLT-vs-PT validation protocol)
and by near-unit self-acceptance under vanishing perturbations."""
import numpy as np
import jax.numpy as jnp

from hairpt.core.math import matrix_lookat
from hairpt.film.film import Film
from hairpt.models import shapes as shp
from hairpt.models.bsdf import registry as R
from hairpt.models.sensors import Camera
from hairpt.scene.scene import SceneBuilder
from hairpt.integrators import path as path_int
from hairpt.integrators import mlt as mlt_int


def _mirror_box(res=16, radiance=(14.0, 13.0, 11.0)):
    """Diffuse box with a mirror back panel and a small lamp: populates
    E-D-S-D (caustic), E-D-D-S-D (manifold) and all-diffuse (bidir/lens)
    trajectory patterns."""
    b = SceneBuilder()
    white = b.add_material(kind=R.DIFFUSE, diffuse=(0.65, 0.65, 0.65))
    green = b.add_material(kind=R.DIFFUSE, diffuse=(0.2, 0.65, 0.2))
    mirror = b.add_material(kind=R.CONDUCTOR, specular=(0.9, 0.9, 0.9),
                            eta=0.2, k=(3.9, 3.9, 3.9))
    quad = shp.rectangle()
    rot_floor = np.array([[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0],
                          [0, 0, 0, 1]], np.float64)
    sc = np.diag([2.0, 2.0, 1.0, 1.0])
    tr = np.eye(4); tr[:3, 3] = [0, 0, 1.0]
    b.add_mesh(quad, white, to_world=tr @ rot_floor @ sc)
    # mirror back wall (z=+3)
    back = np.eye(4); back[:3, 3] = [0, 1.0, 3.0]
    flipz = np.diag([1.0, 1.0, -1.0, 1.0])
    b.add_mesh(quad, mirror, to_world=back @ flipz @ sc)
    # left / right walls + ceiling (closed so mirror bounces stay inside)
    left = np.array([[0, 0, 1, -1.8], [0, 1, 0, 1.0], [-1, 0, 0, 1.0],
                     [0, 0, 0, 1]], np.float64)
    b.add_mesh(quad, green, to_world=left @ sc)
    right = np.array([[0, 0, -1, 1.8], [0, 1, 0, 1.0], [1, 0, 0, 1.0],
                      [0, 0, 0, 1]], np.float64)
    b.add_mesh(quad, white, to_world=right @ sc)
    ceil = np.array([[1, 0, 0, 0], [0, 0, 1, 2.5], [0, -1, 0, 1.0],
                     [0, 0, 0, 1]], np.float64)
    b.add_mesh(quad, white, to_world=ceil @ sc)
    # lamp near the top, facing down (rotation maps +z -> -y)
    s_l = 0.35
    lamp = np.array([[s_l, 0, 0, 0.4], [0, 0, -s_l, 2.2], [0, s_l, 0, 0.8],
                     [0, 0, 0, 1]], np.float64)
    b.add_mesh(quad, white, to_world=lamp, radiance=radiance)
    cam = Camera.perspective(matrix_lookat((0.3, 1.2, -2.6), (0, 0.8, 1.0),
                                           (0, 1, 0)), 55.0, res, res)
    return b.build(cam, Film.make(res, res, "box"), spp=1, max_depth=6,
                   sampler=0, rr_depth=99)


def test_mlt_full_mutation_set_matches_pt():
    scene = _mirror_box(res=16)
    img_pt = np.asarray(path_int.render(scene, spp=128))
    img_ml = np.asarray(mlt_int.render_mlt(scene, n_chains=1 << 13,
                                           n_mutations=64, seed=2))
    assert np.isfinite(img_ml).all() and (img_ml >= 0).all()
    m_pt, m_ml = img_pt.mean(), img_ml.mean()
    assert abs(m_ml - m_pt) / m_pt < 0.15, (m_pt, m_ml)
    r = 4
    a = img_pt.reshape(4, r, 4, r, 3).mean((1, 3, 4))
    c = img_ml.reshape(4, r, 4, r, 3).mean((1, 3, 4))
    rel = np.abs(a - c) / np.maximum(a, 8e-2)
    assert np.percentile(rel, 85) < 0.3, rel


def test_mutators_self_acceptance():
    """Vanishing perturbations must be accepted with probability ~1 on
    eligible lanes — a sharp end-to-end check of every density and
    Jacobian factor in the caustic/manifold acceptance ratios."""
    import jax
    scene = _mirror_box(res=24)
    arr = scene.arrays
    n_pool = 1 << 15
    n = 1 << 10
    idx_pool = jnp.arange(n_pool, dtype=jnp.uint32)
    from hairpt.core import rng
    u = rng.uniform_2d(idx_pool, jnp.uint32(77), 0)
    pix = jnp.stack([u[:, 0] * scene.config.width,
                     u[:, 1] * scene.config.height], -1)
    pool = mlt_int._record_path(scene, arr, pix, jnp.uint32(5))
    ctx = mlt_int._Ctx(scene=scene, arr=arr, kinds=scene.active_kinds,
                       n=n, idx=jnp.arange(n, dtype=jnp.uint32),
                       cam_o=scene.camera.to_world[:3, 3], seed=0,
                       lens_sigma=0.03)

    def take(mask, want):
        rows = np.where(np.asarray(mask))[0]
        assert rows.size >= want, f"only {rows.size} eligible lanes"
        rows = np.resize(rows, n)
        return mlt_int._lane_gather(pool, jnp.asarray(rows)), rows.size

    st_c, n_c = take(mlt_int._struct_caustic(pool, arr), 16)
    _, a_c = jax.jit(lambda s: mlt_int._step_caustic(
        ctx, s, jnp.uint32(1), sigma_scale=1e-3))(st_c)
    a_c = np.asarray(a_c)
    elig_c = a_c > 0
    # a solid share of structurally eligible lanes must survive the
    # proposal gates (lanes whose trajectory TERMINATED at x3 — stored
    # bounce pdf 0 — correctly reject and move via large steps only) ...
    assert elig_c.mean() > 0.3, elig_c.mean()
    # ...and accept a vanishing perturbation with probability ~1
    assert np.median(a_c[elig_c]) > 0.9, np.median(a_c[elig_c])

    st_m, n_m = take(mlt_int._struct_manifold(pool, arr), 6)
    _, a_m = jax.jit(lambda s: mlt_int._step_manifold(
        ctx, s, jnp.uint32(1), sigma=1e-4))(st_m)
    a_m = np.asarray(a_m)
    elig_m = a_m > 0
    assert elig_m.mean() > 0.2, elig_m.mean()
    assert np.median(a_m[elig_m]) > 0.85, np.median(a_m[elig_m])

    # multi-chain (mut_mchain.h): E-S-D-S-D, vanishing pixel move
    st_h, n_h = take(mlt_int._struct_mchain(pool, arr), 4)
    ctx_tiny = ctx._replace(lens_sigma=1e-6)
    _, a_h = jax.jit(lambda s: mlt_int._step_mchain(
        ctx_tiny, s, jnp.uint32(1)))(st_h)
    a_h = np.asarray(a_h)
    elig_h = a_h > 0
    assert elig_h.mean() > 0.2, elig_h.mean()
    assert np.median(a_h[elig_h]) > 0.85, np.median(a_h[elig_h])


def test_mutators_preserve_state_consistency():
    """After a round of every mutation, the stored per-vertex weights
    must still reproduce the acceptance-relevant invariants: buckets
    stay finite/non-negative-luminance and vertex records stay on
    geometry (|p| bounded by the scene)."""
    import jax
    scene = _mirror_box(res=16)
    arr = scene.arrays
    n = 1 << 10
    idx = jnp.arange(n, dtype=jnp.uint32)
    from hairpt.core import rng
    u = rng.uniform_2d(idx, jnp.uint32(3), 0)
    pix = jnp.stack([u[:, 0] * scene.config.width,
                     u[:, 1] * scene.config.height], -1)
    st = mlt_int._record_path(scene, arr, pix, jnp.uint32(9))
    ctx = mlt_int._Ctx(scene=scene, arr=arr, kinds=scene.active_kinds,
                       n=n, idx=idx,
                       cam_o=scene.camera.to_world[:3, 3], seed=0,
                       lens_sigma=0.03)

    @jax.jit
    def one_round(st):
        for i, step in enumerate([
                lambda s, it: mlt_int._step_lens(ctx, s, it, 0.3),
                lambda s, it: mlt_int._step_caustic(ctx, s, it),
                lambda s, it: mlt_int._step_manifold(ctx, s, it),
                lambda s, it: mlt_int._step_mchain(ctx, s, it),
                lambda s, it: mlt_int._step_bidir(ctx, s, it),
                lambda s, it: mlt_int._step_bidir2(ctx, s, it)]):
            prop, a = step(st, jnp.uint32(i + 1))
            acc = rng.uniform_1d(idx, jnp.uint32(50 + i),
                                 jnp.uint32(i)) < a
            st = mlt_int._lane_select(acc, prop, st)
        return st

    for r in range(3):
        st = one_round(st)
    w = np.asarray(mlt_int.traj_w(st))
    assert np.isfinite(w).all()
    assert np.isfinite(np.asarray(st.v.p)).all()
    assert (np.abs(np.asarray(st.v.p)) < 50.0).all()
