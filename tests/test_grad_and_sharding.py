import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hairpt.film.film import Film
from hairpt.models import shapes as shp
from hairpt.models import emitters as em
from hairpt.models.bsdf import registry as mat
from hairpt.core.math import matrix_lookat
from hairpt.models.sensors import Camera
from hairpt.scene.scene import SceneBuilder
from hairpt.scene import hairgen
from hairpt.integrators import path as path_int
from hairpt.integrators import inverse
from hairpt.parallel import mesh as pmesh


def _diffuse_scene(w=16, h=16):
    b = SceneBuilder()
    m = b.add_material(kind=mat.DIFFUSE, diffuse=(0.4, 0.5, 0.6),
                       twosided=True)
    b.add_mesh(shp.sphere(1.0, 16, 32), m)
    b.env = em.make_constant((1.0, 0.9, 0.8))
    cam = Camera.perspective(matrix_lookat((0, 0, -4), (0, 0, 0), (0, 1, 0)),
                             45.0, w, h)
    return b.build(cam, Film.make(w, h, "box"), spp=1, max_depth=3,
                   sampler=0, strict_normals=False)


def _hair_scene(w=12, h=12, kind=mat.MARSCHNER):
    b = SceneBuilder()
    kw = {}
    if kind == mat.MARSCHNER:
        kw = dict(sigma_a=(0.5, 0.5, 0.5), beta_r=0.1, eta=1.55, alpha=0.2,
                  diffuse=(0.3, 0.1, 0.02))
    m = b.add_material(kind=kind, **kw)
    fs = hairgen.gen_furball(n_fibers=150, n_segs=5, radius=0.03, seed=2,
                             center=(0, 0, 0), core_r=0.5, fiber_len=0.6)
    b.add_fibers(fs, m)
    b.env = em.make_constant((1.0, 1.0, 1.0))
    cam = Camera.perspective(matrix_lookat((0, 0.4, -3), (0, 0, 0),
                                           (0, 1, 0)), 45.0, w, h)
    return b.build(cam, Film.make(w, h, "box"), spp=1, max_depth=3,
                   sampler=0)


def test_grad_matches_finite_difference_diffuse():
    scene = _diffuse_scene()
    target = jnp.zeros((16, 16, 3), jnp.float32)
    d0 = np.asarray(scene.arrays.materials.diffuse)

    def f(diffuse):
        return inverse.loss_fn(scene, {"diffuse": diffuse}, target, spp=2)

    g = jax.grad(f)(jnp.asarray(d0))
    eps = 1e-3
    for c in range(3):
        dp = d0.copy(); dp[0, c] += eps
        dm = d0.copy(); dm[0, c] -= eps
        fd = (float(f(jnp.asarray(dp))) - float(f(jnp.asarray(dm)))) \
            / (2 * eps)
        assert np.isfinite(fd)
        np.testing.assert_allclose(float(g[0, c]), fd, rtol=0.08,
                                   atol=2e-4)


def test_grad_sigma_a_through_marschner_tables():
    scene = _hair_scene()
    target = jnp.zeros((12, 12, 3), jnp.float32)
    s0 = np.asarray(scene.arrays.materials.sigma_a)

    def f(sig):
        return inverse.loss_fn(scene, {"sigma_a": sig}, target, spp=1)

    g = jax.grad(f)(jnp.asarray(s0))
    assert np.isfinite(np.asarray(g)).all()
    # finite-difference check on the red channel
    eps = 3e-2
    sp = s0.copy(); sp[0, 0] += eps
    sm = s0.copy(); sm[0, 0] -= eps
    fd = (float(f(jnp.asarray(sp))) - float(f(jnp.asarray(sm)))) / (2 * eps)
    np.testing.assert_allclose(float(g[0, 0]), fd, rtol=0.15, atol=5e-5)
    # absorption ↑ → image darker → with black target, loss decreases
    assert float(g[0, 0]) < 0


def test_inverse_rendering_converges():
    """Optimize diffuse reflectance towards a target render."""
    scene = _diffuse_scene(12, 12)
    true_diff = jnp.asarray([[0.7, 0.3, 0.15]], jnp.float32)
    target = inverse.render_image(scene, {"diffuse": true_diff}, spp=4)
    params0 = {"diffuse": jnp.asarray([[0.3, 0.6, 0.5]], jnp.float32)}
    params, losses = inverse.fit(scene, target, params0, steps=32, lr=0.08,
                                 spp=2)
    # MC noise sets a loss floor; what matters is parameter recovery
    assert losses[-1] < losses[0] * 0.6, losses
    np.testing.assert_allclose(np.asarray(params["diffuse"])[0],
                               np.asarray(true_diff)[0], atol=0.12)


def test_sharded_render_matches_single_device():
    scene = _diffuse_scene()
    img1 = np.asarray(path_int.render(scene, spp=2))
    n_dev = len(jax.devices())
    assert n_dev >= 8, "conftest must provide 8 virtual devices"
    mesh = pmesh.default_mesh(8)
    img8 = np.asarray(pmesh.render_sharded(scene, mesh, spp=2))
    np.testing.assert_allclose(img8, img1, rtol=2e-4, atol=2e-5)


def test_sharded_train_step_runs():
    scene = _hair_scene(8, 8)
    mesh = pmesh.default_mesh(8)
    target = jnp.zeros((8, 8, 3), jnp.float32)
    step = pmesh.make_train_step(scene, mesh, target, spp=1, lr=0.05)
    params = {"sigma_a": scene.arrays.materials.sigma_a,
              "beta_r": scene.arrays.materials.beta_r}
    params, loss = step(params, jnp.uint32(0))
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(params["sigma_a"])).all()


def test_multihost_mesh_parity():
    """2-D (hosts × chips) mesh on 8 virtual devices (2×4): the
    hierarchically psum-reduced render must match the 1-device image, and
    the sharded train step must run (the multi-host code path, minus real
    DCN)."""
    import jax
    import jax.numpy as jnp
    from hairpt.parallel import mesh as pmesh

    scene = _diffuse_scene()
    ref = np.asarray(path_int.render(scene, spp=2))
    m = pmesh.multihost_mesh(2, 4)
    got = np.asarray(pmesh.render_sharded(scene, mesh=m, spp=2))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)

    hs = _hair_scene(8, 8)
    target = jnp.zeros((8, 8, 3), jnp.float32)
    step = pmesh.make_train_step(hs, m, target, spp=1, lr=0.05)
    params = {"sigma_a": hs.arrays.materials.sigma_a,
              "beta_r": hs.arrays.materials.beta_r}
    params, loss = step(params, jnp.uint32(0))
    assert np.isfinite(float(loss))


def test_fit_orbax_checkpoint_resume(tmp_path):
    """Interrupted fit resumes from the orbax checkpoint and lands on the
    SAME params/opt-state trajectory as an uninterrupted run (seeds are
    step indices, so the trajectory is deterministic)."""
    scene = _diffuse_scene(8, 8)
    true_diff = jnp.asarray([[0.7, 0.3, 0.15]], jnp.float32)
    target = inverse.render_image(scene, {"diffuse": true_diff}, spp=2)
    params0 = {"diffuse": jnp.asarray([[0.3, 0.6, 0.5]], jnp.float32)}

    ref_params, _ = inverse.fit(scene, target, params0, steps=6, lr=0.05,
                                spp=1)
    ck = str(tmp_path / "ck")
    # the interrupted run shares the 6-step lr-decay horizon
    inverse.fit(scene, target, params0, steps=4, lr=0.05, spp=1,
                checkpoint_dir=ck, checkpoint_every=2, decay_steps=6)
    resumed, _ = inverse.fit(scene, target, params0, steps=6, lr=0.05,
                             spp=1, checkpoint_dir=ck, checkpoint_every=2)
    np.testing.assert_allclose(np.asarray(resumed["diffuse"]),
                               np.asarray(ref_params["diffuse"]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_virtual_mesh_film_parity_256():
    """ROADMAP §3 / VERDICT r2 #8: cross-shard film determinism at a
    REAL resolution. A 256² hair render on the 8-virtual-device mesh
    must (a) be bitwise-deterministic across repeated runs (the psum
    reduction order is mesh-fixed), and (b) match the single-device
    image to float tolerance (scatter-add order within a shard is the
    only difference)."""
    from hairpt.film.film import Film
    from hairpt.models.sensors import Camera
    from hairpt.core.math import matrix_lookat
    from hairpt.models import emitters as em
    from hairpt.models.bsdf import registry as mat
    from hairpt.scene.scene import SceneBuilder
    from hairpt.scene import hairgen

    b = SceneBuilder()
    m = b.add_material(kind=mat.KAJIYAKAY, diffuse=(0.35, 0.2, 0.05),
                       specular=(0.2, 0.2, 0.2), exponent=10.0)
    fs = hairgen.gen_furball(n_fibers=120, n_segs=5, radius=0.03, seed=2,
                             center=(0, 0, 0), core_r=0.6, fiber_len=0.8)
    b.add_fibers(fs, m)
    b.env = em.make_constant((0.7, 0.8, 0.9))
    cam = Camera.perspective(matrix_lookat((0, 0.4, -4), (0, 0, 0),
                                           (0, 1, 0)), 45.0, 256, 256)
    scene = b.build(cam, Film.make(256, 256, "tent"), spp=1, max_depth=3,
                    sampler=1, swept_k=32)

    mesh = pmesh.default_mesh(8)
    img_a = np.asarray(pmesh.render_sharded(scene, mesh, spp=1))
    img_b = np.asarray(pmesh.render_sharded(scene, mesh, spp=1))
    np.testing.assert_array_equal(img_a, img_b)   # bitwise determinism

    img_1 = np.asarray(path_int.render(scene, spp=1))
    assert img_a.shape == img_1.shape == (256, 256, 3)
    # tolerance: the tent-filter splat + weight-normalize reassociates
    # across shard boundaries (measured max rel diff 8e-4 at 1 spp);
    # the DETERMINISM guarantee is the bitwise check above — cross-
    # device equality is float-order-bounded, like the reference's
    # "distributed == local modulo float add order" (SURVEY §4)
    np.testing.assert_allclose(img_a, img_1, rtol=2e-3, atol=2e-4)


def test_beta_r_recovery_antithetic():
    """β_R convergence gate (VERDICT r4 item 5): with the antithetic
    BSDF-sample pairing + tail-averaged readout, the recovered
    longitudinal roughness on a tiny Marschner furball lands within
    35% of truth at a small step/spp budget (the committed
    artifacts/inverse_furball_log.txt runs the full-budget version —
    20% gate — on TPU; this CPU gate catches estimator regressions)."""
    import __graft_entry__ as ge
    scene = ge._tiny_furball_scene(width=20, height=20, n_fibers=120,
                                   max_depth=3)
    true_p = {"beta_r": jnp.asarray([0.16], jnp.float32)}
    target = inverse.render_image(scene, true_p, spp=8)
    params0 = {"beta_r": jnp.asarray([0.30], jnp.float32)}
    params, losses = inverse.fit(scene, target, params0, steps=24,
                                 lr=0.04, spp=2, loss_kind="cross",
                                 antithetic=True)
    trace = inverse.fit.last_trace
    tail = trace[len(trace) * 2 // 3:]
    br = float(np.mean([t["beta_r"][0] for t in tail]))
    assert abs(br - 0.16) <= 0.35 * 0.16 + 0.02, (br, losses[:3],
                                                  losses[-3:])
