"""Emitted-ray sampling tests (reference: Emitter::sampleRay of point/spot/
directional/collimated/area, used by particle tracing & photon shooting)."""
import numpy as np
import jax.numpy as jnp

from hairpt.models import emitters as em


def _uniform(n, seed, d):
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.rand(n, d), jnp.float32)


def test_point_emit_energy():
    dl = em.make_delta_lights([dict(kind=em.POINT, position=(1, 2, 3),
                                    intensity=(2.0, 1.0, 0.5))])
    n = 4096
    u = np.random.RandomState(0).rand(n, 3).astype(np.float32)
    o, d, pw, _ = em.delta_emit(dl, jnp.asarray(u[:, 0]),
                             jnp.asarray(u[:, 1:3]),
                             jnp.zeros(3), jnp.float32(1.0))
    assert np.allclose(np.asarray(o), [1, 2, 3])
    # directions uniform on the sphere → mean ≈ 0
    assert np.linalg.norm(np.asarray(d).mean(0)) < 0.05
    # flux = 4π·I exactly per sample (uniform sphere pdf cancels)
    assert np.allclose(np.asarray(pw).mean(0),
                       4 * np.pi * np.array([2.0, 1.0, 0.5]), rtol=1e-5)


def test_collimated_emit_exact_and_nee_zero():
    phi = (3.0, 4.0, 5.0)
    dl = em.make_delta_lights([dict(kind=em.COLLIMATED, position=(0, 5, 0),
                                    direction=(0, -1, 0), intensity=phi)])
    n = 16
    u = np.random.RandomState(1).rand(n, 3).astype(np.float32)
    o, d, pw, _ = em.delta_emit(dl, jnp.asarray(u[:, 0]),
                             jnp.asarray(u[:, 1:3]),
                             jnp.zeros(3), jnp.float32(1.0))
    assert np.allclose(np.asarray(o), [0, 5, 0])
    assert np.allclose(np.asarray(d), [0, -1, 0])
    assert np.allclose(np.asarray(pw), phi)
    # NEE from a surface point: 0D response → direct sampling fails
    # (collimated.cpp:126-134)
    p = jnp.asarray(np.random.RandomState(2).rand(8, 3), jnp.float32)
    _, _, contrib, _ = em.delta_light_sample(dl, p, jnp.full((8,), 0.5))
    assert np.allclose(np.asarray(contrib), 0.0)


def test_spot_emit_energy():
    # integral of the emitted flux over the cone must equal
    # I·∫falloff dω; verify MC mean = 2π(1−cosCutoff)·E[falloff]·I
    dl = em.make_delta_lights([dict(kind=em.SPOT, position=(0, 0, 0),
                                    direction=(0, 0, 1),
                                    intensity=(1.0, 1.0, 1.0),
                                    cutoff_deg=30.0, beam_deg=20.0)])
    n = 1 << 15
    rs = np.random.RandomState(3)
    u = rs.rand(n, 3).astype(np.float32)
    o, d, pw, _ = em.delta_emit(dl, jnp.asarray(u[:, 0]),
                             jnp.asarray(u[:, 1:3]),
                             jnp.zeros(3), jnp.float32(1.0))
    d = np.asarray(d)
    assert (d[:, 2] >= np.cos(np.radians(30.0)) - 1e-5).all()
    # analytic: Φ = I·2π·[(1−cos cb) + ∫_{cb}^{cc} falloff sinθ dθ]
    cc, cb = np.cos(np.radians(30.0)), np.cos(np.radians(20.0))
    mu = np.linspace(cc, 1.0, 20001)
    fall = np.clip((mu - cc) / (cb - cc), 0.0, 1.0)
    fall[mu >= cb] = 1.0
    phi_true = 2 * np.pi * np.trapezoid(fall, mu)
    assert abs(np.asarray(pw)[:, 0].mean() - phi_true) < 0.01 * phi_true


def test_area_emit_energy():
    # one unit right triangle (area ½) with radiance L → Φ = π·L·A
    al = em.AreaLights(
        p0=jnp.asarray([[0.0, 0.0, 0.0]]), e1=jnp.asarray([[1.0, 0.0, 0.0]]),
        e2=jnp.asarray([[0.0, 1.0, 0.0]]), n=jnp.asarray([[0.0, 0.0, 1.0]]),
        radiance=jnp.asarray([[2.0, 2.0, 2.0]]), area=jnp.asarray([0.5]),
        cdf=jnp.asarray([1.0]), tri_index=jnp.asarray([0]))
    n = 4096
    rs = np.random.RandomState(4)
    u = rs.rand(n, 5).astype(np.float32)
    o, d, nrm, pw = em.area_emit(al, jnp.asarray(u[:, 0]),
                                 jnp.asarray(u[:, 1:3]),
                                 jnp.asarray(u[:, 3:5]))
    o = np.asarray(o)
    assert (o[:, 0] >= -1e-6).all() and (o[:, 0] + o[:, 1] <= 1 + 1e-5).all()
    assert (np.asarray(d)[:, 2] >= -1e-6).all()
    assert np.allclose(np.asarray(pw).mean(0), np.pi * 2.0 * 0.5, rtol=1e-5)


def test_photon_emit_multigroup():
    """Photon shooting from a scene with area + point + env groups: the
    emitted flux estimate must be finite and group-complete."""
    from hairpt.scene.scene import SceneBuilder
    from hairpt.models.bsdf import registry as mat
    from hairpt.models import shapes as shp
    from hairpt.models.sensors import Camera
    from hairpt.film.film import Film
    from hairpt.integrators.photonmap import _env_emit

    b = SceneBuilder()
    mid = b.add_material(kind=mat.DIFFUSE, diffuse=(0.5, 0.5, 0.5))
    t = np.eye(4)
    t[:3, 3] = [0, 0, 3]
    b.add_mesh(shp.rectangle(), mid, to_world=t)
    b.add_mesh(shp.rectangle(), mid, radiance=(1.0, 1.0, 1.0))
    b.env = em.make_constant((0.3, 0.3, 0.3))
    b.delta_lights.append(dict(kind=em.COLLIMATED, position=(0, 5, 0),
                               direction=(0, -1, 0),
                               intensity=(1.0, 1.0, 1.0)))
    cam = Camera.perspective(np.eye(4), 90.0, 32, 32)
    scene = b.build(cam, Film.make(32, 32, "box"), spp=1, max_depth=3)
    assert scene.config.nee_probs == (1 / 3, 1 / 3, 1 / 3)
    ray, power = _env_emit(scene, 1 << 12, seed=0)
    pw = np.asarray(power)
    assert np.isfinite(pw).all() and (pw >= 0).all()
    assert pw.sum() > 0
