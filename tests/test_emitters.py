import numpy as np
import jax.numpy as jnp

from hairpt.core import rng
from hairpt.film.film import Film
from hairpt.models import shapes as shp, emitters as em
from hairpt.models.bsdf import registry as mat
from hairpt.models.sensors import Camera
from hairpt.core.math import matrix_lookat
from hairpt.scene.scene import SceneBuilder
from hairpt.integrators import path as path_int


def _floor_scene(light_entry, albedo=0.8):
    b = SceneBuilder()
    m = b.add_material(kind=mat.DIFFUSE, diffuse=(albedo,) * 3,
                      twosided=True)
    rot = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], float)
    floor = np.eye(4)
    floor[:3, :3] = rot @ np.diag([20.0, 20.0, 1.0])
    b.add_mesh(shp.rectangle(), m, to_world=floor)
    b.delta_lights.append(light_entry)
    cam = Camera.perspective(matrix_lookat((0, 2, -6), (0, 0, 0), (0, 1, 0)),
                             45.0, 24, 24)
    return b.build(cam, Film.make(24, 24, "box"), spp=1, max_depth=2,
                   sampler=1)


def test_point_light_analytic():
    """Floor under a point light: peak radiance = a/π · I/d² (exact)."""
    scene = _floor_scene(dict(kind=em.POINT, position=(0, 3, 0),
                              intensity=(10, 10, 10)))
    img = np.asarray(path_int.render(scene, spp=16))
    assert np.isfinite(img).all()
    expected = 0.8 / np.pi * 10.0 / 9.0
    np.testing.assert_allclose(img.max(), expected, rtol=0.08)


def test_directional_light_analytic():
    """Directional light straight down: L = a/π · E everywhere on the floor."""
    scene = _floor_scene(dict(kind=em.DIRECTIONAL, direction=(0, -1, 0),
                              intensity=(2.0, 2.0, 2.0)))
    img = np.asarray(path_int.render(scene, spp=8))
    expected = 0.8 / np.pi * 2.0
    # floor covers the lower half of the frame
    region = img[16:22, 8:16]
    np.testing.assert_allclose(region.mean(), expected, rtol=0.05)


def test_spot_light_cone():
    """Spot light: lit inside the cone, dark outside."""
    scene = _floor_scene(dict(kind=em.SPOT, position=(0, 3, 0),
                              direction=(0, -1, 0),
                              intensity=(20, 20, 20),
                              cutoff_deg=20.0, beam_deg=15.0))
    img = np.asarray(path_int.render(scene, spp=16))
    assert img.max() > 0.3          # bright spot below the light
    assert np.isfinite(img).all()
    # corners of the floor (outside the cone) stay black
    assert img[23, 0].max() < 1e-4 and img[23, 23].max() < 1e-4


def test_envmap_sample_pdf_consistency():
    """env_sample's pdf must match env_pdf of the returned direction, and
    the estimator ∫L dω via importance sampling must match the direct sum."""
    rng_np = np.random.default_rng(0)
    img = rng_np.random((32, 64, 3)).astype(np.float32) ** 2
    env = em.make_envmap(img)
    n = 1 << 14
    u = rng.uniform_2d(jnp.arange(n, dtype=jnp.uint32), 0, 3)
    d, le, pdf = em.env_sample(env, u)
    pdf2 = em.env_pdf(env, d)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-3)
    # MC estimate of total irradiance ∫ L dω == sum over texels of L·ΔΩ
    est = np.mean(np.asarray(le) / np.asarray(pdf)[:, None], axis=0)
    h, w = 32, 64
    theta = (np.arange(h) + 0.5) / h * np.pi
    d_omega = (np.pi / h) * (2 * np.pi / w) * np.sin(theta)
    ref = (img * d_omega[:, None, None]).sum(axis=(0, 1))
    np.testing.assert_allclose(est, ref, rtol=0.02)


# ---------------------------------------------------------------------------
# Hosek-Wilkie sky model (reference: src/emitters/sunsky/skymodel.cpp)
# ---------------------------------------------------------------------------

def test_hosek_physical_properties():
    import numpy as np
    from hairpt.models import hosek
    cfg, rad = hosek.cook_configuration(3.0, 0.15, np.radians(30))
    ct = np.cos(np.radians(60))
    near_sun = hosek.sky_radiance(cfg, rad, ct, 1.0)
    away = hosek.sky_radiance(cfg, rad, ct, np.cos(np.radians(90)))
    assert (near_sun > away).all()          # circumsolar brightening
    assert away[2] > away[1] > away[0]      # blue sky away from the sun
    cfg8, rad8 = hosek.cook_configuration(8.0, 0.15, np.radians(30))
    away8 = hosek.sky_radiance(cfg8, rad8, ct, np.cos(np.radians(90)))
    assert away8[2] / away8[0] < away[2] / away[0]   # haze desaturates
    # continuity across integer turbidity boundaries
    a = hosek.sky_radiance(*hosek.cook_configuration(
        3.999, 0.15, np.radians(30)), ct, 0.5)
    b = hosek.sky_radiance(*hosek.cook_configuration(
        4.001, 0.15, np.radians(30)), ct, 0.5)
    np.testing.assert_allclose(a, b, rtol=0.01)
    # elevation continuity
    a = hosek.sky_radiance(*hosek.cook_configuration(
        3.0, 0.15, np.radians(29.9)), ct, 0.5)
    b = hosek.sky_radiance(*hosek.cook_configuration(
        3.0, 0.15, np.radians(30.1)), ct, 0.5)
    np.testing.assert_allclose(a, b, rtol=0.02)


def test_sunsky_hosek_bake():
    import numpy as np
    from hairpt.models import emitters as em
    sun_dir = np.array([0.3, 0.8, 0.5])
    env = em.bake_sunsky(sun_dir / np.linalg.norm(sun_dir), turbidity=3.0,
                         res=64, model="hosek", sun_radius_scale=12.0)
    img = np.asarray(env.image)
    assert np.isfinite(img).all() and (img >= 0).all()
    # upper hemisphere lit, below horizon dark (sky term)
    upper = img[:28].mean()
    lower = img[40:].mean()
    assert upper > 10 * max(lower, 1e-9)
    # sun disc is the brightest spot and sits in the sun direction
    y, x = np.unravel_index(img.sum(-1).argmax(), img.shape[:2])
    h, w = img.shape[:2]
    theta = (y + 0.5) / h * np.pi
    phi = (x + 0.5) / w * 2 * np.pi
    d = np.array([np.sin(theta) * np.sin(phi), np.cos(theta),
                  -np.sin(theta) * np.cos(phi)])
    sd = sun_dir / np.linalg.norm(sun_dir)
    assert d @ sd > 0.99, (d, sd)


def test_envmap_chi2_histogram():
    """χ² GOF: the histogram of env-sampled directions must match the
    exact per-texel selection probabilities of the importance tables
    (the reference's test_chisquare emitter tier). Texel-aligned bins
    make the expected counts exact (the pdf is piecewise constant)."""
    rng_np = np.random.default_rng(3)
    h, w = 24, 48
    img = (rng_np.random((h, w, 3)).astype(np.float32) ** 3) * 4.0
    env = em.make_envmap(img)
    n = 1 << 17
    u = rng.uniform_2d(jnp.arange(n, dtype=jnp.uint32), 7, 11)
    d, _, _ = em.env_sample(env, u)
    uu, vv = em.env_uv_from_dir(env, d)
    xi = np.minimum((np.asarray(uu) * w).astype(int), w - 1)
    yi = np.minimum((np.asarray(vv) * h).astype(int), h - 1)
    counts = np.bincount(yi * w + xi, minlength=h * w)

    lum = img @ np.array([0.212671, 0.715160, 0.072169])
    theta = (np.arange(h) + 0.5) / h * np.pi
    wgt = lum * np.sin(theta)[:, None] + 1e-12
    exp = (wgt / wgt.sum()).reshape(-1) * n
    mask = exp > 10
    chi2 = np.sum((counts[mask] - exp[mask]) ** 2 / exp[mask])
    dof = mask.sum() - 1
    assert dof > 200
    assert chi2 < dof + 5 * np.sqrt(2 * dof), (chi2, dof)
