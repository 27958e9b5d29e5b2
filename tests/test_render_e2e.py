import numpy as np
import jax.numpy as jnp

from hairpt.film.film import Film
from hairpt.models import shapes as shp
from hairpt.models import emitters as em
from hairpt.models.bsdf import registry as mat
from hairpt.models.sensors import Camera
from hairpt.core.math import matrix_lookat
from hairpt.scene.scene import SceneBuilder
from hairpt.scene import hairgen
from hairpt.integrators import path as path_int


def _simple_cam(w=32, h=32, origin=(0, 1.0, -6.0), target=(0, 1.0, 0)):
    m = matrix_lookat(origin, target, (0, 1, 0))
    return Camera.perspective(m, 45.0, w, h)


def test_furnace_env_only():
    """No geometry: every pixel must equal the constant environment."""
    b = SceneBuilder()
    b.env = em.make_constant((0.7, 0.5, 0.3))
    cam = _simple_cam(16, 16)
    scene = b.build(cam, Film.make(16, 16, "box"), spp=1, max_depth=3,
                    sampler=0)
    img = np.asarray(path_int.render(scene, spp=1))
    np.testing.assert_allclose(img, np.broadcast_to([0.7, 0.5, 0.3],
                                                    img.shape), rtol=1e-4)


def test_white_furnace_diffuse_sphere():
    """Albedo-1 diffuse sphere inside a unit furnace must stay at 1."""
    b = SceneBuilder()
    m = b.add_material(kind=mat.DIFFUSE, diffuse=(1.0, 1.0, 1.0))
    b.add_mesh(shp.sphere(1.0, 24, 48), m)
    b.env = em.make_constant((1.0, 1.0, 1.0))
    cam = _simple_cam(24, 24, origin=(0, 0, -5.0), target=(0, 0, 0))
    scene = b.build(cam, Film.make(24, 24, "box"), spp=1, max_depth=16,
                    rr_depth=64, sampler=1, strict_normals=False)
    img = np.asarray(path_int.render(scene, spp=32))
    assert np.isfinite(img).all()
    # truncation at depth 16 loses < 1% energy for albedo 1
    assert abs(img.mean() - 1.0) < 0.03, img.mean()


def test_direct_diffuse_plane_vs_analytic():
    """A diffuse floor lit by a constant environment of radiance L:
    with albedo a, radiosity = a·L (one bounce direct = a·L exactly under
    NEE+MIS). Checks NEE, shadowing and the MIS combination."""
    b = SceneBuilder()
    m = b.add_material(kind=mat.DIFFUSE, diffuse=(0.6, 0.6, 0.6),
                       twosided=True)
    floor = np.eye(4); floor[:3, :3] *= 50.0
    rot = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], float)  # z→up(y)
    floor[:3, :3] = rot @ np.diag([50.0, 50.0, 1.0])
    b.add_mesh(shp.rectangle(), m, to_world=floor)
    b.env = em.make_constant((2.0, 2.0, 2.0))
    cam = _simple_cam(24, 24, origin=(0, 3.0, -6.0), target=(0, 0.0, 0))
    scene = b.build(cam, Film.make(24, 24, "box"), spp=1, max_depth=2,
                    sampler=1)
    img = np.asarray(path_int.render(scene, spp=16))
    # center pixels see the floor: expected a*L = 0.6*2 = 1.2
    center = img[18:22, 8:16]
    np.testing.assert_allclose(center.mean(), 1.2, rtol=0.05)


def test_area_light_mis():
    """Diffuse floor + emissive quad overhead; MIS(NEE,BSDF) must converge
    to the same value with few samples and stay finite."""
    b = SceneBuilder()
    m = b.add_material(kind=mat.DIFFUSE, diffuse=(0.5, 0.5, 0.5),
                       twosided=True)
    rot = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], float)
    floor = np.eye(4)
    floor[:3, :3] = rot @ np.diag([20.0, 20.0, 1.0])
    b.add_mesh(shp.rectangle(), m, to_world=floor)
    # emissive quad at y=4 facing down
    lt = np.eye(4)
    lt[:3, :3] = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], float) \
        @ np.diag([1.5, 1.5, 1.0])
    lt[:3, 3] = [0, 4.0, 0]
    b.add_mesh(shp.rectangle(), m, to_world=lt, radiance=(8.0, 8.0, 8.0))
    cam = _simple_cam(24, 24, origin=(0, 2.0, -7.0), target=(0, 1.0, 0))
    scene = b.build(cam, Film.make(24, 24, "box"), spp=1, max_depth=3,
                    sampler=1)
    img = np.asarray(path_int.render(scene, spp=24))
    assert np.isfinite(img).all()
    assert img.max() > 0.1  # light visible
    # floor under the light is lit
    assert img[16:, :, :].mean() > 0.05


def test_hair_scene_smoke():
    """A tiny fiber clump under sunsky with the kajiyakay BSDF renders
    finite, non-black, and hair pixels differ from background."""
    b = SceneBuilder()
    m = b.add_material(kind=mat.KAJIYAKAY, diffuse=(0.35, 0.2, 0.05),
                       specular=(0.2, 0.2, 0.2), exponent=10.0)
    fs = hairgen.gen_furball(n_fibers=300, n_segs=6, radius=0.02, seed=1,
                             center=(0, 0, 0), core_r=0.6, fiber_len=0.8)
    b.add_fibers(fs, m)
    b.env = em.bake_sunsky((0.2, 0.76, -0.62), turbidity=3.0, sky_scale=5.0,
                           sun_scale=19.0912, sun_radius_scale=37.9165,
                           res=64)
    cam = _simple_cam(32, 32, origin=(0, 0.6, -4.0), target=(0, 0, 0))
    scene = b.build(cam, Film.make(32, 32, "tent"), spp=1, max_depth=5,
                    sampler=1, ray_eps=1e-3)
    img = np.asarray(path_int.render(scene, spp=4))
    assert np.isfinite(img).all()
    assert img.mean() > 1e-3
    # center (hair) differs from corner (sky)
    assert abs(img[16, 16].mean() - img[0, 0].mean()) > 1e-3


def test_ao_and_field_integrators():
    from hairpt.integrators import aux_integrators as aux
    b = SceneBuilder()
    m = b.add_material(kind=mat.DIFFUSE, diffuse=(0.5, 0.5, 0.5),
                       twosided=True)
    b.add_mesh(shp.sphere(1.0, 12, 24), m)
    rot = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], float)
    floor = np.eye(4)
    floor[:3, :3] = rot @ np.diag([10.0, 10.0, 1.0])
    floor[:3, 3] = [0, -1.0, 0]
    b.add_mesh(shp.rectangle(), m, to_world=floor)
    b.env = em.make_constant((1.0, 1.0, 1.0))
    cam = _simple_cam(16, 16, origin=(0, 1.0, -5.0), target=(0, 0, 0))
    scene = b.build(cam, Film.make(16, 16, "box"), spp=1, max_depth=2)

    ao = np.asarray(aux.render_ao(scene, spp=8))
    assert np.isfinite(ao).all()
    # sky pixels fully unoccluded; under-sphere floor partially occluded
    assert ao.max() > 0.99 and ao.min() < 0.9

    nrm = np.asarray(aux.render_field(scene, "shNormal"))
    assert np.isfinite(nrm).all()
    # sphere front normals point towards camera (-z world)
    assert nrm[8, 8, 2] < -0.5
    dist = np.asarray(aux.render_field(scene, "distance"))
    assert dist[8, 8, 0] > 1.0
    alb = np.asarray(aux.render_field(scene, "albedo"))
    assert abs(alb[8, 8, 0] - 0.5) < 0.05


def test_adaptive_sampling():
    from hairpt.integrators import aux_integrators as aux
    b = SceneBuilder()
    m = b.add_material(kind=mat.DIFFUSE, diffuse=(0.6, 0.6, 0.6),
                       twosided=True)
    b.add_mesh(shp.sphere(1.0, 12, 24), m)
    b.env = em.make_constant((1.0, 1.0, 1.0))
    cam = _simple_cam(16, 16, origin=(0, 0, -5.0), target=(0, 0, 0))
    scene = b.build(cam, Film.make(16, 16, "box"), spp=1, max_depth=4,
                    strict_normals=False)
    img = np.asarray(aux.render_adaptive(scene, base_spp=4, extra_spp=8))
    assert np.isfinite(img).all()
    # furnace: everything ~1 regardless of sample allocation
    np.testing.assert_allclose(img.mean(), 1.0, atol=0.08)
