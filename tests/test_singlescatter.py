"""Single-scatter subsurface tests (reference: src/subsurface/
singlescatter.cpp; classical Jensen et al. 2001 estimator).

Analytic oracle: a slab of thickness D viewed and lit straight-on with
η = 1 (no refraction, Ft = 1) and isotropic phase has

  L = E · σs/(4π) · (1 − e^{−2σt·D}) / (2σt)

since the interior point at depth s attenuates e^{−σt·s} in and
e^{−σt·s} back out toward the light."""
import numpy as np
import jax.numpy as jnp

from hairpt.film.film import Film
from hairpt.models import emitters as em
from hairpt.models import shapes as shp
from hairpt.models.bsdf import registry as mat
from hairpt.models.sensors import Camera
from hairpt.models.subsurface import SSSParams
from hairpt.scene.scene import SceneBuilder
from hairpt.integrators.path import _single_scatter


def _cube_scene():
    b = SceneBuilder()
    mid = b.add_material(kind=mat.DIFFUSE, diffuse=(0.5, 0.5, 0.5))
    b.add_mesh(shp.cube(), mid)
    b.delta_lights.append(dict(kind=em.DIRECTIONAL, direction=(0, 0, -1),
                               intensity=(2.0, 2.0, 2.0)))
    cam = Camera.perspective(np.eye(4), 60.0, 16, 16)
    return b.build(cam, Film.make(16, 16, "box"), spp=1, max_depth=2)


def test_single_scatter_slab_analytic():
    scene = _cube_scene()
    arr, cfg = scene.arrays, scene.config
    assert cfg.nee_probs == (0.0, 0.0, 1.0)

    sig_s = np.array([0.8, 0.5, 0.3], np.float32)
    sig_a = np.array([0.2, 0.1, 0.05], np.float32)
    params = SSSParams(sigma_s=jnp.asarray(sig_s),
                       sigma_a=jnp.asarray(sig_a),
                       eta=jnp.float32(1.0), scale=jnp.float32(1.0), g=0.0)

    n_pts = 4096
    rs = np.random.RandomState(0)
    # points on the cube's top face (z = 1), looking straight down
    xy = rs.rand(n_pts, 2).astype(np.float32) * 1.2 - 0.6
    p = jnp.asarray(np.concatenate([xy, np.ones((n_pts, 1), np.float32)],
                                   axis=1))
    n = jnp.zeros((n_pts, 3), jnp.float32).at[:, 2].set(1.0)
    wo = n
    sel = jnp.ones((n_pts,), bool)
    u = rs.rand(n_pts, 4).astype(np.float32)
    lo = np.asarray(_single_scatter(
        arr, cfg, p, n, wo, params, sel,
        jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]), jnp.asarray(u[:, 2:4])))
    assert np.isfinite(lo).all() and (lo >= 0).all()

    sig_t = sig_s + sig_a
    D = 2.0                                   # cube spans [-1, 1]
    expect = 2.0 * sig_s / (4 * np.pi) * (1 - np.exp(-2 * sig_t * D)) \
        / (2 * sig_t)
    got = lo.mean(axis=0)
    assert np.allclose(got, expect, rtol=0.05), (got, expect)


def test_single_scatter_refraction_snell():
    """With η>1 the refracted interior direction must satisfy Snell's law;
    verify through the estimator's interior geometry by checking that the
    returned radiance is finite and strictly reduced by the two Fresnel
    transmittance factors vs η=1 at normal incidence."""
    scene = _cube_scene()
    arr, cfg = scene.arrays, scene.config
    sig = jnp.asarray([0.5, 0.5, 0.5])
    n_pts = 2048
    rs = np.random.RandomState(1)
    xy = rs.rand(n_pts, 2).astype(np.float32) - 0.5
    p = jnp.asarray(np.concatenate([xy, np.ones((n_pts, 1), np.float32)],
                                   axis=1))
    n = jnp.zeros((n_pts, 3), jnp.float32).at[:, 2].set(1.0)
    u = rs.rand(n_pts, 4).astype(np.float32)
    args = (jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]),
            jnp.asarray(u[:, 2:4]))
    outs = {}
    for eta in (1.0, 1.5):
        params = SSSParams(sigma_s=sig, sigma_a=sig * 0.1,
                           eta=jnp.float32(eta), scale=jnp.float32(1.0))
        lo = np.asarray(_single_scatter(arr, cfg, p, n, n, params,
                                        jnp.ones((n_pts,), bool), *args))
        outs[eta] = lo.mean()
        assert np.isfinite(lo).all()
    # normal incidence η=1.5: (1−R)² with R=0.04 → ~0.92×, plus the Snell
    # s'_i stretch only at oblique exits; radiance must drop but not crash
    assert outs[1.5] < outs[1.0]
    assert outs[1.5] > 0.5 * outs[1.0]


XML = """<scene version="0.5.0">
 <integrator type="path"><integer name="maxDepth" value="3"/></integrator>
 <sensor type="perspective">
  <float name="fov" value="60"/>
  <transform name="toWorld"><translate z="-4"/></transform>
  <film type="ldrfilm">
   <integer name="width" value="24"/><integer name="height" value="24"/>
  </film>
  <sampler type="independent"><integer name="sampleCount" value="2"/></sampler>
 </sensor>
 <shape type="sphere">
  <subsurface type="singlescatter">
   <spectrum name="sigmaS" value="1.2, 1.0, 0.8"/>
   <spectrum name="sigmaA" value="0.05, 0.1, 0.2"/>
   <float name="intIOR" value="1.3"/>
   <float name="g" value="0.2"/>
  </subsurface>
 </shape>
 <emitter type="constant"><spectrum name="radiance" value="1.0"/></emitter>
</scene>"""


def test_single_scatter_xml_e2e():
    import os
    import tempfile
    from hairpt.scene.xml_loader import load_scene
    from hairpt.integrators.sss import attach_dipole
    from hairpt.integrators import path as path_int

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "scene.xml")
        with open(path, "w") as f:
            f.write(XML)
        scene = load_scene(path)
    assert scene.config.sss_single and abs(scene.config.sss_g - 0.2) < 1e-6
    scene = attach_dipole(scene)
    assert scene.arrays.sss is not None
    img = np.asarray(path_int.render(scene, seed=0))
    assert np.isfinite(img).all()
    # the sphere interior must scatter some light toward the camera
    h, w = img.shape[:2]
    assert img[h // 2, w // 2].max() > 1e-4
