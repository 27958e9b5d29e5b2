import numpy as np

from hairpt.film.film import Film
from hairpt.models import shapes as shp, emitters as em
from hairpt.models.bsdf import registry as mat
from hairpt.models.sensors import Camera
from hairpt.core.math import matrix_lookat
from hairpt.scene.scene import SceneBuilder
from hairpt.integrators import path as path_int
from hairpt.integrators import vpl as vpl_int


def _scene(w=20, h=20):
    b = SceneBuilder()
    m = b.add_material(kind=mat.DIFFUSE, diffuse=(0.6, 0.6, 0.6),
                       twosided=True)
    b.add_mesh(shp.sphere(1.0, 16, 32), m)
    rot = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], float)
    floor = np.eye(4)
    floor[:3, :3] = rot @ np.diag([8.0, 8.0, 1.0])
    floor[:3, 3] = [0, -1.0, 0]
    b.add_mesh(shp.rectangle(), m, to_world=floor)
    b.env = em.make_constant((1.0, 1.0, 1.0))
    cam = Camera.perspective(matrix_lookat((0, 1.5, -5), (0, 0, 0),
                                           (0, 1, 0)), 45.0, w, h)
    return b.build(cam, Film.make(w, h, "box"), spp=1, max_depth=6,
                   sampler=1, strict_normals=False)


def test_vpl_generation():
    scene = _scene()
    vpls = vpl_int.trace_vpls(scene, 256, max_bounces=3, seed=0)
    v = np.asarray(vpls.valid)
    assert v.sum() > 50                       # VPLs land on geometry
    assert np.isfinite(np.asarray(vpls.power)).all()
    # deposited frames are orthonormal where valid
    n = np.asarray(vpls.sh_n)[v]
    np.testing.assert_allclose((n * n).sum(-1), 1.0, atol=1e-4)


def test_vpl_matches_path_tracer():
    """Instant radiosity vs path tracing on a diffuse scene: direct NEE is
    shared machinery, so agreement checks the VPL indirect estimator
    (clamping biases it slightly low; bound reflects that)."""
    scene = _scene(20, 20)
    ref = np.asarray(path_int.render(scene, spp=48))
    img = np.asarray(vpl_int.render_vpl(scene, n_paths=512, max_bounces=3,
                                        clamp_dist=0.05, spp=2))
    assert np.isfinite(img).all()
    geo = ref.mean(-1) < 0.999  # non-sky pixels
    assert geo.sum() > 50
    r_mean = ref[geo].mean()
    v_mean = img[geo].mean()
    assert abs(v_mean - r_mean) / r_mean < 0.25, (v_mean, r_mean)
