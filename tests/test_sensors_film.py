import numpy as np
import jax.numpy as jnp

from hairpt.core.math import matrix_lookat
from hairpt.models import sensors
from hairpt.models.sensors import Camera
from hairpt.film.film import Film, splat_samples, develop, zeros
from hairpt.film.rfilter import FILTERS, filter_eval


def test_perspective_ray_conventions():
    """Center pixel looks along the view axis; edge pixels per x-fov."""
    cam = Camera.perspective(matrix_lookat((0, 0, 0), (0, 0, 1), (0, 1, 0)),
                             60.0, 100, 50)
    # center
    r = sensors.sample_ray(cam, jnp.asarray([[50.0, 25.0]]))
    np.testing.assert_allclose(np.asarray(r.d)[0], [0, 0, 1], atol=1e-5)
    # left edge (u=0): camera x points screen-left ⇒ world left = +x for
    # this lookat (left = up × dir = (1,0,0)? verify angle only)
    r = sensors.sample_ray(cam, jnp.asarray([[0.0, 25.0]]))
    d = np.asarray(r.d)[0]
    ang = np.degrees(np.arctan2(abs(d[0]), d[2]))
    np.testing.assert_allclose(ang, 30.0, atol=0.05)  # half of the 60° x-fov


def test_thinlens_focus():
    """Thin lens: rays from different aperture points converge at the
    focus distance."""
    cam = Camera.perspective(matrix_lookat((0, 0, 0), (0, 0, 1), (0, 1, 0)),
                             45.0, 64, 64, aperture_radius=0.2,
                             focus_distance=5.0, kind=sensors.THINLENS)
    pos = jnp.broadcast_to(jnp.asarray([20.0, 32.0]), (64, 2))
    ap = jnp.stack([jnp.linspace(0.01, 0.99, 64),
                    jnp.linspace(0.99, 0.01, 64)], -1)
    r = sensors.sample_ray(cam, pos, ap)
    # points at t where z = focus distance must coincide
    t = 5.0 / np.asarray(r.d)[:, 2]
    p = np.asarray(r.o) + np.asarray(r.d) * t[:, None]
    assert p.std(axis=0).max() < 1e-3, p.std(axis=0)


def test_orthographic_parallel():
    cam = Camera.perspective(matrix_lookat((0, 0, 0), (0, 0, 1), (0, 1, 0)),
                             45.0, 32, 32, kind=sensors.ORTHOGRAPHIC)
    pos = jnp.asarray([[1.0, 1.0], [30.0, 30.0]])
    r = sensors.sample_ray(cam, pos)
    d = np.asarray(r.d)
    np.testing.assert_allclose(d[0], d[1], atol=1e-6)
    o = np.asarray(r.o)
    assert np.linalg.norm(o[0] - o[1]) > 0.1


def test_film_splat_preserves_energy_and_develops():
    """For normalized filters, develop() of a uniform splat is uniform."""
    for name in FILTERS:
        film = Film.make(16, 16, name)
        img, wt = zeros(film)
        # one sample per pixel center with radiance 2.0
        ij = np.stack(np.meshgrid(np.arange(16), np.arange(16)),
                      -1).reshape(-1, 2) + 0.5
        pos = jnp.asarray(ij, jnp.float32)
        val = jnp.full((256, 3), 2.0)
        img, wt = splat_samples(film, pos, val, img, wt)
        out = np.asarray(develop(img, wt))
        inner = out[4:12, 4:12]
        np.testing.assert_allclose(inner, 2.0, rtol=1e-4,
                                   err_msg=f"filter {name}")


def test_filter_shapes():
    # tent at 0 offset is 1, at radius is 0
    assert float(filter_eval(FILTERS["tent"][0], 1.0, jnp.float32(0.0),
                             jnp.float32(0.0))) == 1.0
    assert float(filter_eval(FILTERS["tent"][0], 1.0, jnp.float32(1.0),
                             jnp.float32(0.0))) == 0.0
    # mitchell is partition-of-unity-ish at integer offsets: f(0) + 2f(1) ≈ 1
    m = FILTERS["mitchell"][0]
    s = float(filter_eval(m, 2.0, jnp.float32(0.0), jnp.float32(0.0))) \
        + 2 * float(filter_eval(m, 2.0, jnp.float32(1.0), jnp.float32(0.0)))
    assert abs(s - 1.0) < 0.25


# ---------------------------------------------------------------------------
# measurement sensors + telecentric + radial distortion
# ---------------------------------------------------------------------------

def test_radiancemeter_single_direction():
    import numpy as np
    from hairpt.models import sensors as sens
    cam = sens.Camera.perspective(np.eye(4), 45.0, 4, 4,
                                  kind=sens.RADIANCEMETER)
    pos = jnp.asarray([[0.5, 0.5], [3.5, 2.5]], jnp.float32)
    r = sens.sample_ray(cam, pos, None)
    np.testing.assert_allclose(np.asarray(r.d),
                               [[0, 0, 1], [0, 0, 1]], atol=1e-7)


def test_fluencemeter_uniform_sphere():
    import numpy as np
    from hairpt.models import sensors as sens
    cam = sens.Camera.perspective(np.eye(4), 45.0, 64, 64,
                                  kind=sens.FLUENCEMETER)
    n = 64 * 64
    pix = np.arange(n)
    pos = jnp.asarray(np.stack([(pix % 64) + 0.5, (pix // 64) + 0.5], -1),
                      jnp.float32)
    d = np.asarray(sens.sample_ray(cam, pos, None).d)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(d.mean(0), 0.0, atol=0.05)  # uniform sphere


def test_irradiancemeter_cosine_moments():
    import numpy as np
    from hairpt.models import sensors as sens
    cam = sens.Camera.perspective(np.eye(4), 45.0, 128, 128,
                                  kind=sens.IRRADIANCEMETER)
    n = 128 * 128
    pix = np.arange(n)
    pos = jnp.asarray(np.stack([(pix % 128) + 0.5, (pix // 128) + 0.5], -1),
                      jnp.float32)
    d = np.asarray(sens.sample_ray(cam, pos, None).d)
    assert (d[:, 2] >= 0).all()
    # E[cosθ] of a cosine distribution = 2/3
    np.testing.assert_allclose(d[:, 2].mean(), 2.0 / 3.0, atol=0.01)


def test_telecentric_parallel_centers():
    import numpy as np
    from hairpt.models import sensors as sens
    cam = sens.Camera.perspective(np.eye(4), 45.0, 8, 8,
                                  kind=sens.TELECENTRIC,
                                  aperture_radius=0.0, focus_distance=5.0)
    pos = jnp.asarray([[1.5, 2.5], [6.5, 4.5]], jnp.float32)
    r = sens.sample_ray(cam, pos, jnp.full((2, 2), 0.5, jnp.float32))
    d = np.asarray(r.d)
    # zero aperture → parallel +z rays from shifted origins
    np.testing.assert_allclose(d, [[0, 0, 1], [0, 0, 1]], atol=1e-6)
    o = np.asarray(r.o)
    assert abs(o[0][0] - o[1][0]) > 0.1  # origins differ across the film


def test_perspective_rdist_bends_edges():
    import numpy as np
    from hairpt.models import sensors as sens
    cam = sens.Camera.perspective(np.eye(4), 45.0, 64, 64,
                                  kind=sens.PERSPECTIVE_RDIST)
    cam = cam._replace(kc0=0.3, kc1=0.0)
    base = sens.Camera.perspective(np.eye(4), 45.0, 64, 64)
    pos = jnp.asarray([[32.0, 32.0], [2.0, 32.0]], jnp.float32)
    d_r = np.asarray(sens.sample_ray(cam, pos, None).d)
    d_b = np.asarray(sens.sample_ray(base, pos, None).d)
    np.testing.assert_allclose(d_r[0], d_b[0], atol=1e-6)  # center unchanged
    # edge ray bends outward for positive kc0
    assert abs(d_r[1][0]) > abs(d_b[1][0])


def test_film_annotations_and_banner():
    """label[] overlays + banner (src/films/annotations.h, banner.h)."""
    import numpy as np
    from hairpt.utils import io as io_utils
    img = np.zeros((32, 64, 3), np.float32)
    out = io_utils.annotate_image(
        img, [(2, 2, "spp=$sampler['sampleCount']")],
        {"sampler.sampleCount": 8}, banner=True)
    assert out.shape == img.shape
    assert out.max() > 0.5          # white text drawn
    assert (out != img).any()
    # substitution resolved (the $ placeholder is gone → text present in
    # the top-left stripe only)
    assert out[:12].max() > 0.5
