"""Spectral N>3 rendering (core/spectral.py + integrators/spectral.py —
reference SPECTRUM_SAMPLES>3 compile-time mode, spectrum.h:25):
colorimetry round-trip, RGB-render consistency on a dispersion-free
scene, and Cauchy dispersion actually separating the bands."""
import numpy as np

from hairpt.core import spectral as sp
from hairpt.core.math import matrix_lookat
from hairpt.film.film import Film
from hairpt.models import shapes as shp
from hairpt.models.bsdf import registry as R
from hairpt.models.sensors import Camera
from hairpt.scene.scene import SceneBuilder
from hairpt.integrators import path as path_int
from hairpt.integrators.spectral import render_spectral


def test_colorimetry_roundtrip():
    for n in (6, 12, 30):
        A, lam, dl = sp.upsample_basis(n)
        W, _, _ = sp.rgb_weights(n)
        # flat spectrum integrates to exactly white
        assert np.allclose(np.ones(n) @ W, 1.0, atol=1e-12)
        # upsample → integrate identity (exact without the nonneg clamp)
        rs = np.random.RandomState(3)
        rgb = rs.rand(256, 3)
        back = (rgb @ A.T) @ W
        assert np.abs(back - rgb).max() < 1e-10
        # desaturated albedos (the common case) survive the clamp too
        soft = 0.2 + 0.6 * rs.rand(256, 3)
        back2 = np.clip(soft @ A.T, 0, None) @ W
        assert np.abs(back2 - soft).max() < 0.02, np.abs(back2 - soft).max()


def _box(res=24, albedo=(0.6, 0.5, 0.4)):
    b = SceneBuilder()
    m = b.add_material(kind=R.DIFFUSE, diffuse=albedo)
    quad = shp.rectangle()
    rot_floor = np.array([[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0],
                          [0, 0, 0, 1]], np.float64)
    sc = np.diag([2.0, 2.0, 1.0, 1.0])
    tr = np.eye(4); tr[:3, 3] = [0, 0, 1.0]
    b.add_mesh(quad, m, to_world=tr @ rot_floor @ sc)
    back = np.eye(4); back[:3, 3] = [0, 1.0, 3.0]
    b.add_mesh(quad, m, to_world=back @ np.diag([1.0, 1, -1, 1]) @ sc)
    s_l = 0.4
    lamp = np.array([[s_l, 0, 0, 0], [0, 0, -s_l, 2.2], [0, s_l, 0, 1.0],
                     [0, 0, 0, 1]], np.float64)
    b.add_mesh(quad, m, to_world=lamp, radiance=(10.0, 10.0, 10.0))
    cam = Camera.perspective(matrix_lookat((0.3, 1.2, -2.6), (0, 0.8, 1.0),
                                           (0, 1, 0)), 55.0, res, res)
    return b.build(cam, Film.make(res, res, "box"), spp=1, max_depth=4,
                   sampler=0, rr_depth=99)


def test_spectral_matches_rgb_without_dispersion():
    """Dispersion-free mildly-colored scene: the 12-bin spectral render
    must agree with the RGB render. (Not bit-exact: spectral multiplies
    SPDs where RGB multiplies triples — the difference IS the physics,
    but for soft albedos over 2 bounces it stays small.)"""
    scene = _box()
    img_rgb = np.asarray(path_int.render(scene, spp=32))
    img_sp = np.asarray(render_spectral(scene, n_bins=12, spp=32))
    assert np.isfinite(img_sp).all()
    m_r, m_s = img_rgb.mean(), img_sp.mean()
    assert abs(m_s - m_r) / m_r < 0.05, (m_r, m_s)
    # per-channel means stay close too (colorimetry, not just energy)
    cr = img_rgb.mean((0, 1))
    cs = img_sp.mean((0, 1))
    assert np.abs(cs - cr).max() / cr.max() < 0.08, (cr, cs)


def test_spectral_dispersion_separates_bands():
    """A glass slab with Cauchy dispersion: per-band images through the
    glass must differ (red and blue refract differently), while the
    same scene with cauchy_b=0 gives identical bands."""
    b = SceneBuilder()
    glass = b.add_material(kind=R.DIELECTRIC, eta=1.5)
    white = b.add_material(kind=R.DIFFUSE, diffuse=(0.8, 0.8, 0.8))
    quad = shp.rectangle()
    # tilted glass slab between camera and a striped-lit back wall
    for z in (0.9, 1.1):
        mg = np.array([[1, 0, 0, 0.0], [0, 1, 0, 0], [0, 0.35, 1, z],
                       [0, 0, 0, 1]], np.float64)
        b.add_mesh(quad, glass, to_world=mg @ np.diag([2.0, 2, 1, 1]))
    back = np.eye(4); back[:3, 3] = [0, 0, 3.0]
    b.add_mesh(quad, white, to_world=back @ np.diag([3.0, 3, 1, 1]))
    s_l = 0.15
    lamp = np.array([[s_l, 0, 0, 0.0], [0, s_l, 0, 0.0],
                     [0, 0, -1.0, 2.9], [0, 0, 0, 1]], np.float64)
    b.add_mesh(quad, white, to_world=lamp, radiance=(60.0, 60.0, 60.0))
    cam = Camera.perspective(np.eye(4), 50.0, 32, 32)
    scene = b.build(cam, Film.make(32, 32, "box"), spp=1, max_depth=6,
                    sampler=0, rr_depth=99)

    _, bins_d = render_spectral(scene, n_bins=6, spp=24, cauchy_b=0.012,
                                return_bins=True)
    _, bins_0 = render_spectral(scene, n_bins=6, spp=24, cauchy_b=0.0,
                                return_bins=True)
    bins_d = np.asarray(bins_d)
    bins_0 = np.asarray(bins_0)
    # without dispersion all bands see the same geometry: band images are
    # proportional (white scene → near-identical up to upsample weights)
    r0 = bins_0[..., 0] / np.maximum(bins_0[..., 0].mean(), 1e-9)
    r5 = bins_0[..., 5] / np.maximum(bins_0[..., 5].mean(), 1e-9)
    base_diff = np.abs(r0 - r5).mean()
    # with dispersion the blue and red extreme bands shift
    d0 = bins_d[..., 0] / np.maximum(bins_d[..., 0].mean(), 1e-9)
    d5 = bins_d[..., 5] / np.maximum(bins_d[..., 5].mean(), 1e-9)
    disp_diff = np.abs(d0 - d5).mean()
    assert disp_diff > 2.0 * base_diff + 1e-4, (base_diff, disp_diff)
