import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hairpt.core import vmath, rng, warps, distribution
from hairpt.core.quad import gauss_legendre


def test_frame_roundtrip():
    n = vmath.normalize(jnp.asarray([[0.3, -0.5, 0.8], [0.0, 0.0, -1.0],
                                     [1.0, 0.0, 0.0]], jnp.float32))
    f = vmath.frame_from_normal(n)
    # orthonormality
    for a, b in [(f.s, f.t), (f.s, f.n), (f.t, f.n)]:
        np.testing.assert_allclose(vmath.dot(a, b), 0.0, atol=1e-6)
    np.testing.assert_allclose(vmath.length(f.s), 1.0, atol=1e-6)
    v = jnp.asarray([[0.1, 0.2, 0.3]], jnp.float32)
    w = f.to_world(f.to_local(jnp.broadcast_to(v, n.shape)))
    np.testing.assert_allclose(np.asarray(w), np.broadcast_to(v, n.shape),
                               atol=1e-6)


def test_rng_uniformity_and_determinism():
    pix = jnp.arange(1 << 14, dtype=jnp.uint32)
    u = rng.uniform_1d(pix, 3, 5)
    assert float(jnp.min(u)) >= 0.0 and float(jnp.max(u)) < 1.0
    assert abs(float(jnp.mean(u)) - 0.5) < 0.01
    # deterministic
    u2 = rng.uniform_1d(pix, 3, 5)
    np.testing.assert_array_equal(np.asarray(u), np.asarray(u2))
    # decorrelated across dims
    v = rng.uniform_1d(pix, 3, 6)
    corr = np.corrcoef(np.asarray(u), np.asarray(v))[0, 1]
    assert abs(corr) < 0.05


def test_sobol_stratification():
    # The first 2 components of a scrambled (0,2) sequence must be far better
    # stratified than independent samples: mean of N points converges ~1/N.
    n = 1024
    pts = rng.sobol_2d(jnp.uint32(7), jnp.arange(n, dtype=jnp.uint32), 0)
    m = np.asarray(jnp.mean(pts, axis=0))
    assert np.all(np.abs(m - 0.5) < 0.005), m
    # elementary intervals: each of the n strata in x contains exactly 1 point
    xs = np.sort(np.asarray(pts[:, 0]))
    strata = np.floor(xs * n).astype(int)
    assert len(np.unique(strata)) == n


def _chi2_uniform_sphere(samples, pdf_fn, n_theta=8, n_phi=16):
    """Chi-square GOF on the sphere in (cos theta, phi) bins — the same idea
    as the reference's ChiSquare harness (src/tests/test_chisquare.cpp)."""
    s = np.asarray(samples)
    cos_t = np.clip(s[:, 2], -1, 1)
    phi = np.arctan2(s[:, 1], s[:, 0]) + np.pi
    i = np.minimum((cos_t * 0.5 + 0.5) * n_theta, n_theta - 1e-6).astype(int)
    j = np.minimum(phi / (2 * np.pi) * n_phi, n_phi - 1e-6).astype(int)
    counts = np.bincount(i * n_phi + j, minlength=n_theta * n_phi)

    # integrate pdf over bins numerically
    n = len(s)
    expected = np.zeros(n_theta * n_phi)
    gauss_x, gauss_w = gauss_legendre(8)
    for bi in range(n_theta):
        c0, c1 = -1 + 2 * bi / n_theta, -1 + 2 * (bi + 1) / n_theta
        for bj in range(n_phi):
            p0, p1 = 2 * np.pi * bj / n_phi - np.pi, 2 * np.pi * (bj + 1) / n_phi - np.pi
            ct = 0.5 * (c1 + c0) + 0.5 * (c1 - c0) * gauss_x
            ph = 0.5 * (p1 + p0) + 0.5 * (p1 - p0) * gauss_x
            st = np.sqrt(np.maximum(1 - ct ** 2, 0))
            w = np.stack(np.meshgrid(st * np.cos(ph[:, None])[:, 0], ph), -1)
            # simple midpoint-style tensor quadrature over the bin
            CT, PH = np.meshgrid(ct, ph, indexing="ij")
            ST = np.sqrt(np.maximum(1 - CT ** 2, 0))
            dirs = np.stack([ST * np.cos(PH), ST * np.sin(PH), CT], axis=-1)
            vals = pdf_fn(dirs.reshape(-1, 3)).reshape(CT.shape)
            integral = np.sum(gauss_w[:, None] * gauss_w[None, :] * vals) \
                * 0.25 * (c1 - c0) * (p1 - p0)
            expected[bi * n_phi + bj] = integral * n
    mask = expected > 5
    chi2 = np.sum((counts[mask] - expected[mask]) ** 2 / expected[mask])
    dof = mask.sum() - 1
    # loose 99.9% bound: chi2 < dof + 4*sqrt(2*dof)
    assert chi2 < dof + 4 * np.sqrt(2 * dof), (chi2, dof)


@pytest.mark.parametrize("warp_name", ["sphere", "hemisphere", "cosine", "cone"])
def test_warp_chisquare(warp_name):
    n = 1 << 16
    u = rng.uniform_2d(jnp.arange(n, dtype=jnp.uint32), 0, 11)
    if warp_name == "sphere":
        w = warps.square_to_uniform_sphere(u)
        pdf = lambda d: np.full(len(d), 1 / (4 * np.pi))
    elif warp_name == "hemisphere":
        w = warps.square_to_uniform_hemisphere(u)
        pdf = lambda d: np.where(d[:, 2] >= 0, 1 / (2 * np.pi), 0.0)
    elif warp_name == "cosine":
        w = warps.square_to_cosine_hemisphere(u)
        pdf = lambda d: np.maximum(d[:, 2], 0) / np.pi
    else:
        cc = 0.3
        w = warps.square_to_uniform_cone(u, cc)
        pdf = lambda d: np.where(d[:, 2] >= cc,
                                 1 / (2 * np.pi * (1 - cc)), 0.0)
    _chi2_uniform_sphere(w, pdf)


def test_distribution_1d():
    w = jnp.asarray([1.0, 3.0, 0.0, 2.0, 4.0])
    cdf, total = distribution.build_cdf(w)
    np.testing.assert_allclose(float(total), 10.0)
    u = rng.uniform_1d(jnp.arange(1 << 15, dtype=jnp.uint32), 0, 0)
    idx, prob, ur = distribution.sample_discrete(jnp.broadcast_to(cdf, (len(u), 5)), u)
    counts = np.bincount(np.asarray(idx), minlength=5) / len(u)
    np.testing.assert_allclose(counts, np.asarray(w) / 10.0, atol=0.01)
    assert counts[2] == 0.0
    # continuous
    x, pdf = distribution.sample_continuous(jnp.broadcast_to(cdf, (len(u), 5)), u)
    assert float(jnp.min(pdf)) > 0
    pdf2 = distribution.pdf_continuous(jnp.broadcast_to(cdf, (len(u), 5)), x)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-4)


def test_interpolated_cdf():
    rows = np.stack([np.ones(8), np.arange(8, dtype=np.float64)])
    d = distribution.InterpolatedCdf1D(rows)
    s = d.sum(jnp.asarray([0.0, 1.0, 0.5]))
    np.testing.assert_allclose(np.asarray(s), [8.0, 28.0, 18.0], rtol=1e-5)
    u = rng.uniform_1d(jnp.arange(1 << 15, dtype=jnp.uint32), 1, 0)
    v = jnp.full(u.shape, 1.0)
    idx, ur, prob = d.sample(v, u)
    counts = np.bincount(np.asarray(idx), minlength=8) / len(u)
    np.testing.assert_allclose(counts, np.arange(8) / 28.0, atol=0.01)
    p = d.pdf_bin(v, idx)
    np.testing.assert_allclose(np.asarray(p), np.asarray(prob), rtol=1e-4)


def test_halton_stratification():
    pts = rng.halton_2d(jnp.uint32(3), jnp.arange(512, dtype=jnp.uint32), 7)
    p = np.asarray(pts)
    assert p.min() >= 0 and p.max() < 1
    # mean converges much faster than 1/sqrt(n) for a (2,3) Halton set
    assert np.all(np.abs(p.mean(axis=0) - 0.5) < 0.01), p.mean(axis=0)
    # base-2 strata of size 1/256 each contain exactly 2 of 512 points
    strata = np.floor(np.sort(p[:, 0]) * 256).astype(int)
    counts = np.bincount(strata, minlength=256)
    assert counts.min() >= 1 and counts.max() <= 3


def test_stratified_sampler_exact_strata():
    """mode (STRATIFIED, spp): across all spp samples of one pixel/dim,
    every stratum is hit exactly once (a true permutation), and 2D
    points stratify on the a x b grid (reference:
    src/samplers/stratified.cpp)."""
    import numpy as np
    from hairpt.core import rng
    spp = 16
    pix = jnp.zeros((spp,), jnp.uint32) + 7
    smp = jnp.arange(spp, dtype=jnp.uint32)
    u = np.asarray(rng.next_1d((rng.STRATIFIED, spp), pix, smp, 5))
    strata = np.sort((u * spp).astype(int))
    np.testing.assert_array_equal(strata, np.arange(spp))
    u2 = np.asarray(rng.next_2d((rng.STRATIFIED, spp), pix, smp, 9))
    cells = np.sort((u2[:, 0] * 4).astype(int) * 4
                    + (u2[:, 1] * 4).astype(int))
    np.testing.assert_array_equal(cells, np.arange(spp))
    # different pixels get different permutations
    u_b = np.asarray(rng.next_1d((rng.STRATIFIED, spp), pix + 1, smp, 5))
    assert not np.allclose(u, u_b)


def test_animated_transform_interpolation():
    """AnimatedTransform: endpoint exactness, midpoint rotation = half
    angle (slerp), translation lerp (reference: core/track.h)."""
    import numpy as np
    from hairpt.core.track import AnimatedTransform

    def rot_z(deg):
        a = np.radians(deg)
        m = np.eye(4)
        m[:2, :2] = [[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]]
        return m

    m0 = rot_z(0.0); m0[:3, 3] = [0, 0, 0]
    m1 = rot_z(90.0); m1[:3, 3] = [2, 4, 6]
    at = AnimatedTransform([(0.0, m0), (1.0, m1)])
    np.testing.assert_allclose(at.eval(0.0), m0, atol=1e-12)
    np.testing.assert_allclose(at.eval(1.0), m1, atol=1e-9)
    mid = at.eval(0.5)
    expect = rot_z(45.0); expect[:3, 3] = [1, 2, 3]
    np.testing.assert_allclose(mid, expect, atol=1e-7)
    # clamping outside the range
    np.testing.assert_allclose(at.eval(-5.0), m0, atol=1e-12)


def test_heightfield_scene_renders():
    """heightfield + gridtexture through the XML loader + CLI path."""
    import numpy as np
    import os, tempfile
    from hairpt.scene.xml_loader import load_scene
    from hairpt.integrators import aux_integrators as aux
    with tempfile.TemporaryDirectory() as td:
        xml = os.path.join(td, "s.xml")
        open(xml, "w").write('''<scene version="0.5.0">
 <integrator type="path"/>
 <sensor type="perspective"><float name="fov" value="45"/>
  <transform name="toWorld">
    <lookat origin="0, -2.5, 1.5" target="0, 0, 0" up="0, 0, 1"/>
  </transform>
  <sampler type="independent"><integer name="sampleCount" value="2"/></sampler>
  <film type="hdrfilm"><integer name="width" value="24"/>
   <integer name="height" value="24"/></film>
 </sensor>
 <emitter type="constant"><spectrum name="radiance" value="1"/></emitter>
 <shape type="heightfield"><float name="scale" value="0.5"/>
  <bsdf type="diffuse"/></shape>
</scene>''')
        scene = load_scene(xml, {})
        img = np.asarray(aux.render_field(scene, "distance"))
        assert np.isfinite(img).all()
        assert (img > 0).mean() > 0.3  # the surface fills the frame


def test_faure_permutations():
    """Faure scrambling permutations (reference: src/samplers/faure.cpp):
    known published values and the defining recursive structure."""
    from hairpt.core.rng import faure_permutation
    assert faure_permutation(2) == [0, 1]
    assert faure_permutation(3) == [0, 1, 2]
    assert faure_permutation(4) == [0, 2, 1, 3]
    assert faure_permutation(5) == [0, 3, 2, 1, 4]
    assert faure_permutation(8) == [0, 4, 2, 6, 1, 5, 3, 7]
    for b in (6, 7, 9, 11, 16):
        p = faure_permutation(b)
        assert sorted(p) == list(range(b))
        assert p[0] == 0


def test_permuted_radical_inverse():
    import numpy as np
    import jax.numpy as jnp
    from hairpt.core import rng
    idx = jnp.arange(64, dtype=jnp.uint32)
    # base 2 (dim 0) and base 3 (dim 1): Faure perms are identity →
    # must match the plain radical inverse
    for dim, base in ((0, 2), (1, 3)):
        a = np.asarray(rng.permuted_radical_inverse(dim, idx))
        b = np.asarray(rng._radical_inverse(base, idx))
        np.testing.assert_allclose(a, b, atol=2e-6)
    # base 5 (dim 2): first points follow the σ_5 = (0,3,2,1,4) digits
    a5 = np.asarray(rng.permuted_radical_inverse(2, idx[:5]))
    np.testing.assert_allclose(a5, [0.0, 3 / 5, 2 / 5, 1 / 5, 4 / 5],
                               atol=2e-6)
    # every dim: first b^2 points are b²-stratified (net property)
    for dim, base in ((2, 5), (3, 7), (10, 31)):
        n = base * base
        u = np.asarray(rng.permuted_radical_inverse(
            dim, jnp.arange(n, dtype=jnp.uint32)))
        # values are exactly m/n for integer m (round, don't floor: f32
        # cannot represent m/n exactly and may sit a ulp below a boundary)
        strata = set(np.round(u * n).astype(int).tolist())
        assert len(strata) == n, (dim, base, len(strata))
