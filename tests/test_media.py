import numpy as np
import jax.numpy as jnp

from hairpt.core import rng
from hairpt.models import media as med
from hairpt.film.film import Film
from hairpt.models import emitters as em
from hairpt.models.bsdf import registry as mat
from hairpt.models.sensors import Camera
from hairpt.core.math import matrix_lookat
from hairpt.scene.scene import SceneBuilder
from hairpt.integrators.volpath import render_volpath


def phase_chi2(kind, m, wi_dir, n=1 << 17, n_theta=16, n_phi=16):
    """χ² GOF: histogram of phase_sample directions vs the numerically
    integrated phase_pdf (mirrors test_chisquare.cpp's PhaseAdapter)."""
    wi = jnp.broadcast_to(jnp.asarray(wi_dir, jnp.float32), (n, 3))
    u2 = rng.uniform_2d(jnp.arange(n, dtype=jnp.uint32), 0, 7)
    wo, pdf = med.phase_sample(kind, m.g, wi, u2, m.phase_p,
                               m.orientation, m.mix)
    ok = np.asarray(pdf) > 0
    s = np.asarray(wo)[ok]
    n_acc = int(ok.sum())
    ct = np.clip(s[:, 2], -1, 1)
    ph = np.arctan2(s[:, 1], s[:, 0]) + np.pi
    bi = np.minimum(((ct + 1) / 2 * n_theta).astype(int), n_theta - 1)
    bj = np.minimum((ph / (2 * np.pi) * n_phi).astype(int), n_phi - 1)
    counts = np.bincount(bi * n_phi + bj, minlength=n_theta * n_phi)
    # integrate the pdf over each bin with a 6x6 midpoint rule
    q = 6
    exp = np.zeros(n_theta * n_phi)
    wi_q = jnp.broadcast_to(jnp.asarray(wi_dir, jnp.float32), (q * q, 3))
    for i in range(n_theta):
        for j in range(n_phi):
            c = -1 + 2 * (i + (np.arange(q) + 0.5) / q) / n_theta
            p = -np.pi + 2 * np.pi * (j + (np.arange(q) + 0.5) / q) / n_phi
            C, P = np.meshgrid(c, p, indexing="ij")
            S = np.sqrt(np.maximum(1 - C ** 2, 0))
            dirs = np.stack([S * np.cos(P), S * np.sin(P), C],
                            axis=-1).reshape(-1, 3).astype(np.float32)
            pd = med.phase_pdf(kind, m.g, wi_q, jnp.asarray(dirs),
                               m.phase_p, m.orientation, m.mix)
            exp[i * n_phi + j] = np.mean(np.asarray(pd)) \
                * (2 / n_theta) * (2 * np.pi / n_phi) * n_acc
    mask = exp > 8
    chi2 = np.sum((counts[mask] - exp[mask]) ** 2 / exp[mask])
    dof = mask.sum() - 1
    assert dof > 4
    assert chi2 < dof + 5 * np.sqrt(2 * dof), (chi2, dof, kind)


def test_chi2_hg():
    """Non-tautological sampler↔eval GOF for HG (the round-1 eval had an
    inverted anisotropy sign that the pdf:=eval tests could not catch)."""
    for g in (0.5, -0.4):
        m = med.make_medium((0.3,) * 3, (0.1,) * 3, phase_kind=med.HG, g=g)
        phase_chi2(med.HG, m, [0.0, 0.6, 0.8])


def test_chi2_rayleigh_exact():
    """Exact cubic-root Rayleigh sampling (rayleigh.cpp:104-130) — the
    uniform-sphere fallback this replaces would fail this GOF."""
    m = med.make_medium((0.3,) * 3, (0.1,) * 3, phase_kind=med.RAYLEIGH)
    phase_chi2(med.RAYLEIGH, m, [0.6, 0.0, 0.8])
    # second moment of cosθ: ∫(3/16π)(1+c²)c² dω = 0.4
    n = 1 << 16
    wi = jnp.broadcast_to(jnp.asarray([1.0, 0, 0]), (n, 3))
    u2 = rng.uniform_2d(jnp.arange(n, dtype=jnp.uint32), 0, 7)
    wo, _ = med.phase_sample(med.RAYLEIGH, m.g, wi, u2)
    ct = np.asarray(jnp.sum(-wi * wo, -1))
    np.testing.assert_allclose((ct ** 2).mean(), 0.4, atol=0.01)


def test_chi2_microflake():
    """Gaussian-fiber micro-flake (microflake.cpp + microflake_fiber.h):
    eval normalizes to 1 over the sphere and the rejection sampler's
    histogram matches eval (pdf == eval)."""
    for stddev, wi_dir in [(0.3, [1.0, 0.0, 0.0]),
                           (0.15, [0.6, 0.0, 0.8])]:
        m = med.make_medium((0.3,) * 3, (0.1,) * 3,
                            phase_kind=med.MICROFLAKE, stddev=stddev,
                            orientation=(0.0, 0.0, 1.0))
        phase_chi2(med.MICROFLAKE, m, wi_dir)


def test_microflake_eval_normalized_and_unoriented_zero():
    m = med.make_medium((0.3,) * 3, (0.1,) * 3, phase_kind=med.MICROFLAKE,
                        stddev=0.3, orientation=(0.0, 0.0, 1.0))
    nb = 128
    th = (np.arange(nb) + 0.5) / nb * np.pi
    ph = (np.arange(nb) + 0.5) / nb * 2 * np.pi
    T, P = np.meshgrid(th, ph, indexing="ij")
    dirs = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P),
                     np.cos(T)], -1).reshape(-1, 3).astype(np.float32)
    wi = jnp.broadcast_to(jnp.asarray([1.0, 0, 0]), (dirs.shape[0], 3))
    f = med.phase_eval(med.MICROFLAKE, m.g, wi, jnp.asarray(dirs),
                       m.phase_p, m.orientation)
    integ = (np.asarray(f).reshape(nb, nb) * np.sin(T)).sum() \
        * (np.pi / nb) * (2 * np.pi / nb)
    np.testing.assert_allclose(integ, 1.0, atol=0.01)
    # unoriented lanes evaluate to 0 (the reference's `return 0` branch)
    f0 = med.phase_eval(med.MICROFLAKE, m.g, wi[:4], jnp.asarray(dirs[:4]),
                        m.phase_p, jnp.zeros(3))
    assert float(np.abs(np.asarray(f0)).max()) == 0.0


def test_chi2_kkay_importance_sampling():
    m = med.make_medium((0.3,) * 3, (0.1,) * 3, phase_kind=med.KKAY_IS,
                        ks=0.7, kd=0.3, exponent=20.0,
                        orientation=(0.0, 0.0, 1.0))
    phase_chi2(med.KKAY_IS, m, [1.0, 0.0, 0.0])
    # energy estimate: E[eval/pdf] = ∫eval dω ≈ ks + kd for ⊥ illumination
    n = 1 << 16
    wi = jnp.broadcast_to(jnp.asarray([1.0, 0, 0]), (n, 3))
    u2 = rng.uniform_2d(jnp.arange(n, dtype=jnp.uint32), 0, 7)
    wo, pdf = med.phase_sample(med.KKAY_IS, m.g, wi, u2, m.phase_p,
                               m.orientation)
    pe = med.phase_eval(med.KKAY_IS, m.g, wi, wo, m.phase_p, m.orientation)
    est = float((np.asarray(pe) / np.maximum(np.asarray(pdf), 1e-20))
                .mean())
    np.testing.assert_allclose(est, 1.0, rtol=0.02)


def test_chi2_mixture_phase():
    m = med.make_medium((0.3,) * 3, (0.1,) * 3,
                        phase_kind=med.MIXTURE_PHASE,
                        mix=((med.HG, 0.6, 0.5), (med.RAYLEIGH, 0.4, 0.0)))
    phase_chi2(med.MIXTURE_PHASE, m, [0.0, 0.6, 0.8])
    # sub-unit weights lose energy proportionally (mixturephase.cpp:100-110
    # warns rather than renormalizes): ∫eval dω == Σw
    m2 = med.make_medium((0.3,) * 3, (0.1,) * 3,
                         phase_kind=med.MIXTURE_PHASE,
                         mix=((med.HG, 0.5, 0.3), (med.ISOTROPIC, 0.25,
                                                   0.0)))
    n = 1 << 16
    wi = jnp.broadcast_to(jnp.asarray([1.0, 0, 0]), (n, 3))
    u2 = rng.uniform_2d(jnp.arange(n, dtype=jnp.uint32), 0, 7)
    wo, pdf = med.phase_sample(med.MIXTURE_PHASE, m2.g, wi, u2, m2.phase_p,
                               m2.orientation, m2.mix)
    pe = med.phase_eval(med.MIXTURE_PHASE, m2.g, wi, wo, m2.phase_p,
                        m2.orientation, m2.mix)
    est = float((np.asarray(pe) / np.maximum(np.asarray(pdf), 1e-20))
                .mean())
    np.testing.assert_allclose(est, 0.75, rtol=0.02)


def test_hg_phase_normalization_and_sampling():
    n = 1 << 15
    g = 0.4
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    u2 = rng.uniform_2d(jnp.arange(n, dtype=jnp.uint32), 0, 5)
    wo, pdf = med.phase_sample(med.HG, g, wi, u2)
    # pdf at the sampled directions equals the eval
    pe = med.phase_eval(med.HG, g, wi, wo)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pe), rtol=2e-3)
    # estimator of ∫p dω via importance sampling == 1
    est = np.mean(np.asarray(pe) / np.asarray(pdf)) * 1.0
    np.testing.assert_allclose(est, 1.0, rtol=1e-3)
    # mean cosine equals g (HG property); forward dir is -wi
    ct = np.asarray(jnp.sum(-wi * wo, axis=-1))
    np.testing.assert_allclose(ct.mean(), g, atol=0.02)


def test_kkay_phase_energy_and_fallback():
    """Exact Kajiya-Kay phase (src/phase/kkay.cpp): with ks=1, kd=0 and
    illumination perpendicular to the fiber the sphere integral of eval
    is 1 (the normalization's defining property, kkay.cpp:33-35); with a
    zero orientation eval degrades to kd/(4π) (kkay.cpp:105-106)."""
    n = 1 << 16
    m = med.make_medium((0.3,) * 3, (0.1,) * 3, phase_kind=med.KKAY,
                        ks=1.0, kd=0.0, exponent=4.0,
                        orientation=(0.0, 0.0, 1.0))
    # wi ⊥ fiber (fiber along z): light travels along +x ⇒ wi = -x? The
    # reference evaluates -dot(wi, n) with n = fiber tangent; wi ⊥ n.
    wi = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3))
    pix = jnp.arange(n, dtype=jnp.uint32)
    u2 = rng.uniform_2d(pix, 0, 3)
    wo, pdf = med.phase_sample(med.KKAY, m.g, wi, u2, m.phase_p,
                               m.orientation)
    pe = med.phase_eval(med.KKAY, m.g, wi, wo, m.phase_p, m.orientation)
    est = np.mean(np.asarray(pe) / np.asarray(pdf))
    np.testing.assert_allclose(est, 1.0, rtol=0.02)
    # kd floor with no orientation
    m0 = med.make_medium((0.3,) * 3, (0.1,) * 3, phase_kind=med.KKAY,
                         ks=1.0, kd=0.25)
    pe0 = med.phase_eval(med.KKAY, m0.g, wi[:8], wo[:8], m0.phase_p,
                         m0.orientation)
    np.testing.assert_allclose(np.asarray(pe0),
                               0.25 / (4.0 * np.pi), rtol=1e-5)
    # normalization factor matches an independent quadrature
    from scipy.integrate import quad as _sciquad  # noqa: F401
    norm = med.kkay_normalization(4.0)
    theta = np.linspace(0, np.pi, 20001)
    integrand = np.cos(theta - np.pi / 2) ** 4.0 * np.sin(theta)
    ref = 1.0 / (np.trapezoid(integrand, theta) * 2 * np.pi)
    np.testing.assert_allclose(norm, ref, rtol=1e-6)


def test_distance_sampling_unbiased():
    """E[weight · f(surface/medium)] reproduces analytic transmittance."""
    m = med.make_medium(sigma_s=(0.3, 0.3, 0.3), sigma_a=(0.2, 0.2, 0.2))
    n = 1 << 16
    t_max = jnp.full((n,), 2.0)
    u1 = rng.uniform_1d(jnp.arange(n, dtype=jnp.uint32), 0, 0)
    u2 = rng.uniform_1d(jnp.arange(n, dtype=jnp.uint32), 0, 1)
    d, is_med, w = med.sample_distance(m, u1, u2, t_max)
    # surface-survival estimator: E[w · 1{surface}] == exp(-σt·t_max)
    w = np.asarray(w)
    surf = ~np.asarray(is_med)
    est = (w[:, 0] * surf).mean()
    ref = np.exp(-0.5 * 2.0)
    np.testing.assert_allclose(est, ref, rtol=0.02)


def test_volpath_fog_furnace():
    """Scattering-only fog (albedo 1) in a uniform furnace stays at the
    environment radiance (energy conservation through the medium)."""
    b = SceneBuilder()
    b.add_material(kind=mat.DIFFUSE)  # unused but table must exist
    b.env = em.make_constant((1.0, 1.0, 1.0))
    cam = Camera.perspective(matrix_lookat((0, 0, -3), (0, 0, 0), (0, 1, 0)),
                             45.0, 12, 12)
    scene = b.build(cam, Film.make(12, 12, "box"), spp=1, max_depth=16,
                    rr_depth=64, sampler=1)
    medium = med.make_medium(sigma_s=(0.4, 0.4, 0.4),
                             sigma_a=(0.0, 0.0, 0.0), g=0.2, fog_depth=3.0)
    img = np.asarray(render_volpath(scene, medium, spp=24))
    assert np.isfinite(img).all()
    np.testing.assert_allclose(img.mean(), 1.0, atol=0.08)


def test_volpath_absorbing_fog_darkens():
    b = SceneBuilder()
    b.add_material(kind=mat.DIFFUSE)
    b.env = em.make_constant((1.0, 1.0, 1.0))
    cam = Camera.perspective(matrix_lookat((0, 0, -3), (0, 0, 0), (0, 1, 0)),
                             45.0, 8, 8)
    scene = b.build(cam, Film.make(8, 8, "box"), spp=1, max_depth=8,
                    sampler=1)
    medium = med.make_medium(sigma_s=(0.0, 0.0, 0.0),
                             sigma_a=(0.5, 0.5, 0.5), fog_depth=2.0)
    img = np.asarray(render_volpath(scene, medium, spp=32))
    # pure absorption through a 2-unit slab: L = exp(-0.5*2) = 0.368
    np.testing.assert_allclose(img.mean(), np.exp(-1.0), rtol=0.06)


def test_volpath_vacuum_limit_matches_path():
    """σ→0 medium: volpath must reproduce the plain path tracer."""
    from hairpt.models import shapes as shp
    b = SceneBuilder()
    m = b.add_material(kind=mat.DIFFUSE, diffuse=(0.6, 0.6, 0.6),
                       twosided=True)
    b.add_mesh(shp.sphere(1.0, 12, 24), m)
    b.env = em.make_constant((1.0, 1.0, 1.0))
    cam = Camera.perspective(matrix_lookat((0, 0, -4), (0, 0, 0), (0, 1, 0)),
                             45.0, 16, 16)
    scene = b.build(cam, Film.make(16, 16, "box"), spp=1, max_depth=4,
                    sampler=1, strict_normals=False)
    from hairpt.integrators import path as P
    ref = np.asarray(P.render(scene, spp=24))
    medium = med.make_medium(sigma_s=(1e-6,) * 3, sigma_a=(1e-6,) * 3,
                             fog_depth=10.0)
    img = np.asarray(render_volpath(scene, medium, spp=24))
    np.testing.assert_allclose(img.mean(), ref.mean(), rtol=0.06)


# ---------------------------------------------------------------------------
# heterogeneous media (grid volumes + Woodcock/delta tracking)
# ---------------------------------------------------------------------------

def test_grid_density_trilinear():
    import numpy as np
    from hairpt.models import media as med
    # linear ramp along x: density(x) = x over [0, 1]^3
    n = 9
    data = np.broadcast_to(np.linspace(0, 1, n)[None, None, :],
                           (n, n, n)).astype(np.float32)
    vol = med.make_grid_volume(data, (0, 0, 0), (1, 1, 1))
    p = jnp.asarray([[0.25, 0.5, 0.5], [0.75, 0.5, 0.5],
                     [2.0, 0.5, 0.5]], jnp.float32)
    d = np.asarray(med.grid_density(vol, p))
    np.testing.assert_allclose(d[:2], [0.25, 0.75], atol=1e-5)
    assert d[2] == 0.0  # outside → vacuum


def test_woodcock_matches_homogeneous_limit():
    """Constant-density grid: delta-tracked free flights must reproduce
    the analytic exponential distribution, and ratio-tracked
    transmittance the analytic exp(-σt d)."""
    import numpy as np
    from hairpt.models import media as med
    sigma_s = (0.6, 0.6, 0.6)
    sigma_a = (0.4, 0.4, 0.4)
    vol = med.make_grid_volume(np.ones((4, 4, 4), np.float32),
                               (-50, -50, -50), (50, 50, 50))
    hm = med.make_hetero_medium(vol, sigma_s, sigma_a)
    n = 1 << 15
    o = jnp.zeros((n, 3), jnp.float32)
    d = jnp.zeros((n, 3), jnp.float32).at[:, 2].set(1.0)
    pix = jnp.arange(n, dtype=jnp.uint32)
    smp = jnp.zeros((n,), jnp.uint32)
    t_max = jnp.full((n,), 3.0, jnp.float32)
    t, is_med = med.woodcock_sample(hm, o, d, t_max, pix, smp, 100)
    t = np.asarray(t); is_med = np.asarray(is_med)
    # escape probability exp(-1*3.0)
    np.testing.assert_allclose((~is_med).mean(), np.exp(-3.0), atol=0.01)
    # mean collision t for events: analytic conditional mean
    # E[t | t<3] = (1 - (1+3σ)e^{-3σ})/(σ(1-e^{-3σ})), σ=1
    sig = 1.0
    expect = (1 - (1 + 3 * sig) * np.exp(-3 * sig)) \
        / (sig * (1 - np.exp(-3 * sig)))
    np.testing.assert_allclose(t[is_med].mean(), expect, rtol=0.02)

    tr = np.asarray(med.woodcock_transmittance(
        hm, o, d, jnp.full((n,), 2.0), pix, smp, 500))
    np.testing.assert_allclose(tr.mean(0), np.exp(-2.0), rtol=0.05)


def test_hetero_volpath_runs_and_darkens():
    """Gaussian density blob in front of a constant env: the blob region
    must be dimmer than the clear region (absorbing medium)."""
    import numpy as np
    from hairpt.models import media as med
    from hairpt.film.film import Film
    from hairpt.models import emitters as em
    from hairpt.models.bsdf import registry as mat
    from hairpt.models.sensors import Camera
    from hairpt.core.math import matrix_lookat
    from hairpt.scene.scene import SceneBuilder
    from hairpt.integrators.volpath import render_volpath

    g = 17
    zz, yy, xx = np.meshgrid(*([np.linspace(-1, 1, g)] * 3), indexing="ij")
    blob = np.exp(-8 * (xx ** 2 + yy ** 2 + zz ** 2)).astype(np.float32)
    vol = med.make_grid_volume(blob, (-1, -1, -1), (1, 1, 1))
    hm = med.make_hetero_medium(vol, sigma_s=(0.5,) * 3,
                                sigma_a=(4.0,) * 3, density_scale=4.0)

    b = SceneBuilder()
    b.add_material(kind=mat.DIFFUSE)
    b.env = em.make_constant((1.0, 1.0, 1.0))
    cam = Camera.perspective(matrix_lookat((0, 0, -4), (0, 0, 0),
                                           (0, 1, 0)), 35.0, 32, 32)
    scene = b.build(cam, Film.make(32, 32, "box"), spp=1, max_depth=6,
                    sampler=0)
    img = np.asarray(render_volpath(scene, hm, spp=8))
    assert np.isfinite(img).all()
    center = img[14:18, 14:18].mean()
    corner = img[:4, :4].mean()
    assert center < corner * 0.7, (center, corner)
    assert corner > 0.9  # clear paths see the env


# ---------------------------------------------------------------------------
# dipole subsurface (models/subsurface.py + integrators/sss.py)
# ---------------------------------------------------------------------------

def test_hgrid_matches_dense_and_sparsifies():
    """Block-sparse hierarchical grid (hgridvolume counterpart): lookups
    match the dense trilinear grid away from block borders; empty blocks
    return 0; bake_volume_cache (volcache counterpart) reproduces the
    baked function."""
    rs = np.random.RandomState(0)
    res = 16
    dense = rs.rand(res, res, res).astype(np.float32) + 0.1
    dense[:8, :8, :8] = 0.0        # one empty block region
    wmin, wmax = (-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)
    gv = med.make_grid_volume(dense, wmin, wmax)
    hv = med.make_hgrid_from_dense(dense, wmin, wmax, block=8)
    assert int((np.asarray(hv.block_idx) < 0).sum()) == 1  # empty block

    pts = jnp.asarray(rs.rand(512, 3) * 2 - 1, jnp.float32) * 0.95
    d_ref = np.asarray(med.grid_density(gv, pts))
    d_h = np.asarray(med.hgrid_density(hv, pts))
    # borders between blocks clamp inside the block (reference behavior),
    # so compare only points with all 8 interpolation voxels in one block
    g = (np.asarray(pts) + 1) * 0.5 * (res - 1)
    i0 = np.floor(g).astype(int)
    same_block = ((i0 // 8) == ((i0 + 1) // 8)).all(-1)
    np.testing.assert_allclose(d_h[same_block], d_ref[same_block],
                               rtol=2e-3, atol=2e-3)
    # inside the dropped block → exactly 0
    pts0 = jnp.asarray(rs.rand(64, 3), jnp.float32) * 0.8 - 0.95
    assert np.all(np.asarray(med.hgrid_density(hv, pts0)) == 0.0)

    # volcache: bake a radial falloff and read it back
    fn = lambda p: jnp.maximum(1.0 - jnp.linalg.norm(p, axis=-1), 0.0)
    cache = med.bake_volume_cache(fn, wmin, wmax, res=32, block=8)
    q = jnp.asarray(rs.rand(256, 3) * 1.2 - 0.6, jnp.float32)
    got = np.asarray(med.hgrid_density(cache, q))
    want = np.asarray(fn(q))
    np.testing.assert_allclose(got, want, atol=0.08)  # trilinear res-32 bake


def test_woodcock_hgrid_consistency():
    """Woodcock tracking through an HGridVolume matches the dense grid
    version of the same medium."""
    res = 16
    # smooth radial blob: block-border clamping (inherent to per-block
    # lookups, as in the reference) is negligible on smooth densities
    zz, yy, xx = np.meshgrid(*([np.linspace(-1, 1, res)] * 3),
                             indexing="ij")
    dense = np.exp(-2.0 * (xx ** 2 + yy ** 2 + zz ** 2)).astype(np.float32)
    wmin, wmax = (-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)
    gv = med.make_grid_volume(dense, wmin, wmax)
    hv = med.make_hgrid_from_dense(dense, wmin, wmax, block=8)
    md = med.make_hetero_medium(gv, (0.8,) * 3, (0.2,) * 3)
    mh = med.make_hetero_medium(hv, (0.8,) * 3, (0.2,) * 3)
    n = 4096
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    pix = jnp.arange(n, dtype=jnp.uint32)
    trd = np.asarray(med.woodcock_transmittance(
        md, o, d, jnp.full((n,), 4.0), pix, 0, 0)).mean()
    trh = np.asarray(med.woodcock_transmittance(
        mh, o, d, jnp.full((n,), 4.0), pix, 1, 0)).mean()
    # same medium, independent estimators: agree within MC noise; block-
    # border clamping adds a small bias bound
    np.testing.assert_allclose(trh, trd, rtol=0.12)


def test_dipole_rd_properties():
    import numpy as np
    from hairpt.models import subsurface as sss
    params = sss.SSSParams(sigma_s=jnp.asarray([2.6, 3.2, 3.9]),
                           sigma_a=jnp.asarray([0.002, 0.004, 0.007]),
                           eta=jnp.float32(1.5), scale=jnp.float32(1.0))
    r = np.asarray([0.01, 0.05, 0.2, 1.0], np.float32)
    rd = np.asarray(sss.rd_kernel(params, jnp.asarray(r * r)))
    assert (rd > 0).all()
    assert (np.diff(rd, axis=0) < 0).all()  # monotone falloff
    # total diffuse albedo ≈ ∫ Rd 2πr dr stays below 1 (energy conservation)
    rr = np.linspace(1e-3, 20.0, 20000, dtype=np.float32)
    rdv = np.asarray(sss.rd_kernel(params, jnp.asarray(rr * rr)))
    alb = (rdv * 2 * np.pi * rr[:, None]).sum(0) * (rr[1] - rr[0])
    assert (alb < 1.01).all() and (alb > 0.3).all(), alb


def test_dipole_render_translucency():
    """A dipole slab lit from one side shows light bleeding to nearby
    shadowed points (the defining subsurface behavior)."""
    import numpy as np
    from hairpt.core.math import matrix_lookat
    from hairpt.film.film import Film
    from hairpt.models import shapes as shp
    from hairpt.models.bsdf import registry as R
    from hairpt.models.sensors import Camera
    from hairpt.scene.scene import SceneBuilder
    from hairpt.integrators.sss import attach_dipole
    from hairpt.integrators import path as path_int

    b = SceneBuilder()
    dip = b.add_material(kind=R.DIPOLE, transmit=(2.0, 2.0, 2.0),
                         sigma_a=(0.02, 0.02, 0.02), eta=1.3, mix_w=1.0)
    # 180° about y so the plane (at z=0 before transform) faces -z
    sc = np.diag([-1.0, 1.0, -1.0, 1.0]); sc[2, 3] = 2.0
    b.add_mesh(shp.rectangle(), dip, to_world=sc)
    # point light close to the left half of the slab
    b.delta_lights.append(dict(kind=0, position=(-0.6, 0.0, 1.0),
                               direction=(0, 0, 1), intensity=(6.0,) * 3,
                               cutoff_deg=90, beam_deg=60))
    cam = Camera.perspective(matrix_lookat((0, 0, -1.5), (0, 0, 2.0),
                                           (0, 1, 0)), 60.0, 24, 24)
    scene = b.build(cam, Film.make(24, 24, "box"), spp=1, max_depth=3,
                    sampler=0)
    scene = attach_dipole(scene, n_samples=3000, k_light_samples=8)
    assert scene.arrays.sss is not None
    img = np.asarray(path_int.render(scene, spp=4))
    assert np.isfinite(img).all()
    # camera x points screen-left, so world -x (the lit side) is on the
    # image's RIGHT
    near = img[8:16, 16:22].mean()
    far = img[8:16, 2:8].mean()
    assert near > far > 0, (near, far)   # bleed, with falloff
