"""core/numerics.py vs scipy/analytic oracles (reference counterparts:
src/libcore/{brent,spline,shvector}.cpp exercised by mtsutil tests
test_quad/test_sh)."""
import numpy as np
import jax.numpy as jnp

from hairpt.core import numerics as nm


def test_brent_root():
    # root of cos(x) - x = 0.7390851
    f = lambda x: jnp.cos(x) - x
    r = np.asarray(nm.brent_solve(f, jnp.zeros(4), jnp.ones(4)))
    np.testing.assert_allclose(r, 0.7390851, rtol=1e-5)
    # batched: per-lane polynomial roots x² - c = 0 on [0, 3]
    c = jnp.asarray([0.25, 1.0, 2.25, 4.0])
    g = lambda x: x * x - c
    r = np.asarray(nm.brent_solve(g, jnp.zeros(4), jnp.full((4,), 3.0)))
    np.testing.assert_allclose(r, np.sqrt(np.asarray(c)), rtol=1e-5)


def test_cubic_spline_eval_and_integral():
    # f(x) = sin(x) on [0, pi]: Catmull-Rom through samples ≈ f
    n = 33
    xs = np.linspace(0, np.pi, n)
    vals = np.sin(xs)
    q = jnp.asarray(np.linspace(0.05, np.pi - 0.05, 200), jnp.float32)
    got = np.asarray(nm.eval_cubic_1d(q, vals, 0.0, float(np.pi)))
    np.testing.assert_allclose(got, np.sin(np.asarray(q)), atol=2e-4)
    # outside the domain → 0
    assert nm.eval_cubic_1d(jnp.asarray([-0.1]), vals, 0.0,
                            float(np.pi))[0] == 0.0
    # integral of the interpolant ≈ ∫ sin = 2
    areas = nm.integrate_cubic_1d(vals, 0.0, float(np.pi))
    np.testing.assert_allclose(areas.sum(), 2.0, rtol=1e-4)


def test_cubic_spline_sampling():
    """sample_cubic_1d draws x ∝ interpolant: histogram matches pdf."""
    n = 17
    xs = np.linspace(0.0, 1.0, n)
    vals = 0.5 + xs ** 2          # positive, increasing density
    u = jnp.asarray(np.random.RandomState(0).rand(1 << 14), jnp.float32)
    x, pdf = nm.sample_cubic_1d(u, vals, 0.0, 1.0)
    x = np.asarray(x)
    pdf = np.asarray(pdf)
    assert ((x >= 0) & (x <= 1)).all()
    # normalization: E[1/pdf] = domain measure
    np.testing.assert_allclose((1.0 / pdf).mean(), 1.0, rtol=0.02)
    # mean of samples matches ∫x f/∫f  = (0.25+1/4... ) compute numerically
    xx = np.linspace(0, 1, 20001)
    fx = 0.5 + xx ** 2
    ref_mean = np.trapezoid(xx * fx, xx) / np.trapezoid(fx, xx)
    np.testing.assert_allclose(x.mean(), ref_mean, atol=0.01)


def test_sh_project_eval_roundtrip():
    """Projecting a band-limited function recovers it exactly."""
    l_max = 4
    # f = Y_0^0 combination + directional terms expressible in l<=2
    def f(theta, phi):
        ct = jnp.cos(theta)
        st = jnp.sin(theta)
        return 1.0 + ct + ct * ct + st * st * jnp.cos(2 * phi)

    coeffs = nm.sh_project(f, l_max, res=32)
    th = jnp.asarray(np.random.RandomState(1).rand(128) * np.pi)
    ph = jnp.asarray(np.random.RandomState(2).rand(128) * 2 * np.pi)
    got = np.asarray(nm.sh_eval(coeffs, l_max, th, ph))
    want = np.asarray(f(th, ph))
    np.testing.assert_allclose(got, want, atol=2e-3)
    # orthonormality: projecting Y_2^1 gives a single unit coefficient
    def y21(theta, phi):
        return nm.sh_eval_basis(2, theta, phi)[..., 7]  # l=2, m=1 index
    c = np.asarray(nm.sh_project(y21, 2, res=48))
    want = np.zeros(9)
    want[7] = 1.0
    np.testing.assert_allclose(c, want, atol=2e-3)


def test_sh_matches_scipy():
    """Real SH basis against scipy's complex sph_harm combination."""
    from scipy.special import sph_harm_y
    rng = np.random.RandomState(3)
    theta = rng.rand(64) * np.pi
    phi = rng.rand(64) * 2 * np.pi
    basis = np.asarray(nm.sh_eval_basis(3, jnp.asarray(theta),
                                        jnp.asarray(phi)))
    k = 0
    for l in range(4):
        for m in range(-l, l + 1):
            # scipy's sph_harm_y includes the Condon-Shortley phase, as
            # does our Legendre recurrence — so the real combination has
            # no extra (-1)^m
            y = sph_harm_y(l, abs(m), theta, phi)
            if m > 0:
                ref = np.sqrt(2) * y.real
            elif m < 0:
                ref = np.sqrt(2) * y.imag
            else:
                ref = y.real
            np.testing.assert_allclose(basis[:, k], ref, atol=1e-4,
                                       err_msg=f"l={l} m={m}")
            k += 1


def test_gauss_lobatto_adaptive():
    # adaptive Gauss-Lobatto vs analytic integrals (reference:
    # GaussLobattoIntegrator, src/libcore/quad.cpp:295-420)
    from hairpt.core.quad import gauss_lobatto
    assert abs(gauss_lobatto(np.sin, 0.0, np.pi, rel_err=1e-10) - 2.0) < 1e-8
    assert abs(gauss_lobatto(np.exp, 0.0, 1.0, rel_err=1e-10)
               - (np.e - 1.0)) < 1e-10
    # integrable singularity-ish: sqrt on [0,1] = 2/3
    assert abs(gauss_lobatto(np.sqrt, 0.0, 1.0, rel_err=1e-10)
               - 2.0 / 3.0) < 1e-8
    # oscillatory: ∫0^10 cos(x²) dx (Fresnel) vs a dense Simpson oracle
    xs = np.linspace(0, 10, 200001)
    oracle = np.trapezoid(np.cos(xs * xs), xs)
    got = gauss_lobatto(lambda x: np.cos(x * x), 0.0, 10.0, rel_err=1e-10)
    assert abs(got - oracle) < 1e-6
