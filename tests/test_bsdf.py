import jax.numpy as jnp
import numpy as np
import pytest

from hairpt.core import rng, warps
from hairpt.models.bsdf import registry as R
from hairpt.models.bsdf import simple, plastic, hair, tables  # noqa: F401
from hairpt.models.bsdf.fresnel import fresnel_dielectric


def make_gm(n, **over):
    rows = [R.default_material_row(**over)]
    table = R.pack_materials(rows)
    return R.gather(table, None, jnp.zeros(n, jnp.int32),
                    jnp.zeros((n, 2), jnp.float32))


def fixed_wi(n, theta_deg=40.0, phi_deg=30.0):
    t = np.radians(theta_deg); p = np.radians(phi_deg)
    wi = np.array([np.sin(t) * np.cos(p), np.sin(t) * np.sin(p), np.cos(t)],
                  np.float32)
    return jnp.broadcast_to(wi, (n, 3))


def make_hair_aux(sigma_a=(0.5, 0.5, 0.5), beta_r=0.1, eta=1.55):
    vals = hair.precompute_azimuthal(jnp.asarray(sigma_a, jnp.float32),
                                     beta_r, eta)
    w, lw = hair.azimuthal_sampling_tables(vals)
    return R.HairTables(values=vals[None], weights=w[None],
                        lobe_weight=lw[None])


def sample_pdf_consistency(kind, n=1 << 15, seed=0, atol=0.05, aux=None,
                           **mat_over):
    """sample() then compare its reported pdf with pdf() of the same wo,
    and check weight == eval/pdf. Mirrors the χ² harness intent
    (reference: src/tests/test_chisquare.cpp) in a cheaper form."""
    gm = make_gm(n, kind=kind, **mat_over)
    wi = fixed_wi(n)
    pix = jnp.arange(n, dtype=jnp.uint32)
    ul = rng.uniform_1d(pix, 0, 1)
    u2 = rng.uniform_2d(pix, 0, 2)
    u2b = rng.uniform_2d(pix, 0, 4)
    wo, w, pdf, is_delta, _ = R.sample([kind], gm, wi, ul, u2, u2b, aux)
    f, pdf2 = R.eval_pdf([kind], gm, wi, wo, aux)
    ok = np.asarray(pdf > 1e-6) & ~np.asarray(is_delta)
    if ok.sum() > 0:
        np.testing.assert_allclose(np.asarray(pdf)[ok], np.asarray(pdf2)[ok],
                                   rtol=1e-3, atol=1e-5)
        ratio = np.asarray(w)[ok] * np.asarray(pdf)[ok, None] \
            - np.asarray(f)[ok]
        assert np.abs(ratio).max() < 1e-3, np.abs(ratio).max()
    return gm, wi, wo, w, pdf, is_delta


def chi2_direction_test(kind, n=1 << 16, n_theta=10, n_phi=10,
                        theta_deg=40.0, aux=None, **mat_over):
    """Histogram sampled wo against numerically integrated pdf()."""
    gm = make_gm(n, kind=kind, **mat_over)
    wi = fixed_wi(n, theta_deg=theta_deg)
    pix = jnp.arange(n, dtype=jnp.uint32)
    ul = rng.uniform_1d(pix, 0, 1)
    u2 = rng.uniform_2d(pix, 0, 2)
    u2b = rng.uniform_2d(pix, 0, 4)
    wo, w, pdf, is_delta, _ = R.sample([kind], gm, wi, ul, u2, u2b, aux)
    keep = np.asarray(pdf > 0) & ~np.asarray(is_delta)
    s = np.asarray(wo)[keep]
    # normalize by ALL drawn samples: pdf() integrates to the sampling
    # success probability for rejection-prone lobes (e.g. below-horizon
    # microfacet reflections), so rejected draws are part of the measure
    n_eff = int((~np.asarray(is_delta)).sum())
    cos_t = np.clip(s[:, 2], -1, 1)
    phi = np.arctan2(s[:, 1], s[:, 0]) + np.pi
    bi = np.minimum(((cos_t + 1) / 2 * n_theta).astype(int), n_theta - 1)
    bj = np.minimum((phi / (2 * np.pi) * n_phi).astype(int), n_phi - 1)
    counts = np.bincount(bi * n_phi + bj, minlength=n_theta * n_phi)

    # integrate pdf over each bin with an 8x8 midpoint rule
    m = 8
    exp = np.zeros(n_theta * n_phi)
    gm1 = make_gm(m * m, kind=kind, **mat_over)
    for i in range(n_theta):
        for j in range(n_phi):
            c = -1 + 2 * (i + (np.arange(m) + 0.5) / m) / n_theta
            p = -np.pi + 2 * np.pi * (j + (np.arange(m) + 0.5) / m) / n_phi
            C, P = np.meshgrid(c, p, indexing="ij")
            S = np.sqrt(np.maximum(1 - C ** 2, 0))
            dirs = np.stack([S * np.cos(P), S * np.sin(P), C],
                            axis=-1).reshape(-1, 3).astype(np.float32)
            _, pd = R.eval_pdf([kind], gm1,
                               fixed_wi(m * m, theta_deg=theta_deg),
                               jnp.asarray(dirs), aux)
            exp[i * n_phi + j] = np.mean(np.asarray(pd)) \
                * (2 / n_theta) * (2 * np.pi / n_phi) * n_eff
    mask = exp > 8
    chi2 = np.sum((counts[mask] - exp[mask]) ** 2 / exp[mask])
    dof = mask.sum() - 1
    assert dof > 4
    assert chi2 < dof + 5 * np.sqrt(2 * dof), (chi2, dof, kind)


@pytest.mark.parametrize("kind", [R.DIFFUSE, R.ROUGHDIFFUSE, R.PHONG,
                                  R.KAJIYAKAY])
def test_sample_pdf_consistency(kind):
    sample_pdf_consistency(kind)


@pytest.mark.parametrize("kind,over", [
    (R.DIFFUSE, {}),
    (R.DIFFUSE, dict(theta_deg=75.0)),
    (R.ROUGHDIFFUSE, dict(alpha=0.4)),
    (R.PHONG, dict(exponent=12.0, spec_weight=0.4)),
    (R.PHONG, dict(exponent=40.0, spec_weight=0.6, theta_deg=70.0)),
    (R.WARD, dict(alpha=0.25, spec_weight=0.5)),
    (R.ROUGHCONDUCTOR, dict(alpha=0.3)),
    # sharp lobes need finer bins or the per-bin midpoint integration
    # of the expected pdf under-resolves the peak
    (R.ROUGHCONDUCTOR, dict(alpha=0.12, dist=1, theta_deg=65.0,
                            n=1 << 18, n_theta=24, n_phi=24)),
    (R.KAJIYAKAY, dict(exponent=10.0, spec_weight=0.3)),
    (R.ROUGHPLASTIC, dict(alpha=0.3, eta=1.55)),
    (R.ROUGHPLASTIC, dict(alpha=0.15, eta=1.5, theta_deg=70.0)),
])
def test_chi2_sampling(kind, over):
    if kind == R.ROUGHPLASTIC:
        rt = tables.get(0, 1.55)
        over = dict(over)
        over["ext_trans"] = rt.eval_np(
            (np.arange(R.N_COS) + 0.5) / R.N_COS,
            np.full(R.N_COS, over["alpha"]))
        over["int_fdr"] = 1.0 - rt.eval_diffuse_np(over["alpha"])
    chi2_direction_test(kind, **over)


# -- corrected-mode Marschner (MARSCHNER_PURE): the χ² GOF sweep the
# faithful pdf≡1 quirk makes impossible (VERDICT weak #5 / SURVEY §7.6) ----

def test_marschner_pure_sample_pdf_consistency():
    sample_pdf_consistency(R.MARSCHNER_PURE, aux=make_hair_aux(),
                           aux_id=0, diffuse=(0.0, 0.0, 0.0))


@pytest.mark.parametrize("beta_r,theta_deg,diffuse", [
    (0.3, 40.0, (0.0, 0.0, 0.0)),
    (0.3, 70.0, (0.0, 0.0, 0.0)),
    (0.45, 25.0, (0.3, 0.2, 0.1)),
])
def test_chi2_marschner_pure(beta_r, theta_deg, diffuse):
    aux = make_hair_aux(beta_r=beta_r)
    over = dict(aux_id=0, diffuse=diffuse, beta_r=beta_r, eta=1.55)
    if sum(diffuse) > 0:
        rt = tables.get(0, 1.55)
        over["ext_trans"] = rt.eval_np(
            (np.arange(R.N_COS) + 0.5) / R.N_COS, np.full(R.N_COS, 0.2))
        over["int_fdr"] = 1.0 - rt.eval_diffuse_np(0.2)
        over["spec_weight"] = 0.5
    chi2_direction_test(R.MARSCHNER_PURE, aux=aux, n=1 << 18,
                        n_theta=24, n_phi=24, theta_deg=theta_deg, **over)


def test_marschner_pure_pdf_normalized():
    # ∫ pdf dω ≈ 1 over the sphere (the quirky mode cannot satisfy this)
    aux = make_hair_aux()
    nb = 128
    th = (np.arange(nb) + 0.5) / nb * np.pi - np.pi / 2
    ph = (np.arange(nb) + 0.5) / nb * 2 * np.pi
    T, P = np.meshgrid(th, ph, indexing="ij")
    dirs = np.stack([np.sin(P) * np.cos(T), np.sin(T),
                     np.cos(P) * np.cos(T)], -1).reshape(-1, 3)
    gm = make_gm(dirs.shape[0], kind=R.MARSCHNER_PURE, aux_id=0,
                 diffuse=(0.0, 0.0, 0.0))
    _, pd = R.eval_pdf([R.MARSCHNER_PURE], gm,
                       fixed_wi(dirs.shape[0]),
                       jnp.asarray(dirs, jnp.float32), aux)
    integ = (np.asarray(pd).reshape(nb, nb) * np.cos(T)).sum() \
        * (np.pi / nb) * (2 * np.pi / nb)
    assert abs(integ - 1.0) < 0.02, integ


def test_diffuse_white_furnace():
    # integral of eval over the hemisphere == albedo for white diffuse
    n = 1 << 16
    gm = make_gm(n, kind=R.DIFFUSE, diffuse=(1.0, 1.0, 1.0))
    wi = fixed_wi(n)
    u2 = rng.uniform_2d(jnp.arange(n, dtype=jnp.uint32), 0, 0)
    wo = warps.square_to_uniform_hemisphere(u2)
    f, _ = R.eval_pdf([R.DIFFUSE], gm, wi, wo)
    est = np.mean(np.asarray(f)[:, 0]) * 2 * np.pi
    assert abs(est - 1.0) < 0.02, est


def test_rough_transmittance_table():
    rt = tables.get(0, 1.5)
    # smooth limit ≈ 1 - fresnel
    cos = np.linspace(0.1, 1.0, 16)
    t_tab = rt.eval_np(cos, np.full(16, 1e-3))
    F, _ = fresnel_dielectric(jnp.asarray(cos, jnp.float32), 1.5)
    np.testing.assert_allclose(t_tab, 1 - np.asarray(F), atol=0.02)
    # diffuse average within [0,1] and decreasing in alpha is plausible
    assert 0.5 < rt.eval_diffuse_np(0.001) < 1.0


def test_marschner_precompute_tables():
    vals = hair.precompute_azimuthal(jnp.asarray([0.5, 0.5, 0.5]), 0.1, 1.55)
    v = np.asarray(vals)
    assert v.shape == (3, hair.AZ_RES, hair.AZ_RES, 3)
    assert np.all(v >= 0)
    assert np.isfinite(v).all()
    # R lobe peaks in the backward direction (phi=pi gets little R energy,
    # phi near 0/2pi gets the mirror peak) — actually R's exit angle is
    # Phi(0,h)=-2 gammaI ∈ [-pi, pi]; energy should be spread; just check
    # normalization magnitude is sane: ∫N_R dphi ≈ average fresnel ∈ (0, 0.2)
    int_r = v[0].sum(axis=1)[:, 0] * 2 * np.pi / hair.AZ_RES
    assert 0.0 < int_r.mean() < 0.5
    # TT should dominate TRT in total energy for light absorption
    w, lw = hair.azimuthal_sampling_tables(vals)
    assert np.asarray(lw).shape == (3, hair.AZ_RES)
    assert np.all(np.asarray(lw) >= 0)


def test_marschner_sample_eval_runs():
    n = 4096
    vals = hair.precompute_azimuthal(jnp.asarray([0.5, 0.5, 0.5]), 0.1, 1.55)
    w, lw = hair.azimuthal_sampling_tables(vals)
    aux = R.HairTables(values=vals[None], weights=w[None],
                       lobe_weight=lw[None])
    rt = tables.get(0, 1.55)
    ext = rt.eval_np((np.arange(R.N_COS) + 0.5) / R.N_COS,
                     np.full(R.N_COS, 0.2))
    gm = make_gm(n, kind=R.MARSCHNER, aux_id=0, eta=1.55, alpha=0.2,
                 ext_trans=ext, int_fdr=1.0 - rt.eval_diffuse_np(0.2),
                 diffuse=(0.143016, 0.0156076, 1.80928e-05), spec_weight=0.5)
    wi = fixed_wi(n, 50, 120)
    pix = jnp.arange(n, dtype=jnp.uint32)
    wo, wgt, pdf, is_delta, _ = R.sample(
        [R.MARSCHNER], gm, wi, rng.uniform_1d(pix, 0, 1),
        rng.uniform_2d(pix, 0, 2), rng.uniform_2d(pix, 0, 4),
        hair_tables=aux)
    assert np.isfinite(np.asarray(wgt)).all()
    assert np.isfinite(np.asarray(wo)).all()
    f, pdf2 = R.eval_pdf([R.MARSCHNER], gm, wi, wo, hair_tables=aux)
    assert np.isfinite(np.asarray(f)).all()
    np.testing.assert_allclose(np.asarray(pdf2), 1.0)  # faithful pdf quirk
    # sampled directions must be unit length
    np.testing.assert_allclose(np.linalg.norm(np.asarray(wo), axis=-1), 1.0,
                               atol=1e-4)


@pytest.mark.parametrize("kind,over", [
    (R.ROUGHDIELECTRIC, dict(alpha=0.3, eta=1.5)),
    (R.ROUGHDIELECTRIC, dict(alpha=0.2, eta=1.33, theta_deg=72.0)),
    (R.DIFFTRANS, {}),
])
def test_chi2_sampling_transmissive(kind, over):
    from hairpt.models.bsdf import dielectric_rough  # noqa: F401
    chi2_direction_test(kind, **over)


def test_rough_dielectric_energy():
    """White rough dielectric: reflection+transmission should carry ~all
    energy (weak-white-furnace: weights near 1 on average)."""
    from hairpt.models.bsdf import dielectric_rough  # noqa: F401
    n = 1 << 14
    gm = make_gm(n, kind=R.ROUGHDIELECTRIC, alpha=0.25, eta=1.5,
                 specular=(1, 1, 1), transmit=(1, 1, 1))
    wi = fixed_wi(n, 35.0)
    pix = jnp.arange(n, dtype=jnp.uint32)
    wo, w, pdf, is_delta, eta_s = R.sample(
        [R.ROUGHDIELECTRIC], gm, wi, rng.uniform_1d(pix, 0, 1),
        rng.uniform_2d(pix, 0, 2), rng.uniform_2d(pix, 0, 4))
    w = np.asarray(w)
    ok = np.asarray(pdf) > 0
    # account for the radiance compression factor on refracted samples:
    # multiply back eta_rel^2 so the energy check is in power terms
    eta_sq = np.asarray(eta_s) ** 2
    power_w = w[:, 0] * np.where(np.asarray(eta_s) != 1.0, eta_sq, 1.0)
    mean_w = power_w[ok].mean()
    assert 0.75 < mean_w < 1.1, mean_w  # VNDF weights ≈ G2/G1 ≤ 1


def test_bitmap_texture_eval():
    import numpy as _np
    img = _np.zeros((8, 8, 3), _np.float32)
    img[:, :4] = [1.0, 0.0, 0.0]   # left half red
    img[:, 4:] = [0.0, 1.0, 0.0]   # right half green
    tex = R.CheckerboardTable(
        kind=jnp.asarray([1], jnp.int32),
        color0=jnp.zeros((1, 3)), color1=jnp.zeros((1, 3)),
        uv_scale=jnp.ones((1, 2)), uv_offset=jnp.zeros((1, 2)),
        bitmaps=jnp.asarray(img[None]),
        aux=jnp.zeros((1,)), mips=jnp.zeros((1, 0, 8, 8, 3)))
    uv = jnp.asarray([[0.2, 0.5], [0.8, 0.5]], jnp.float32)
    out = R.eval_checkerboard(tex, jnp.asarray([0, 0], jnp.int32), uv,
                              jnp.zeros((2, 3)))
    o = np.asarray(out)
    assert o[0, 0] > 0.9 and o[0, 1] < 0.1   # red at u=0.2
    assert o[1, 1] > 0.9 and o[1, 0] < 0.1   # green at u=0.8


def test_longitudinal_m_vs_reference_formula():
    """longitudinal_m must match the reference's closed form
    M(v) = exp(-b)·I0(a)/(2v·sinh(1/v)) (marschner_diffuse.cpp:365-377)
    in float64, across both numerical branches."""
    import numpy as _np
    from hairpt.models.bsdf.hair import longitudinal_m

    rng_ = _np.random.default_rng(5)
    for v in [0.01, 0.04, 0.09, 0.11, 0.25, 1.0]:
        for _ in range(20):
            ti = rng_.uniform(-1.2, 1.2)
            to = rng_.uniform(-1.2, 1.2)
            si, ci = _np.sin(ti), _np.cos(ti)
            so, co = _np.sin(to), _np.cos(to)
            a = ci * co / v
            b = si * so / v
            ref = _np.exp(-b) * _np.i0(a) / (2 * v * _np.sinh(1.0 / v))
            got = float(longitudinal_m(jnp.float32(v), jnp.float32(si),
                                       jnp.float32(so), jnp.float32(ci),
                                       jnp.float32(co)))
            if ref < 1e-30 or not _np.isfinite(ref):
                continue
            assert abs(got - ref) / max(ref, 1e-6) < 2e-2, (v, ti, to, got,
                                                            ref)


def test_kajiyakay_eval_matches_reference_formula():
    """KajiyaKay.eval must equal the literal reference expression
    (kajiyakay.cpp:121-180) at arbitrary directions."""
    import numpy as _np
    rng_ = _np.random.default_rng(6)
    n = 64
    wi = rng_.normal(size=(n, 3)); wi /= _np.linalg.norm(wi, axis=1,
                                                         keepdims=True)
    wo = rng_.normal(size=(n, 3)); wo /= _np.linalg.norm(wo, axis=1,
                                                         keepdims=True)
    kd = _np.array([0.3, 0.2, 0.1]); ks = _np.array([0.6, 0.5, 0.4])
    expo = 17.0
    gm = make_gm(n, kind=R.KAJIYAKAY, diffuse=tuple(kd), specular=tuple(ks),
                 exponent=expo)
    f, _ = R.eval_pdf([R.KAJIYAKAY], gm, jnp.asarray(wi, jnp.float32),
                      jnp.asarray(wo, jnp.float32))
    f = np.asarray(f)
    for i in range(n):
        if wi[i, 2] <= 0 or wo[i, 2] <= 0:
            ref = _np.zeros(3)
        else:
            tl, te = abs(wi[i, 0]), abs(wo[i, 0])
            alpha = tl * te + _np.sqrt(1 - tl * tl) * _np.sqrt(1 - te * te)
            spec = _np.zeros(3)
            if alpha > 0 and wi[i, 0] * wo[i, 0] < 0:
                spec = 0.15 * ks * (expo + 2) / (4 * _np.pi) * alpha ** expo
            ref = (spec + kd / _np.pi) * wo[i, 2]
        _np.testing.assert_allclose(f[i], ref, rtol=2e-3, atol=1e-6)


def test_mixture_bsdf_blends():
    """MIXTURE of red and green diffuse == analytic blend, and the sampler
    is consistent with the blended pdf."""
    rows = [R.default_material_row(kind=R.MIXTURE, mix_a=1, mix_b=2,
                                   mix_w=0.3),
            R.default_material_row(kind=R.DIFFUSE, diffuse=(1, 0, 0)),
            R.default_material_row(kind=R.DIFFUSE, diffuse=(0, 1, 0))]
    table = R.pack_materials(rows)
    n = 1 << 13
    mat_id = jnp.zeros(n, jnp.int32)
    uv = jnp.zeros((n, 2))
    gm = R.gather(table, None, mat_id, uv)
    wi = fixed_wi(n)
    kinds = (R.MIXTURE, R.DIFFUSE)
    wo = fixed_wi(n, 25.0, -40.0)
    f, pdf = R.eval_pdf_mix(kinds, table, None, mat_id, uv, gm, wi, wo)
    expect = (0.3 * np.array([1, 0, 0]) + 0.7 * np.array([0, 1, 0])) \
        / np.pi * float(wo[0, 2])
    np.testing.assert_allclose(np.asarray(f)[0], expect, rtol=1e-4)
    pix = jnp.arange(n, dtype=jnp.uint32)
    wo_s, w_s, pdf_s, dl, _ = R.sample_mix(
        kinds, table, None, mat_id, uv, gm, wi,
        rng.uniform_1d(pix, 0, 1), rng.uniform_2d(pix, 0, 2),
        rng.uniform_2d(pix, 0, 4))
    f2, pdf2 = R.eval_pdf_mix(kinds, table, None, mat_id, uv, gm, wi, wo_s)
    ok = np.asarray(pdf_s) > 1e-6
    np.testing.assert_allclose(np.asarray(pdf_s)[ok], np.asarray(pdf2)[ok],
                               rtol=1e-3)
    resid = np.asarray(w_s)[ok] * np.asarray(pdf_s)[ok, None] \
        - np.asarray(f2)[ok]
    assert np.abs(resid).max() < 1e-3


def test_gridtexture_eval():
    """gridtexture: color1 on integer cell borders, color0 inside
    (reference: src/textures/gridtexture.cpp)."""
    from hairpt.scene.scene import SceneBuilder
    b = SceneBuilder()
    tid = b.add_gridtexture((0.1, 0.2, 0.3), (0.9, 0.8, 0.7),
                            line_width=0.1)
    b.add_material(kind=R.DIFFUSE, tex_id=tid)
    from hairpt.film.film import Film
    from hairpt.models.sensors import Camera
    sc = b.build(Camera.perspective(np.eye(4), 45, 8, 8),
                 Film.make(8, 8, "box"), spp=1, max_depth=2)
    tex = sc.arrays.checkers
    uv = jnp.asarray([[0.5, 0.5], [0.01, 0.5], [0.5, 0.99]], jnp.float32)
    out = R.eval_checkerboard(tex, jnp.zeros(3, jnp.int32), uv,
                              jnp.zeros((3, 3)))
    out = np.asarray(out)
    np.testing.assert_allclose(out[0], [0.1, 0.2, 0.3], atol=1e-6)  # cell
    np.testing.assert_allclose(out[1], [0.9, 0.8, 0.7], atol=1e-6)  # line
    np.testing.assert_allclose(out[2], [0.9, 0.8, 0.7], atol=1e-6)  # line


def test_mipmap_trilinear_lod():
    """Mip pyramid: lod 0 reproduces the base texel, high lod converges to
    the global mean; intermediate lods interpolate monotonically."""
    from hairpt.scene.scene import SceneBuilder
    b = SceneBuilder()
    img = np.zeros((64, 64, 3), np.float32)
    img[::2, :, 0] = 1.0     # fine horizontal stripes in red
    tid = b.add_bitmap_texture(img, res=64)
    b.add_material(kind=R.DIFFUSE, tex_id=tid)
    from hairpt.film.film import Film
    from hairpt.models.sensors import Camera
    sc = b.build(Camera.perspective(np.eye(4), 45, 8, 8),
                 Film.make(8, 8, "box"), spp=1, max_depth=2)
    tex = sc.arrays.checkers
    assert tex.mips.shape[1] == 4
    # v chosen so the base-level bilinear lookup lands on the CENTER of
    # an even (red) stripe row: mod(1-v,1)*64-0.5 == 20
    uv = jnp.broadcast_to(jnp.asarray([0.31, 1.0 - 20.5 / 64.0],
                                      jnp.float32), (4, 2))
    tid0 = jnp.zeros(4, jnp.int32)
    base = jnp.zeros((4, 3))
    v0 = np.asarray(R.eval_checkerboard(tex, tid0, uv, base,
                                        jnp.zeros(4)))[0]
    v3 = np.asarray(R.eval_checkerboard(tex, tid0, uv, base,
                                        jnp.full(4, 3.0)))[0]
    # coarsest level ≈ stripe average (0.5 in red)
    np.testing.assert_allclose(v3[0], 0.5, atol=0.1)
    np.testing.assert_allclose(v0[0], 1.0, atol=0.05)  # on a stripe
    v1 = np.asarray(R.eval_checkerboard(tex, tid0, uv, base,
                                        jnp.full(4, 1.5)))[0]
    assert min(v0[0], v3[0]) - 1e-5 <= v1[0] <= max(v0[0], v3[0]) + 1e-5


def test_wireframe_vertexcolors_curvature_textures():
    import numpy as np
    from hairpt.scene.scene import SceneBuilder
    from hairpt.models import shapes as shp
    from hairpt.film.film import Film
    from hairpt.models.sensors import Camera
    b = SceneBuilder()
    t_wf = b.add_wireframe_texture((0.2, 0.2, 0.2), (1.0, 0.0, 0.0),
                                   line_width=0.1)
    m_wf = b.add_material(kind=R.DIFFUSE, tex_id=t_wf)
    t_vc = b.add_vertexcolor_texture()
    m_vc = b.add_material(kind=R.DIFFUSE, tex_id=t_vc)
    m_cv = b.add_material(kind=R.DIFFUSE,
                          tex_id=b.add_vertexcolor_texture(),
                          __curvature__=True)
    # colored sphere: per-vertex gradient
    sph = shp.sphere(1.0, 8, 16)
    cols = np.zeros((len(sph.positions), 3), np.float32)
    cols[:, 1] = (sph.positions[:, 1] + 1) / 2
    b.add_mesh(sph._replace(colors=cols), m_vc)
    b.add_mesh(shp.rectangle(), m_wf)
    b.add_mesh(shp.sphere(2.0, 8, 16), m_cv)   # curvature-baked
    sc = b.build(Camera.perspective(np.eye(4), 45, 8, 8),
                 Film.make(8, 8, "box"), spp=1, max_depth=2)
    tex = sc.arrays.checkers
    # wireframe eval: center of triangle vs near an edge
    tid = jnp.full(2, t_wf, jnp.int32)
    uv = jnp.zeros((2, 2))
    base = jnp.zeros((2, 3))
    bary = jnp.asarray([[0.33, 0.33], [0.02, 0.49]], jnp.float32)
    out = np.asarray(R.eval_checkerboard(tex, tid, uv, base, None, bary,
                                         jnp.ones((2, 3))))
    np.testing.assert_allclose(out[0], [0.2, 0.2, 0.2], atol=1e-6)
    np.testing.assert_allclose(out[1], [1.0, 0.0, 0.0], atol=1e-6)
    # vertexcolor passthrough
    tid2 = jnp.full(2, t_vc, jnp.int32)
    vc = jnp.asarray([[0.1, 0.5, 0.9], [0.7, 0.2, 0.0]], jnp.float32)
    out2 = np.asarray(R.eval_checkerboard(tex, tid2, uv, base, None, bary,
                                          vc))
    np.testing.assert_allclose(out2, np.asarray(vc), atol=1e-6)
    # curvature baked into the third mesh's vertex colors: positive K →
    # green channel dominates
    sh = sc.arrays.tri_shading
    kinds = np.asarray(sc.arrays.materials.kind)
    mids = np.asarray(sh.mat_id)
    vc0 = np.asarray(sh.vc0)
    curv_rows = vc0[mids == m_cv]
    assert curv_rows[:, 1].mean() > 0.2      # green (positive curvature)
    assert curv_rows[:, 0].max() < 1e-6      # no negative-K red
