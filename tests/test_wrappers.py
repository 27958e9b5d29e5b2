"""Wrapper materials: MASK (src/bsdfs/mask.cpp), COATING (coating.cpp),
ROUGHCOATING (roughcoating.cpp). Identity limits, analytic factors, and
sample/eval/pdf consistency."""
import jax.numpy as jnp
import numpy as np

from hairpt.core import rng
from hairpt.models.bsdf import registry as R
from hairpt.models.bsdf import simple, plastic, hair, tables  # noqa: F401
from hairpt.scene.scene import SceneBuilder

from test_bsdf import fixed_wi


def _table(rows):
    return R.pack_materials(rows)


def _mats(n, table):
    mat_id = jnp.zeros(n, jnp.int32)
    uv = jnp.zeros((n, 2), jnp.float32)
    gm = R.gather(table, None, mat_id, uv)
    return mat_id, uv, gm


def _samples(n):
    pix = jnp.arange(n, dtype=jnp.uint32)
    return (rng.uniform_1d(pix, 0, 1), rng.uniform_2d(pix, 0, 2),
            rng.uniform_2d(pix, 0, 4))


def test_mask_eval_scales_nested():
    op = (0.7, 0.4, 0.2)
    rows = [R.default_material_row(kind=R.MASK, diffuse=op, mix_a=1),
            R.default_material_row(kind=R.DIFFUSE, diffuse=(0.8, 0.6, 0.4))]
    table = _table(rows)
    n = 8
    mat_id, uv, gm = _mats(n, table)
    wi = fixed_wi(n)
    wo = fixed_wi(n, 25.0, -40.0)
    kinds = (R.MASK, R.DIFFUSE)
    f, pdf = R.eval_pdf_mix(kinds, table, None, mat_id, uv, gm, wi, wo)
    expect = np.array(op) * np.array([0.8, 0.6, 0.4]) / np.pi \
        * float(wo[0, 2])
    np.testing.assert_allclose(np.asarray(f)[0], expect, rtol=1e-5)
    lum = float(np.dot(op, [0.212671, 0.715160, 0.072169]))
    np.testing.assert_allclose(float(pdf[0]),
                               lum * float(wo[0, 2]) / np.pi, rtol=1e-5)


def test_mask_sampling_passthrough_and_consistency():
    op = (0.5, 0.5, 0.5)
    rows = [R.default_material_row(kind=R.MASK, diffuse=op, mix_a=1),
            R.default_material_row(kind=R.DIFFUSE, diffuse=(0.9, 0.9, 0.9))]
    table = _table(rows)
    n = 1 << 13
    mat_id, uv, gm = _mats(n, table)
    wi = fixed_wi(n)
    kinds = (R.MASK, R.DIFFUSE)
    ul, u2, u2b = _samples(n)
    wo, wt, pdf, is_delta, _ = R.sample_mix(kinds, table, None, mat_id, uv,
                                            gm, wi, ul, u2, u2b)
    d = np.asarray(is_delta)
    # delta pass-through lanes continue straight: wo == -wi
    np.testing.assert_allclose(np.asarray(wo)[d], -np.asarray(wi)[d],
                               atol=1e-6)
    assert 0.4 < d.mean() < 0.6  # ≈ 1 - luminance(opacity)
    # smooth lanes: weight * pdf == masked eval
    f, pdf2 = R.eval_pdf_mix(kinds, table, None, mat_id, uv, gm, wi, wo)
    ok = ~d & (np.asarray(pdf) > 1e-6)
    np.testing.assert_allclose(np.asarray(pdf)[ok], np.asarray(pdf2)[ok],
                               rtol=1e-4)
    resid = np.asarray(wt)[ok] * np.asarray(pdf)[ok, None] \
        - np.asarray(f)[ok]
    assert np.abs(resid).max() < 1e-3
    # energy: pass-through weight (1-op)/(1-lum) == 1 for gray opacity
    np.testing.assert_allclose(np.asarray(wt)[d], 1.0, rtol=1e-5)


def _coating_rows(kind, eta=1.5, sigma=0.0, alpha=0.1,
                  nested=(0.6, 0.45, 0.3)):
    b = SceneBuilder()
    i_nested = b.add_material(kind=R.DIFFUSE, diffuse=nested)
    b.add_material(kind=kind, eta=eta, alpha=alpha,
                   sigma_a=(sigma, sigma, sigma), mix_a=i_nested,
                   specular=(1.0, 1.0, 1.0))
    return b.materials


def test_coating_eta1_reduces_to_nested():
    """eta→1, σ=0: the layer vanishes; coated diffuse == plain diffuse."""
    rows = _coating_rows(R.COATING, eta=1.0001)
    table = _table(rows)
    n = 8
    mat_id = jnp.ones(n, jnp.int32)
    uv = jnp.zeros((n, 2), jnp.float32)
    gm = R.gather(table, None, mat_id, uv)
    wi = fixed_wi(n)
    wo = fixed_wi(n, 55.0, 110.0)
    kinds = (R.COATING, R.DIFFUSE)
    f, pdf = R.eval_pdf_mix(kinds, table, None, mat_id, uv, gm, wi, wo)
    expect = np.array([0.6, 0.45, 0.3]) / np.pi * float(wo[0, 2])
    np.testing.assert_allclose(np.asarray(f)[0], expect, rtol=2e-3)


def test_coating_absorption_darkens():
    f_vals = []
    for sigma in (0.0, 0.5, 2.0):
        rows = _coating_rows(R.COATING, sigma=sigma)
        table = _table(rows)
        n = 4
        mat_id = jnp.ones(n, jnp.int32)
        uv = jnp.zeros((n, 2), jnp.float32)
        gm = R.gather(table, None, mat_id, uv)
        f, _ = R.eval_pdf_mix((R.COATING, R.DIFFUSE), table, None, mat_id,
                              uv, gm, fixed_wi(n), fixed_wi(n, 30, 0))
        f_vals.append(float(np.asarray(f)[0].mean()))
    assert f_vals[0] > f_vals[1] > f_vals[2] > 0


def test_coating_sample_consistency():
    for kind in (R.COATING, R.ROUGHCOATING):
        rows = _coating_rows(kind, eta=1.5, sigma=0.2, alpha=0.15)
        table = _table(rows)
        n = 1 << 13
        mat_id = jnp.ones(n, jnp.int32)
        uv = jnp.zeros((n, 2), jnp.float32)
        gm = R.gather(table, None, mat_id, uv)
        wi = fixed_wi(n)
        kinds = (kind, R.DIFFUSE)
        ul, u2, u2b = _samples(n)
        wo, wt, pdf, is_delta, _ = R.sample_mix(
            kinds, table, None, mat_id, uv, gm, wi, ul, u2, u2b)
        f, pdf2 = R.eval_pdf_mix(kinds, table, None, mat_id, uv, gm, wi, wo)
        ok = ~np.asarray(is_delta) & (np.asarray(pdf) > 1e-5)
        assert ok.sum() > n // 4
        np.testing.assert_allclose(np.asarray(pdf)[ok], np.asarray(pdf2)[ok],
                                   rtol=2e-3, atol=1e-6)
        resid = np.asarray(wt)[ok] * np.asarray(pdf)[ok, None] \
            - np.asarray(f)[ok]
        assert np.abs(resid).max() < 2e-3, (kind, np.abs(resid).max())
        # smooth-coating lanes that chose specular are delta reflections
        d = np.asarray(is_delta)
        if kind == R.COATING and d.sum():
            wo_d = np.asarray(wo)[d]
            wi_d = np.asarray(wi)[d]
            np.testing.assert_allclose(wo_d[:, 2], wi_d[:, 2], atol=1e-6)
            np.testing.assert_allclose(wo_d[:, :2], -wi_d[:, :2], atol=1e-6)


def test_coating_albedo_matches_analytic_model():
    """Sampled albedo of a clear coat over white diffuse == the analytic
    single-scattering coating model: R12 + (1-R12)·E_cos[(1-R21)·1{¬TIR}].
    (The reference discards TIR'd nested samples — coating.cpp returns 0
    when R21 == 1 — so a clear coat over white diffuse loses exactly the
    TIR fraction; this checks we reproduce that, no more and no less.)"""
    eta = 1.5
    theta_i = 35.0
    rows = _coating_rows(R.COATING, eta=eta, sigma=0.0,
                         nested=(1.0, 1.0, 1.0))
    table = _table(rows)
    n = 1 << 16
    mat_id = jnp.ones(n, jnp.int32)
    uv = jnp.zeros((n, 2), jnp.float32)
    gm = R.gather(table, None, mat_id, uv)
    wi = fixed_wi(n, theta_i)
    kinds = (R.COATING, R.DIFFUSE)
    ul, u2, u2b = _samples(n)
    wo, wt, pdf, is_delta, _ = R.sample_mix(
        kinds, table, None, mat_id, uv, gm, wi, ul, u2, u2b)
    albedo = float(np.asarray(wt).mean(0).mean())

    # independent numpy oracle
    def fresnel(c, e):
        s2t = (1 - c * c) / (e * e)
        if s2t >= 1:
            return 1.0
        ct = np.sqrt(1 - s2t)
        rs = (c - e * ct) / (c + e * ct)
        rp = (e * c - ct) / (e * c + ct)
        return 0.5 * (rs * rs + rp * rp)

    r12 = fresnel(np.cos(np.radians(theta_i)), eta)
    m = 1 << 16
    u = (np.arange(m) + 0.5) / m
    cos_p = np.sqrt(1 - u)           # cosine-distributed θ' in the layer
    sin_p = np.sqrt(u)
    r21 = np.array([fresnel(c, 1 / eta) for c in cos_p])
    expect = r12 + (1 - r12) * np.mean(np.where(sin_p * eta < 1,
                                                1 - r21, 0.0))
    np.testing.assert_allclose(albedo, expect, rtol=0.02)


def test_normalmap_tilts_frame():
    """A constant normal map tilting +x must rotate the shading frame; an
    identity map (0.5,0.5,1) must leave it unchanged."""
    from hairpt.models.bsdf.registry import perturb_shading_frame
    b = SceneBuilder()
    flat = np.zeros((8, 8, 3), np.float32)
    flat[..., 0] = 0.5
    flat[..., 1] = 0.5
    flat[..., 2] = 1.0
    tilt = flat.copy()
    tilt[..., 0] = 0.5 + 0.25  # n_ts = (0.5, 0, sqrt-ish) after 2c-1
    t_flat = b.add_bitmap_texture(flat, res=8)
    t_tilt = b.add_bitmap_texture(tilt, res=8)
    b.add_material(kind=R.DIFFUSE, nrm_tex_id=t_flat, nrm_kind=0)
    b.add_material(kind=R.DIFFUSE, nrm_tex_id=t_tilt, nrm_kind=0)
    b.add_material(kind=R.DIFFUSE)  # no map
    from hairpt.film.film import Film
    from hairpt.models.sensors import Camera
    from hairpt.core.math import matrix_lookat
    from hairpt.models import shapes as shp
    b.add_mesh(shp.rectangle(), 0)
    cam = Camera.perspective(matrix_lookat((0, 0, -3), (0, 0, 0), (0, 1, 0)),
                             45.0, 8, 8)
    sc = b.build(cam, Film.make(8, 8, "box"), spp=1, max_depth=2)
    assert sc.has_normal_maps

    table = sc.arrays.materials
    tex = sc.arrays.checkers
    n = 3
    mat_id = jnp.asarray([0, 1, 2], jnp.int32)
    uv = jnp.full((n, 2), 0.5, jnp.float32)
    sh_n = jnp.broadcast_to(jnp.asarray([0., 0., 1.], jnp.float32), (n, 3))
    sh_s = jnp.broadcast_to(jnp.asarray([1., 0., 0.], jnp.float32), (n, 3))
    sh_t = jnp.broadcast_to(jnp.asarray([0., 1., 0.], jnp.float32), (n, 3))
    pn, ps, pt = perturb_shading_frame(table, tex, mat_id, uv,
                                       sh_n, sh_s, sh_t)
    pn, ps, pt = map(np.asarray, (pn, ps, pt))
    # identity map: unchanged (within bilinear noise)
    np.testing.assert_allclose(pn[0], [0, 0, 1], atol=1e-3)
    # tilted map: normal leans +x
    assert pn[1][0] > 0.3, pn[1]
    np.testing.assert_allclose(np.linalg.norm(pn[1]), 1.0, atol=1e-5)
    # orthonormal frame
    assert abs(np.dot(pn[1], ps[1])) < 1e-5
    assert abs(np.dot(pn[1], pt[1])) < 1e-5
    # unmapped lane untouched
    np.testing.assert_array_equal(pn[2], [0, 0, 1])


def test_hk_slab_consistency_and_limits():
    """Hanrahan-Krueger slab: sample/eval/pdf consistency; thick slab →
    no transmission; thin clear slab → mostly delta pass-through."""
    from hairpt.models.bsdf import hk as hk_mod  # registers HK
    n = 1 << 13
    gm = None
    from test_bsdf import make_gm, fixed_wi
    gm = make_gm(n, kind=R.HK, transmit=(2.0, 2.0, 2.0),
                 sigma_a=(0.1, 0.1, 0.1), alpha=1.0, beta_r=0.4)
    wi = fixed_wi(n)
    ul, u2, u2b = _samples(n)
    wo, wt, pdf, is_delta, _ = R.sample([R.HK], gm, wi, ul, u2, u2b)
    f, pdf2 = R.eval_pdf([R.HK], gm, wi, wo)
    ok = ~np.asarray(is_delta) & (np.asarray(pdf) > 1e-6)
    np.testing.assert_allclose(np.asarray(pdf)[ok], np.asarray(pdf2)[ok],
                               rtol=1e-3)
    resid = np.asarray(wt)[ok] * np.asarray(pdf)[ok, None] \
        - np.asarray(f)[ok]
    assert np.abs(resid).max() < 1e-3
    # delta lanes go straight through
    d = np.asarray(is_delta)
    np.testing.assert_allclose(np.asarray(wo)[d], -np.asarray(wi)[d],
                               atol=1e-6)
    # thick slab: transmission negligible
    gm_thick = make_gm(8, kind=R.HK, transmit=(5.0,) * 3,
                       sigma_a=(5.0,) * 3, alpha=10.0, beta_r=0.0)
    wo_t = -fixed_wi(8, 30.0)
    f_t, _ = R.eval_pdf([R.HK], gm_thick, fixed_wi(8, 30.0), wo_t)
    assert np.asarray(f_t).max() < 1e-4
    # nearly-clear slab: delta weight ≈ 1, single scattering tiny
    gm_thin = make_gm(8, kind=R.HK, transmit=(0.01,) * 3,
                      sigma_a=(0.0,) * 3, alpha=0.01, beta_r=0.0)
    p_s = np.asarray(hk_mod._p_spec(gm_thin, fixed_wi(8)))
    assert (p_s > 0.999).all()


# -- Bitmap::resample parity (bitmap.h:1040-1090) -------------------------

def test_resample_preserves_constants():
    from hairpt.utils.resample import resample
    img = np.full((33, 47, 3), 0.73, np.float32)
    for f in ("box", "tent", "gaussian", "mitchell", "lanczos"):
        for bnd in ("clamp", "wrap", "mirror"):
            out = np.asarray(resample(img, 64, 20, f, bnd))
            np.testing.assert_allclose(out, 0.73, atol=1e-4,
                                       err_msg=f"{f}/{bnd}")


def test_resample_linear_ramp_tent():
    """Tent upsampling reproduces a linear ramp exactly in the
    interior (linear interpolation reproduces affine functions)."""
    from hairpt.utils.resample import resample
    x = np.arange(32, dtype=np.float32)
    img = np.broadcast_to(x[None, :], (8, 32)).copy()
    out = np.asarray(resample(img, 64, 8, "tent", "clamp"))
    j = np.arange(64)
    expect = (j + 0.5) * 0.5 - 0.5
    inner = slice(4, 60)
    np.testing.assert_allclose(out[4, inner], expect[inner], atol=1e-3)


def test_resample_downsample_box_average():
    """2x box downsample = 2x2 mean."""
    from hairpt.utils.resample import resample
    rng = np.random.default_rng(0)
    img = rng.random((16, 16)).astype(np.float32)
    out = np.asarray(resample(img, 8, 8, "box"))
    expect = img.reshape(8, 2, 8, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_resample_auto_clamp_bounds_ringing():
    from hairpt.utils.resample import resample
    img = np.zeros((16, 16), np.float32)
    img[8:, :] = 1.0   # step edge → lanczos rings
    out = np.asarray(resample(img, 64, 64, "lanczos", clamp="auto"))
    assert out.min() >= 0.0 - 1e-6 and out.max() <= 1.0 + 1e-6
