"""Irawan woven-cloth BSDF (src/bsdfs/irawan.{h,cpp}) + procedural noise
(src/librender/noise.cpp, core/qmc.h sampleTEA)."""
import jax
import jax.numpy as jnp
import numpy as np

from hairpt.core import noise
from hairpt.models.bsdf import cloth as cb
from hairpt.models.bsdf import registry as R


# ---------------------------------------------------------------------------
# noise primitives
# ---------------------------------------------------------------------------

def test_tea_matches_reference_algorithm():
    """TEA hash equals a direct numpy implementation of qmc.h:146."""
    def tea_np(v0, v1, rounds=8):
        v0 = np.uint32(v0)
        v1 = np.uint32(v1)
        s = np.uint32(0)
        with np.errstate(over="ignore"):
            for _ in range(rounds):
                s = np.uint32(s + np.uint32(0x9e3779b9))
                v0 = np.uint32(v0 + (
                    np.uint32((np.uint32(v1 << np.uint32(4))
                               + np.uint32(0xA341316C)))
                    ^ np.uint32(v1 + s)
                    ^ np.uint32((v1 >> np.uint32(5))
                                + np.uint32(0xC8013EA4))))
                v1 = np.uint32(v1 + (
                    np.uint32((np.uint32(v0 << np.uint32(4))
                               + np.uint32(0xAD90777D)))
                    ^ np.uint32(v0 + s)
                    ^ np.uint32((v0 >> np.uint32(5))
                                + np.uint32(0x7E95761E))))
        return v0, v1

    rs = np.random.RandomState(3)
    a = rs.randint(0, 2 ** 31, 64).astype(np.uint32)
    b = rs.randint(0, 2 ** 31, 64).astype(np.uint32)
    lo, hi = noise.sample_tea(jnp.asarray(a), jnp.asarray(b), 8)
    for i in range(64):
        l_np, h_np = tea_np(a[i], b[i])
        assert np.uint32(lo[i]) == l_np
        assert np.uint32(hi[i]) == h_np
    f = np.asarray(noise.sample_tea_float(jnp.asarray(a), jnp.asarray(b), 8))
    assert np.all((f >= 0.0) & (f < 1.0))
    assert f.std() > 0.2  # roughly uniform


def test_perlin_properties():
    """Improved Perlin noise: zero on the integer lattice, bounded,
    smooth, non-constant."""
    pts_int = jnp.asarray(np.random.RandomState(0)
                          .randint(-8, 8, (32, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(noise.perlin(pts_int)), 0.0,
                               atol=1e-6)
    pts = jnp.asarray(np.random.RandomState(1).rand(512, 3) * 16 - 8,
                      jnp.float32)
    v = np.asarray(noise.perlin(pts))
    assert np.all(np.abs(v) <= 1.2)
    assert v.std() > 0.05
    # fbm accumulates octaves
    w = np.asarray(noise.fbm(pts, octaves=4))
    assert np.all(np.isfinite(w))


# ---------------------------------------------------------------------------
# weave DSL parser
# ---------------------------------------------------------------------------

def test_parse_weave_dsl():
    txt = """
    /* a comment */
    weave {
      name = "test",
      tileWidth = 2, tileHeight = 2,
      alpha = $myalpha, beta = 4.0, ss = 0.1, hWidth = 0.6,
      warpArea = 2.0, weftArea = 1.0,
      dWarpUmaxOverDWarp = 18.0,
      fineness = 2.0, period = 3.0,
      pattern { 1, 2, 2, 1 },
      yarn { type = warp, psi = 45, umax = 60, kappa = 1.0,
             width = 1.0, length = 3.0, centerU = 0.5, centerV = 0.5,
             kd = {0.2, 0.3, 0.4}, ks = $myks },
      yarn { type = weft, umax = 50, width = 1.0, length = 3.0,
             centerU = 0.5, centerV = 0.5,
             kd = {0.5, 0.5, 0.5}, ks = {0.1, 0.1, 0.1} }
    }
    """
    wp = cb.parse_weave(txt, {"myalpha": 0.25, "myks": (0.9, 0.8, 0.7)})
    assert wp.tile_width == 2 and wp.tile_height == 2
    assert wp.alpha == 0.25
    assert wp.pattern == [1, 2, 2, 1]
    assert len(wp.yarns) == 2
    np.testing.assert_allclose(wp.yarns[0]["psi"], np.pi / 4, rtol=1e-6)
    np.testing.assert_allclose(wp.yarns[0]["umax"], np.pi / 3, rtol=1e-6)
    np.testing.assert_allclose(wp.d_warp_umax_over_d_warp,
                               18 * np.pi / 180, rtol=1e-6)
    assert wp.yarns[0]["kd"] == (0.2, 0.3, 0.4)
    assert wp.yarns[0]["ks"] == (0.9, 0.8, 0.7)
    assert wp.yarns[1]["type"] == 1


# ---------------------------------------------------------------------------
# the BRDF itself
# ---------------------------------------------------------------------------

def _cloth_setup(name="plain", repeat=(3.0, 3.0)):
    wp = cb.parse_weave(cb.BUILTIN_WEAVES[name])
    ct = cb.pack_cloth([wp], [repeat])
    rows = [R.default_material_row(kind=R.CLOTH, aux_id=0,
                                   transmit=(wp.alpha, wp.beta, wp.ss),
                                   k=(wp.h_width, 0, 0))]
    return wp, R.pack_materials(rows, cloth=ct)


def test_cloth_eval_energy_and_sides():
    """eval >= 0, finite, front-side only; average reflectance under
    cosine sampling bounded by kd + ks (the MC normalization calibrates
    the specular term to ks on average, irawan.cpp:147-171)."""
    wp, table = _cloth_setup()
    rs = np.random.RandomState(0)
    n = 8192
    uv = jnp.asarray(rs.rand(n, 2), jnp.float32)
    gm = R.gather(table, None, jnp.zeros(n, jnp.int32), uv)
    wi = jnp.asarray(cb._cosine_dirs(rs, n))
    wo = jnp.asarray(cb._cosine_dirs(rs, n))
    f, pdf = jax.jit(R.FAMILIES[R.CLOTH].eval_pdf,
                     static_argnums=3)(gm, wi, wo, None)
    f = np.asarray(f)
    assert np.all(np.isfinite(f)) and np.all(f >= 0)
    avg = (f / np.maximum(np.asarray(pdf)[:, None], 1e-9)).mean(axis=0)
    kd = np.asarray(wp.yarns[0]["kd"])
    ks = np.asarray(wp.yarns[0]["ks"])
    assert np.all(avg > 0.3 * kd)
    assert np.all(avg < 1.5 * (kd + ks))
    # back side is black
    f_b, pdf_b = R.FAMILIES[R.CLOTH].eval_pdf(
        gm, wi, wo.at[:, 2].multiply(-1.0), None)
    assert float(jnp.max(f_b)) == 0.0
    assert float(jnp.max(pdf_b)) == 0.0


def test_cloth_spatial_variation_and_weft():
    """Different uv cells resolve to different yarns (twill has distinct
    warp/weft colors); the weave repeats with repeatU/repeatV."""
    wp = cb.parse_weave(cb.BUILTIN_WEAVES["twill"])
    ct = cb.pack_cloth([wp], [(1.0, 1.0)])
    n = 1024
    rs = np.random.RandomState(1)
    uv = jnp.asarray(rs.rand(n, 2), jnp.float32)
    res = cb.cloth_resolve(ct, jnp.zeros(n, jnp.int32), uv)
    kd = np.asarray(res["kd"])
    # both yarn colors appear
    assert (np.abs(kd - np.asarray(wp.yarns[0]["kd"])).sum(1) < 1e-5).any()
    assert (np.abs(kd - np.asarray(wp.yarns[1]["kd"])).sum(1) < 1e-5).any()
    wef = np.asarray(res["is_weft"])
    assert wef.any() and (~wef).any()
    # periodicity: uv and uv + 1 tile resolve identically
    uv2 = uv + jnp.asarray([1.0, 0.0])[None, :] \
        / jnp.asarray([1.0, 1.0])[None, :]
    # repeatU=1 so +1 in u is tile_w cells -> same lattice cell modulo
    res2 = cb.cloth_resolve(ct, jnp.zeros(n, jnp.int32), uv2)
    np.testing.assert_allclose(np.asarray(res2["kd"]), kd, atol=1e-5)


def test_cloth_sample_weight_consistency():
    """sample() returns unit wo in the upper hemisphere with weight =
    f/pdf of the same direction."""
    wp, table = _cloth_setup("twill")
    rs = np.random.RandomState(2)
    n = 2048
    uv = jnp.asarray(rs.rand(n, 2), jnp.float32)
    gm = R.gather(table, None, jnp.zeros(n, jnp.int32), uv)
    wi = jnp.asarray(cb._cosine_dirs(rs, n))
    u2 = jnp.asarray(rs.rand(n, 2), jnp.float32)
    wo, w, pdf, is_d, eta = R.FAMILIES[R.CLOTH].sample(
        gm, wi, jnp.zeros(n), u2, u2, None)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(wo, axis=-1)),
                               1.0, atol=1e-5)
    assert np.all(np.asarray(wo)[:, 2] >= 0)
    f, p2 = R.FAMILIES[R.CLOTH].eval_pdf(gm, wi, wo, None)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(p2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(w), np.asarray(f) / np.maximum(np.asarray(p2)[:, None],
                                                  1e-9), rtol=1e-4)
    assert not np.asarray(is_d).any()


def test_cloth_noise_paths():
    """period/fineness > 0 activate the correlated umax noise and the
    per-point intensity variation — outputs stay finite and vary."""
    wp = cb.parse_weave(cb.BUILTIN_WEAVES["plain"])
    wp.period = 2.0
    wp.fineness = 3.0
    wp.d_warp_umax_over_d_warp = 10 * np.pi / 180
    wp.d_weft_umax_over_d_weft = 10 * np.pi / 180
    ct = cb.pack_cloth([wp], [(4.0, 4.0)])
    n = 4096
    rs = np.random.RandomState(3)
    uv = jnp.asarray(rs.rand(n, 2), jnp.float32)
    res = cb.cloth_resolve(ct, jnp.zeros(n, jnp.int32), uv)
    umax = np.asarray(res["umax"])
    assert np.all(np.isfinite(umax))
    assert umax.std() > 1e-4          # noise varies per yarn segment
    ks = np.asarray(res["ks"])
    assert np.all(np.isfinite(ks))
    assert ks.std() > 1e-4            # intensity variation active


def test_cloth_in_xml_scene():
    """<bsdf type="irawan"> loads through the XML path and renders."""
    import os
    import tempfile
    from hairpt.scene import xml_loader
    from hairpt.integrators import aux_integrators

    xml = """<scene version="0.5.0">
      <integrator type="direct"/>
      <sensor type="perspective">
        <float name="fov" value="45"/>
        <transform name="toWorld">
          <lookat origin="0, 0, 3" target="0, 0, 0" up="0, 1, 0"/>
        </transform>
        <film type="ldrfilm">
          <integer name="width" value="24"/>
          <integer name="height" value="24"/>
        </film>
        <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
      </sensor>
      <emitter type="constant"><spectrum name="radiance" value="1.0"/></emitter>
      <shape type="rectangle">
        <bsdf type="irawan">
          <string name="filename" value="plain"/>
          <float name="repeatU" value="4"/>
          <float name="repeatV" value="4"/>
        </bsdf>
      </shape>
    </scene>"""
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "scene.xml")
        with open(path, "w") as fh:
            fh.write(xml)
        scene = xml_loader.load_scene(path)
    assert R.CLOTH in scene.active_kinds
    img = aux_integrators.render_direct(scene)
    img = np.asarray(img)
    assert np.all(np.isfinite(img))
    assert img.mean() > 0.01   # lit cloth is not black
