"""EWA anisotropic texture filtering (models/bsdf/registry.ewa_eval_bitmap)
— parity target: include/mitsuba/render/mipmap.h evalEWA. The defining
property: an anisotropic footprint filters ALONG its major axis only —
stretching along the stripes of a stripe texture keeps them sharp, while
stretching across them averages to the stripe mean. Isotropic trilinear
at the same (major-axis) level blurs both."""
import numpy as np
import jax.numpy as jnp

from hairpt.models.bsdf import registry as mat
from hairpt.scene.scene import _build_mips


def _stripe_table(R=64, period=8):
    """One bitmap texture: vertical stripes along u (value depends on x
    only), with the mip pyramid."""
    x = np.arange(R)
    stripe = ((x // (period // 2)) % 2).astype(np.float32)
    bm = np.broadcast_to(stripe[None, :, None], (R, R, 3)).copy()
    bitmaps = bm[None]                       # [1, R, R, 3]
    return mat.CheckerboardTable(
        kind=jnp.asarray([1], jnp.int32),
        color0=jnp.zeros((1, 3)), color1=jnp.ones((1, 3)),
        uv_scale=jnp.ones((1, 2)), uv_offset=jnp.zeros((1, 2)),
        bitmaps=jnp.asarray(bitmaps),
        aux=jnp.zeros((1,)),
        mips=jnp.asarray(_build_mips(bitmaps, levels=5)))


def test_ewa_anisotropy_preserves_detail_along_stripes():
    tex = _stripe_table()
    n = 8
    tid = jnp.zeros((n,), jnp.int32)
    # points at stripe centers: u such that the texel column is solidly
    # 1 (x = 2..3 of each period-8 block -> value 1)
    su = (6.5 + 8.0 * jnp.arange(n, dtype=jnp.float32)) / 64.0 % 1.0
    sv = jnp.linspace(0.1, 0.9, n)
    big = 16.0 / 64.0     # 16-texel major axis
    tiny = 1.0 / 64.0

    # major axis ALONG the stripes (v): detail along u must survive
    ewa_v = mat.ewa_eval_bitmap(tex, tid, su, sv,
                                jnp.stack([jnp.full((n,), tiny),
                                           jnp.zeros((n,))], -1),
                                jnp.stack([jnp.zeros((n,)),
                                           jnp.full((n,), big)], -1))
    assert float(jnp.min(ewa_v[..., 0])) > 0.85, np.asarray(ewa_v[..., 0])

    # major axis ACROSS the stripes (u), spanning 2 periods: averages
    # to the stripe mean 0.5
    ewa_u = mat.ewa_eval_bitmap(tex, tid, su, sv,
                                jnp.stack([jnp.full((n,), big),
                                           jnp.zeros((n,))], -1),
                                jnp.stack([jnp.zeros((n,)),
                                           jnp.full((n,), tiny)], -1))
    assert np.allclose(np.asarray(ewa_u[..., 0]), 0.5, atol=0.15), \
        np.asarray(ewa_u[..., 0])

    # isotropic trilinear at the major-axis level blurs BOTH directions
    # (the shimmer-vs-blur tradeoff EWA removes): along-stripe lanes
    # lose their detail under it
    lvl = jnp.full((n,), 4, jnp.int32)    # 16-texel box level
    tri = mat._bilinear_mip(tex, tid, su, sv, lvl)
    assert float(jnp.max(tri[..., 0])) < 0.75


def test_ewa_isotropic_matches_trilinear_scale():
    """A circular footprint must reproduce the right mip level: one-texel
    footprint = sharp base level; 8-texel footprint ~ level-3 average."""
    tex = _stripe_table()
    n = 4
    tid = jnp.zeros((n,), jnp.int32)
    su = jnp.full((n,), 6.5 / 64.0)
    sv = jnp.full((n,), 0.5)
    one = 1.0 / 64.0
    ewa_sharp = mat.ewa_eval_bitmap(
        tex, tid, su, sv,
        jnp.stack([jnp.full((n,), one), jnp.zeros((n,))], -1),
        jnp.stack([jnp.zeros((n,)), jnp.full((n,), one)], -1))
    assert float(jnp.min(ewa_sharp[..., 0])) > 0.85
    eight = 8.0 / 64.0
    ewa_blur = mat.ewa_eval_bitmap(
        tex, tid, su, sv,
        jnp.stack([jnp.full((n,), eight), jnp.zeros((n,))], -1),
        jnp.stack([jnp.zeros((n,)), jnp.full((n,), eight)], -1))
    assert np.allclose(np.asarray(ewa_blur[..., 0]), 0.5, atol=0.2)


def test_eval_checkerboard_duv_fallback():
    """Zero-Jacobian lanes under the duv path must reproduce the
    trilinear result exactly (bounce/hair lanes)."""
    tex = _stripe_table()
    n = 16
    tid = jnp.zeros((n,), jnp.int32)
    uv = jnp.stack([jnp.linspace(0.05, 0.95, n),
                    jnp.linspace(0.1, 0.9, n)], -1)
    base = jnp.zeros((n, 3))
    lod = jnp.full((n,), 1.5)
    v_plain = mat.eval_checkerboard(tex, tid, uv, base, lod=lod)
    z2 = jnp.zeros((n, 2))
    v_duv = mat.eval_checkerboard(tex, tid, uv, base, lod=lod,
                                  duv=(z2, z2))
    np.testing.assert_allclose(np.asarray(v_plain), np.asarray(v_duv),
                               rtol=1e-6, atol=1e-7)
