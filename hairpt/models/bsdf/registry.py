"""Switch-free BSDF dispatch over material tables.

TPU-native replacement for the reference's virtual-dispatch plugin BSDFs
(include/mitsuba/render/bsdf.h:215 + dlopened src/bsdfs/*.cpp): materials
live in SoA tables; a shading wavefront gathers its per-lane parameters and
every BSDF *family present in the scene* is evaluated branchlessly on the
VPU, lane-selected by the material `kind`. Families absent from a scene are
skipped at trace time (static python set), so a hair-only scene compiles
hair-only shading code.

Conventions (identical to the reference, bsdf.h:40 BSDFSamplingRecord):
- wi, wo in the local shading frame, +z = shading normal
- `eval` returns f(wi,wo)·|cosθo| in the solid-angle measure, smooth
  components only (delta lobes contribute 0 to `eval`/`pdf`)
- `sample` returns (wo, weight = f·cos/pdf, pdf, is_delta, eta_scale)
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

# family ids (values are baked into scene material tables)
DIFFUSE = 0
ROUGHDIFFUSE = 1
CONDUCTOR = 2
ROUGHCONDUCTOR = 3
DIELECTRIC = 4
THINDIELECTRIC = 5
ROUGHDIELECTRIC = 6
PLASTIC = 7
ROUGHPLASTIC = 8
PHONG = 9
WARD = 10
NULL = 11
KAJIYAKAY = 12
MARSCHNER = 13          # = the fork's MarschnerDiffuse ("marschner" plugin)
MARSCHNERDIELECTRIC = 14
MASK = 15
DIFFTRANS = 16
MIXTURE = 17
COATING = 18
ROUGHCOATING = 19
DIPOLE = 20   # subsurface dipole BSSRDF — resolved at the integrator level
              # (src/subsurface/dipole.cpp); params: transmit=σs',
              # sigma_a=σa, eta, mix_w=density scale
HK = 21       # Hanrahan-Krueger slab (src/bsdfs/hk.cpp)
CLOTH = 22    # Irawan & Marschner woven cloth (src/bsdfs/irawan.cpp);
              # weave data in MaterialTable.cloth, resolved in gather()
MARSCHNER_PURE = 23  # corrected-mode Marschner (true 3-lobe mixture pdf,
                     # fresh per-decision samples, MIS-compatible) — the
                     # default for the "marschner" plugin name; the quirky
                     # MarschnerDiffuse behavior stays at MARSCHNER

# wrapper kinds modify/combine a nested material row (mix_a, mix_b)
WRAPPER_KINDS = (MIXTURE, MASK, COATING, ROUGHCOATING)

_LUM = np.array([0.212671, 0.715160, 0.072169], np.float32)

N_COS = 64  # resolution of the per-material external-transmittance slice


class MaterialTable(NamedTuple):
    """SoA material parameters, [M] leading axis."""
    kind: jnp.ndarray        # [M] int32 family id
    twosided: jnp.ndarray    # [M] bool — flip wi.z < 0 hemispheres
    diffuse: jnp.ndarray     # [M, 3]
    specular: jnp.ndarray    # [M, 3]
    transmit: jnp.ndarray    # [M, 3]
    exponent: jnp.ndarray    # [M]
    alpha: jnp.ndarray       # [M] microfacet roughness
    dist: jnp.ndarray        # [M] 0=ggx 1=beckmann
    eta: jnp.ndarray         # [M] int_ior/ext_ior
    k: jnp.ndarray           # [M, 3] conductor absorption
    nonlinear: jnp.ndarray   # [M] bool
    spec_weight: jnp.ndarray  # [M] specularSamplingWeight
    ext_trans: jnp.ndarray   # [M, N_COS] T12(cosθ) slice at this alpha/eta
    int_fdr: jnp.ndarray     # [M] internal diffuse Fresnel reflectance
    sigma_a: jnp.ndarray     # [M, 3] hair absorption
    beta_r: jnp.ndarray      # [M] hair longitudinal roughness
    scale_tilt: jnp.ndarray  # [M] hair scale tilt (radians)
    aux_id: jnp.ndarray      # [M] index into hair azimuthal stacks (-1 none)
    tex_id: jnp.ndarray      # [M] index into checkerboard table (-1 none)
    mix_a: jnp.ndarray       # [M] first sub-material row (MIXTURE only)
    mix_b: jnp.ndarray       # [M] second sub-material row
    mix_w: jnp.ndarray       # [M] weight of mix_a
    nrm_tex_id: jnp.ndarray  # [M] normal/bump texture (-1 none)
    nrm_kind: jnp.ndarray    # [M] 0 = normalmap (rgb), 1 = bumpmap (height)
    nrm_scale: jnp.ndarray   # [M] bump height scale
    cloth: object = None     # Optional[cloth.ClothTable]; aux_id of CLOTH
                             # rows indexes its patterns


class CheckerboardTable(NamedTuple):
    """Texture table: procedural checkerboards + bitmaps resampled to a
    common resolution (reference: src/textures/{checkerboard,bitmap}.cpp;
    trilinear mipmapping is a roadmap item — bilinear at a fixed resolution
    here)."""
    kind: jnp.ndarray    # [T] 0 = checker, 1 = bitmap, 2 = grid,
                         #     3 = wireframe (bary), 4 = vertexcolors
    color0: jnp.ndarray  # [T, 3]
    color1: jnp.ndarray  # [T, 3]
    uv_scale: jnp.ndarray   # [T, 2]
    uv_offset: jnp.ndarray  # [T, 2]
    bitmaps: jnp.ndarray    # [T, R, R, 3] (zeros for checkers)
    aux: jnp.ndarray        # [T] grid lineWidth / spare parameter
    mips: jnp.ndarray       # [T, L, R, R, 3] pre-blurred pyramid (level k
                            # = 2^k box filter, stored at full R) or
                            # zeros-shaped [T, 0, ...] when unused


class HairTables(NamedTuple):
    """Stacked Marschner azimuthal tables, [K] hair materials
    (reference: marschner_diffuse.cpp precomputeAzimuthalDistributions)."""
    values: jnp.ndarray    # [K, 3(lobe R/TT/TRT), 64(cosθd), 64(phi), 3(rgb)]
    weights: jnp.ndarray   # [K, 3, 64, 64] dilated max-weights for sampling
    lobe_weight: jnp.ndarray  # [K, 3, 64] ∫N dφ per cosθd row
    values_quad: jnp.ndarray = None  # [K, 63, 63, 3, 4, 3] 2×2 bilinear
    #                          quads (hair.quad_pack): one block gather
    #                          per lane replaces 12 texel gathers


class GatheredMat(NamedTuple):
    """Per-lane material parameters after the gather + texture eval."""
    kind: jnp.ndarray
    diffuse: jnp.ndarray    # texture-resolved rgb
    specular: jnp.ndarray
    transmit: jnp.ndarray
    exponent: jnp.ndarray
    alpha: jnp.ndarray
    dist: jnp.ndarray
    eta: jnp.ndarray
    k: jnp.ndarray
    nonlinear: jnp.ndarray
    spec_weight: jnp.ndarray
    ext_trans: jnp.ndarray  # [N, N_COS]
    int_fdr: jnp.ndarray
    sigma_a: jnp.ndarray
    beta_r: jnp.ndarray
    scale_tilt: jnp.ndarray
    aux_id: jnp.ndarray


def default_material_row(**over):
    row = dict(kind=DIFFUSE, twosided=False, diffuse=(0.5, 0.5, 0.5),
               specular=(1.0, 1.0, 1.0), transmit=(1.0, 1.0, 1.0),
               exponent=30.0, alpha=0.1, dist=0, eta=1.5,
               k=(1.0, 1.0, 1.0), nonlinear=False, spec_weight=0.5,
               ext_trans=np.ones(N_COS), int_fdr=0.0,
               sigma_a=(0.5, 0.5, 0.5), beta_r=0.1, scale_tilt=-0.1,
               aux_id=-1, tex_id=-1, mix_a=0, mix_b=0, mix_w=0.5,
               nrm_tex_id=-1, nrm_kind=0, nrm_scale=1.0)
    row.update(over)
    return row


def pack_materials(rows, cloth=None) -> MaterialTable:
    def arr(key, dtype=np.float32):
        return jnp.asarray(np.array([r[key] for r in rows], dtype=dtype))
    return MaterialTable(
        cloth=cloth,
        kind=arr("kind", np.int32), twosided=arr("twosided", bool),
        diffuse=arr("diffuse"), specular=arr("specular"),
        transmit=arr("transmit"), exponent=arr("exponent"),
        alpha=arr("alpha"), dist=arr("dist", np.int32), eta=arr("eta"),
        k=arr("k"), nonlinear=arr("nonlinear", bool),
        spec_weight=arr("spec_weight"),
        ext_trans=arr("ext_trans"), int_fdr=arr("int_fdr"),
        sigma_a=arr("sigma_a"), beta_r=arr("beta_r"),
        scale_tilt=arr("scale_tilt"), aux_id=arr("aux_id", np.int32),
        tex_id=arr("tex_id", np.int32), mix_a=arr("mix_a", np.int32),
        mix_b=arr("mix_b", np.int32), mix_w=arr("mix_w"),
        nrm_tex_id=arr("nrm_tex_id", np.int32),
        nrm_kind=arr("nrm_kind", np.int32), nrm_scale=arr("nrm_scale"))


def _bilinear_mip(tex: CheckerboardTable, tid, su, sv, level_idx):
    """Bilinear lookup in mip level `level_idx` [N] of texture `tid` [N]
    at scaled-uv (su, sv) [N] (repeat wrap, v flipped)."""
    r = tex.bitmaps.shape[1]
    fu = jnp.mod(su, 1.0) * r - 0.5
    fv = jnp.mod(1.0 - jnp.mod(sv, 1.0), 1.0) * r - 0.5
    x0 = jnp.floor(fu).astype(jnp.int32)
    y0 = jnp.floor(fv).astype(jnp.int32)
    wx = (fu - x0)[..., None]
    wy = (fv - y0)[..., None]
    x0m = jnp.mod(x0, r); x1m = jnp.mod(x0 + 1, r)
    y0m = jnp.mod(y0, r); y1m = jnp.mod(y0 + 1, r)
    bm_l = tex.mips[tid, level_idx]
    lanes = jnp.arange(bm_l.shape[0])
    return ((bm_l[lanes, y0m, x0m] * (1 - wx)
             + bm_l[lanes, y0m, x1m] * wx) * (1 - wy)
            + (bm_l[lanes, y1m, x0m] * (1 - wx)
               + bm_l[lanes, y1m, x1m] * wx) * wy)


def ewa_eval_bitmap(tex: CheckerboardTable, tid, su, sv, duv_dx, duv_dy,
                    n_probes: int = 7, max_aniso: float | None = None):
    """Anisotropic elliptical filtering of the bitmap pyramid — the
    vector-architecture form of the reference's EWA
    (include/mitsuba/render/mipmap.h evalEWA): instead of rasterizing a
    dynamic texel bounding box (data-dependent loop, hostile to XLA),
    the footprint ellipse (image of the pixel under the uv Jacobian
    [duv_dx | duv_dy], in SCALED-uv units) is integrated by a STATIC set
    of Gaussian-weighted trilinear probes spaced along its major axis at
    the mip level matching the minor axis — McCormack et al.'s Feline
    construction, the standard bounded-cost EWA approximation. Per-lane
    Jacobians, fully batched; cost = n_probes x 2 bilinear mip reads.

    max_aniso defaults to (n_probes+1)/2 — the largest ratio the probe
    set can cover WITHOUT gaps (probe spacing <= minor-axis filter
    radius); beyond it the minor axis widens, exactly the hardware
    'max anisotropy' clamp semantics."""
    if max_aniso is None:
        max_aniso = (n_probes + 1) / 2.0
    r = tex.bitmaps.shape[1]
    L = tex.mips.shape[1]
    # Jacobian in texel units
    a = duv_dx[..., 0] * r
    c = duv_dx[..., 1] * r
    b = duv_dy[..., 0] * r
    d = duv_dy[..., 1] * r
    # principal axes of the footprint ellipse = eigen-structure of A Aᵀ
    m00 = a * a + b * b
    m11 = c * c + d * d
    m01 = a * c + b * d
    tr = m00 + m11
    diff = jnp.sqrt(jnp.maximum((m00 - m11) ** 2 + 4 * m01 * m01, 0.0))
    s_major = jnp.sqrt(jnp.maximum(0.5 * (tr + diff), 1e-12))
    s_minor = jnp.sqrt(jnp.maximum(0.5 * (tr - diff), 0.0))
    # clamp: minor >= major/max_aniso (bounds probe count error) and
    # >= 1 texel (bilinear handles sub-texel)
    s_minor = jnp.maximum(jnp.maximum(s_minor, s_major / max_aniso), 1.0)
    s_major = jnp.maximum(s_major, s_minor)
    theta = 0.5 * jnp.arctan2(2 * m01, m00 - m11)
    maj_u = jnp.cos(theta) / r       # major-axis direction, uv units
    maj_v = jnp.sin(theta) / r
    lvl = jnp.clip(jnp.log2(s_minor), 0.0, L - 1.001)
    l0 = jnp.floor(lvl).astype(jnp.int32)
    fl = (lvl - l0)[..., None]
    l1 = jnp.minimum(l0 + 1, L - 1)

    # probes along the major line, length 2*(major - minor), Gaussian
    # weighted (alpha=2 as in Feline); n_probes=1 degenerates to
    # trilinear at the minor-axis level
    half = jnp.maximum(s_major - s_minor, 0.0)
    acc = jnp.zeros(su.shape + (3,), jnp.float32)
    wsum = jnp.zeros(su.shape + (1,), jnp.float32)
    for i in range(n_probes):
        u_i = (2.0 * i / max(n_probes - 1, 1) - 1.0) if n_probes > 1 \
            else 0.0
        w = jnp.exp(jnp.float32(-2.0 * u_i * u_i))[None] \
            * jnp.ones_like(su)[..., None]
        off = half * u_i
        pu = su + maj_u * off
        pv = sv + maj_v * off
        v0 = _bilinear_mip(tex, tid, pu, pv, l0)
        v1 = _bilinear_mip(tex, tid, pu, pv, l1)
        acc = acc + w * (v0 * (1 - fl) + v1 * fl)
        wsum = wsum + w
    return acc / wsum


def eval_checkerboard(tex: CheckerboardTable, tex_id, uv, base,
                      lod=None, bary=None, vcolor=None, duv=None):
    """Resolve textured reflectance; lanes with tex_id < 0 keep `base`.

    duv: optional (duv_dx [N,2], duv_dy [N,2]) uv-space pixel-footprint
    Jacobian (UNscaled uv units) — enables anisotropic EWA filtering of
    bitmap lanes (mipmap.h parity); scalar `lod` remains the isotropic
    fallback."""
    if tex is None:
        return base
    tid = jnp.maximum(tex_id, 0)
    scale = tex.uv_scale[tid]
    off = tex.uv_offset[tid]
    su = uv[..., 0] * scale[..., 0] + off[..., 0]
    sv = uv[..., 1] * scale[..., 1] + off[..., 1]
    # checkerboard (reference: src/textures/checkerboard.cpp:66-74 —
    # 2×2 tiles per scaled-uv unit, TRUNCATED int conversion, same
    # parity → color0)
    x = jnp.trunc(su * 2.0).astype(jnp.int32) % 2
    y = jnp.trunc(sv * 2.0).astype(jnp.int32) % 2
    par = x == y
    val_ck = jnp.where(par[..., None], tex.color0[tid], tex.color1[tid])
    # bitmap (bilinear, repeat wrap; v flipped as in the reference)
    r = tex.bitmaps.shape[1]
    fu = jnp.mod(su, 1.0) * r - 0.5
    fv = jnp.mod(1.0 - jnp.mod(sv, 1.0), 1.0) * r - 0.5
    x0 = jnp.floor(fu).astype(jnp.int32)
    y0 = jnp.floor(fv).astype(jnp.int32)
    wx = (fu - x0)[..., None]
    wy = (fv - y0)[..., None]
    x0m = jnp.mod(x0, r); x1m = jnp.mod(x0 + 1, r)
    y0m = jnp.mod(y0, r); y1m = jnp.mod(y0 + 1, r)
    bm = tex.bitmaps
    val_bm = ((bm[tid, y0m, x0m] * (1 - wx) + bm[tid, y0m, x1m] * wx)
              * (1 - wy)
              + (bm[tid, y1m, x0m] * (1 - wx) + bm[tid, y1m, x1m] * wx)
              * wy)
    val = jnp.where((tex.kind[tid] == 1)[..., None], val_bm, val_ck)
    # trilinear mipmap lookup for bitmap lanes when a footprint is given
    # (reference: src/textures/bitmap.cpp EWA/trilinear via mipmap.h)
    if lod is not None and tex.mips.shape[1] > 0:
        L = tex.mips.shape[1]
        lvl = jnp.clip(lod, 0.0, L - 1.001)
        l0 = jnp.floor(lvl).astype(jnp.int32)
        fl = (lvl - l0)[..., None]

        def bil(level_idx):
            bm_l = tex.mips[tid, level_idx]
            return ((bm_l[jnp.arange(bm_l.shape[0]), y0m, x0m] * (1 - wx)
                     + bm_l[jnp.arange(bm_l.shape[0]), y0m, x1m] * wx)
                    * (1 - wy)
                    + (bm_l[jnp.arange(bm_l.shape[0]), y1m, x0m] * (1 - wx)
                       + bm_l[jnp.arange(bm_l.shape[0]), y1m, x1m] * wx)
                    * wy)

        v0 = bil(l0)
        v1 = bil(jnp.minimum(l0 + 1, L - 1))
        val_bm = v0 * (1 - fl) + v1 * fl
        if duv is not None:
            # anisotropic EWA where a true footprint Jacobian is available
            # (zero-Jacobian lanes keep the trilinear value)
            sc_dx = duv[0] * scale
            sc_dy = duv[1] * scale
            has_j = (jnp.sum(jnp.abs(sc_dx), -1)
                     + jnp.sum(jnp.abs(sc_dy), -1)) > 0
            # whole-wave gate: bounce waves (depth >= 2) thread
            # all-zero Jacobians, so the 7-probe EWA gathers would be
            # ~14 dead texture reads per lane every bounce — lax.cond
            # skips them at runtime when no lane has a footprint
            # (ADVICE r3; XLA cannot elide a jnp.where branch)
            val_bm = jax.lax.cond(
                jnp.any(has_j),
                lambda: jnp.where(
                    has_j[..., None],
                    ewa_eval_bitmap(tex, tid, su, sv, sc_dx, sc_dy),
                    val_bm),
                lambda: val_bm)
        val = jnp.where((tex.kind[tid] == 1)[..., None], val_bm, val)
    # gridtexture (src/textures/gridtexture.cpp): color1 lines of width
    # `lineWidth` along integer cell borders, color0 inside cells
    lw = tex.aux[tid] * 0.5
    fu = jnp.mod(su, 1.0)
    fv = jnp.mod(sv, 1.0)
    on_line = (jnp.minimum(fu, 1.0 - fu) < lw) \
        | (jnp.minimum(fv, 1.0 - fv) < lw)
    val_gr = jnp.where(on_line[..., None], tex.color1[tid], tex.color0[tid])
    val = jnp.where((tex.kind[tid] == 2)[..., None], val_gr, val)
    # wireframe (src/textures/wireframe.cpp): color1 near triangle edges
    if bary is not None:
        b1 = bary[..., 0]
        b2 = bary[..., 1]
        b0 = 1.0 - b1 - b2
        edge = jnp.minimum(jnp.minimum(b0, b1), b2) < tex.aux[tid]
        val_wf = jnp.where(edge[..., None], tex.color1[tid],
                           tex.color0[tid])
        val = jnp.where((tex.kind[tid] == 3)[..., None], val_wf, val)
    # vertexcolors / curvature (src/textures/{vertexcolors,curvature}.cpp)
    if vcolor is not None:
        val = jnp.where((tex.kind[tid] == 4)[..., None], vcolor, val)
    return jnp.where((tex_id >= 0)[..., None], val, base)


def gather(table: MaterialTable, tex: Optional[CheckerboardTable],
           mat_id, uv, lod=None, bary=None, vcolor=None,
           duv=None) -> GatheredMat:
    m = jnp.maximum(mat_id, 0)
    diffuse = table.diffuse[m]
    diffuse = eval_checkerboard(tex, table.tex_id[m], uv, diffuse, lod,
                                bary, vcolor, duv)
    gm = GatheredMat(
        kind=table.kind[m], diffuse=diffuse, specular=table.specular[m],
        transmit=table.transmit[m], exponent=table.exponent[m],
        alpha=table.alpha[m], dist=table.dist[m], eta=table.eta[m],
        k=table.k[m], nonlinear=table.nonlinear[m],
        spec_weight=table.spec_weight[m], ext_trans=table.ext_trans[m],
        int_fdr=table.int_fdr[m], sigma_a=table.sigma_a[m],
        beta_r=table.beta_r[m], scale_tilt=table.scale_tilt[m],
        aux_id=table.aux_id[m])
    if table.cloth is not None:
        # spatially-varying woven-cloth yarn resolution (irawan) — the
        # uv-dependent stage runs here so the BSDF eval is uv-free
        from . import cloth as cloth_mod
        res = cloth_mod.cloth_resolve(table.cloth,
                                      jnp.maximum(gm.aux_id, 0), uv)
        sel = gm.kind == CLOTH
        s1 = sel[..., None]
        gm = gm._replace(
            diffuse=jnp.where(s1, res["kd"], gm.diffuse),
            specular=jnp.where(s1, res["ks"], gm.specular),
            exponent=jnp.where(sel, res["u"], gm.exponent),
            alpha=jnp.where(sel, res["v"], gm.alpha),
            beta_r=jnp.where(sel, res["umax"], gm.beta_r),
            scale_tilt=jnp.where(sel, res["psi"], gm.scale_tilt),
            eta=jnp.where(sel, res["kappa"], gm.eta),
            sigma_a=jnp.where(s1, jnp.stack(
                [res["w"], res["l"],
                 res["is_weft"].astype(jnp.float32)], -1), gm.sigma_a))
    return gm


def ext_trans_lookup(gm: GatheredMat, cos_theta):
    """Per-lane T12(cosθ) from the material's precomputed slice."""
    x = jnp.clip(cos_theta, 0.0, 1.0) * N_COS - 0.5
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, N_COS - 2)
    fx = jnp.clip(x - x0.astype(x.dtype), 0.0, 1.0)
    t0 = jnp.take_along_axis(gm.ext_trans, x0[..., None], axis=-1)[..., 0]
    t1 = jnp.take_along_axis(gm.ext_trans, (x0 + 1)[..., None], axis=-1)[..., 0]
    return t0 * (1.0 - fx) + t1 * fx


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

# populated by the family modules at import time: kind -> module
FAMILIES: dict = {}


def register(kind: int, module):
    FAMILIES[kind] = module


def eval_pdf(active_kinds, gm: GatheredMat, wi, wo, hair_tables=None):
    """Evaluate f·cos and the sampling pdf for all lanes.

    active_kinds: static iterable of family ids present in the scene.
    """
    n = wi.shape[:-1]
    f = jnp.zeros(n + (3,), jnp.float32)
    pdf = jnp.zeros(n, jnp.float32)
    for kind in sorted(set(int(k) for k in active_kinds)):
        if kind in WRAPPER_KINDS or kind == DIPOLE:
            continue  # wrappers via eval_pdf_mix; dipole at the integrator
        mod = FAMILIES[kind]
        fk, pk = mod.eval_pdf(gm, wi, wo, hair_tables)
        sel = gm.kind == kind
        f = jnp.where(sel[..., None], fk, f)
        pdf = jnp.where(sel, pk, pdf)
    return f, pdf


def sample(active_kinds, gm: GatheredMat, wi, u_lobe, u2, u2b,
           hair_tables=None):
    """Sample an outgoing direction for all lanes.

    u_lobe: [N] lobe-selection sample; u2, u2b: [N, 2] direction samples.
    Returns (wo, weight, pdf, is_delta, eta_scale).
    """
    n = wi.shape[:-1]
    wo = jnp.zeros(n + (3,), jnp.float32)
    weight = jnp.zeros(n + (3,), jnp.float32)
    pdf = jnp.zeros(n, jnp.float32)
    is_delta = jnp.zeros(n, bool)
    eta_s = jnp.ones(n, jnp.float32)
    for kind in sorted(set(int(k) for k in active_kinds)):
        if kind in WRAPPER_KINDS or kind == DIPOLE:
            continue  # wrappers via sample_mix; dipole at the integrator
        mod = FAMILIES[kind]
        wk, wtk, pk, dk, ek = mod.sample(gm, wi, u_lobe, u2, u2b, hair_tables)
        sel = gm.kind == kind
        wo = jnp.where(sel[..., None], wk, wo)
        weight = jnp.where(sel[..., None], wtk, weight)
        pdf = jnp.where(sel, pk, pdf)
        is_delta = jnp.where(sel, dk, is_delta)
        eta_s = jnp.where(sel, ek, eta_s)
    return wo, weight, pdf, is_delta, eta_s


# ---------------------------------------------------------------------------
# Wrapper materials — one level of nested-material indirection.
#   MIXTURE      (src/bsdfs/{mixturebsdf,blendbsdf}.cpp): blend of rows
#                mix_a/mix_b with weight mix_w.
#   MASK         (src/bsdfs/mask.cpp): opacity (stored in `diffuse`, may be
#                textured) × nested row mix_a + (1-opacity) delta
#                pass-through.
#   COATING      (src/bsdfs/coating.cpp): smooth dielectric layer (ior
#                `eta`, absorption·thickness in `sigma_a`) over nested row
#                mix_a; nested directions are refraction-unfolded.
#   ROUGHCOATING (src/bsdfs/roughcoating.cpp): microfacet layer; specular
#                lobe D·G·F/(4cosθi), nested transmittance from the
#                material's precomputed rough-transmittance slice.
# Nested rows must be plain (non-wrapper) families, as in the reference's
# practical scenes.
# ---------------------------------------------------------------------------

def _sub_kinds(active_kinds):
    return tuple(k for k in active_kinds if k not in WRAPPER_KINDS)


def _luminance(c):
    return c @ jnp.asarray(_LUM)


def _refract_in(w, eta):
    """Refraction-unfolded entry into the coating layer: the transmitted
    direction expressed in the SAME hemisphere as w (reference:
    coating.cpp refractIn). Returns (w', R12, tir)."""
    from .fresnel import fresnel_dielectric
    cos_i = w[..., 2]
    R, _ = fresnel_dielectric(jnp.abs(cos_i), eta)
    inv_eta = 1.0 / eta
    sin2_t = (1.0 - cos_i * cos_i) * inv_eta * inv_eta
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    wp = jnp.stack([w[..., 0] * inv_eta, w[..., 1] * inv_eta,
                    jnp.sign(cos_i) * cos_t], axis=-1)
    return wp, jnp.where(tir, 1.0, R), tir


def _refract_out(wp, eta):
    """Exit from the layer (reference: coating.cpp refractOut).
    Returns (w, R21, tir)."""
    from .fresnel import fresnel_dielectric
    cos_i = wp[..., 2]
    R, _ = fresnel_dielectric(jnp.abs(cos_i), 1.0 / eta)
    sin2_t = (1.0 - cos_i * cos_i) * eta * eta
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    w = jnp.stack([wp[..., 0] * eta, wp[..., 1] * eta,
                   jnp.sign(cos_i) * cos_t], axis=-1)
    return w, jnp.where(tir, 1.0, R), tir


def _coat_absorb(gm, wi_p, wo_p):
    """exp(-σa·d·(1/|cosθi'| + 1/|cosθo'|)); σa·thickness is in sigma_a."""
    path = 1.0 / jnp.maximum(jnp.abs(wi_p[..., 2]), 1e-6) \
        + 1.0 / jnp.maximum(jnp.abs(wo_p[..., 2]), 1e-6)
    return jnp.exp(-gm.sigma_a * path[..., None])


def _coat_prob_spec(gm, wi, rough: bool):
    from .fresnel import fresnel_dielectric
    if rough:
        r = 1.0 - ext_trans_lookup(gm, jnp.abs(wi[..., 2]))
    else:
        r, _ = fresnel_dielectric(jnp.abs(wi[..., 2]), gm.eta)
    sw = gm.spec_weight
    return (r * sw) / jnp.maximum(r * sw + (1 - r) * (1 - sw), 1e-7)


def _coat_eval_pdf(sub, gm, gm_n, wi, wo, hair_tables, rough: bool):
    """(f, pdf) of a coated lane; both lobes, solid-angle measure."""
    wi_p, R12, tir_i = _refract_in(wi, gm.eta)
    wo_p, R21, tir_o = _refract_in(wo, gm.eta)
    f_n, p_n = eval_pdf(sub, gm_n, wi_p, wo_p, hair_tables)
    inv_eta2 = 1.0 / (gm.eta * gm.eta)
    jac = inv_eta2 * wo[..., 2] / jnp.where(jnp.abs(wo_p[..., 2]) < 1e-7,
                                            1e-7, wo_p[..., 2])
    if rough:
        T_i = ext_trans_lookup(gm, jnp.abs(wi[..., 2]))
        T_o = ext_trans_lookup(gm, jnp.abs(wo[..., 2]))
        through = (T_i * T_o)[..., None]
    else:
        through = ((1.0 - R12) * (1.0 - R21))[..., None]
    f = f_n * through * _coat_absorb(gm, wi_p, wo_p) * jac[..., None]
    dead = tir_i | tir_o
    f = jnp.where(dead[..., None], 0.0, f)
    p_spec = _coat_prob_spec(gm, wi, rough)
    pdf = jnp.where(dead, 0.0, p_n * jac * (1.0 - p_spec))
    if rough:
        # glossy reflection lobe (reference: roughcoating.cpp:273-291)
        from . import microfacet as mf
        from .fresnel import fresnel_dielectric
        from .plastic import _dyn_ndf, _dyn_g, _dyn_pdf_m, _half
        both_up = wi[..., 2] * wo[..., 2] > 0
        h = _half(wi, wo) * jnp.sign(wo[..., 2])[..., None]
        D = _dyn_ndf(gm.dist, gm.alpha, h)
        G = _dyn_g(gm.dist, gm.alpha, wi, wo, h)
        F, _ = fresnel_dielectric(jnp.abs(jnp.sum(wi * h, -1)), gm.eta)
        spec = gm.specular * (F * D * G / jnp.maximum(
            4.0 * jnp.abs(wi[..., 2]), 1e-7))[..., None]
        pdf_m = _dyn_pdf_m(gm.dist, gm.alpha, wi, h)
        pdf_spec = mf.half_vector_to_wo_pdf(pdf_m, wo, h)
        f = f + jnp.where(both_up[..., None], spec, 0.0)
        pdf = pdf + jnp.where(both_up, pdf_spec * p_spec, 0.0)
    return f, pdf


def eval_pdf_mix(active_kinds, table, tex, mat_id, uv, gm, wi, wo,
                 hair_tables=None):
    """eval_pdf with one level of wrapper-material indirection."""
    akt = set(int(k) for k in active_kinds)
    f, pdf = eval_pdf(active_kinds, gm, wi, wo, hair_tables)
    if not (akt & set(WRAPPER_KINDS)):
        return f, pdf
    m = jnp.maximum(mat_id, 0)
    kind_m = table.kind[m]
    sub = _sub_kinds(active_kinds)
    gm_a = gather(table, tex, table.mix_a[m], uv)

    if MIXTURE in akt or MASK in akt:
        f_a, p_a = eval_pdf(sub, gm_a, wi, wo, hair_tables)
    if MIXTURE in akt:
        is_mix = kind_m == MIXTURE
        w = table.mix_w[m]
        gm_b = gather(table, tex, table.mix_b[m], uv)
        f_b, p_b = eval_pdf(sub, gm_b, wi, wo, hair_tables)
        f = jnp.where(is_mix[..., None],
                      w[..., None] * f_a + (1 - w)[..., None] * f_b, f)
        pdf = jnp.where(is_mix, w * p_a + (1 - w) * p_b, pdf)
    if MASK in akt:
        is_mask = kind_m == MASK
        op = gm.diffuse  # opacity (texture-resolved)
        f = jnp.where(is_mask[..., None], f_a * op, f)
        pdf = jnp.where(is_mask, p_a * _luminance(op), pdf)
    for rough, kind in ((False, COATING), (True, ROUGHCOATING)):
        if kind in akt:
            is_c = kind_m == kind
            f_c, p_c = _coat_eval_pdf(sub, gm, gm_a, wi, wo, hair_tables,
                                      rough)
            f = jnp.where(is_c[..., None], f_c, f)
            pdf = jnp.where(is_c, p_c, pdf)
    return f, pdf


def sample_mix(active_kinds, table, tex, mat_id, uv, gm, wi, u_lobe, u2,
               u2b, hair_tables=None):
    """sample with one level of wrapper-material indirection."""
    akt = set(int(k) for k in active_kinds)
    if not (akt & set(WRAPPER_KINDS)):
        return sample(active_kinds, gm, wi, u_lobe, u2, u2b, hair_tables)
    m = jnp.maximum(mat_id, 0)
    kind_m = table.kind[m]
    sub = _sub_kinds(active_kinds)
    n = wi.shape[:-1]

    # ---- route each lane to an effective sub-material + rescaled sample --
    id_eff = m
    u_eff = u_lobe
    if MIXTURE in akt:
        is_mix = kind_m == MIXTURE
        w = table.mix_w[m]
        pick_a = u_lobe < w
        u_resc = jnp.where(pick_a, u_lobe / jnp.maximum(w, 1e-7),
                           (u_lobe - w) / jnp.maximum(1 - w, 1e-7))
        id_eff = jnp.where(is_mix,
                           jnp.where(pick_a, table.mix_a[m],
                                     table.mix_b[m]), id_eff)
        u_eff = jnp.where(is_mix, u_resc, u_eff)
    if MASK in akt:
        is_mask = kind_m == MASK
        op_lum = _luminance(gm.diffuse)
        mask_nested = u_lobe < op_lum
        id_eff = jnp.where(is_mask & mask_nested, table.mix_a[m], id_eff)
        u_eff = jnp.where(is_mask,
                          u_lobe / jnp.maximum(op_lum, 1e-7), u_eff)
    is_coat = jnp.zeros(n, bool)
    coat_rough = jnp.zeros(n, bool)
    if COATING in akt:
        is_coat = is_coat | (kind_m == COATING)
    if ROUGHCOATING in akt:
        sel = kind_m == ROUGHCOATING
        is_coat = is_coat | sel
        coat_rough = coat_rough | sel
    if COATING in akt or ROUGHCOATING in akt:
        rough_flag = ROUGHCOATING in akt and COATING not in akt
        p_spec = _coat_prob_spec(gm, wi, rough_flag) if \
            (COATING in akt) != (ROUGHCOATING in akt) else \
            jnp.where(coat_rough, _coat_prob_spec(gm, wi, True),
                      _coat_prob_spec(gm, wi, False))
        coat_nested = u_lobe >= p_spec
        id_eff = jnp.where(is_coat & coat_nested, table.mix_a[m], id_eff)
        u_eff = jnp.where(is_coat & coat_nested,
                          (u_lobe - p_spec) / jnp.maximum(1 - p_spec, 1e-7),
                          u_eff)

    # coated lanes sample the nested BSDF with the refracted wi
    wi_p, R12, tir_i = _refract_in(wi, gm.eta)
    wi_eff = jnp.where(is_coat[..., None], wi_p, wi)

    gm_eff = gather(table, tex, id_eff, uv)
    wo, wt, pdf, is_delta, eta_s = sample(sub, gm_eff, wi_eff, u_eff, u2,
                                          u2b, hair_tables)

    # ---- MIXTURE smooth lanes: full blended f/pdf -------------------------
    if MIXTURE in akt:
        f_mix, p_mix = eval_pdf_mix(active_kinds, table, tex, mat_id, uv,
                                    gm, wi, wo, hair_tables)
        smooth_mix = is_mix & ~is_delta
        wt = jnp.where(smooth_mix[..., None],
                       f_mix / jnp.maximum(p_mix, 1e-9)[..., None], wt)
        pdf = jnp.where(smooth_mix, p_mix, pdf)
        delta_mix = is_mix & is_delta
        pdf = jnp.where(delta_mix, pdf * jnp.where(pick_a, w, 1 - w), pdf)

    # ---- MASK --------------------------------------------------------------
    if MASK in akt:
        # nested branch: weight × opacity/op_lum, pdf × op_lum
        sel_n = is_mask & mask_nested
        wt = jnp.where(sel_n[..., None],
                       wt * gm.diffuse / jnp.maximum(op_lum, 1e-7)[..., None],
                       wt)
        pdf = jnp.where(sel_n, pdf * op_lum, pdf)
        # pass-through branch: delta transmission straight through
        sel_t = is_mask & ~mask_nested
        wo = jnp.where(sel_t[..., None], -wi, wo)
        wt = jnp.where(sel_t[..., None],
                       (1.0 - gm.diffuse)
                       / jnp.maximum(1.0 - op_lum, 1e-7)[..., None], wt)
        pdf = jnp.where(sel_t, 1.0 - op_lum, pdf)
        is_delta = jnp.where(sel_t, True, is_delta)
        eta_s = jnp.where(sel_t, 1.0, eta_s)

    # ---- COATING / ROUGHCOATING -------------------------------------------
    if COATING in akt or ROUGHCOATING in akt:
        from ...core.math import reflect_z
        # nested branch: refract the sampled wo out of the layer
        wo_out, R21, tir_o = _refract_out(wo, gm.eta)
        sel_n = is_coat & coat_nested
        sel_s = is_coat & ~coat_nested
        # specular-branch direction: smooth coat = mirror delta;
        # rough coat = microfacet-sampled glossy reflection
        # (roughcoating.cpp:293-316 samples the NDF — treating it as a
        # mirror would leave the D·G·F lobe in pdf() forever unsampled)
        wo_s = reflect_z(wi)
        if ROUGHCOATING in akt:
            from .plastic import _dyn_sample_m
            m_h, _ = _dyn_sample_m(gm.dist, gm.alpha, wi, u2)
            wo_g = 2.0 * jnp.sum(wi * m_h, -1, keepdims=True) * m_h - wi
            wo_s = jnp.where(coat_rough[..., None], wo_g, wo_s)
        # recompute the full coated f/pdf at the outgoing direction
        # (mirrors eval; keeps MIS-consistent pdfs for smooth nested lobes)
        gm_a = gather(table, tex, table.mix_a[m], uv)
        wo_eval = jnp.where(sel_n[..., None], wo_out,
                            jnp.where(sel_s[..., None], wo_s, wo))
        if COATING in akt:
            f_c0, p_c0 = _coat_eval_pdf(sub, gm, gm_a, wi, wo_eval,
                                        hair_tables, False)
        if ROUGHCOATING in akt:
            f_c1, p_c1 = _coat_eval_pdf(sub, gm, gm_a, wi, wo_eval,
                                        hair_tables, True)
        if COATING in akt and ROUGHCOATING in akt:
            f_c = jnp.where(coat_rough[..., None], f_c1, f_c0)
            p_c = jnp.where(coat_rough, p_c1, p_c0)
        elif COATING in akt:
            f_c, p_c = f_c0, p_c0
        else:
            f_c, p_c = f_c1, p_c1
        smooth_n = sel_n & ~is_delta & ~tir_i & ~tir_o
        wo = jnp.where(sel_n[..., None], wo_out, wo)
        wt = jnp.where(smooth_n[..., None],
                       f_c / jnp.maximum(p_c, 1e-9)[..., None], wt)
        wt = jnp.where((sel_n & (is_delta | tir_i | tir_o))[..., None],
                       jnp.where(sel_n[..., None] & is_delta[..., None]
                                 & ~(tir_i | tir_o)[..., None],
                                 wt * ((1.0 - R12) * (1.0 - R21)
                                       / jnp.maximum(1 - p_spec, 1e-7)
                                       )[..., None]
                                 * _coat_absorb(gm, wi_p, wo),
                                 0.0), wt)
        pdf = jnp.where(smooth_n, p_c, pdf)
        pdf = jnp.where(sel_n & is_delta, pdf * (1 - p_spec), pdf)
        pdf = jnp.where(sel_n & (tir_i | tir_o), 0.0, pdf)
        # specular branch
        wo = jnp.where(sel_s[..., None], wo_s, wo)
        # smooth coating: delta mirror with weight specular·R12/p_spec
        sel_s_delta = sel_s & ~coat_rough
        wt = jnp.where(sel_s_delta[..., None],
                       gm.specular * (R12 / jnp.maximum(p_spec,
                                                        1e-7))[..., None],
                       wt)
        pdf = jnp.where(sel_s_delta, p_spec, pdf)
        is_delta = jnp.where(sel_s_delta, True, is_delta)
        # rough coating: smooth glossy lobe — weight f/pdf with the full
        # mixture pdf (MIS-consistent); below-horizon samples are rejected
        sel_s_rough = sel_s & coat_rough
        ok_g = sel_s_rough & (wo[..., 2] * wi[..., 2] > 0) & (p_c > 1e-9)
        wt = jnp.where(ok_g[..., None],
                       f_c / jnp.maximum(p_c, 1e-9)[..., None],
                       jnp.where(sel_s_rough[..., None], 0.0, wt))
        pdf = jnp.where(sel_s_rough, jnp.where(ok_g, p_c, 0.0), pdf)
        is_delta = jnp.where(sel_s_rough, False, is_delta)
        eta_s = jnp.where(is_coat, 1.0, eta_s)
    return wo, wt, pdf, is_delta, eta_s


# ---------------------------------------------------------------------------
# normal/bump mapping (reference: src/bsdfs/{normalmap,bumpmap}.cpp) —
# perturbs the shading frame before BSDF dispatch rather than wrapping the
# BSDF itself (same visible behavior, no extra indirection level).
# ---------------------------------------------------------------------------

def perturb_shading_frame(table: MaterialTable,
                          tex: Optional[CheckerboardTable], mat_id, uv,
                          sh_n, sh_s, sh_t):
    """Returns (sh_n, sh_s, sh_t) with normal/bump maps applied for lanes
    whose material carries one. Normal maps read a tangent-space rgb
    normal (2c-1); bump maps take central differences of the height
    texture's luminance in uv."""
    if tex is None:
        return sh_n, sh_s, sh_t
    m = jnp.maximum(mat_id, 0)
    tid = table.nrm_tex_id[m]
    active = tid >= 0
    if tex.bitmaps.shape[0] == 0:
        return sh_n, sh_s, sh_t

    kind = table.nrm_kind[m]
    scale = table.nrm_scale[m]
    base = jnp.zeros(uv.shape[:-1] + (3,), jnp.float32)

    # normal map: rgb → tangent-space normal
    rgb = eval_checkerboard(tex, tid, uv, base)
    n_ts = rgb * 2.0 - 1.0

    # bump map: central differences of height (luminance)
    res = tex.bitmaps.shape[1]
    d = 1.0 / res
    h0 = _luminance(rgb)
    hu = _luminance(eval_checkerboard(
        tex, tid, uv + jnp.asarray([d, 0.0], jnp.float32), base))
    hv = _luminance(eval_checkerboard(
        tex, tid, uv + jnp.asarray([0.0, d], jnp.float32), base))
    dhdu = (hu - h0) / d * scale
    dhdv = (hv - h0) / d * scale
    n_bump = jnp.stack([-dhdu, -dhdv, jnp.ones_like(dhdu)], axis=-1)

    n_local = jnp.where((kind == 0)[..., None], n_ts, n_bump)
    n_local = n_local / jnp.sqrt(jnp.maximum(
        jnp.sum(n_local * n_local, -1, keepdims=True), 1e-12))
    # to world via the current frame, then re-orthogonalize s, t
    n_w = (sh_s * n_local[..., 0:1] + sh_t * n_local[..., 1:2]
           + sh_n * n_local[..., 2:3])
    s_w = sh_s - n_w * jnp.sum(n_w * sh_s, -1, keepdims=True)
    s_w = s_w / jnp.sqrt(jnp.maximum(jnp.sum(s_w * s_w, -1, keepdims=True),
                                     1e-12))
    t_w = jnp.cross(n_w, s_w)
    a = active[..., None]
    return (jnp.where(a, n_w, sh_n), jnp.where(a, s_w, sh_s),
            jnp.where(a, t_w, sh_t))
