"""Irawan & Marschner woven-cloth BRDF.

Capability counterpart of the reference's src/bsdfs/irawan.{h,cpp}
(Piti Irawan's thesis model): an explicit weave-pattern description
(tile of warp/weft yarn segments) drives a spatially-varying specular
yarn highlight (filament or staple integrand) plus a per-yarn diffuse
term. TPU-native formulation: the uv-dependent yarn resolution happens
at material-gather time (cloth_resolve, called from registry.gather) so
the BSDF eval itself is a branchless function of per-lane scalars; the
weave DSL parser and the MC specular normalization (irawan.cpp:147-171)
run host-side at scene build.

GatheredMat field mapping for CLOTH lanes (set by cloth_resolve):
  diffuse    <- yarn kd
  specular   <- yarn ks * specNorm * intensityVariation * areaScale
  exponent   <- u   (yarn inclination coordinate)
  alpha      <- v   (yarn azimuth coordinate)
  beta_r     <- umax (after correlated-noise adjustment)
  scale_tilt <- psi
  eta        <- kappa
  sigma_a    <- (width, length, is_weft)
Per-pattern scalars ride the material row: transmit = (alpha, beta, ss),
k = (hWidth, 0, 0).
"""
from __future__ import annotations

import re
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import noise
from . import registry as R

CLOTH_KIND = R.CLOTH
TEA_ROUNDS = 8   # irawan.cpp:262 teaIterations


class ClothTable(NamedTuple):
    """[P] weave patterns, padded to common tile / yarn-count sizes."""
    pattern: jnp.ndarray    # [P, TH, TW] int32 yarn index (0-based)
    tile_w: jnp.ndarray     # [P] float32
    tile_h: jnp.ndarray     # [P]
    repeat_u: jnp.ndarray   # [P]
    repeat_v: jnp.ndarray   # [P]
    period: jnp.ndarray     # [P]
    fineness: jnp.ndarray   # [P]
    d_umax: jnp.ndarray     # [P, 4] dWarp/dWarp, dWarp/dWeft, dWeft/dWarp,
    #                         dWeft/dWeft (radians)
    spec_norm: jnp.ndarray  # [P] MC specular normalization
    yarn_type: jnp.ndarray  # [P, Y] 0 = warp, 1 = weft
    yarn_psi: jnp.ndarray   # [P, Y] radians
    yarn_umax: jnp.ndarray  # [P, Y] radians
    yarn_kappa: jnp.ndarray  # [P, Y]
    yarn_w: jnp.ndarray     # [P, Y]
    yarn_l: jnp.ndarray     # [P, Y]
    yarn_cu: jnp.ndarray    # [P, Y] centerU
    yarn_cv: jnp.ndarray    # [P, Y] centerV
    yarn_kd: jnp.ndarray    # [P, Y, 3]
    yarn_ks: jnp.ndarray    # [P, Y, 3]
    area_scale: jnp.ndarray  # [P, 2] (warp+weft)/warp, (warp+weft)/weft


# ---------------------------------------------------------------------------
# host-side weave pattern description + DSL parser (irawan.h grammar)
# ---------------------------------------------------------------------------

class WeavePattern:
    """Plain-python weave description (irawan.h WeavePattern + Yarn)."""

    def __init__(self):
        self.name = ""
        self.alpha = 0.0
        self.beta = 0.0
        self.ss = 0.0
        self.h_width = 0.0
        self.warp_area = 1.0
        self.weft_area = 1.0
        self.tile_width = 0
        self.tile_height = 0
        self.d_warp_umax_over_d_warp = 0.0
        self.d_warp_umax_over_d_weft = 0.0
        self.d_weft_umax_over_d_warp = 0.0
        self.d_weft_umax_over_d_weft = 0.0
        self.fineness = 0.0
        self.period = 0.0
        self.pattern = []       # 1-based yarn ids, row-major [th, tw]
        self.yarns = []         # list of dicts


_YARN_DEFAULTS = dict(type=0, psi=0.0, umax=0.0, kappa=0.0, width=0.0,
                      length=0.0, centerU=0.0, centerV=0.0,
                      kd=(0.0, 0.0, 0.0), ks=(0.0, 0.0, 0.0))
_DEG_KEYS = {"psi", "umax", "dWarpUmaxOverDWarp", "dWarpUmaxOverDWeft",
             "dWeftUmaxOverDWarp", "dWeftUmaxOverDWeft"}


def _parse_value(txt, props):
    txt = txt.strip()
    if txt.startswith("$"):
        return props[txt[1:]]
    if txt.startswith("{"):
        return tuple(float(x) for x in txt.strip("{}").split(","))
    if txt.startswith('"'):
        return txt.strip('"')
    if txt in ("warp", "weft"):
        return 0 if txt == "warp" else 1
    return float(txt)


def parse_weave(text: str, props=None) -> WeavePattern:
    """Parse the irawan weave DSL (irawan.h WeavePatternGrammar): a
    `weave { key = value, ..., pattern {...}, yarn {...}, ... }` block
    with /* */ comments and $var substitution from `props`."""
    props = props or {}
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    m = re.search(r"weave\s*\{(.*)\}\s*$", text, flags=re.S)
    if not m:
        raise ValueError("not a weave pattern file")
    body = m.group(1)
    wp = WeavePattern()

    # yarn blocks
    def yarn_sub(mo):
        yarn = dict(_YARN_DEFAULTS)
        for key, val in re.findall(
                r"(\w+)\s*=\s*(\{[^}]*\}|\$\w+|\"[^\"]*\"|[-\w.+eE]+)",
                mo.group(1)):
            v = _parse_value(val, props)
            if key in _DEG_KEYS:
                v = float(v) * np.pi / 180.0
            yarn[key] = v
        wp.yarns.append(yarn)
        return " "

    # pattern block
    def pattern_sub(mo):
        wp.pattern = [int(x) for x in re.findall(r"\d+", mo.group(1))]
        return " "

    # yarn bodies contain one level of nested {r, g, b} braces
    body = re.sub(r"yarn\s*\{((?:[^{}]|\{[^{}]*\})*)\}", yarn_sub, body)
    body = re.sub(r"pattern\s*\{([^}]*)\}", pattern_sub, body)

    key_map = {"tileWidth": "tile_width", "tileHeight": "tile_height",
               "hWidth": "h_width", "warpArea": "warp_area",
               "weftArea": "weft_area",
               "dWarpUmaxOverDWarp": "d_warp_umax_over_d_warp",
               "dWarpUmaxOverDWeft": "d_warp_umax_over_d_weft",
               "dWeftUmaxOverDWarp": "d_weft_umax_over_d_warp",
               "dWeftUmaxOverDWeft": "d_weft_umax_over_d_weft"}
    for key, val in re.findall(
            r"(\w+)\s*=\s*(\$\w+|\"[^\"]*\"|[-\w.+eE]+)", body):
        v = _parse_value(val, props)
        if key in _DEG_KEYS:
            v = float(v) * np.pi / 180.0
        attr = key_map.get(key, key)
        if attr in ("tile_width", "tile_height"):
            v = int(v)
        setattr(wp, attr, v)
    assert len(wp.pattern) == wp.tile_width * wp.tile_height, \
        "pattern size != tileWidth*tileHeight"
    for pid in wp.pattern:
        assert 0 < pid <= len(wp.yarns), "pattern references missing yarn"
    return wp


# generic built-in weaves (plain/tabby and a 2/2 twill); yarn geometry
# follows the model's constraints (w·sin(umax) < l), colors are
# placeholders meant to be overridden via $warp_kd etc.
BUILTIN_WEAVES = {
    "plain": """
weave {
  name = "plain weave",
  tileWidth = 2, tileHeight = 2,
  alpha = 0.3, beta = 6.0, ss = 0.0, hWidth = 0.5,
  warpArea = 1.0, weftArea = 1.0,
  fineness = 0.0, period = 0.0,
  pattern { 1, 2, 2, 1 },
  yarn { type = warp, psi = 30, umax = 55, kappa = -0.5,
         width = 1.0, length = 2.2, centerU = 0.5, centerV = 0.5,
         kd = {0.35, 0.33, 0.3}, ks = {0.4, 0.4, 0.4} },
  yarn { type = weft, psi = 30, umax = 55, kappa = -0.5,
         width = 1.0, length = 2.2, centerU = 0.5, centerV = 0.5,
         kd = {0.35, 0.33, 0.3}, ks = {0.4, 0.4, 0.4} }
}
""",
    "twill": """
weave {
  name = "2/2 twill",
  tileWidth = 4, tileHeight = 4,
  alpha = 0.15, beta = 8.0, ss = 0.2, hWidth = 0.5,
  warpArea = 2.0, weftArea = 1.0,
  fineness = 0.0, period = 0.0,
  pattern { 1, 1, 2, 2,  2, 1, 1, 2,  2, 2, 1, 1,  1, 2, 2, 1 },
  yarn { type = warp, psi = 0, umax = 40, kappa = 0.0,
         width = 1.2, length = 3.5, centerU = 0.5, centerV = 0.5,
         kd = {0.1, 0.12, 0.35}, ks = {0.5, 0.5, 0.55} },
  yarn { type = weft, psi = 0, umax = 40, kappa = 0.0,
         width = 1.2, length = 3.5, centerU = 0.5, centerV = 0.5,
         kd = {0.6, 0.6, 0.62}, ks = {0.5, 0.5, 0.5} }
}
""",
}


def pack_cloth(patterns, repeat_uv) -> ClothTable:
    """Pack WeavePatterns (+ per-pattern (repeatU, repeatV)) into a
    padded ClothTable; computes the MC specular normalization."""
    P = len(patterns)
    TH = max(p.tile_height for p in patterns)
    TW = max(p.tile_width for p in patterns)
    Y = max(len(p.yarns) for p in patterns)
    pat = np.zeros((P, TH, TW), np.int32)
    ys = {k: np.zeros((P, Y), np.float32)
          for k in ("type", "psi", "umax", "kappa", "width", "length",
                    "centerU", "centerV")}
    kd = np.zeros((P, Y, 3), np.float32)
    ks = np.zeros((P, Y, 3), np.float32)
    scal = {k: np.zeros((P,), np.float32)
            for k in ("tile_w", "tile_h", "repeat_u", "repeat_v", "period",
                      "fineness")}
    d4 = np.zeros((P, 4), np.float32)
    area = np.ones((P, 2), np.float32)
    for i, (p, (ru, rv)) in enumerate(zip(patterns, repeat_uv)):
        a = np.asarray(p.pattern, np.int32).reshape(p.tile_height,
                                                    p.tile_width) - 1
        pat[i, :p.tile_height, :p.tile_width] = a
        for j, yarn in enumerate(p.yarns):
            for k in ys:
                ys[k][i, j] = float(yarn[k] if not isinstance(yarn[k], tuple)
                                    else yarn[k][0])
            kd[i, j] = yarn["kd"]
            ks[i, j] = yarn["ks"]
        scal["tile_w"][i] = p.tile_width
        scal["tile_h"][i] = p.tile_height
        scal["repeat_u"][i] = ru
        scal["repeat_v"][i] = rv
        scal["period"][i] = p.period
        scal["fineness"][i] = p.fineness
        d4[i] = (p.d_warp_umax_over_d_warp, p.d_warp_umax_over_d_weft,
                 p.d_weft_umax_over_d_warp, p.d_weft_umax_over_d_weft)
        total = p.warp_area + p.weft_area
        area[i] = (total / max(p.warp_area, 1e-6),
                   total / max(p.weft_area, 1e-6))
    ct = ClothTable(
        pattern=jnp.asarray(pat), tile_w=jnp.asarray(scal["tile_w"]),
        tile_h=jnp.asarray(scal["tile_h"]),
        repeat_u=jnp.asarray(scal["repeat_u"]),
        repeat_v=jnp.asarray(scal["repeat_v"]),
        period=jnp.asarray(scal["period"]),
        fineness=jnp.asarray(scal["fineness"]), d_umax=jnp.asarray(d4),
        spec_norm=jnp.ones((P,), jnp.float32),
        yarn_type=jnp.asarray(ys["type"]), yarn_psi=jnp.asarray(ys["psi"]),
        yarn_umax=jnp.asarray(ys["umax"]),
        yarn_kappa=jnp.asarray(ys["kappa"]), yarn_w=jnp.asarray(ys["width"]),
        yarn_l=jnp.asarray(ys["length"]), yarn_cu=jnp.asarray(ys["centerU"]),
        yarn_cv=jnp.asarray(ys["centerV"]), yarn_kd=jnp.asarray(kd),
        yarn_ks=jnp.asarray(ks), area_scale=jnp.asarray(area))
    # MC specular normalization (irawan.cpp configure(): 10k cosine-
    # sampled wi/wo + uniform uv; norm = N / (sum of the un-normalized
    # specular eval) / pi)
    norms = np.ones((P,), np.float32)
    rs = np.random.RandomState(7)
    n_s = 10000

    @jax.jit
    def _norm_total(ct_, pid, uv, wi, wo, scal4):
        res = cloth_resolve(ct_, pid, uv, init=True)
        spec = _integrand(res, wi, wo, scal4[..., 0], scal4[..., 1],
                          scal4[..., 2], scal4[..., 3])
        # spec includes the trailing cosTheta(wo); configure() divides it
        # back out (irawan.cpp:161); gain = intensityVariation * areaScale
        spec = spec / jnp.maximum(wo[..., 2], 1e-6)
        return jnp.sum(spec * res["gain"])

    for i, (p, (ru, rv)) in enumerate(zip(patterns, repeat_uv)):
        wi = jnp.asarray(_cosine_dirs(rs, n_s))
        wo = jnp.asarray(_cosine_dirs(rs, n_s))
        uv = jnp.asarray(rs.rand(n_s, 2), jnp.float32)
        pid = jnp.full((n_s,), i, jnp.int32)
        scal4 = jnp.broadcast_to(jnp.asarray(
            [p.alpha, p.beta, p.ss, p.h_width], jnp.float32), (n_s, 4))
        total = float(_norm_total(ct, pid, uv, wi, wo, scal4))
        norms[i] = n_s / (total * np.pi) if total > 0 else 0.0
    return ct._replace(spec_norm=jnp.asarray(norms))


def _cosine_dirs(rs, n):
    u1 = rs.rand(n)
    u2 = rs.rand(n)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    return np.stack([r * np.cos(phi), r * np.sin(phi),
                     np.sqrt(np.maximum(1 - u1, 0))], -1).astype(np.float32)


# ---------------------------------------------------------------------------
# gather-time yarn resolution (uv -> per-lane yarn scalars)
# ---------------------------------------------------------------------------

def cloth_resolve(ct: ClothTable, pid, uv, init=False):
    """Resolve the weave at uv (irawan.cpp eval():188-280 'texturing'
    stage). pid [N] pattern ids, uv [N, 2]. Returns per-lane dict."""
    tw = ct.tile_w[pid]
    th = ct.tile_h[pid]
    x = uv[..., 0] * ct.repeat_u[pid] * tw
    y = (1.0 - uv[..., 1]) * ct.repeat_v[pid] * th
    ix = jnp.floor(x).astype(jnp.int32)
    iy = jnp.floor(y).astype(jnp.int32)
    twi = tw.astype(jnp.int32)
    thi = th.astype(jnp.int32)
    lx = jnp.mod(ix, twi)
    ly = jnp.mod(iy, thi)
    yid = ct.pattern[pid, ly, lx]                     # [N]

    cu = ct.yarn_cu[pid, yid]
    cv = ct.yarn_cv[pid, yid]
    # tile-cell corner of the CURRENT tile + yarn center inside it
    cx = jnp.floor(ix.astype(jnp.float32) / tw) * tw + cu * tw
    cy = jnp.floor(iy.astype(jnp.float32) / th) * th + (1.0 - cv) * th
    dx = x - cx
    dy = -(y - cy)

    ytype = ct.yarn_type[pid, yid]                    # 0 warp / 1 weft
    is_weft = ytype > 0.5
    # weft: rotate local xy by pi/2 about z (directions rotate in eval)
    dx, dy = jnp.where(is_weft, -dy, dx), jnp.where(is_weft, dx, dy)

    umax = ct.yarn_umax[pid, yid]
    psi = ct.yarn_psi[pid, yid]
    kappa = ct.yarn_kappa[pid, yid]
    w = ct.yarn_w[pid, yid]
    length = ct.yarn_l[pid, yid]

    # correlated noise on umax (irawan.cpp:264-276)
    period = ct.period[pid]
    pos_x = cx.astype(jnp.uint32)
    pos_y = cy.astype(jnp.uint32)
    tea1 = noise.sample_tea_float(pos_x, 2 * pos_y, TEA_ROUNDS)
    tea2 = noise.sample_tea_float(pos_x, 2 * pos_y + 1, TEA_ROUNDS)
    safe_p = jnp.maximum(period, 1e-6)
    n1 = noise.perlin(jnp.stack(
        [(cx * (th * ct.repeat_v[pid] + tea1) + cy) / safe_p,
         jnp.zeros_like(cx), jnp.zeros_like(cx)], -1))
    n2 = noise.perlin(jnp.stack(
        [(cy * (tw * ct.repeat_u[pid] + tea2) + cx) / safe_p,
         jnp.zeros_like(cx), jnp.zeros_like(cx)], -1))
    d_w = jnp.where(is_weft, ct.d_umax[pid, 2], ct.d_umax[pid, 0])
    d_f = jnp.where(is_weft, ct.d_umax[pid, 3], ct.d_umax[pid, 1])
    umax = jnp.where(period > 0.0, umax + n1 * d_w + n2 * d_f, umax)

    u = dy / (length * 0.5) * umax
    v = dx * jnp.pi / jnp.maximum(w, 1e-9)

    # random intensity variation (irawan.cpp:292-303)
    fineness = ct.fineness[pid]
    i1 = ((cx + dx) * fineness).astype(jnp.uint32)
    i2 = ((cy + dy) * fineness).astype(jnp.uint32)
    xi = noise.sample_tea_float(i1, i2, TEA_ROUNDS)
    iv = jnp.minimum(-jnp.log(jnp.maximum(xi, 1e-10)), 10.0)
    iv = jnp.where(fineness > 0.0, iv, 1.0)

    a_scale = jnp.where(is_weft, ct.area_scale[pid, 1],
                        ct.area_scale[pid, 0])
    gain = iv * a_scale
    ks = ct.yarn_ks[pid, yid] * (gain * ct.spec_norm[pid])[..., None]
    if init:
        return dict(u=u, v=v, umax=umax, psi=psi, kappa=kappa, w=w,
                    l=length, is_weft=is_weft, gain=gain)
    return dict(u=u, v=v, umax=umax, psi=psi, kappa=kappa, w=w, l=length,
                is_weft=is_weft, kd=ct.yarn_kd[pid, yid], ks=ks)


# ---------------------------------------------------------------------------
# the scattering integrands (irawan.cpp:383-549), branchless
# ---------------------------------------------------------------------------

def _von_mises(cos_x, b):
    """irawan.cpp vonMises: exp(b·cosx) / (2π·I0(b)) with the A&S
    polynomial I0."""
    ab = jnp.abs(b)
    t = ab / 3.75
    t2 = t * t
    i0_small = 1.0 + t2 * (3.5156229 + t2 * (3.0899424 + t2 * (1.2067492
               + t2 * (0.2659732 + t2 * (0.0360768 + t2 * 0.0045813)))))
    ti = 3.75 / jnp.maximum(ab, 1e-9)
    i0_large = jnp.exp(ab) / jnp.sqrt(jnp.maximum(ab, 1e-9)) \
        * (0.39894228 + ti * (0.01328592 + ti * (0.00225319
           + ti * (-0.00157565 + ti * (0.00916281 + ti * (-0.02057706
           + ti * (0.02635537 + ti * (-0.01647633 + ti * 0.00392377))))))))
    i0 = jnp.where(ab <= 3.75, i0_small, i0_large)
    return jnp.exp(b * cos_x) / (2.0 * jnp.pi * i0)


def _seeliger(c1, c2):
    """irawan.cpp seeliger with sg_a=0, sg_s=1 (albedo 1)."""
    c1 = jnp.maximum(c1, 0.0)
    c2 = jnp.maximum(c2, 0.0)
    s = c1 + c2
    return jnp.where((c1 > 0) & (c2 > 0),
                     c1 * c2 / (4.0 * jnp.pi * jnp.maximum(s, 1e-12)), 0.0)


def _radius_of_curvature(u, umax, kappa, w, length):
    """irawan.cpp radiusOfCurvature: yarn spine = ellipse / parabola /
    hyperbola segment selected by rhat (thesis §5.3)."""
    tan_umax = jnp.tan(jnp.maximum(umax, 1e-6))
    rhat = 1.0 + kappa * (1.0 + 1.0 / tan_umax)
    a = 0.5 * w
    sin_umax = jnp.sin(umax)
    rest = 0.5 * length - a * sin_umax

    r_circle = rest / jnp.maximum(sin_umax, 1e-9)

    # ellipse (rhat > 0)
    rh_pos = jnp.maximum(rhat, 1e-9)
    tmax_e = jnp.arctan(rh_pos * tan_umax)
    bhat_e = rest / jnp.maximum(jnp.sin(tmax_e), 1e-9)
    ahat_e = bhat_e / rh_pos
    t_e = jnp.arctan(rh_pos * jnp.tan(u))
    r_ell = (bhat_e ** 2 * jnp.cos(t_e) ** 2
             + ahat_e ** 2 * jnp.sin(t_e) ** 2) ** 1.5 \
        / jnp.maximum(ahat_e * bhat_e, 1e-12)

    # hyperbola (rhat < 0)
    def atanh(x):
        xc = jnp.clip(x, -1.0 + 1e-6, 1.0 - 1e-6)
        return 0.5 * jnp.log((1.0 + xc) / (1.0 - xc))
    rh_neg = jnp.minimum(rhat, -1e-9)
    tmax_h = -atanh(rh_neg * tan_umax)
    bhat_h = rest / jnp.maximum(jnp.sinh(jnp.abs(tmax_h)), 1e-9) \
        * jnp.sign(tmax_h + 1e-30)
    ahat_h = bhat_h / rh_neg
    t_h = -atanh(rh_neg * jnp.tan(u))
    r_hyp = -(bhat_h ** 2 * jnp.cosh(t_h) ** 2
              + ahat_h ** 2 * jnp.sinh(t_h) ** 2) ** 1.5 \
        / jnp.where(jnp.abs(ahat_h * bhat_h) > 1e-12, ahat_h * bhat_h, 1e-12)

    # parabola (rhat == 0)
    tmax_p = tan_umax
    ahat_p = rest / jnp.maximum(2.0 * tmax_p, 1e-9)
    t_p = jnp.tan(u)
    r_par = 2.0 * ahat_p * (1.0 + t_p * t_p) ** 1.5

    r = jnp.where(rhat == 1.0, r_circle,
                  jnp.where(rhat > 0.0, r_ell,
                            jnp.where(rhat < 0.0, r_hyp, r_par)))
    return r


def _smoothstep01(x):
    t = jnp.clip(x, 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _integrand(res, wi, wo, p_alpha, p_beta, p_ss, p_hw):
    """Specular integrand × gain-independent geometry. wi/wo are in the
    UNROTATED local frame; the weft rotation is applied here
    (irawan.cpp:243-256)."""
    is_weft = res["is_weft"]

    def rot(d):
        return jnp.stack([jnp.where(is_weft, -d[..., 1], d[..., 0]),
                          jnp.where(is_weft, d[..., 0], d[..., 1]),
                          d[..., 2]], -1)

    om_i = rot(wi)
    om_r = rot(wo)
    u = res["u"]
    v = res["v"]
    umax = res["umax"]
    psi = res["psi"]
    kappa = res["kappa"]
    w = res["w"]
    length = res["l"]

    h = om_i + om_r
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    sum_len = jnp.linalg.norm(om_i + om_r, axis=-1)
    fc = p_alpha + _von_mises(-jnp.sum(om_i * om_r, -1), p_beta)
    a = 0.5 * w
    guards = (w * jnp.sin(umax) < length) & (kappa >= -1.0)

    # ---- filament (psi == 0); irawan.cpp:383-464 -------------------------
    u_of_v = jnp.arctan(h[..., 1] / jnp.where(jnp.abs(h[..., 2]) > 1e-12,
                                              h[..., 2], 1e-12))
    in_f = jnp.abs(u_of_v) < umax
    n_f = jnp.stack([jnp.sin(v), jnp.sin(u_of_v) * jnp.cos(v),
                     jnp.cos(u_of_v) * jnp.cos(v)], -1)
    n_f = n_f / jnp.maximum(jnp.linalg.norm(n_f, axis=-1, keepdims=True),
                            1e-12)
    t_f = jnp.stack([jnp.zeros_like(u_of_v), jnp.cos(u_of_v),
                     -jnp.sin(u_of_v)], -1)
    ss_umax = (1.0 - p_ss) * umax
    r_f = _radius_of_curvature(jnp.minimum(jnp.abs(u_of_v), ss_umax),
                               jnp.maximum(ss_umax, 1e-6), kappa, w, length)
    tch_x = t_f[..., 1] * h[..., 2] - t_f[..., 2] * h[..., 1]
    gu = a * (r_f + a * jnp.cos(v)) \
        / jnp.maximum(sum_len * jnp.abs(tch_x), 1e-12)
    a_f = _seeliger(jnp.sum(n_f * om_i, -1), jnp.sum(n_f * om_r, -1))
    as_f = jnp.where(p_ss > 0.0,
                     a_f * (1.0 - _smoothstep01(
                         (jnp.abs(u_of_v) - ss_umax)
                         / jnp.maximum(p_ss * umax, 1e-9))),
                     a_f)
    fs_f = gu * fc * as_f * jnp.pi * length
    dy = length * p_hw
    y_of_v = jnp.clip(u_of_v * 0.5 * length / jnp.maximum(umax, 1e-9),
                      0.5 * (dy - length), 0.5 * (length - dy))
    sel_f = jnp.abs(y_of_v - u * 0.5 * length
                    / jnp.maximum(umax, 1e-9)) < 0.5 * dy
    val_f = jnp.where(in_f & sel_f & (p_ss < 1.0) & (p_ss >= 0.0),
                      fs_f / jnp.maximum(dy, 1e-9), 0.0)

    # ---- staple (psi != 0); irawan.cpp:466-549 ---------------------------
    sin_u, cos_u = jnp.sin(u), jnp.cos(u)
    denom_d = jnp.sqrt(jnp.maximum(
        h[..., 0] ** 2 + (h[..., 1] * sin_u + h[..., 2] * cos_u) ** 2,
        1e-12)) * jnp.tan(jnp.where(jnp.abs(psi) > 1e-9, psi, 1.0))
    d_st = (h[..., 1] * cos_u - h[..., 2] * sin_u) \
        / jnp.where(jnp.abs(denom_d) > 1e-12, denom_d, 1e-12)
    v_of_u = jnp.arctan2(-h[..., 1] * sin_u - h[..., 2] * cos_u,
                         h[..., 0]) \
        + jnp.arccos(jnp.clip(d_st, -1.0, 1.0))
    in_s = (jnp.abs(d_st) < 1.0) & (jnp.abs(v_of_u) < jnp.pi / 2.0)
    n_s = jnp.stack([jnp.sin(v_of_u), sin_u * jnp.cos(v_of_u),
                     cos_u * jnp.cos(v_of_u)], -1)
    n_s = n_s / jnp.maximum(jnp.linalg.norm(n_s, axis=-1, keepdims=True),
                            1e-12)
    r_s = _radius_of_curvature(jnp.abs(u), jnp.maximum(umax, 1e-6),
                               kappa, w, length)
    den_s = sum_len * jnp.sum(n_s * h, -1) * jnp.abs(jnp.sin(psi))
    gv = a * (r_s + a * jnp.cos(v_of_u)) \
        / jnp.where(jnp.abs(den_s) > 1e-12, den_s, 1e-12)
    a_s = _seeliger(jnp.sum(n_s * om_i, -1), jnp.sum(n_s * om_r, -1))
    fs_s = gv * fc * a_s * 2.0 * w * umax
    dxw = w * p_hw
    x_of_u = jnp.clip(v_of_u * w / jnp.pi,
                      0.5 * (dxw - w), 0.5 * (w - dxw))
    sel_s = jnp.abs(x_of_u - v * w / jnp.pi) < 0.5 * dxw
    val_s = jnp.where(in_s & sel_s, fs_s / jnp.maximum(dxw, 1e-9), 0.0)

    val = jnp.where(jnp.abs(psi) > 1e-9, val_s, val_f)
    val = jnp.where(guards, val, 0.0)
    # front-side only, with the trailing cosTheta(wo) of eval()
    cos_ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    return jnp.where(cos_ok, jnp.maximum(val, 0.0) * wo[..., 2], 0.0)


# ---------------------------------------------------------------------------
# family module (registry dispatch)
# ---------------------------------------------------------------------------

def _cloth_res_from_gm(gm):
    return dict(u=gm.exponent, v=gm.alpha, umax=gm.beta_r,
                psi=gm.scale_tilt, kappa=gm.eta, w=gm.sigma_a[..., 0],
                l=gm.sigma_a[..., 1], is_weft=gm.sigma_a[..., 2] > 0.5)


class Cloth:
    @staticmethod
    def eval_pdf(gm, wi, wo, aux):
        res = _cloth_res_from_gm(gm)
        spec = _integrand(res, wi, wo, gm.transmit[..., 0],
                          gm.transmit[..., 1], gm.transmit[..., 2],
                          gm.k[..., 0])
        cos_ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
        f = gm.specular * spec[..., None] \
            + jnp.where(cos_ok, wo[..., 2], 0.0)[..., None] \
            * gm.diffuse / jnp.pi
        pdf = jnp.where(cos_ok, wo[..., 2] / jnp.pi, 0.0)
        return f, pdf

    @staticmethod
    def sample(gm, wi, u_lobe, u2, u2b, aux):
        n = wi.shape[:-1]
        # cosine-hemisphere sampling, as the reference (irawan.cpp:345)
        r = jnp.sqrt(jnp.maximum(u2[..., 0], 0.0))
        phi = 2.0 * jnp.pi * u2[..., 1]
        wo = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                        jnp.sqrt(jnp.maximum(1.0 - u2[..., 0], 0.0))], -1)
        f, pdf = Cloth.eval_pdf(gm, wi, wo, aux)
        weight = f / jnp.maximum(pdf, 1e-9)[..., None]
        weight = jnp.where((pdf > 0)[..., None], weight, 0.0)
        return wo, weight, pdf, jnp.zeros(n, bool), jnp.ones(n, jnp.float32)


R.register(CLOTH_KIND, Cloth)
