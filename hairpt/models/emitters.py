"""Emitters.

Design: every *environment-type* emitter (constant, envmap, sky, sun,
sunsky) is baked at scene-build time into ONE importance-sampled lat-long
radiance table — the TPU-native replacement for the reference's per-plugin
virtual emitters (src/emitters/{constant,envmap,sky,sun,sunsky}.cpp):
evaluation is a bilinear texture fetch and sampling is a two-level CDF
inversion, both branchless. The sun disc from sunsky is rasterized into the
table (resolution is chosen so the scaled disc spans many texels).

The sky model is Preetham et al. 97 (analytic, host-side numpy); the
reference uses Hosek-Wilkie (src/emitters/sky.cpp:218) — same capability,
different fit. The relative sun/sky scaling honours the scene XML's
skyScale/sunScale/sunRadiusScale parameters.

Area lights (emissive triangles), point, spot and directional emitters are
kept analytic, with a discrete CDF over emitter power for NEE selection
(reference: Scene::sampleEmitterDirect, src/librender/scene.cpp:828).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


TWO_PI = 2.0 * np.pi

# sun angular radius (degrees) — physical value, as in src/emitters/sun.cpp
SUN_APP_RADIUS_DEG = 0.5358 / 2.0


class EnvMap(NamedTuple):
    """Baked lat-long environment with an O(1) alias sampling table.

    The reference inverts a marginal/conditional CDF pair per sample
    (src/libcore/mipmap.h hierarchical warp); on TPU every CDF bisection
    step is a serialized scalar gather, so the bake builds a Vose alias
    table over the flat texel grid instead — sampling is 2 gathers
    (slot probability + alias index) and the pdf is 1 gather into the
    flat texel-pdf table, all branchless."""
    image: jnp.ndarray       # [H, W, 3] radiance
    to_world: jnp.ndarray    # [3, 3] rotation (emitter-local → world)
    to_local: jnp.ndarray    # [3, 3]
    alias_idx: jnp.ndarray   # [H*W] alias slot target
    alias_prob: jnp.ndarray  # [H*W] P(keep slot) in the alias method
    texel_pdf: jnp.ndarray   # [H*W] discrete texel probability


class AreaLights(NamedTuple):
    """Emissive triangles for NEE (reference: src/emitters/area.cpp)."""
    p0: jnp.ndarray        # [L, 3]
    e1: jnp.ndarray        # [L, 3]
    e2: jnp.ndarray        # [L, 3]
    n: jnp.ndarray         # [L, 3] geometric normal
    radiance: jnp.ndarray  # [L, 3]
    area: jnp.ndarray      # [L]
    cdf: jnp.ndarray       # [L] selection CDF (by power)
    tri_index: jnp.ndarray  # [L] index into the scene's sorted triangle array


POINT = 0
SPOT = 1
DIRECTIONAL = 2
COLLIMATED = 3


class DeltaLights(NamedTuple):
    """Point/spot/directional/collimated emitters (reference:
    src/emitters/{point,spot,directional,collimated}.cpp). All are delta
    distributions: only reachable via NEE, never by BSDF rays, so their MIS
    weight is 1. A collimated beam is a delta in *both* position and
    direction — direct sampling always fails (collimated.cpp:126-134
    'Direct sampling always fails for a response function on a 0D space'),
    so it contributes only through emitted rays (photon/particle tracing)."""
    kind: jnp.ndarray       # [L] POINT/SPOT/DIRECTIONAL/COLLIMATED
    position: jnp.ndarray   # [L, 3]
    direction: jnp.ndarray  # [L, 3] spot axis / directional emit direction
    intensity: jnp.ndarray  # [L, 3] point/spot: W/sr; directional: W/m²
    cos_cutoff: jnp.ndarray  # [L] spot outer angle
    cos_beam: jnp.ndarray    # [L] spot inner (full-strength) angle
    cdf: jnp.ndarray         # [L] selection CDF (by power luminance)


def make_delta_lights(entries) -> DeltaLights:
    """entries: list of dicts with keys kind/position/direction/intensity/
    cutoff_deg/beam_deg."""
    kind = np.array([e["kind"] for e in entries], np.int32)
    position = np.array([e.get("position", (0, 0, 0)) for e in entries],
                        np.float32)
    direction = np.array([e.get("direction", (0, 0, 1)) for e in entries],
                         np.float64)
    direction /= np.maximum(np.linalg.norm(direction, axis=-1,
                                           keepdims=True), 1e-12)
    intensity = np.array([e.get("intensity", (1, 1, 1)) for e in entries],
                         np.float32)
    cutoff = np.array([np.cos(np.radians(e.get("cutoff_deg", 20.0)))
                       for e in entries], np.float32)
    beam = np.array([np.cos(np.radians(e.get("beam_deg", 15.0)))
                     for e in entries], np.float32)
    lum = intensity @ np.array([0.212671, 0.715160, 0.072169],
                               np.float32)
    cdf = np.cumsum(lum + 1e-9)
    cdf /= cdf[-1]
    return DeltaLights(kind=jnp.asarray(kind),
                       position=jnp.asarray(position),
                       direction=jnp.asarray(direction, jnp.float32),
                       intensity=jnp.asarray(intensity),
                       cos_cutoff=jnp.asarray(cutoff),
                       cos_beam=jnp.asarray(beam),
                       cdf=jnp.asarray(cdf, jnp.float32))


def delta_light_sample(dl: DeltaLights, p, u):
    """Sample one delta light for shading point p.
    Returns (d [N,3], dist [N], contribution Le/pdf_positional [N,3],
    prob_selection [N])."""
    nl = dl.cdf.shape[0]
    l = jnp.clip(jnp.searchsorted(dl.cdf, u), 0, nl - 1)
    hi = dl.cdf[l]
    lo = jnp.where(l > 0, dl.cdf[jnp.maximum(l - 1, 0)], 0.0)
    prob = hi - lo
    kind = dl.kind[l]

    to_l = dl.position[l] - p
    d2 = jnp.sum(to_l * to_l, axis=-1)
    dist_p = jnp.sqrt(jnp.maximum(d2, 1e-20))
    d_point = to_l / dist_p[..., None]
    contrib_pt = dl.intensity[l] / jnp.maximum(d2, 1e-12)[..., None]

    # spot falloff (reference: spot.cpp falloffCurve, linear blend)
    cos_a = -jnp.sum(dl.direction[l] * d_point, axis=-1)
    cc = dl.cos_cutoff[l]
    cb = dl.cos_beam[l]
    fall = jnp.clip((cos_a - cc) / jnp.maximum(cb - cc, 1e-6), 0.0, 1.0)
    fall = jnp.where(cos_a >= cb, 1.0, fall)
    contrib_spot = contrib_pt * fall[..., None]

    d_dir = -dl.direction[l]
    contrib_dir = dl.intensity[l]

    is_dir = kind == DIRECTIONAL
    is_spot = kind == SPOT
    d = jnp.where(is_dir[..., None], d_dir, d_point)
    dist = jnp.where(is_dir, jnp.inf, dist_p)
    contrib = jnp.where(is_dir[..., None], contrib_dir,
                        jnp.where(is_spot[..., None], contrib_spot,
                                  contrib_pt))
    # collimated: direct sampling of a 0D response always fails
    # (collimated.cpp:126-134)
    contrib = jnp.where((kind == COLLIMATED)[..., None], 0.0, contrib)
    return d, dist, contrib, prob


def delta_emit(dl: DeltaLights, u_sel, u_dir, center, radius):
    """Sample an emitted ray from the delta-light set (light tracing /
    photon shooting; reference: {point,spot,directional,collimated}.cpp
    sampleRay). Returns (o [N,3], d [N,3], power [N,3]) where power is the
    per-ray flux estimate Φ/pdf already divided by the selection prob
    (caller divides by the photon count). center/radius describe the scene
    bounding sphere (directional emitters start on a tangent disk)."""
    from ..core import warps
    from ..core.math import coordinate_system
    nl = dl.cdf.shape[0]
    l = jnp.clip(jnp.searchsorted(dl.cdf, u_sel), 0, nl - 1)
    hi = dl.cdf[l]
    lo = jnp.where(l > 0, dl.cdf[jnp.maximum(l - 1, 0)], 0.0)
    prob = jnp.maximum(hi - lo, 1e-12)
    kind = dl.kind[l]
    pos = dl.position[l]
    axis = dl.direction[l]
    inten = dl.intensity[l]

    # point: uniform sphere, Φ = 4π·I
    d_sph = warps.square_to_uniform_sphere(u_dir)
    pw_point = inten * (4.0 * jnp.pi)

    # spot: uniform cone inside the cutoff, weighted by the falloff curve;
    # Φ/pdf = I·2π(1−cosCutoff)·falloff (spot.cpp sampleRay)
    cc = dl.cos_cutoff[l]
    cb = dl.cos_beam[l]
    s_a, t_a = coordinate_system(axis)
    cone = warps.square_to_uniform_cone(u_dir, cc)
    d_cone = s_a * cone[..., 0:1] + t_a * cone[..., 1:2] \
        + axis * cone[..., 2:3]
    cos_a = cone[..., 2]
    fall = jnp.clip((cos_a - cc) / jnp.maximum(cb - cc, 1e-6), 0.0, 1.0)
    fall = jnp.where(cos_a >= cb, 1.0, fall)
    pw_spot = inten * (TWO_PI * (1.0 - cc))[..., None] * fall[..., None]

    # directional: start on a tangent disk behind the scene; Φ = E·πR²
    disk = warps.square_to_uniform_disk_concentric(u_dir) * radius
    o_dir = center - axis * radius * 1.5 \
        + s_a * disk[..., 0:1] + t_a * disk[..., 1:2]
    pw_dir = inten * (jnp.pi * radius * radius)

    # collimated: exact beam; the intensity field stores total power Φ
    is_dir = (kind == DIRECTIONAL)[..., None]
    is_coll = (kind == COLLIMATED)[..., None]
    is_spot = (kind == SPOT)[..., None]
    o = jnp.where(is_dir, o_dir, pos)
    d = jnp.where(is_dir | is_coll, axis,
                  jnp.where(is_spot, d_cone, d_sph))
    pw = jnp.where(is_coll, inten,
                   jnp.where(is_dir, pw_dir,
                             jnp.where(is_spot, pw_spot, pw_point)))
    return o, d, pw / prob[..., None], (l, prob)


def area_emit(al: AreaLights, u_sel, u_tri, u_dir):
    """Sample an emitted ray from the area-light set (area.cpp
    samplePosition + cosine sampleDirection). Returns (o, d, n, power)
    with power = L·π·A/p_sel (flux estimate, divided by selection prob)."""
    from ..core import warps
    from ..core.math import coordinate_system
    nl = al.cdf.shape[0]
    l = jnp.clip(jnp.searchsorted(al.cdf, u_sel), 0, nl - 1)
    hi = al.cdf[l]
    lo = jnp.where(l > 0, al.cdf[jnp.maximum(l - 1, 0)], 0.0)
    prob = jnp.maximum(hi - lo, 1e-12)
    b = warps.square_to_uniform_triangle(u_tri)
    o = al.p0[l] + al.e1[l] * b[..., 0:1] + al.e2[l] * b[..., 1:2]
    n = al.n[l]
    s_a, t_a = coordinate_system(n)
    loc = warps.square_to_cosine_hemisphere(u_dir)
    d = s_a * loc[..., 0:1] + t_a * loc[..., 1:2] + n * loc[..., 2:3]
    pw = al.radiance[l] * (jnp.pi * al.area[l] / prob)[..., None]
    return o, d, n, pw


# ---------------------------------------------------------------------------
# environment baking
# ---------------------------------------------------------------------------

def _build_alias_table(weights: np.ndarray):
    """Vose alias method over the flat weight array (O(N) build).
    Returns (alias_idx [N] int32, alias_prob [N] float32, pdf [N] float64)."""
    w = np.asarray(weights, np.float64).reshape(-1)
    n = w.size
    pdf = w / w.sum()
    scaled = pdf * n
    alias = np.arange(n, dtype=np.int32)
    prob = np.ones(n, np.float64)
    small = list(np.nonzero(scaled < 1.0)[0][::-1])
    large = list(np.nonzero(scaled >= 1.0)[0][::-1])
    while small and large:
        s = small.pop()
        g = large.pop()
        prob[s] = scaled[s]
        alias[s] = g
        scaled[g] = (scaled[g] + scaled[s]) - 1.0
        (small if scaled[g] < 1.0 else large).append(g)
    # leftovers are ≈1 up to rounding
    for i in small + large:
        prob[i] = 1.0
    return alias, prob.astype(np.float32), pdf


def make_envmap(image: np.ndarray, to_world3: Optional[np.ndarray] = None,
                scale: float = 1.0) -> EnvMap:
    image = np.asarray(image, np.float32) * scale
    if to_world3 is None:
        to_world3 = np.eye(3)
    h = image.shape[0]
    lum = image @ np.array([0.212671, 0.715160, 0.072169])
    theta = (np.arange(h) + 0.5) / h * np.pi
    weights = lum * np.sin(theta)[:, None] + 1e-12
    alias_idx, alias_prob, pdf = _build_alias_table(weights)
    return EnvMap(image=jnp.asarray(image),
                  to_world=jnp.asarray(to_world3, jnp.float32),
                  to_local=jnp.asarray(np.linalg.inv(to_world3), jnp.float32),
                  alias_idx=jnp.asarray(alias_idx),
                  alias_prob=jnp.asarray(alias_prob),
                  texel_pdf=jnp.asarray(pdf, jnp.float32))


def make_constant(radiance, res: int = 8) -> EnvMap:
    img = np.broadcast_to(np.asarray(radiance, np.float32),
                          (res, 2 * res, 3)).copy()
    return make_envmap(img)


# --- Preetham sky ----------------------------------------------------------

def _perez(theta, gamma, A, B, C, D, E):
    cg = np.cos(gamma)
    return (1.0 + A * np.exp(B / np.maximum(np.cos(theta), 0.01))) \
        * (1.0 + C * np.exp(D * gamma) + E * cg * cg)


def _preetham_sky_xyY(theta, gamma, theta_s, T):
    """Preetham sky luminance/chromaticity (theta: view zenith angle,
    gamma: angle to sun, theta_s: sun zenith angle, T: turbidity)."""
    # Perez coefficients
    AY, BY, CY, DY, EY = (0.1787 * T - 1.4630, -0.3554 * T + 0.4275,
                          -0.0227 * T + 5.3251, 0.1206 * T - 2.5771,
                          -0.0670 * T + 0.3703)
    Ax, Bx, Cx, Dx, Ex = (-0.0193 * T - 0.2592, -0.0665 * T + 0.0008,
                          -0.0004 * T + 0.2125, -0.0641 * T - 0.8989,
                          -0.0033 * T + 0.0452)
    Ay, By, Cy, Dy, Ey = (-0.0167 * T - 0.2608, -0.0950 * T + 0.0092,
                          -0.0079 * T + 0.2102, -0.0441 * T - 1.6537,
                          -0.0109 * T + 0.0529)

    chi = (4.0 / 9.0 - T / 120.0) * (np.pi - 2 * theta_s)
    Yz = (4.0453 * T - 4.9710) * np.tan(chi) - 0.2155 * T + 2.4192  # kcd/m2
    ts = theta_s
    tv = np.array([ts ** 3, ts ** 2, ts, 1.0])
    Tm = np.array([T * T, T, 1.0])
    xz = Tm @ np.array([[0.00166, -0.00375, 0.00209, 0.0],
                        [-0.02903, 0.06377, -0.03202, 0.00394],
                        [0.11693, -0.21196, 0.06052, 0.25886]]) @ tv
    yz = Tm @ np.array([[0.00275, -0.00610, 0.00317, 0.0],
                        [-0.04214, 0.08970, -0.04153, 0.00516],
                        [0.15346, -0.26756, 0.06670, 0.26688]]) @ tv

    Y = Yz * _perez(theta, gamma, AY, BY, CY, DY, EY) \
        / np.maximum(_perez(0.0, theta_s, AY, BY, CY, DY, EY), 1e-6)
    x = xz * _perez(theta, gamma, Ax, Bx, Cx, Dx, Ex) \
        / np.maximum(_perez(0.0, theta_s, Ax, Bx, Cx, Dx, Ex), 1e-6)
    y = yz * _perez(theta, gamma, Ay, By, Cy, Dy, Ey) \
        / np.maximum(_perez(0.0, theta_s, Ay, By, Cy, Dy, Ey), 1e-6)
    return Y, x, y


def _xyY_to_rgb(Y, x, y):
    y = np.maximum(y, 1e-6)
    X = x / y * Y
    Z = (1 - x - y) / y * Y
    M = np.array([[3.240479, -1.537150, -0.498535],
                  [-0.969256, 1.875991, 0.041556],
                  [0.055648, -0.204043, 1.057311]])
    xyz = np.stack([X, Y, Z], axis=-1)
    return np.maximum(xyz @ M.T, 0.0)


def _sun_radiance_rgb(theta_s, T):
    """Full Preetham solar radiance at the earth's surface in linear sRGB
    (reference: computeSunRadiance, src/emitters/sunsky/sunmodel.h:316-341
    — the paper's Rayleigh/aerosol/ozone/mixed-gas/water-vapor attenuation
    of the extraterrestrial solar spectrum, integrated against the CIE
    matching functions with mitsuba's ∫ȳ normalization)."""
    import os
    from ..core import spectral
    data = np.load(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "data",
        "sun_spectra.npz"))
    cos_t = max(np.cos(theta_s), 0.0)
    theta_deg = np.degrees(theta_s)
    m = 1.0 / (cos_t + 0.15 * (93.885 - theta_deg) ** -1.253)
    beta = 0.04608365822050 * T - 0.04586025928522
    lam = np.arange(350.0, 801.0, 5.0)            # nm (the reference grid)
    k_o = np.interp(lam, data["k_oWavelengths"], data["k_oAmplitudes"])
    k_g = np.interp(lam, data["k_gWavelengths"], data["k_gAmplitudes"])
    k_wa = np.interp(lam, data["k_waWavelengths"], data["k_waAmplitudes"])
    sol = np.interp(lam, data["solWavelengths"], data["solAmplitudes"])
    tau_r = np.exp(-m * 0.008735 * (lam / 1000.0) ** -4.08)
    tau_a = np.exp(-m * beta * (lam / 1000.0) ** -1.3)
    tau_o = np.exp(-m * k_o * 0.35)
    tau_g = np.exp(-1.41 * k_g * m / (1 + 118.93 * k_g * m) ** 0.45)
    w = 2.0
    tau_wa = np.exp(-0.2385 * k_wa * w * m
                    / (1 + 20.07 * k_wa * w * m) ** 0.45)
    spec = sol * tau_r * tau_a * tau_o * tau_g * tau_wa     # [L]
    cmf = np.asarray(spectral.cmf_xyz(lam))                 # [L, 3]
    xyz = (spec[:, None] * cmf).sum(0) * 5.0 / 106.856895   # ∫ȳ dλ norm
    rgb = spectral.XYZ_TO_RGB @ xyz
    return np.maximum(rgb, 0.0)


def bake_sunsky(sun_dir, turbidity: float = 3.0, sky_scale: float = 1.0,
                sun_scale: float = 1.0, sun_radius_scale: float = 1.0,
                res: int = 512, with_sun: bool = True,
                with_sky: bool = True, model: str = "hosek",
                albedo=0.15) -> EnvMap:
    """Rasterize the sun+sky model into a lat-long table.

    World convention matches the reference sky plugins: y is up.
    model: 'hosek' (Hosek-Wilkie 2012 — what the reference sky/sunsky
    plugins evaluate, src/emitters/sky.cpp:246) or 'preetham'
    (round-1 stand-in fit, kept for comparison); albedo = ground albedo
    (reference default 0.15)."""
    h, w = res, 2 * res
    sun_dir = np.asarray(sun_dir, np.float64)
    sun_dir = sun_dir / np.linalg.norm(sun_dir)
    theta_s = np.arccos(np.clip(sun_dir[1], -1, 1))

    v = (np.arange(h) + 0.5) / h
    u = (np.arange(w) + 0.5) / w
    theta = v * np.pi
    phi = u * TWO_PI
    st = np.sin(theta)[:, None]
    d = np.stack([st * np.sin(phi)[None, :],
                  np.broadcast_to(np.cos(theta)[:, None], (h, w)),
                  st * (-np.cos(phi)[None, :])], axis=-1)  # mitsuba uv→dir

    img = np.zeros((h, w, 3), np.float32)
    cos_gamma = np.clip(d @ sun_dir, -1, 1)
    gamma = np.arccos(cos_gamma)

    if with_sky and theta_s < np.pi / 2:
        zen = np.broadcast_to(theta[:, None], (h, w))
        if model == "hosek":
            from . import hosek
            cfg, rad = hosek.cook_configuration(
                turbidity, albedo, np.pi / 2 - theta_s)
            rgb = hosek.sky_radiance(cfg, rad,
                                     np.cos(np.minimum(zen,
                                                       np.pi / 2 - 1e-3)),
                                     cos_gamma)
            # mitsuba's tristimulus normalization: the arhosek RGB
            # radiance divided by ∫ȳdλ (sky.cpp:434 "/ 106.856980")
            rgb = rgb / 106.856980
        else:
            Y, x, y = _preetham_sky_xyY(np.minimum(zen, np.pi / 2 - 0.001),
                                        gamma, theta_s, turbidity)
            rgb = _xyY_to_rgb(Y, x, y)
            # kcd/m^2-ish → roughly unit-luminance sky, then skyScale
            rgb = rgb * 0.02
        rgb[zen > np.pi / 2] = 0.0  # below horizon
        img += (sky_scale * rgb).astype(np.float32)

    if with_sun and theta_s < np.pi / 2:
        sun_r0 = np.radians(SUN_APP_RADIUS_DEG)
        sun_r = sun_r0 * sun_radius_scale
        # physical solar radiance, diluted so sunRadiusScale preserves the
        # total power (reference: sun.cpp:180-202 — the bake integrates
        # m_radiance over the UNSCALED solid angle and spreads it across
        # the scaled cone)
        rad0 = _sun_radiance_rgb(theta_s, turbidity)
        omega0 = TWO_PI * (1.0 - np.cos(sun_r0))
        omega = TWO_PI * (1.0 - np.cos(sun_r))
        disc = gamma <= sun_r
        L_sun = rad0 * (omega0 / omega)
        img[disc] += (sun_scale * L_sun).astype(np.float32)

    return make_envmap(img)


# ---------------------------------------------------------------------------
# environment queries (device)
# ---------------------------------------------------------------------------

def env_uv_from_dir(env: EnvMap, d_world):
    """Mitsuba envmap mapping (src/emitters/envmap.cpp): u from atan2(x,-z),
    v from acos(y)."""
    d = d_world @ env.to_local.T
    phi = jnp.arctan2(d[..., 0], -d[..., 2])
    phi = jnp.where(phi < 0, phi + TWO_PI, phi)
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    return phi / TWO_PI, theta / jnp.pi


def env_eval(env: EnvMap, d_world):
    """Bilinear radiance lookup in direction d_world [..., 3]."""
    h, w = env.image.shape[:2]
    u, v = env_uv_from_dir(env, d_world)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0m = jnp.mod(x0, w)
    x1m = jnp.mod(x0 + 1, w)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y0 + 1, 0, h - 1)
    img = env.image
    return ((img[y0c, x0m] * (1 - fx) + img[y0c, x1m] * fx) * (1 - fy)
            + (img[y1c, x0m] * (1 - fx) + img[y1c, x1m] * fx) * fy)


def env_sample(env: EnvMap, u2):
    """Importance-sample a direction ∝ luminance·sinθ via the alias table:
    u2.x picks a slot, u2.y flips slot-vs-alias — O(1), 2 gathers, no CDF
    bisection (replaces the reference's hierarchical mipmap warp,
    src/libcore/mipmap.h / envmap.cpp:324 internalSampleDirection).
    Returns (d_world [N,3], radiance [N,3], pdf_solid_angle [N])."""
    h, w = env.image.shape[:2]
    n = h * w
    slot = jnp.clip((u2[..., 0] * n).astype(jnp.int32), 0, n - 1)
    keep = u2[..., 1] < env.alias_prob[slot]
    idx = jnp.where(keep, slot, env.alias_idx[slot])
    iy = idx // w
    ix = idx - iy * w
    v = (iy.astype(jnp.float32) + 0.5) / h
    u = (ix.astype(jnp.float32) + 0.5) / w
    theta = v * jnp.pi
    phi = u * TWO_PI
    st = jnp.sin(theta)
    d_local = jnp.stack([st * jnp.sin(phi), jnp.cos(theta),
                         -st * jnp.cos(phi)], axis=-1)
    d_world = d_local @ env.to_world.T
    pdf = env.texel_pdf[idx] * (h * w) / (2.0 * jnp.pi * jnp.pi
                                          * jnp.maximum(st, 1e-5))
    radiance = env.image[iy, ix]
    return d_world, radiance, pdf


def env_pdf(env: EnvMap, d_world):
    h, w = env.image.shape[:2]
    u, v = env_uv_from_dir(env, d_world)
    ix = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    iy = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    st = jnp.sin(jnp.clip(v, 1e-4, 1 - 1e-4) * jnp.pi)
    pdf_texel = env.texel_pdf[iy * w + ix]
    return pdf_texel * (h * w) / (2.0 * jnp.pi * jnp.pi
                                  * jnp.maximum(st, 1e-5))
