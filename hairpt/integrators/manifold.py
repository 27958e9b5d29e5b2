"""Specular manifold walk (batched).

Capability counterpart of the reference's SpecularManifold
(include/mitsuba/bidir/manifold.h:35, src/libbidir/manifold.cpp — Jakob &
Marschner 2012 "Manifold exploration"): given a path segment
a → x → b whose middle vertex is specular (mirror reflection or
refraction), move x on the surface until the generalized half-vector
constraint is satisfied, i.e. the segment is a valid specular chain.

TPU-native redesign: instead of the reference's per-path 2×2 block
tridiagonal solve over SimpleVertex arrays, this walks N chains in
parallel as a fixed-iteration Newton loop over SoA lanes:

  constraint  c(x) = [s·h, t·h]  with  h = ŵa + η·ŵb  (η=1 → reflection),
              ŵa = normalize(a−x), ŵb = normalize(b−x), (s,t) ⟂ n(x)
  Jacobian    2×2 by symmetric finite differences along the tangent frame
              (replaces the closed-form dndu/dpdu assembly — equivalent to
              first order, and robust to any underlying shape)
  step        x ← project(x + Δu·s + Δv·t): the displaced point is
              re-projected onto the geometry by tracing the ray a→x′
              (manifold.cpp project()), which also refreshes n(x).

Single-vertex chains cover the reference's own dominant use cases (lens /
caustic manifold perturbations, specular motion flow 'rd'/'td' configs);
longer chains can be driven by calling walk once per vertex in a
Gauss-Seidel sweep.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import Ray, dot, normalize
from .common import scene_intersect
from .aux_integrators import _swept_params


def _constraint(a, b, x, n, eta):
    """Specular constraint at x: tangential components of the DIFFERENCE
    between the actual direction to b and the mirror/Snell-predicted
    direction of the ray a→x. Same zero set as Jakob & Marschner's
    generalized-half-vector form c = tang(ŵa + η·ŵb), but conditioned
    uniformly in η: the half-vector form degenerates as η→1 for
    transmission (‖ŵa + η·ŵb‖ → 0, so normalizing amplifies the error by
    1/|1−η|), while the direction difference is always O(angular error).

    eta convention (matches the callers): η = n_dest/n_src as seen from
    the a-side; η == 1 means mirror reflection."""
    wa = normalize(a - x)
    wb = normalize(b - x)
    cos_s = dot(wa, n)
    n_o = jnp.where(cos_s[..., None] < 0, -n, n)   # oriented toward a
    cosi = jnp.abs(cos_s)
    refl = 2.0 * cosi[..., None] * n_o - wa
    inv_eta = 1.0 / jnp.maximum(eta, 1e-6)         # = n_src/n_dest
    k = 1.0 - inv_eta ** 2 * (1.0 - cosi ** 2)
    cost = jnp.sqrt(jnp.maximum(k, 0.0))           # TIR lanes never pass tol
    refr = -inv_eta[..., None] * wa \
        + (inv_eta * cosi - cost)[..., None] * n_o
    d_pred = jnp.where((eta == 1.0)[..., None], refl, refr)
    diff = wb - d_pred
    from ..core.math import coordinate_system
    s, t = coordinate_system(n)
    return jnp.stack([dot(s, diff), dot(t, diff)], -1), (s, t)


def walk(arr, cfg, a, b, hit0, eta=None, n_iters: int = 16,
         step_scale: float = 1.0, tol: float = 1e-4):
    """Move the specular vertex hit0 (a Hit from scene_intersect) so that
    a → x → b becomes a valid specular chain.

    a, b    [N, 3] fixed endpoints
    hit0    initial Hit for the middle vertex (x = hit0.p, n = hit0.sh_n)
    eta     [N] relative IOR per lane (None / 1.0 = mirror reflection)

    Returns (x [N,3], n [N,3], ok [N]) — ok lanes satisfied |c| < tol.
    """
    n_l = a.shape[0]
    if eta is None:
        eta = jnp.ones((n_l,), jnp.float32)

    x = hit0.p
    n = hit0.sh_n
    valid = hit0.valid
    # finite-difference scale: fraction of local chord length
    fd = 1e-3 * jnp.minimum(jnp.linalg.norm(a - x, axis=-1),
                            jnp.linalg.norm(b - x, axis=-1)) + 1e-7

    def reproject(x_new):
        """Trace a→x′ to put the displaced point back on the geometry
        (manifold.cpp project()); returns (x, n, hit_ok). The ray skips
        the first 1% of the chord so an endpoint that itself lies ON
        scene geometry (an interior path vertex) does not self-hit."""
        d = x_new - a
        dist = jnp.linalg.norm(d, axis=-1)
        d = d / jnp.maximum(dist, 1e-12)[..., None]
        ray = Ray(o=a, d=d, mint=0.01 * dist,
                  maxt=jnp.where(valid, jnp.inf, 0.0))
        h = scene_intersect(arr, ray, cfg.traversal, cfg.block,
                            _swept_params(cfg))
        return h.p, h.sh_n, h.valid

    def probe(x_disp):
        """Constraint at the REPROJECTED displaced point — the finite
        difference therefore includes the surface's normal field (the
        dndu/dndv terms of manifold.cpp's closed-form Jacobian), which is
        essential on curved geometry."""
        xp, np_, hp = reproject(x_disp)
        c, _ = _constraint(a, b, xp, np_, eta)
        return c, hp

    for _ in range(n_iters):
        c, (s, t) = _constraint(a, b, x, n, eta)
        cp_u, ok_u = probe(x + s * fd[..., None])
        cm_u, ok_u2 = probe(x - s * fd[..., None])
        cp_v, ok_v = probe(x + t * fd[..., None])
        cm_v, ok_v2 = probe(x - t * fd[..., None])
        fd_ok = ok_u & ok_u2 & ok_v & ok_v2
        j00 = (cp_u[..., 0] - cm_u[..., 0]) / (2 * fd)
        j10 = (cp_u[..., 1] - cm_u[..., 1]) / (2 * fd)
        j01 = (cp_v[..., 0] - cm_v[..., 0]) / (2 * fd)
        j11 = (cp_v[..., 1] - cm_v[..., 1]) / (2 * fd)
        det = j00 * j11 - j01 * j10
        inv = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
        du = -(j11 * c[..., 0] - j01 * c[..., 1]) * inv
        dv = -(-j10 * c[..., 0] + j00 * c[..., 1]) * inv
        # trust region: clamp the step to a fraction of the chord
        max_step = step_scale * jnp.minimum(
            jnp.linalg.norm(a - x, axis=-1),
            jnp.linalg.norm(b - x, axis=-1)) * 0.5
        mag = jnp.sqrt(du * du + dv * dv)
        scale = jnp.minimum(1.0, max_step / jnp.maximum(mag, 1e-12))
        du = du * scale
        dv = dv * scale
        x_new = x + s * du[..., None] + t * dv[..., None]
        xp, np_, hp = reproject(x_new)
        # a failed step (ray misses / singular Jacobian) leaves the lane
        # where it was — it may still converge from there next iteration
        good = hp & fd_ok & (jnp.abs(det) > 1e-12)
        x = jnp.where(good[..., None], xp, x)
        n = jnp.where(good[..., None], np_, n)

    c_fin, _ = _constraint(a, b, x, n, eta)
    ok = valid & (jnp.linalg.norm(c_fin, axis=-1) < tol)
    return x, n, ok


def generalized_g(a, b, x, n, eta=None, fd: float = 1e-4):
    """Generalized geometric term of the chain a → x → b (manifold.h G()):
    |dA_b / dω_a| compression of the specular vertex, estimated by the
    same finite-difference machinery the walk uses. Returns [N]."""
    # classical G(a↔x) modulated by the specular transfer |det T|
    n_l = a.shape[0]
    if eta is None:
        eta = jnp.ones((n_l,), jnp.float32)
    wa = normalize(x - a)
    d2 = jnp.sum((x - a) ** 2, -1)
    g_ax = jnp.abs(dot(wa, n)) / jnp.maximum(d2, 1e-12)
    c, (s, t) = _constraint(a, b, x, n, eta)
    # transfer determinant: how the constraint moves with b vs with x
    fdv = fd * (jnp.sqrt(d2) + 1e-6)
    from ..core.math import coordinate_system
    sb, tb = coordinate_system(normalize(b - x))
    out = []
    for db in (sb, tb):
        cb, _ = _constraint(a, b + db * fdv[..., None], x, n, eta)
        out.append((cb - c) / fdv[..., None])
    jb = jnp.stack(out, -1)                       # [N, 2, 2] dc/db
    outx = []
    for dx in (s, t):
        cx, _ = _constraint(a, b, x + dx * fdv[..., None], n, eta)
        outx.append((cx - c) / fdv[..., None])
    jx = jnp.stack(outx, -1)                      # [N, 2, 2] dc/dx
    det_b = jb[:, 0, 0] * jb[:, 1, 1] - jb[:, 0, 1] * jb[:, 1, 0]
    det_x = jx[:, 0, 0] * jx[:, 1, 1] - jx[:, 0, 1] * jx[:, 1, 0]
    ratio = jnp.abs(det_b) / jnp.maximum(jnp.abs(det_x), 1e-12)
    return g_ax * ratio
