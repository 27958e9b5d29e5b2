"""Vector/geometry math on batched jnp arrays.

Everything operates on arrays with a trailing axis of size 3 (SoA-friendly,
vectorizes onto the TPU VPU). This is the TPU-native replacement for the
reference's scalar Vector/Point/Frame/Transform classes
(reference: include/mitsuba/core/{vector,transform,frame,aabb}.h).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from typing import NamedTuple

EPS = 1e-4  # ray epsilon, mirrors Mitsuba's Epsilon (core/constants.h)
INF = jnp.inf


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(a):
    return jnp.sqrt(jnp.maximum(jnp.sum(a * a, axis=-1), 0.0))


def length_sq(a):
    return jnp.sum(a * a, axis=-1)


def normalize(a, eps: float = 1e-20):
    return a * jax.lax.rsqrt(jnp.maximum(jnp.sum(a * a, axis=-1, keepdims=True), eps))


def safe_sqrt(x):
    """sqrt clamped at 0 with a finite gradient at the boundary.

    The naive sqrt(max(x,0)) has an infinite derivative at 0 which turns
    into NaN through `jnp.where` branches (0·inf); clamping the argument
    inside the sqrt keeps reverse-mode finite while the forward value is
    exact for x > 0 and exactly 0 otherwise."""
    return jnp.where(x > 0.0, jnp.sqrt(jnp.maximum(x, 1e-12)), 0.0)


def lerp(a, b, t):
    return a + (b - a) * t


def vec3(x, y, z):
    return jnp.stack(jnp.broadcast_arrays(
        jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.asarray(z, jnp.float32)), axis=-1)


def reflect_z(w):
    """Mirror reflection about local z axis: (-x, -y, z)."""
    return w * jnp.asarray([-1.0, -1.0, 1.0], w.dtype)


# ---------------------------------------------------------------------------
# Orthonormal frames
# ---------------------------------------------------------------------------

class Frame(NamedTuple):
    """Orthonormal shading frame; n is the z axis in local coordinates.

    Matches the reference convention (include/mitsuba/core/frame.h):
    local = (dot(s, v), dot(t, v), dot(n, v)).
    """
    s: jnp.ndarray  # tangent    -> local x
    t: jnp.ndarray  # bitangent  -> local y
    n: jnp.ndarray  # normal     -> local z

    def to_local(self, v):
        return jnp.stack([dot(self.s, v), dot(self.t, v), dot(self.n, v)], axis=-1)

    def to_world(self, v):
        return (self.s * v[..., 0:1] + self.t * v[..., 1:2] + self.n * v[..., 2:3])


def coordinate_system(n):
    """Build (s, t) ⟂ n. Branchless Duff et al. / Frisvad construction."""
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    s = jnp.stack([1.0 + sign * n[..., 0] * n[..., 0] * a,
                   sign * b,
                   -sign * n[..., 0]], axis=-1)
    t = jnp.stack([b,
                   sign + n[..., 1] * n[..., 1] * a,
                   -n[..., 1]], axis=-1)
    return s, t


def frame_from_normal(n) -> Frame:
    s, t = coordinate_system(n)
    return Frame(s=s, t=t, n=n)


def frame_cos_theta(w):
    return w[..., 2]


def frame_sin_theta2(w):
    return jnp.maximum(1.0 - w[..., 2] * w[..., 2], 0.0)


# ---------------------------------------------------------------------------
# Rays (SoA pytree)
# ---------------------------------------------------------------------------

class Ray(NamedTuple):
    o: jnp.ndarray      # [..., 3] origin
    d: jnp.ndarray      # [..., 3] direction (normalized)
    mint: jnp.ndarray   # [...]
    maxt: jnp.ndarray   # [...]

    def at(self, t):
        return self.o + self.d * t[..., None]


def make_ray(o, d, mint=EPS, maxt=INF) -> Ray:
    batch = jnp.broadcast_shapes(o.shape[:-1], d.shape[:-1])
    return Ray(o=jnp.broadcast_to(o, batch + (3,)),
               d=jnp.broadcast_to(d, batch + (3,)),
               mint=jnp.broadcast_to(jnp.asarray(mint, jnp.float32), batch),
               maxt=jnp.broadcast_to(jnp.asarray(maxt, jnp.float32), batch))


# ---------------------------------------------------------------------------
# 4x4 transforms (host-side, numpy: used at scene build time only)
# ---------------------------------------------------------------------------

def transform_point(m, p):
    """Apply 4x4 matrix m to points p [..., 3]."""
    m = jnp.asarray(m, jnp.float32)
    r = p @ m[:3, :3].T + m[:3, 3]
    return r


def transform_vector(m, v):
    m = jnp.asarray(m, jnp.float32)
    return v @ m[:3, :3].T


def transform_normal(m, n):
    """Normals transform by the inverse transpose."""
    m = np.asarray(m, np.float64)
    it = np.linalg.inv(m[:3, :3]).T
    return n @ jnp.asarray(it.T, jnp.float32).T


def perspective_matrix(fov_deg: float, near: float, far: float) -> np.ndarray:
    """Mitsuba-style perspective projection (x-fov in degrees), maps the view
    frustum to [0,1]^2 on xy at z=1 (reference: src/sensors/perspective.cpp:139-178
    'm_cameraToSample')."""
    recip = 1.0 / (far - near)
    cot = 1.0 / np.tan(np.radians(fov_deg) / 2.0)
    m = np.array([
        [cot, 0, 0, 0],
        [0, cot, 0, 0],
        [0, 0, far * recip, -near * far * recip],
        [0, 0, 1, 0]], np.float64)
    return m


def matrix_lookat(origin, target, up) -> np.ndarray:
    """Camera-to-world matrix, Mitsuba convention: camera looks down +z,
    x points left-to-right in image, y up (reference: core/transform.cpp lookAt)."""
    origin = np.asarray(origin, np.float64)
    d = np.asarray(target, np.float64) - origin
    d /= np.linalg.norm(d)
    left = np.cross(np.asarray(up, np.float64), d)
    left /= np.linalg.norm(left)
    new_up = np.cross(d, left)
    m = np.eye(4)
    m[:3, 0] = left
    m[:3, 1] = new_up
    m[:3, 2] = d
    m[:3, 3] = origin
    return m
