"""Sensors (cameras).

Capability parity with the reference sensor plugins (src/sensors/):
perspective, thinlens, orthographic, spherical, radiancemeter. Ray
generation is a pure batched function of continuous film coordinates, so a
whole wavefront of primary rays is produced in one fused kernel
(reference: src/sensors/perspective.cpp:247-296 sampleRay[Differential]).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.math import Ray, normalize
from ..core import warps

PERSPECTIVE = 0
THINLENS = 1
ORTHOGRAPHIC = 2
SPHERICAL = 3
TELECENTRIC = 4       # src/sensors/telecentric.cpp
RADIANCEMETER = 5     # src/sensors/radiancemeter.cpp
FLUENCEMETER = 6      # src/sensors/fluencemeter.cpp
IRRADIANCEMETER = 7   # src/sensors/irradiancemeter.cpp
PERSPECTIVE_RDIST = 8  # src/sensors/perspective_rdist.cpp


class Camera(NamedTuple):
    kind: int
    to_world: jnp.ndarray      # [4, 4] camera→world (rigid)
    tan_half_fov: jnp.ndarray  # scalar, tan(xfov/2)
    aspect: float              # width / height
    width: int
    height: int
    near: float = 1e-2
    far: float = 1e4
    aperture_radius: float = 0.0
    focus_distance: float = 1.0
    kc0: float = 0.0           # radial distortion r² coefficient
    kc1: float = 0.0           # radial distortion r⁴ coefficient

    @staticmethod
    def perspective(to_world, fov_deg: float, width: int, height: int,
                    fov_axis: str = "x", near: float = 1e-2, far: float = 1e4,
                    aperture_radius: float = 0.0, focus_distance: float = 1.0,
                    kind: int = PERSPECTIVE) -> "Camera":
        aspect = width / height
        fov = np.radians(fov_deg)
        if fov_axis == "y":
            # convert y-fov to x-fov (reference: PerspectiveCamera::configure,
            # src/librender/sensor.cpp:318-336)
            fov = 2.0 * np.arctan(np.tan(fov / 2.0) * aspect)
        elif fov_axis == "smaller":
            if aspect < 1:
                pass
            else:
                fov = 2.0 * np.arctan(np.tan(fov / 2.0) * aspect)
        elif fov_axis == "diagonal":
            diag = np.hypot(aspect, 1.0)
            fov = 2.0 * np.arctan(np.tan(fov / 2.0) * aspect / diag)
        # HOST arrays on purpose: cameras are captured as closure
        # constants by jitted waves, and lowering embeds device-resident
        # constants by VALUE through a device→host fetch that costs
        # minutes over the axon compile tunnel (even for scalars). numpy
        # constants embed directly.
        return Camera(kind=kind,
                      to_world=np.asarray(to_world, np.float32),
                      tan_half_fov=np.asarray(np.tan(fov / 2.0),
                                              np.float32),
                      aspect=aspect, width=width, height=height, near=near,
                      far=far, aperture_radius=aperture_radius,
                      focus_distance=focus_distance)


def sample_ray(cam: Camera, pos, aperture_sample=None) -> Ray:
    """Generate camera rays for continuous film positions pos [N, 2]
    (in [0,W]x[0,H]; pixel centers at i+0.5).

    Conventions follow the reference exactly: with u,v = pos / resolution,
    the camera-space direction is ((1-2u)·tan, (1-2v)·tan/aspect, 1)
    — camera x points screen-left, y up, z forward
    (derived from m_cameraToSample, src/sensors/perspective.cpp:148-158).
    """
    u = pos[..., 0] / cam.width
    v = pos[..., 1] / cam.height
    t = cam.tan_half_fov
    near_p = jnp.stack([(1.0 - 2.0 * u) * t,
                        (1.0 - 2.0 * v) * t / cam.aspect,
                        jnp.ones_like(u)], axis=-1)

    R = cam.to_world[:3, :3]
    o_world = cam.to_world[:3, 3]

    if cam.kind == ORTHOGRAPHIC:
        d_cam = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                                 near_p.shape)
        o_cam = near_p.at[..., 2].set(0.0)
        o = o_cam @ R.T + o_world
        d = d_cam @ R.T
        return Ray(o=o, d=d,
                   mint=jnp.full(u.shape, cam.near, jnp.float32),
                   maxt=jnp.full(u.shape, cam.far, jnp.float32))

    if cam.kind == SPHERICAL:
        # lat-long mapping over the full sphere (reference: src/sensors/spherical.cpp)
        phi = (1.0 - 2.0 * u) * jnp.pi
        theta = v * jnp.pi
        st, ct = jnp.sin(theta), jnp.cos(theta)
        d_cam = jnp.stack([st * jnp.sin(phi), ct, -st * jnp.cos(phi)], axis=-1)
        d = d_cam @ R.T
        o = jnp.broadcast_to(o_world, d.shape)
        return Ray(o=o, d=d,
                   mint=jnp.full(u.shape, cam.near, jnp.float32),
                   maxt=jnp.full(u.shape, cam.far, jnp.float32))

    if cam.kind == RADIANCEMETER:
        # single-direction probe: every sample measures along +z
        # (reference: src/sensors/radiancemeter.cpp sampleRay)
        d_cam = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                                 near_p.shape)
        o = jnp.broadcast_to(o_world, d_cam.shape)
        return Ray(o=o, d=d_cam @ R.T,
                   mint=jnp.full(u.shape, cam.near, jnp.float32),
                   maxt=jnp.full(u.shape, cam.far, jnp.float32))

    if cam.kind == FLUENCEMETER:
        # point fluence probe: uniform-sphere directions from the film
        # coordinates (reference: src/sensors/fluencemeter.cpp; develop
        # averages over the sphere → fluence / 4π)
        z = 1.0 - 2.0 * v
        r_ = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        phi = 2.0 * jnp.pi * u
        d_cam = jnp.stack([r_ * jnp.cos(phi), r_ * jnp.sin(phi), z],
                          axis=-1)
        o = jnp.broadcast_to(o_world, d_cam.shape)
        return Ray(o=o, d=d_cam @ R.T,
                   mint=jnp.full(u.shape, cam.near, jnp.float32),
                   maxt=jnp.full(u.shape, cam.far, jnp.float32))

    if cam.kind == IRRADIANCEMETER:
        # cosine-weighted hemisphere around +z; the film average is then
        # E/π (reference: src/sensors/irradiancemeter.cpp attaches to a
        # shape; this headless variant probes at the sensor origin)
        r_ = jnp.sqrt(jnp.clip(v, 0.0, 1.0))
        phi = 2.0 * jnp.pi * u
        z = jnp.sqrt(jnp.maximum(1.0 - r_ * r_, 0.0))
        d_cam = jnp.stack([r_ * jnp.cos(phi), r_ * jnp.sin(phi), z],
                          axis=-1)
        o = jnp.broadcast_to(o_world, d_cam.shape)
        return Ray(o=o, d=d_cam @ R.T,
                   mint=jnp.full(u.shape, cam.near, jnp.float32),
                   maxt=jnp.full(u.shape, cam.far, jnp.float32))

    if cam.kind == TELECENTRIC:
        # orthographic with a finite aperture focused at focus_distance
        # (reference: src/sensors/telecentric.cpp)
        ap = warps.square_to_uniform_disk_concentric(
            aperture_sample if aperture_sample is not None
            else jnp.zeros_like(pos)) * cam.aperture_radius
        base = near_p.at[..., 2].set(0.0)
        p_focus = base.at[..., 2].set(cam.focus_distance)
        o_cam = base + jnp.stack([ap[..., 0], ap[..., 1],
                                  jnp.zeros_like(u)], axis=-1)
        d_cam = normalize(p_focus - o_cam)
        return Ray(o=o_cam @ R.T + o_world, d=d_cam @ R.T,
                   mint=jnp.full(u.shape, cam.near, jnp.float32),
                   maxt=jnp.full(u.shape, cam.far, jnp.float32))

    if cam.kind == PERSPECTIVE_RDIST and (cam.kc0 != 0.0 or cam.kc1 != 0.0):
        # polynomial radial lens distortion on the image plane
        # (reference: src/sensors/perspective_rdist.cpp, kc coefficients)
        r2 = near_p[..., 0] ** 2 + near_p[..., 1] ** 2
        f = 1.0 + cam.kc0 * r2 + cam.kc1 * r2 * r2
        near_p = jnp.stack([near_p[..., 0] * f, near_p[..., 1] * f,
                            near_p[..., 2]], axis=-1)

    d_cam = normalize(near_p)

    if cam.kind == THINLENS and cam.aperture_radius > 0.0:
        # (reference: src/sensors/thinlens.cpp) focus plane at focus_distance
        ap = warps.square_to_uniform_disk_concentric(aperture_sample) \
            * cam.aperture_radius
        focus_t = cam.focus_distance / d_cam[..., 2]
        p_focus = d_cam * focus_t[..., None]
        o_cam = jnp.stack([ap[..., 0], ap[..., 1], jnp.zeros_like(u)], axis=-1)
        d_cam = normalize(p_focus - o_cam)
        o = o_cam @ R.T + o_world
    else:
        o = jnp.broadcast_to(o_world, d_cam.shape)

    d = d_cam @ R.T
    inv_z = 1.0 / d_cam[..., 2]
    return Ray(o=o, d=d, mint=cam.near * inv_z, maxt=cam.far * inv_z)


def camera_importance(cam: Camera, p_world):
    """Pinhole-perspective importance for light→camera connections
    (BDPT t=1 / particle tracing; reference: PerspectiveCamera::
    sampleDirect + importance, src/sensors/perspective.cpp:329-408).

    Returns (film_pos [N, 2], We [N], dist [N], dir_to_cam [N, 3],
    valid [N]) where the splat estimator for a point x with scattered
    value f·cosθ_x is  f·cosθ_x · We / dist².
    """
    R = cam.to_world[:3, :3]
    o_world = cam.to_world[:3, 3]
    rel = p_world - o_world
    pc = rel @ R                       # camera-space (columns = axes)
    z = pc[..., 2]
    valid = z > cam.near
    zs = jnp.where(valid, z, 1.0)
    xi = pc[..., 0] / zs
    yi = pc[..., 1] / zs
    t = cam.tan_half_fov
    u = (1.0 - xi / t) * 0.5
    v = (1.0 - yi * cam.aspect / t) * 0.5
    valid = valid & (u >= 0) & (u < 1) & (v >= 0) & (v < 1)
    film_pos = jnp.stack([u * cam.width, v * cam.height], axis=-1)
    dist = jnp.sqrt(jnp.maximum(jnp.sum(rel * rel, axis=-1), 1e-20))
    cos_theta = z / dist
    area = 4.0 * t * t / cam.aspect    # film area on the z=1 plane
    we = 1.0 / jnp.maximum(area * cos_theta ** 3, 1e-9)
    d_to_cam = -rel / dist[..., None]
    return film_pos, jnp.where(valid, we, 0.0), dist, d_to_cam, valid
