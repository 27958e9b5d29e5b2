"""Keyframed rigid-transform animation (reference: include/mitsuba/core/
track.h AnimatedTransform + src/libcore/track.cpp).

Transforms are decomposed into (translation, rotation quaternion, scale)
and interpolated per keyframe — lerp for translation/scale, slerp for
rotation — exactly the reference's interpolation model. Used for
camera shutter blur and for evaluating animated shapes at a fixed scene
time.
"""
from __future__ import annotations

import numpy as np


def mat_to_quat(m):
    """Rotation matrix [3,3] → quaternion (w, x, y, z)."""
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (m[2, 1] - m[1, 2]) / s,
                         (m[0, 2] - m[2, 0]) / s,
                         (m[1, 0] - m[0, 1]) / s])
    i = np.argmax(np.diag(m))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(m[i, i] - m[j, j] - m[k, k] + 1.0, 1e-12)) * 2
    q = np.zeros(4)
    q[0] = (m[k, j] - m[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (m[j, i] + m[i, j]) / s
    q[1 + k] = (m[k, i] + m[i, k]) / s
    return q


def quat_to_mat(q):
    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def slerp(q0, q1, t):
    d = float(np.dot(q0, q1))
    if d < 0:
        q1 = -q1
        d = -d
    if d > 0.9995:
        q = q0 + t * (q1 - q0)
        return q / np.linalg.norm(q)
    th = np.arccos(np.clip(d, -1, 1))
    return (np.sin((1 - t) * th) * q0 + np.sin(t * th) * q1) / np.sin(th)


def decompose(m4):
    t = m4[:3, 3].copy()
    a = m4[:3, :3]
    s = np.linalg.norm(a, axis=0)
    r = a / np.maximum(s, 1e-12)
    # fix handedness
    if np.linalg.det(r) < 0:
        r[:, 0] *= -1
        s[0] *= -1
    return t, mat_to_quat(r), s


class AnimatedTransform:
    """Sorted keyframes of 4x4 transforms; eval(time) interpolates."""

    def __init__(self, keyframes):
        """keyframes: list of (time, 4x4 matrix)."""
        kf = sorted(keyframes, key=lambda x: x[0])
        self.times = np.array([k[0] for k in kf], np.float64)
        self.tr = [decompose(np.asarray(k[1], np.float64)) for k in kf]

    def eval(self, time: float) -> np.ndarray:
        ts = self.times
        if time <= ts[0] or len(ts) == 1:
            i0 = i1 = 0
            f = 0.0
        elif time >= ts[-1]:
            i0 = i1 = len(ts) - 1
            f = 0.0
        else:
            i1 = int(np.searchsorted(ts, time))
            i0 = i1 - 1
            f = float((time - ts[i0]) / (ts[i1] - ts[i0]))
        t0, q0, s0 = self.tr[i0]
        t1, q1, s1 = self.tr[i1]
        t = t0 * (1 - f) + t1 * f
        s = s0 * (1 - f) + s1 * f
        r = quat_to_mat(slerp(q0, q1, f))
        m = np.eye(4)
        m[:3, :3] = r * s[None, :]
        m[:3, 3] = t
        return m
