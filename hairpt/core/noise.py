"""Procedural noise: improved Perlin noise + TEA counter hash.

Capability counterparts of the reference's src/librender/noise.cpp
(Ken Perlin's improved-noise reference implementation, GRAD_PERLIN
variant) and include/mitsuba/core/qmc.h:146 sampleTEA/sampleTEAFloat —
batched jnp, used by the irawan cloth BSDF's yarn-level variation and
available for procedural textures."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Ken Perlin's reference permutation (public domain), doubled for
# overflow-free nested lookups (noise.cpp NoisePerm)
_PERM = np.array([
    151, 160, 137, 91, 90, 15, 131, 13, 201, 95, 96, 53, 194, 233, 7, 225,
    140, 36, 103, 30, 69, 142, 8, 99, 37, 240, 21, 10, 23, 190, 6, 148,
    247, 120, 234, 75, 0, 26, 197, 62, 94, 252, 219, 203, 117, 35, 11, 32,
    57, 177, 33, 88, 237, 149, 56, 87, 174, 20, 125, 136, 171, 168, 68,
    175, 74, 165, 71, 134, 139, 48, 27, 166, 77, 146, 158, 231, 83, 111,
    229, 122, 60, 211, 133, 230, 220, 105, 92, 41, 55, 46, 245, 40, 244,
    102, 143, 54, 65, 25, 63, 161, 1, 216, 80, 73, 209, 76, 132, 187, 208,
    89, 18, 169, 200, 196, 135, 130, 116, 188, 159, 86, 164, 100, 109,
    198, 173, 186, 3, 64, 52, 217, 226, 250, 124, 123, 5, 202, 38, 147,
    118, 126, 255, 82, 85, 212, 207, 206, 59, 227, 47, 16, 58, 17, 182,
    189, 28, 42, 223, 183, 170, 213, 119, 248, 152, 2, 44, 154, 163, 70,
    221, 153, 101, 155, 167, 43, 172, 9, 129, 22, 39, 253, 19, 98, 108,
    110, 79, 113, 224, 232, 178, 185, 112, 104, 218, 246, 97, 228, 251,
    34, 242, 193, 238, 210, 144, 12, 191, 179, 162, 241, 81, 51, 145,
    235, 249, 14, 239, 107, 49, 192, 214, 31, 181, 199, 106, 157, 184,
    84, 204, 176, 115, 121, 50, 45, 127, 4, 150, 254, 138, 236, 205, 93,
    222, 114, 67, 29, 24, 72, 243, 141, 128, 195, 78, 66, 215, 61, 156,
    180], np.int32)
_PERM2 = np.concatenate([_PERM, _PERM])


def _grad(ix, iy, iz, dx, dy, dz):
    perm = jnp.asarray(_PERM2)
    h = perm[perm[perm[ix] + iy] + iz] & 15
    u = jnp.where(h < 8, dx, dy)
    v = jnp.where(h < 4, dy, jnp.where((h == 12) | (h == 14), dx, dz))
    return jnp.where(h & 1, -u, u) + jnp.where(h & 2, -v, v)


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def perlin(p):
    """Improved Perlin noise at points p [..., 3] (noise.cpp:64-111);
    output roughly in [-1, 1]."""
    pf = jnp.floor(p)
    i = pf.astype(jnp.int32) & 255
    d = p - pf
    ix, iy, iz = i[..., 0], i[..., 1], i[..., 2]
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    w000 = _grad(ix, iy, iz, dx, dy, dz)
    w100 = _grad(ix + 1, iy, iz, dx - 1, dy, dz)
    w010 = _grad(ix, iy + 1, iz, dx, dy - 1, dz)
    w110 = _grad(ix + 1, iy + 1, iz, dx - 1, dy - 1, dz)
    w001 = _grad(ix, iy, iz + 1, dx, dy, dz - 1)
    w101 = _grad(ix + 1, iy, iz + 1, dx - 1, dy, dz - 1)
    w011 = _grad(ix, iy + 1, iz + 1, dx, dy - 1, dz - 1)
    w111 = _grad(ix + 1, iy + 1, iz + 1, dx - 1, dy - 1, dz - 1)
    wx, wy, wz = _fade(dx), _fade(dy), _fade(dz)
    x00 = w000 * (1 - wx) + w100 * wx
    x10 = w010 * (1 - wx) + w110 * wx
    x01 = w001 * (1 - wx) + w101 * wx
    x11 = w011 * (1 - wx) + w111 * wx
    y0 = x00 * (1 - wy) + x10 * wy
    y1 = x01 * (1 - wy) + x11 * wy
    return y0 * (1 - wz) + y1 * wz


def fbm(p, omega: float = 0.5, lam: float = 1.99, octaves: int = 6):
    """Fractional Brownian motion over perlin() (noise.cpp fbm)."""
    out = jnp.zeros(p.shape[:-1], jnp.float32)
    o = 1.0
    scale = 1.0
    for _ in range(octaves):
        out = out + o * perlin(p * scale)
        scale *= lam
        o *= omega
    return out


def sample_tea(v0, v1, rounds: int = 4):
    """TEA block cipher as a counter hash (qmc.h:146 sampleTEA). v0/v1
    uint32 arrays; returns (v0', v1') uint32."""
    v0 = jnp.asarray(v0, jnp.uint32)
    v1 = jnp.asarray(v1, jnp.uint32)
    s = jnp.uint32(0)
    for _ in range(rounds):
        s = s + jnp.uint32(0x9e3779b9)
        v0 = v0 + ((((v1 << 4) + jnp.uint32(0xA341316C)) ^ (v1 + s))
                   ^ ((v1 >> 5) + jnp.uint32(0xC8013EA4)))
        v1 = v1 + ((((v0 << 4) + jnp.uint32(0xAD90777D)) ^ (v0 + s))
                   ^ ((v0 >> 5) + jnp.uint32(0x7E95761E)))
    return v0, v1


def sample_tea_float(v0, v1, rounds: int = 4):
    """Uniform float in [0, 1) from the TEA hash (qmc.h sampleTEAFloat:
    the low word's top 23 bits as a [1, 2) mantissa minus one)."""
    lo, _ = sample_tea(v0, v1, rounds)
    bits = (lo >> 9) | jnp.uint32(0x3f800000)
    return jnp.asarray(bits).view(jnp.float32) - 1.0
