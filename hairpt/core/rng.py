"""Stateless counter-based sampling.

Replaces the reference's per-worker cloned stateful samplers
(reference: src/samplers/{independent,sobol}.cpp, src/libcore/random.cpp SFMT):
every sample dimension is a pure function of (pixel_id, sample_id, dim), so
sampling is deterministic, order-independent and shards freely across chips —
no mutable RNG state needs to live on device.

Two modes:
- ``independent``: PCG-style hash → uniform floats.
- ``sobol``: Owen-scrambled (0,2)-sequence per 2D request, padded across
  dimensions with decorrelating scramble keys (Burley 2020 style). This
  covers the capability of the reference's `sobol` and `ldsampler` plugins.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

U32 = jnp.uint32

# Flip to True under `with jax.disable_jit()` debugging if uint32 overflow
# warnings get noisy; all arithmetic below is intentionally mod 2^32.


def _u32(x):
    return jnp.asarray(x).astype(U32)


def hash_u32(x):
    """PCG output mix (PCG-RXS-M-XS) of a uint32."""
    x = _u32(x)
    state = x * U32(747796405) + U32(2891336453)
    word = ((state >> ((state >> U32(28)) + U32(4))) ^ state) * U32(277803737)
    return (word >> U32(22)) ^ word


def hash_combine(a, b):
    """Mix two uint32 streams (order-sensitive)."""
    return hash_u32(_u32(a) ^ (hash_u32(b) + U32(0x9E3779B9) + (_u32(a) << U32(6)) + (_u32(a) >> U32(2))))


def u32_to_unit_float(x):
    """Map uint32 → float32 in [0, 1). Uses the top 24 bits."""
    return (x >> U32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def uniform_1d(pixel, sample, dim):
    """Independent uniform float in [0,1) keyed by (pixel, sample, dim)."""
    h = hash_combine(hash_combine(_u32(pixel), _u32(sample)), _u32(dim))
    return u32_to_unit_float(h)


def uniform_2d(pixel, sample, dim):
    h = hash_combine(hash_combine(_u32(pixel), _u32(sample)), _u32(dim))
    h2 = hash_u32(h + U32(0x68bc21eb))
    return jnp.stack([u32_to_unit_float(h), u32_to_unit_float(h2)], axis=-1)


# ---------------------------------------------------------------------------
# Owen-scrambled (0,2)-sequence
# ---------------------------------------------------------------------------

def reverse_bits_u32(x):
    x = _u32(x)
    x = ((x << U32(16)) | (x >> U32(16)))
    x = ((x & U32(0x00ff00ff)) << U32(8)) | ((x & U32(0xff00ff00)) >> U32(8))
    x = ((x & U32(0x0f0f0f0f)) << U32(4)) | ((x & U32(0xf0f0f0f0)) >> U32(4))
    x = ((x & U32(0x33333333)) << U32(2)) | ((x & U32(0xcccccccc)) >> U32(2))
    x = ((x & U32(0x55555555)) << U32(1)) | ((x & U32(0xaaaaaaaa)) >> U32(1))
    return x


def _laine_karras_permutation(x, seed):
    """Hash acting on reversed bits ⇒ per-digit Owen scramble (Burley 2020)."""
    x = _u32(x)
    seed = _u32(seed)
    x = x + seed
    x = x ^ (x * U32(0x6c50b47c))
    x = x ^ (x * U32(0xb82f1e52))
    x = x ^ (x * U32(0xc7afe638))
    x = x ^ (x * U32(0x8d22f6e6))
    return x


def owen_scramble_u32(x, seed):
    x = reverse_bits_u32(x)
    x = _laine_karras_permutation(x, seed)
    return reverse_bits_u32(x)


def _sobol02_u32(index):
    """First two components of the Sobol (0,2)-sequence as uint32 fractions."""
    index = _u32(index)
    x0 = reverse_bits_u32(index)  # van der Corput

    def body(i, carry):
        n, v, x = carry
        x = jnp.where((n & U32(1)) != 0, x ^ v, x)
        n = n >> U32(1)
        v = v ^ (v >> U32(1))
        return (n, v, x)

    n0 = index
    v0 = jnp.full_like(index, U32(1 << 31))
    x_init = jnp.zeros_like(index)
    _, _, x1 = jax.lax.fori_loop(0, 32, body, (n0, v0, x_init))
    return x0, x1


def sobol_2d(pixel, sample, dim):
    """Owen-scrambled (0,2)-point `sample` of the stream keyed by (pixel, dim).

    The sample index itself is Owen-shuffled per (pixel, dim) so that the
    padded dimensions decorrelate (this is pbrt/Burley's padded Sobol').
    """
    key = hash_combine(_u32(pixel), _u32(dim))
    shuffled = owen_scramble_u32(_u32(sample), hash_u32(key ^ U32(0xa511e9b3)))
    x0, x1 = _sobol02_u32(shuffled)
    x0 = owen_scramble_u32(x0, hash_u32(key ^ U32(0x4117abf3)))
    x1 = owen_scramble_u32(x1, hash_u32(key ^ U32(0x7f1d2ce7)))
    return jnp.stack([u32_to_unit_float(x0), u32_to_unit_float(x1)], axis=-1)


# ---------------------------------------------------------------------------
# Sampler facade
# ---------------------------------------------------------------------------

INDEPENDENT = 0
SOBOL = 1       # padded Owen-scrambled (0,2) (covers `ldsampler`)
HALTON = 2
STRATIFIED = 3  # use as mode=(STRATIFIED, spp); exact for power-of-two spp
SOBOL_QMC = 4   # true high-dim Sobol' w/ pixel lookup; use as
                # mode=(SOBOL_QMC, m, width) with film res ≤ 2^m
                # (the reference `sobol` plugin, src/samplers/sobol.cpp)


_SQ_CACHE: dict = {}


def _sq_tables(m: int):
    # cache NUMPY tables (jnp constants created inside a trace would leak
    # as tracers across traces); jnp.asarray them per call site
    if m not in _SQ_CACHE:
        from . import sobolseq as sq
        dirs, shift = sq.make_np_tables()
        masks = sq.pixel_lookup_tables(m)
        _SQ_CACHE[m] = (dirs, shift, masks)
    import jax.numpy as jnp
    dirs, shift, masks = _SQ_CACHE[m]
    return jnp.asarray(dirs), jnp.asarray(shift), masks


def sobol_qmc(m: int, width: int, pixel, sample, dim, n_comp: int):
    """Components [dim, dim+n_comp) of the global Sobol' point assigned to
    (pixel, sample) by the elementary-interval lookup. Dims 0/1 return the
    in-pixel fractional position; `dim` may be a traced scalar. Identical
    index computations across calls CSE away inside one jit."""
    from . import sobolseq as sq
    import jax.numpy as jnp
    dirs, shift, masks = _sq_tables(m)
    px = _u32(pixel) % U32(width)
    py = _u32(pixel) // U32(width)
    i = sq.interval_to_index(m, masks, dirs, _u32(sample), px, py)
    outs = []
    for c in range(n_comp):
        d = jnp.asarray(dim, jnp.int32) + c
        dc = jnp.clip(d, 0, sq.N_DIMS - 1)
        x = sq.sobol_u32(dirs, dc, i) ^ shift[dc]
        # dims 0/1 carry the pixel in their top m bits — strip to get the
        # in-pixel offset (the film splat re-adds the pixel corner)
        x = jnp.where(d < 2, x << U32(m), x)
        # beyond the generated table: decorrelated hash fallback
        over = hash_combine(hash_combine(_u32(pixel), _u32(sample)),
                            d.astype(jnp.uint32))
        x = jnp.where(d >= sq.N_DIMS, over, x)
        outs.append(u32_to_unit_float(x))
    return jnp.stack(jnp.broadcast_arrays(*outs), axis=-1) if n_comp > 1 \
        else outs[0][..., None]


def _strat_perm(sample, spp_mask, pixel, dim):
    """Stateless bijection of the sample index within [0, 2^k): XOR then
    odd multiply (both bijective mod 2^k), keyed per (pixel, dim) —
    the per-pixel stratum shuffle of the reference stratified sampler
    (src/samplers/stratified.cpp) without mutable permutation tables."""
    key = hash_combine(_u32(pixel), _u32(dim))
    h1 = hash_u32(key ^ U32(0x9E3779B9))
    h2 = hash_u32(key ^ U32(0x85EBCA6B)) | U32(1)
    return ((_u32(sample) ^ h1) * h2) & U32(spp_mask)


def stratified_1d(pixel, sample, dim, spp: int):
    perm = _strat_perm(sample, spp - 1, pixel, dim)
    jit = uniform_1d(pixel, sample, dim)
    return (perm.astype(jnp.float32) + jit) / spp


def stratified_2d(pixel, sample, dim, spp: int):
    import math
    k = int(math.log2(spp))
    a = 1 << (k // 2)
    b = spp // a
    perm = _strat_perm(sample, spp - 1, pixel, dim)
    sx = (perm % a).astype(jnp.float32)
    sy = (perm // a).astype(jnp.float32)
    j = uniform_2d(pixel, sample, dim)
    return jnp.stack([(sx + j[..., 0]) / a, (sy + j[..., 1]) / b], axis=-1)


def _radical_inverse(base: int, index, digits: int = 20):
    """Vectorized radical inverse in an arbitrary base (reference:
    include/mitsuba/core/qmc.h radicalInverse)."""
    index = jnp.asarray(index).astype(jnp.uint32)
    inv_base = jnp.float32(1.0 / base)
    result = jnp.zeros(index.shape, jnp.float32)
    factor = jnp.full(index.shape, inv_base, jnp.float32)
    n = index
    for _ in range(digits):
        digit = n % base
        result = result + digit.astype(jnp.float32) * factor
        factor = factor * inv_base
        n = n // base
    return jnp.minimum(result, 1.0 - 1e-7)


# ---------------------------------------------------------------------------
# Faure-permuted Halton (reference: src/samplers/halton.cpp + faure.cpp)
# ---------------------------------------------------------------------------

_FAURE_DIMS = 64
_FAURE_CACHE: list = []


def faure_permutation(b: int):
    """Faure's recursive digit permutation for base b (faure.cpp):
    σ_2c interleaves 2σ_c and 2σ_c+1; σ_2c+1 increments elements ≥ c of
    σ_2c and inserts c in the middle. σ_b(0) = 0 for every b."""
    if b == 1:
        return [0]
    if b == 2:
        return [0, 1]
    if b % 2 == 0:
        prev = faure_permutation(b // 2)
        return [2 * v for v in prev] + [2 * v + 1 for v in prev]
    c = (b - 1) // 2
    prev = faure_permutation(b - 1)
    out = [v + 1 if v >= c else v for v in prev]
    out.insert(c, c)
    return out


def _first_primes(n: int):
    primes = []
    x = 2
    while len(primes) < n:
        if all(x % p for p in primes if p * p <= x):
            primes.append(x)
        x += 1
    return primes


def _faure_tables():
    """(primes [D], offsets [D], flat permutation table) as numpy; cached
    host-side, jnp.asarray'd per use (same tracer-safety rule as the
    Sobol tables)."""
    if not _FAURE_CACHE:
        import numpy as np
        primes = _first_primes(_FAURE_DIMS)
        offs = []
        flat = []
        for b in primes:
            offs.append(len(flat))
            flat.extend(faure_permutation(b))
        _FAURE_CACHE.append((np.asarray(primes, np.uint32),
                             np.asarray(offs, np.int32),
                             np.asarray(flat, np.uint32)))
    return _FAURE_CACHE[0]


def permuted_radical_inverse(dim, index, digits: int = 24):
    """Faure-permuted radical inverse in base prime(dim); dim may be
    traced (clipped to the generated table)."""
    import jax.numpy as jnp
    primes, offs, flat = _faure_tables()
    primes_t = jnp.asarray(primes)
    offs_t = jnp.asarray(offs)
    flat_t = jnp.asarray(flat)
    d = jnp.clip(jnp.asarray(dim, jnp.int32), 0, _FAURE_DIMS - 1)
    b = primes_t[d]
    off = offs_t[d]
    bf = b.astype(jnp.float32)
    n = _u32(index)
    result = jnp.zeros(jnp.broadcast_shapes(jnp.shape(n), jnp.shape(bf)),
                       jnp.float32)
    factor = 1.0 / bf
    scale = jnp.ones_like(result)
    for _ in range(digits):
        digit = n % b
        pd = flat_t[off + digit.astype(jnp.int32)]
        result = result + pd.astype(jnp.float32) * factor * scale
        scale = scale / bf
        n = n // b
    return jnp.minimum(result, 1.0 - 1e-7)


def halton_2d(pixel, sample, dim):
    """Faure-permuted Halton point of index `sample` in the prime-base
    pair (prime(dim), prime(dim+1)), decorrelated per pixel by
    Cranley-Patterson rotation (reference: src/samplers/halton.cpp with
    the scrambled permutations of faure.cpp)."""
    key = hash_combine(_u32(pixel), _u32(dim))
    r1 = u32_to_unit_float(hash_u32(key ^ U32(0x11111111)))
    r2 = u32_to_unit_float(hash_u32(key ^ U32(0x22222222)))
    h1 = permuted_radical_inverse(dim, sample)
    h2 = permuted_radical_inverse(jnp.asarray(dim) + 1, sample)
    u1 = jnp.mod(h1 + r1, 1.0)
    u2 = jnp.mod(h2 + r2, 1.0)
    return jnp.stack(jnp.broadcast_arrays(u1, u2), axis=-1)


def next_1d(mode, pixel, sample, dim: int):
    if isinstance(mode, tuple) and mode[0] == STRATIFIED:
        spp = int(mode[1])
        if spp & (spp - 1) == 0 and spp > 0:
            return stratified_1d(pixel, sample, dim, spp)
        return uniform_1d(pixel, sample, dim)
    if isinstance(mode, tuple) and mode[0] == SOBOL_QMC:
        return sobol_qmc(mode[1], mode[2], pixel, sample, dim, 1)[..., 0]
    if mode == SOBOL:
        return sobol_2d(pixel, sample, dim)[..., 0]
    if mode == HALTON:
        return halton_2d(pixel, sample, dim)[..., 0]
    return uniform_1d(pixel, sample, dim)


def next_2d(mode, pixel, sample, dim: int):
    if isinstance(mode, tuple) and mode[0] == STRATIFIED:
        spp = int(mode[1])
        if spp & (spp - 1) == 0 and spp > 0:
            return stratified_2d(pixel, sample, dim, spp)
        return uniform_2d(pixel, sample, dim)
    if isinstance(mode, tuple) and mode[0] == SOBOL_QMC:
        return sobol_qmc(mode[1], mode[2], pixel, sample, dim, 2)
    if mode == SOBOL:
        return sobol_2d(pixel, sample, dim)
    if mode == HALTON:
        return halton_2d(pixel, sample, dim)
    return uniform_2d(pixel, sample, dim)


class DimAllocator:
    """Python-side dimension counter; resolves to static ints under jit."""

    def __init__(self):
        self.dim = 0

    def take(self, n: int = 1) -> int:
        d = self.dim
        self.dim += n
        return d
