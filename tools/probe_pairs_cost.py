"""Probe the on-device routing costs for a per-ray pair-list phase B.

The tile-routed kernel tests every tile ray against the tile UNION of
candidate clusters (bounce waves: 188 union vs 13 per-ray → 14× dense
inflation, BASELINE.md r3). A pair-list phase B would need:
  1. per-ray refinement of the tile candidate lists ([T, q_live, 64]
     ray-vs-cluster-AABB slab tests)
  2. a device sort of the surviving (cluster, ray) pairs by cluster
  3. ray gathers into cluster-major blocks + a scatter-min back
This probe measures each primitive at representative sizes so the
design is justified by numbers before any kernel work (r2's attempt
died on 170 ms of HOST-side routing; the question is what the same
routing costs on-device).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))


def bench(f, *args, reps=5):
    r = f(*args)
    float(jnp.sum(r[0] if isinstance(r, tuple) else r))  # barrier
    t0 = time.time()
    for _ in range(reps):
        r = f(*args)
    float(jnp.sum(r[0] if isinstance(r, tuple) else r))
    return (time.time() - t0) / reps


def main():
    key = jax.random.PRNGKey(0)
    N_PAIRS = 3_400_000
    # 1. sort pairs by cluster key (uint32 key + int32 payload)
    keys = jax.random.randint(key, (N_PAIRS,), 0, 7875).astype(jnp.uint32)
    payload = jnp.arange(N_PAIRS, dtype=jnp.int32)

    @jax.jit
    def do_sort(k, p):
        return jax.lax.sort((k, p), dimension=0, num_keys=1)

    dt = bench(do_sort, keys, payload)
    print(f"[pairs] sort {N_PAIRS} pairs: {dt*1e3:.1f} ms")

    # 2. per-ray AABB refinement: [T, Q, 64] slab tests
    T, Q, R = 4096, 192, 64
    lo = jax.random.normal(key, (T, Q, 3))
    hi = lo + 0.1
    o = jax.random.normal(key, (T, R, 3))
    d = jax.random.normal(key, (T, R, 3))

    @jax.jit
    def refine(lo, hi, o, d):
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
        t0 = (lo[:, None, :, :] - o[:, :, None, :]) * inv[:, :, None, :]
        t1 = (hi[:, None, :, :] - o[:, :, None, :]) * inv[:, :, None, :]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        return (tn <= tf).sum(axis=(1, 2))

    dt = bench(refine, lo, hi, o, d)
    print(f"[pairs] per-ray AABB refine [T={T},R={R},Q={Q}]: "
          f"{dt*1e3:.1f} ms")

    # 3. ray gather into pair order (8 floats per ray) + scatter-min back
    rays8 = jax.random.normal(key, (262144, 8))
    idx = jax.random.randint(key, (N_PAIRS,), 0, 262144)

    @jax.jit
    def gather(r8, i):
        return r8[i]

    dt = bench(gather, rays8, idx)
    print(f"[pairs] gather {N_PAIRS}x8 floats: {dt*1e3:.1f} ms")

    tvals = jax.random.uniform(key, (N_PAIRS,))

    @jax.jit
    def scatter_min(i, t):
        out = jnp.full((262144,), jnp.inf)
        return out.at[i].min(t)

    dt = bench(scatter_min, idx, tvals)
    print(f"[pairs] scatter-min {N_PAIRS} -> 262k: {dt*1e3:.1f} ms")

    # 4. cumsum-based offsets (counting-sort alternative)
    counts = jax.random.randint(key, (7875,), 0, 900)

    @jax.jit
    def offsets(c):
        return jnp.cumsum(c)

    dt = bench(offsets, counts)
    print(f"[pairs] cluster-offset cumsum: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
