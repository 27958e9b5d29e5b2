import jax
import jax.numpy as jnp
import numpy as np

from hairpt.core.math import Ray
from hairpt.ops import bvh as bvh_mod
from hairpt.ops import intersect as isec


def _random_tris(n, rng):
    base = rng.uniform(-5, 5, (n, 3))
    v1 = base + rng.uniform(-0.5, 0.5, (n, 3))
    v2 = base + rng.uniform(-0.5, 0.5, (n, 3))
    return base, v1, v2


def _tri_geom(v0, v1, v2, order=None):
    if order is not None:
        v0, v1, v2 = v0[order], v1[order], v2[order]
    return isec.TriGeom(p0=jnp.asarray(v0, jnp.float32),
                        e1=jnp.asarray(v1 - v0, jnp.float32),
                        e2=jnp.asarray(v2 - v0, jnp.float32))


def _rays_towards(n_rays, rng, target_lo=-5, target_hi=5):
    o = rng.uniform(-12, 12, (n_rays, 3))
    tgt = rng.uniform(target_lo, target_hi, (n_rays, 3))
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Ray(o=jnp.asarray(o, jnp.float32), d=jnp.asarray(d, jnp.float32),
               mint=jnp.zeros(n_rays), maxt=jnp.full(n_rays, np.inf))


def test_bvh_skip_pointers_cover_tree():
    # walking skip pointers from the root with always-descend visits preorder
    for n_leaves in [1, 2, 8, 32]:
        num = 2 * n_leaves - 1
        skip = bvh_mod._heap_skip_pointers(num)
        # full DFS: simulate descend-first traversal, count visited
        visited = []
        node = 0
        while node != num:
            visited.append(node)
            if node < n_leaves - 1:
                node = 2 * node + 1
            else:
                node = skip[node]
        assert sorted(visited) == list(range(num))


def test_bvh_vs_bruteforce_triangles():
    rng = np.random.default_rng(0)
    v0, v1, v2 = _random_tris(500, rng)
    fb = bvh_mod.build(np.minimum(np.minimum(v0, v1), v2),
                       np.maximum(np.maximum(v0, v1), v2))
    geom_sorted = _tri_geom(v0, v1, v2, fb.prim_order)
    geom_all = _tri_geom(v0, v1, v2)
    bvh = isec.bvh_to_device(fb)
    rays = _rays_towards(256, rng)

    t_bvh, prim_bvh = isec.closest_hit(bvh, geom_sorted,
                                       isec.tri_intersect_block, 4, rays)
    t_ref, prim_ref = isec.brute_force_closest(geom_all,
                                               isec.tri_intersect_block,
                                               500, rays)
    hit_b = np.asarray(prim_bvh) >= 0
    hit_r = np.asarray(prim_ref) >= 0
    np.testing.assert_array_equal(hit_b, hit_r)
    np.testing.assert_allclose(np.asarray(t_bvh)[hit_b],
                               np.asarray(t_ref)[hit_r], rtol=2e-5)
    # prim ids must agree after the reorder mapping
    mapped = np.asarray(fb.prim_order)[np.asarray(prim_bvh)[hit_b]]
    np.testing.assert_array_equal(mapped, np.asarray(prim_ref)[hit_r])

    occ = isec.any_hit(bvh, geom_sorted, isec.tri_intersect_block, 4, rays)
    np.testing.assert_array_equal(np.asarray(occ), hit_r)


def _make_hair_geom(verts, starts, radius):
    """Build segment arrays with miter normals from polyline vertices
    (mirrors src/shapes/hair.cpp firstMiterNormal/secondMiterNormal)."""
    verts = np.asarray(verts, np.float64)
    starts = np.asarray(starts, bool)
    seg_iv = [i for i in range(len(verts) - 1) if not starts[i + 1]]
    p0, p1, n0, n1 = [], [], [], []
    for iv in seg_iv:
        t = verts[iv + 1] - verts[iv]
        t /= np.linalg.norm(t)
        if iv - 1 >= 0 and not starts[iv]:
            tp = verts[iv] - verts[iv - 1]
            tp /= np.linalg.norm(tp)
            m0 = (tp + t) / np.linalg.norm(tp + t)
        else:
            m0 = t
        if iv + 2 < len(verts) and not starts[iv + 2]:
            tn = verts[iv + 2] - verts[iv + 1]
            tn /= np.linalg.norm(tn)
            m1 = (t + tn) / np.linalg.norm(t + tn)
        else:
            m1 = t
        p0.append(verts[iv]); p1.append(verts[iv + 1])
        n0.append(m0); n1.append(m1)
    n = len(p0)
    return isec.HairGeom(p0=jnp.asarray(np.array(p0), jnp.float32),
                         p1=jnp.asarray(np.array(p1), jnp.float32),
                         n0=jnp.asarray(np.array(n0), jnp.float32),
                         n1=jnp.asarray(np.array(n1), jnp.float32),
                         radius=jnp.full((n,), radius, jnp.float32))


def _hair_oracle_f64(geom, o, d, mint, maxt):
    """Float64 reference implementation of the miter-cylinder test, following
    src/shapes/hair.cpp:485-542 literally."""
    p0 = np.asarray(geom.p0, np.float64)
    p1 = np.asarray(geom.p1, np.float64)
    n0 = np.asarray(geom.n0, np.float64)
    n1 = np.asarray(geom.n1, np.float64)
    r = np.asarray(geom.radius, np.float64)
    best_t = np.inf
    best_i = -1
    for i in range(len(p0)):
        axis = p1[i] - p0[i]
        axis = axis / np.linalg.norm(axis)
        rel_o = o - p0[i]
        po = rel_o - np.dot(axis, rel_o) * axis
        pd = d - np.dot(axis, d) * axis
        A = np.dot(pd, pd)
        B = 2 * np.dot(po, pd)
        C = np.dot(po, po) - r[i] ** 2
        disc = B * B - 4 * A * C
        if disc < 0 or A == 0:
            continue
        sq = np.sqrt(disc)
        t_near = (-B - sq) / (2 * A)
        t_far = (-B + sq) / (2 * A)
        for t in (t_near, t_far):
            if t < mint or t > maxt or t >= best_t:
                continue
            p = o + d * t
            if np.dot(p - p0[i], n0[i]) >= 0 and np.dot(p - p1[i], n1[i]) <= 0:
                best_t = min(best_t, t)
                best_i = i
                break
    return best_t, best_i


def test_hair_intersect_vs_f64_oracle():
    rng = np.random.default_rng(1)
    # wiggly fiber of 12 segments at hair-scale radius, viewed from afar —
    # the exact regime where naive f32 quadratics break
    n_v = 13
    t = np.linspace(0, 1, n_v)
    verts = np.stack([t * 4 - 2,
                      0.3 * np.sin(t * 9),
                      0.2 * np.cos(t * 7)], axis=-1)
    starts = np.zeros(n_v, bool); starts[0] = True
    radius = 0.00566
    geom = _make_hair_geom(verts, starts, radius)
    n_seg = geom.p0.shape[0]

    n_rays = 400
    o = rng.uniform(-1, 1, (n_rays, 3)) * np.array([3, 3, 3]) + \
        np.array([0, 0, 20.0])  # camera-like distance
    tgt_i = rng.integers(0, n_v - 1, n_rays)
    tgt = verts[tgt_i] + rng.normal(0, radius * 1.5, (n_rays, 3))
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Ray(o=jnp.asarray(o, jnp.float32), d=jnp.asarray(d, jnp.float32),
               mint=jnp.zeros(n_rays), maxt=jnp.full(n_rays, np.inf))

    t_f32, prim = isec.brute_force_closest(geom, isec.hair_intersect_block,
                                           n_seg, rays)
    t_f32 = np.asarray(t_f32); prim = np.asarray(prim)

    agree = 0
    total_hit = 0
    for k in range(n_rays):
        t64, i64 = _hair_oracle_f64(geom, o[k], d[k], 0.0, np.inf)
        hit64 = i64 >= 0
        hit32 = prim[k] >= 0
        if hit64:
            total_hit += 1
        if hit64 == hit32:
            agree += 1
            if hit64:
                assert abs(t_f32[k] - t64) < 1e-3 * max(1.0, t64), \
                    (k, t_f32[k], t64)
    assert total_hit > n_rays * 0.3  # sanity: the test actually hits fibers
    # f32 recentered quadratic must agree with f64 classic on >99% of rays
    assert agree >= n_rays * 0.99, (agree, n_rays)


def test_hair_bvh_vs_bruteforce():
    rng = np.random.default_rng(2)
    # many short random fibers
    fibers = []
    starts = []
    for _ in range(60):
        m = rng.integers(2, 6)
        base = rng.uniform(-3, 3, 3)
        pts = base + np.cumsum(rng.normal(0, 0.4, (m, 3)), axis=0)
        fibers.append(pts)
        s = np.zeros(m, bool); s[0] = True
        starts.append(s)
    verts = np.concatenate(fibers)
    starts = np.concatenate(starts)
    geom = _make_hair_geom(verts, starts, 0.05)
    n_seg = int(geom.p0.shape[0])

    pmin = np.asarray(jnp.minimum(geom.p0, geom.p1)) - 0.06
    pmax = np.asarray(jnp.maximum(geom.p0, geom.p1)) + 0.06
    fb = bvh_mod.build(pmin, pmax)
    sort = fb.prim_order
    geom_sorted = isec.HairGeom(*(jnp.asarray(np.asarray(a)[sort])
                                  for a in geom))
    bvh = isec.bvh_to_device(fb)

    rays = _rays_towards(300, np.random.default_rng(3), -3, 3)
    t_b, prim_b = isec.closest_hit(bvh, geom_sorted,
                                   isec.hair_intersect_block, 4, rays)
    t_r, prim_r = isec.brute_force_closest(geom, isec.hair_intersect_block,
                                           n_seg, rays)
    hit_b = np.asarray(prim_b) >= 0
    hit_r = np.asarray(prim_r) >= 0
    np.testing.assert_array_equal(hit_b, hit_r)
    np.testing.assert_allclose(np.asarray(t_b)[hit_b], np.asarray(t_r)[hit_r],
                               rtol=1e-4)
