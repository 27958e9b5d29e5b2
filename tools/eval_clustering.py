"""Offline (CPU/numpy) evaluation of cluster formation and ray-sort keys.

The tiled intersector's compute cost is (slots actually processed per
tile before early exit) x 128 lanes. Round-3 measured bounce tile-64
unions of 188 clusters vs 13 per ray — a 14x dense-test inflation
(BASELINE.md). This harness reproduces the routing pipeline in numpy at
full furball scale and evaluates, WITHOUT TPU compiles:

  * cluster formation strategies (Morton-128 chunks / SAH leaves /
    fiber-major runs / tight miter-aware AABBs),
  * bounce-ray sort keys (octant+Morton vs finer direction bits),
  * the early-exit work model: per-tile q_end (slots until every ray of
    the tile is resolved) and the per-ray ideal (the CSR /
    persistent-threads ceiling).

Populations: camera rays (block-swizzle tiles), first-bounce rays
(spawned at true hit points), sun shadow rays (NEE analog).

Usage: EV_QUALITY=14 EV_TILES=256 python tools/eval_clustering.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

TILE = 64


# ---------------------------------------------------------------------------
# geometry + reference machinery (numpy mirrors of the JAX/Pallas path)
# ---------------------------------------------------------------------------

def build_segments(quality: float):
    from hairpt.scene import hairgen
    fs = hairgen.gen_furball(n_fibers=int(6000 * quality),
                             radius=0.00216667)
    s = hairgen.segments(fs)
    return s


def seg_aabbs(s, mode: str):
    """Per-segment conservative AABBs.
    mode='x2'    — the current build: +-2r blanket inflation
                   (ops/intersect_swept.py build_swept_hair).
    mode='tight' — miter-aware: endpoints extended along the axis by the
                   miter overhang r*tan(angle(n, axis)) and inflated
                   radially by r*sqrt(1-a_i^2) per axis (the exact
                   extent of a miter-clipped cylinder; reference analog
                   hair.cpp:445-464 getAABB / fancy clipping 239-444)."""
    p0, p1, r = s["p0"], s["p1"], s["radius"][:, None]
    if mode == "x2":
        lo = np.minimum(p0, p1) - 2.0 * r
        hi = np.maximum(p0, p1) + 2.0 * r
        return lo, hi
    a = p1 - p0
    a = a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-20)
    # tan of the angle between the miter normal and the axis, capped:
    # tan = sqrt(1-c^2)/c with c = |n.a|; cap matches the builder's
    # steepest-accepted miter (cos >= 0.3 -> tan <= 3.18)
    def overhang(n):
        c = np.abs(np.sum(n * a, axis=-1, keepdims=True))
        c = np.maximum(c, 0.3)
        return r * np.sqrt(np.maximum(1.0 - c * c, 0.0)) / c
    q0 = p0 - a * overhang(s["n0"])
    q1 = p1 + a * overhang(s["n1"])
    rad = r * np.sqrt(np.maximum(1.0 - a * a, 0.0)) + 1e-7
    lo = np.minimum(q0, q1) - rad
    hi = np.maximum(q0, q1) + rad
    return lo, hi


def morton3(q):
    from hairpt.ops.bvh import morton3 as m3
    return m3(q)


def cluster_morton(lo, hi, K=128):
    """Current strategy: Morton order of AABB centroids, fixed-K chunks."""
    c = 0.5 * (lo + hi)
    ext = np.maximum(c.max(0) - c.min(0), 1e-12)
    q = np.clip((c - c.min(0)) / ext * 1023.0, 0, 1023).astype(np.uint32)
    order = np.argsort(morton3(q), kind="stable")
    n = len(order)
    C = -(-n // K)
    assign = np.full(C * K, -1, np.int64)
    assign[:n] = order
    return assign.reshape(C, K)


def cluster_sah(lo, hi, leaf_size=32, K=128):
    """SAH BVH leaves as clusters (leaves hold <= 4*leaf_size prims,
    padded to K lanes). Adaptive spatial tightness at the cost of
    partially-filled rows."""
    from hairpt.ops import bvh as bvh_mod
    fb = bvh_mod.build(lo, hi, leaf_size=leaf_size)
    is_leaf = fb.node_count >= 0
    starts = fb.node_left[is_leaf]
    counts = fb.node_count[is_leaf]
    assert counts.max() <= K, counts.max()
    C = len(starts)
    assign = np.full((C, K), -1, np.int64)
    for i, (st, ct) in enumerate(zip(starts, counts)):
        assign[i, :ct] = fb.prim_order[st:st + ct]
    return assign


def cluster_fiber(s, lo, hi, K=128, segs_per_fiber=None):
    """Fiber-major runs: fibers sorted by root Morton, segments kept in
    along-fiber order — clusters become thin tubes."""
    fid = s["fiber_id"] if "fiber_id" in s else None
    if fid is None:
        # reconstruct fiber runs from p0/p1 adjacency: a new fiber starts
        # where p0 != previous p1
        brk = np.ones(len(s["p0"]), bool)
        brk[1:] = np.any(s["p0"][1:] != s["p1"][:-1], axis=1)
        fid = np.cumsum(brk) - 1
    roots = np.zeros((fid.max() + 1, 3))
    first = np.unique(fid, return_index=True)[1]
    roots[fid[first]] = s["p0"][first]
    ext = np.maximum(roots.max(0) - roots.min(0), 1e-12)
    q = np.clip((roots - roots.min(0)) / ext * 1023.0, 0,
                1023).astype(np.uint32)
    forder = np.argsort(morton3(q), kind="stable")
    frank = np.empty_like(forder)
    frank[forder] = np.arange(len(forder))
    order = np.lexsort((np.arange(len(fid)), frank[fid]))
    n = len(order)
    C = -(-n // K)
    assign = np.full(C * K, -1, np.int64)
    assign[:n] = order
    return assign.reshape(C, K)


def cluster_bounds(assign, lo, hi):
    C, K = assign.shape
    big = 3e37
    l = np.where((assign >= 0)[..., None], lo[np.maximum(assign, 0)], big)
    h = np.where((assign >= 0)[..., None], hi[np.maximum(assign, 0)], -big)
    return l.min(1), h.max(1)


# ---------------------------------------------------------------------------
# numpy slab cull + miter-cylinder test (mirror of pallas_tiled._cyl_test)
# ---------------------------------------------------------------------------

def ray_cluster_te(o, d, mint, maxt, cl_lo, cl_hi, chunk=2048):
    """[N, C] entry-t (inf = miss), mirroring _tile_cluster_mask."""
    N = len(o)
    C = len(cl_lo)
    inv = 1.0 / np.where(np.abs(d) < 1e-12,
                         np.where(d >= 0, 1e-12, -1e-12), d)
    out = np.empty((N, C), np.float32)
    for c0 in range(0, C, chunk):
        lo = cl_lo[c0:c0 + chunk]
        hi = cl_hi[c0:c0 + chunk]
        a0 = (lo[None, :, :] - o[:, None, :]) * inv[:, None, :]
        a1 = (hi[None, :, :] - o[:, None, :]) * inv[:, None, :]
        tn = np.minimum(a0, a1).max(-1)
        tf = np.maximum(a0, a1).min(-1)
        tf = tf * 1.00000024 + 1e-7
        hit = (tn <= tf) & (tf >= mint[:, None]) & (tn <= maxt[:, None])
        out[:, c0:c0 + chunk] = np.where(hit, np.maximum(tn, 0.0), np.inf)
    return out


def cyl_test_np(s, idx, o, d, mint, maxt):
    """Closest miter-cylinder hit of ONE ray against segments idx.
    Returns (t, seg_id) with t=inf, seg=-1 on miss."""
    p0, p1 = s["p0"][idx], s["p1"][idx]
    n0, n1 = s["n0"][idx], s["n1"][idx]
    rr = s["radius"][idx]
    ax = p1 - p0
    ax = ax / np.maximum(np.linalg.norm(ax, axis=-1, keepdims=True), 1e-20)
    r = o[None, :] - p0
    ar = np.sum(ax * r, -1)
    po = r - ar[:, None] * ax
    ad = np.sum(ax * d[None, :], -1)
    pd = d[None, :] - ad[:, None] * ax
    a = np.sum(pd * pd, -1)
    b = np.sum(po * pd, -1)
    ok = a > 1e-18
    inv_a = 1.0 / np.where(ok, a, 1.0)
    t_mid = -b * inv_a
    q = po + pd * t_mid[:, None]
    c_mid = np.sum(q * q, -1) - rr * rr
    disc = -c_mid * inv_a
    ok &= disc >= 0
    dt = np.sqrt(np.maximum(disc, 0))
    on0 = np.sum(r * n0, -1)
    dn0 = np.sum(d[None, :] * n0, -1)
    sn1 = np.sum((p1 - p0) * n1, -1)
    on1 = np.sum(r * n1, -1) - sn1
    dn1 = np.sum(d[None, :] * n1, -1)

    def m_ok(t):
        return (on0 + t * dn0 >= 0) & (on1 + t * dn1 <= 0)

    tn_, tf_ = t_mid - dt, t_mid + dt
    near = ok & (tn_ >= mint) & (tn_ <= maxt) & m_ok(tn_)
    far = ok & (tf_ >= mint) & (tf_ <= maxt) & m_ok(tf_)
    t = np.where(near, tn_, tf_)
    hit = near | far
    if not hit.any():
        return np.inf, -1
    j = np.where(hit)[0][np.argmin(t[hit])]
    return t[hit].min(), int(idx[j])


# ---------------------------------------------------------------------------
# work model
# ---------------------------------------------------------------------------

def tile_work(te, t_true, hit_cl, n_tiles):
    """Early-exit work model over tiles of TILE consecutive rays.

    te     [N, C] per-ray cluster entry-t (inf = miss)
    t_true [N]    true closest hit (inf = miss)
    hit_cl [N]    cluster holding the hit segment in THIS clustering
                  (-1 = miss)

    A ray's hit materializes once the slot holding hit_cl has been
    processed; it is resolved at slot q when its hit beats the
    suffix bound te_next[q], or when the bound passes its personal
    t_pmax (candidate exhaustion) — exactly the kernel's `resolved`.

    Returns dict: union (mean tile union), q_end (mean slots processed
    with the per-tile all-rays early exit), ray_ideal (mean per-ray
    slots if each ray quit individually — the CSR ceiling /64 lanes),
    percand (mean per-ray candidates)."""
    N, C = te.shape
    unions, q_ends, ideals, percand, oct_pairs = [], [], [], [], []
    for ti in range(n_tiles):
        sl = slice(ti * TILE, (ti + 1) * TILE)
        te_t = te[sl]
        tt = t_true[sl]
        hc = hit_cl[sl]
        finite = np.isfinite(te_t)
        percand.append(finite.sum(1).mean())
        t_pmax = np.where(finite.any(1),
                          np.where(finite, te_t, -1).max(1), -1.0)
        tile_te = np.where(finite.any(0), te_t.min(0), np.inf)
        cand = np.where(np.isfinite(tile_te))[0]
        u = len(cand)
        unions.append(u)
        if u == 0:
            q_ends.append(0)
            ideals.append(0)
            oct_pairs.append(0)
            continue
        order = cand[np.argsort(tile_te[cand], kind="stable")]
        pos = np.full(C, u + 1, np.int64)      # slot position per cluster
        pos[order] = np.arange(u)
        te_next = np.concatenate([tile_te[order[1:]], [np.inf]])
        ppos = np.where(hc >= 0, pos[np.maximum(hc, 0)], u + 1)
        qs = np.arange(u)
        have_hit = np.isfinite(tt)[:, None] & (qs[None, :] >= ppos[:, None])
        done = (have_hit & (tt[:, None] <= te_next[None, :])) \
            | (te_next[None, :] > t_pmax[:, None])
        all_done = done.all(0)
        q_end = int(np.argmax(all_done)) + 1 if all_done.any() else u
        q_ends.append(q_end)
        # octet-pair model: a kernel processing (slot, octet) pairs in
        # [64,128] blocks of 8 pairs — pair exists if any ray of the
        # octet enters the cluster AND the octet is not yet resolved
        # (its own rays' early exit) at that slot.
        oct_of = np.arange(TILE) // 8
        done_oct = np.ones((8, u), bool)
        for ob in range(8):
            done_oct[ob] = done[oct_of == ob].all(0)
        # octet ob still needs slot q if not done before q
        alive = np.ones((8, u), bool)
        alive[:, 1:] = ~done_oct[:, :-1]
        enters = np.zeros((8, u), bool)
        for ob in range(8):
            enters[ob] = np.isfinite(te_t[oct_of == ob][:, order]).any(0)
        pair_count = int((alive & enters).sum())
        oct_pairs.append(pair_count / 8.0)   # in [64,128]-block iterations
        # per-ray ideal: each ray over its own candidate list
        tot = 0
        for rr in range(TILE):
            own = np.where(finite[rr])[0]
            if len(own) == 0:
                continue
            ote = te_t[rr][own]
            oo = np.argsort(ote, kind="stable")
            onext = np.concatenate([ote[oo[1:]], [np.inf]])
            if np.isfinite(tt[rr]) and hc[rr] >= 0:
                op = np.where(own[oo] == hc[rr])[0]
                op = op[0] if len(op) else len(own)
                d_ = (np.arange(len(own)) >= op) & (tt[rr] <= onext)
                tot += int(np.argmax(d_)) + 1 if d_.any() else len(own)
            else:
                tot += len(own)
        ideals.append(tot / TILE)
    return dict(union=float(np.mean(unions)) if unions else 0.0,
                q_end=float(np.mean(q_ends)) if q_ends else 0.0,
                ray_ideal=float(np.mean(ideals)) if ideals else 0.0,
                percand=float(np.mean(percand)) if percand else 0.0,
                oct_pairs=float(np.mean(oct_pairs)) if oct_pairs else 0.0)


# ---------------------------------------------------------------------------

def sort_key(o, d, scene_lo, scene_hi, variant: str):
    inv = 1.0 / np.maximum(scene_hi - scene_lo, 1e-9)
    q8 = np.clip((o - scene_lo) * inv * 255.0, 0, 255).astype(np.uint32)
    m = np.zeros(len(o), np.uint64)
    for b in range(8):
        for axx in range(3):
            m |= np.uint64(1) * (((q8[:, axx] >> b) & 1).astype(np.uint64)
                                 << np.uint64(3 * b + axx))
    octant = ((d[:, 0] > 0).astype(np.uint64)
              | ((d[:, 1] > 0).astype(np.uint64) << np.uint64(1))
              | ((d[:, 2] > 0).astype(np.uint64) << np.uint64(2)))
    if variant == "cur":                      # octant-major (the build)
        return m | (octant << np.uint64(24))
    if variant == "morton_major":             # origin-major
        return (m << np.uint64(3)) | octant
    if variant.startswith("dir"):             # finer direction bits
        nb = int(variant[3:])                 # bits per dir axis
        qd = np.clip((d * 0.5 + 0.5) * ((1 << nb) - 1) + 0.5, 0,
                     (1 << nb) - 1).astype(np.uint64)
        dk = (qd[:, 0] | (qd[:, 1] << np.uint64(nb))
              | (qd[:, 2] << np.uint64(2 * nb)))
        return m | (dk << np.uint64(24))
    raise ValueError(variant)


def main():
    quality = float(os.environ.get("EV_QUALITY", "14"))
    n_tiles = int(os.environ.get("EV_TILES", "192"))
    res = int(os.environ.get("EV_RES", "512"))
    t0 = time.time()
    s = build_segments(quality)
    n = len(s["p0"])
    print(f"[ev] {n} segments ({time.time()-t0:.1f}s)", flush=True)

    # camera rays in block-swizzle order (how the tracer tiles them)
    from hairpt.integrators.common import block_swizzle
    import bench  # noqa  (reuse the bench camera)
    cam_to_world = np.array([
        [-0.704024, 0.0939171, 0.703939, -10.6677],
        [1.05829e-08, 0.991217, -0.132245, 14.3141],
        [-0.710177, -0.0931033, -0.69784, 10.2879],
        [0, 0, 0, 1]])
    swz = block_swizzle(res, res)
    rng = np.random.default_rng(0)
    # sample contiguous runs of tiles spread over the image
    total_tiles = res * res // TILE
    tsel = np.sort(rng.choice(total_tiles, n_tiles, replace=False))
    pix = np.concatenate([swz[t * TILE:(t + 1) * TILE] for t in tsel])
    px = (pix % res + 0.5) / res
    py = (pix // res + 0.5) / res
    # perspective ray gen, matching sensors.sample_ray: camera-space
    # direction ((1-2u)tan, (1-2v)tan/aspect, 1)
    tan_h = np.tan(np.radians(35.0) * 0.5)
    d_cam = np.stack([(1 - 2 * px) * tan_h, (1 - 2 * py) * tan_h,
                      np.ones_like(px)], -1)
    R = cam_to_world[:3, :3]
    d = d_cam @ R.T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(cam_to_world[:3, 3], d.shape).copy()
    mint = np.zeros(len(d), np.float32)
    maxt = np.full(len(d), np.inf, np.float32)

    lo2, hi2 = seg_aabbs(s, "x2")
    lot, hit_ = seg_aabbs(s, "tight")
    assigns = {
        "morton128_x2 (current)": cluster_morton(lo2, hi2),
        "morton128_tight": cluster_morton(lot, hit_),
        "sah128_tight": cluster_sah(lot, hit_, leaf_size=32, K=128),
        "sah_leaf64": cluster_sah(lot, hit_, leaf_size=64, K=256),
        "fiber128_tight": cluster_fiber(s, lot, hit_),
    }
    configs = {}
    for name, a in assigns.items():
        lohi = (lo2, hi2) if name.endswith("x2 (current)") else (lot, hit_)
        cl, ch = cluster_bounds(a, *lohi)
        s2c = np.full(n, -1, np.int64)
        valid = a >= 0
        s2c[a[valid]] = np.repeat(np.arange(a.shape[0]), a.shape[1])[
            valid.reshape(-1)]
        fill = valid.sum() / a.size
        configs[name] = (a, cl, ch, s2c)
        print(f"  {name}: C={len(cl)} fill={fill*100:.0f}%")

    scene_lo = lo2.min(0)
    scene_hi = hi2.max(0)

    # true hits (computed once against the current clustering's candidates)
    name0 = "morton128_x2 (current)"
    assign0, cl0, ch0, _ = configs[name0]

    def true_hits(po, pd, pmi, pma):
        te_ref = ray_cluster_te(po, pd, pmi, pma, cl0, ch0)
        tt = np.full(len(po), np.inf)
        seg = np.full(len(po), -1, np.int64)
        for i in range(len(po)):
            cand = np.where(np.isfinite(te_ref[i]))[0]
            if len(cand) == 0:
                continue
            idx = assign0[cand].reshape(-1)
            idx = idx[idx >= 0]
            tt[i], seg[i] = cyl_test_np(s, idx, po[i], pd[i], pmi[i],
                                        pma[i])
        return tt, seg

    t1 = time.time()
    t_true, _ = true_hits(o, d, mint, maxt)
    print(f"[ev] camera true hits: {np.isfinite(t_true).mean()*100:.0f}% "
          f"hit ({time.time()-t1:.1f}s)", flush=True)

    # bounce + shadow populations from the hit points (4 spawns per hit
    # for tile statistics; trimmed to whole tiles)
    hitm = np.isfinite(t_true)
    hp = np.repeat(o[hitm] + d[hitm] * t_true[hitm][:, None], 4, axis=0)
    nb = (len(hp) // TILE) * TILE
    hp = hp[:nb]
    u = rng.random((nb, 2))
    z = 1 - 2 * u[:, 0]
    rr_ = np.sqrt(np.maximum(1 - z * z, 0))
    phi = 2 * np.pi * u[:, 1]
    bd = np.stack([rr_ * np.cos(phi), z, rr_ * np.sin(phi)], -1)
    b_o, b_d = hp, bd
    b_mint = np.full(nb, 1e-3, np.float32)
    b_maxt = np.full(nb, np.inf, np.float32)
    sun = np.array([-0.376047, 0.758426, 0.532333])
    sun /= np.linalg.norm(sun)
    s_d = np.broadcast_to(sun, (nb, 3)).copy()

    pops = {"camera": (o, d, mint, maxt, None),
            "bounce": (b_o, b_d, b_mint, b_maxt, "sort"),
            "shadow": (b_o, s_d, b_mint, b_maxt, "sort")}

    sort_variants = ["cur", "morton_major", "dir4", "dir6"]

    for pname, (po, pd, pmi, pma, dosort) in pops.items():
        tt, seg = true_hits(po, pd, pmi, pma)
        print(f"\n== {pname}: {len(po)} rays, "
              f"{np.isfinite(tt).mean()*100:.0f}% hit ==", flush=True)
        orders = {"asis": np.arange(len(po))}
        if dosort:
            for v in sort_variants:
                orders[v] = np.argsort(
                    sort_key(po, pd, scene_lo, scene_hi, v), kind="stable")
        for cname, (a_c, cl, ch, s2c) in configs.items():
            hit_cl = np.where(seg >= 0, s2c[np.maximum(seg, 0)], -1)
            for oname, ordr in orders.items():
                if pname == "camera" and oname != "asis":
                    continue
                te = ray_cluster_te(po[ordr], pd[ordr], pmi[ordr],
                                    pma[ordr], cl, ch)
                w = tile_work(te, tt[ordr], hit_cl[ordr], len(po) // TILE)
                print(f"  {cname:24s} {oname:13s} union={w['union']:7.1f} "
                      f"q_end={w['q_end']:7.1f} ray_ideal={w['ray_ideal']:6.1f} "
                      f"percand={w['percand']:6.1f} "
                      f"oct_iters={w['oct_pairs']:7.1f}", flush=True)


if __name__ == "__main__":
    main()
