"""Tile-routed intersector (ops/intersect_tiled.py + pallas_tiled.py):
brute-force oracle match, any-hit consistency, full-render parity with
the packed traversal, and tile-padding edge cases."""
import dataclasses

import numpy as np
import jax.numpy as jnp

from hairpt.core.math import Ray
from hairpt.ops import intersect as isec
from hairpt.ops import intersect_swept as sw
from hairpt.ops import intersect_tiled as tl
from hairpt.scene import hairgen

from test_swept import _geom_and_rays


def test_tiled_matches_bruteforce():
    (p0, p1, n0, n1, rad), rays = _geom_and_rays()
    n_seg = len(p0)
    K = 32
    swept = sw.build_swept_hair(p0, p1, n0, n1, rad, K=K)
    C = int(swept.seg_rows.shape[0]) // K

    t_tl, prim_tl, ovf = tl.tiled_closest_hit(swept, rays, C, K, q_max=192,
                                              return_overflow=True)
    assert int(ovf) == 0

    geom = isec.HairGeom(p0=jnp.asarray(p0), p1=jnp.asarray(p1),
                         n0=jnp.asarray(n0), n1=jnp.asarray(n1),
                         radius=jnp.asarray(rad))
    t_ref, prim_ref = isec.brute_force_closest(geom,
                                               isec.hair_intersect_block,
                                               n_seg, rays)
    hit_tl = np.asarray(prim_tl) >= 0
    hit_ref = np.asarray(prim_ref) >= 0
    # no per-ray candidate cap in the tiled router → exact hit classification
    np.testing.assert_array_equal(hit_tl, hit_ref)
    m = hit_ref
    np.testing.assert_allclose(np.asarray(t_tl)[m], np.asarray(t_ref)[m],
                               rtol=2e-4, atol=1e-5)
    assert (np.asarray(prim_tl)[m] == np.asarray(prim_ref)[m]).mean() > 0.999

    occ = tl.tiled_any_hit(swept, rays, C, K, q_max=192)
    np.testing.assert_array_equal(np.asarray(occ), hit_ref)


def test_tiled_subcull_matches_bruteforce():
    """Sub-cluster-AABB phase-A culling (subcull=True) against the
    brute-force oracle, including the any-hit mode and ray-sorted path."""
    (p0, p1, n0, n1, rad), rays = _geom_and_rays()
    n_seg = len(p0)
    K = 64
    swept = sw.build_swept_hair(p0, p1, n0, n1, rad, K=K)
    C = swept.cl_lo.shape[0]

    t_tl, prim_tl, ovf = tl.tiled_closest_hit(swept, rays, C, K, q_max=256,
                                              subcull=True,
                                              return_overflow=True)
    assert int(ovf) == 0

    geom = isec.HairGeom(p0=jnp.asarray(p0), p1=jnp.asarray(p1),
                         n0=jnp.asarray(n0), n1=jnp.asarray(n1),
                         radius=jnp.asarray(rad))
    t_ref, prim_ref = isec.brute_force_closest(geom,
                                               isec.hair_intersect_block,
                                               n_seg, rays)
    hit_tl = np.asarray(prim_tl) >= 0
    hit_ref = np.asarray(prim_ref) >= 0
    np.testing.assert_array_equal(hit_tl, hit_ref)
    m = hit_ref
    np.testing.assert_allclose(np.asarray(t_tl)[m], np.asarray(t_ref)[m],
                               rtol=2e-4, atol=1e-5)
    assert (np.asarray(prim_tl)[m] == np.asarray(prim_ref)[m]).mean() > 0.999

    occ = tl.tiled_any_hit(swept, rays, C, K, q_max=256, subcull=True)
    np.testing.assert_array_equal(np.asarray(occ), hit_ref)

    # Morton-sorted bounce-style path returns identical results
    t_s, prim_s = tl.tiled_closest_hit(swept, rays, C, K, q_max=256,
                                       subcull=True, sort_rays=True)
    np.testing.assert_array_equal(np.asarray(prim_s), np.asarray(prim_tl))


def test_tiled_ragged_n_and_finite_maxt():
    """N not a multiple of the tile size + shadow-style finite maxt rays."""
    (p0, p1, n0, n1, rad), rays = _geom_and_rays(n_fibers=150, n_rays=333)
    K = 32
    swept = sw.build_swept_hair(p0, p1, n0, n1, rad, K=K)
    C = int(swept.seg_rows.shape[0]) // K
    t_full, prim_full = tl.tiled_closest_hit(swept, rays, C, K)
    assert t_full.shape == (333,)

    # clip maxt to 0.7*t_hit: every previously-hit ray must now miss
    hit = np.asarray(prim_full) >= 0
    maxt = np.where(hit, np.asarray(t_full) * 0.7, 0.0)
    rays2 = rays._replace(maxt=jnp.asarray(maxt, jnp.float32))
    t2, prim2 = tl.tiled_closest_hit(swept, rays2, C, K)
    assert not np.any(np.asarray(prim2) >= 0)
    # and mint beyond the hit skips the near hit
    mint = np.where(hit, np.asarray(t_full) * 1.001, 0.0)
    rays3 = rays._replace(mint=jnp.asarray(mint, jnp.float32))
    t3, prim3 = tl.tiled_closest_hit(swept, rays3, C, K)
    changed = hit & (np.asarray(prim3) != np.asarray(prim_full))
    dropped = hit & (np.asarray(prim3) < 0)
    assert np.all(changed | ~hit | (np.asarray(t3) > np.asarray(t_full))
                  | dropped)


def test_tiled_render_matches_packed():
    """Full path-traced render with traversal='tiled' == 'packed'."""
    from hairpt.film.film import Film
    from hairpt.models import emitters as em
    from hairpt.models.bsdf import registry as mat
    from hairpt.models.sensors import Camera
    from hairpt.core.math import matrix_lookat
    from hairpt.scene.scene import SceneBuilder
    from hairpt.integrators import path as path_int

    b = SceneBuilder()
    m = b.add_material(kind=mat.KAJIYAKAY, diffuse=(0.35, 0.2, 0.05),
                       specular=(0.2, 0.2, 0.2), exponent=10.0)
    fs = hairgen.gen_furball(n_fibers=250, n_segs=6, radius=0.02, seed=1,
                             center=(0, 0, 0), core_r=0.6, fiber_len=0.8)
    b.add_fibers(fs, m)
    b.env = em.make_constant((0.8, 0.7, 0.6))
    cam = Camera.perspective(matrix_lookat((0, 0.5, -4), (0, 0, 0),
                                           (0, 1, 0)), 45.0, 24, 24)
    scene = b.build(cam, Film.make(24, 24, "box"), spp=1, max_depth=3,
                    sampler=1, swept_k=32)
    img_packed = np.asarray(path_int.render(scene, spp=2))
    scene_tl = scene._replace(config=dataclasses.replace(
        scene.config, traversal="tiled"))
    img_tiled = np.asarray(path_int.render(scene_tl, spp=2))
    # ≥99.5% of values bit-comparable; the rest are equal-t tie-breaks
    # resolving to an adjacent fiber (different shading normal)
    close = np.isclose(img_tiled, img_packed, rtol=2e-3, atol=2e-3)
    assert close.mean() > 0.995, close.mean()
    assert np.abs(img_tiled - img_packed).max() < 0.05


def test_cull_phase_a_kernel_matches_jnp():
    """Pallas phase-A culling kernel (interpret) vs the jnp slab test:
    identical tile masks, identical entry-t for every candidate; t_pmax
    may differ only on fp-marginal grazing hits (both forms stay
    self-consistent and conservative)."""
    from hairpt.ops.pallas_tiled import cull_phase_a, CULL_CH

    (p0, p1, n0, n1, rad), rays = _geom_and_rays()
    swept = sw.build_swept_hair(p0, p1, n0, n1, rad, K=64)
    tile = 64
    ray_p, _ = tl._pad_rays(rays, tile)
    T = ray_p.o.shape[0] // tile
    rays8 = jnp.stack(
        [ray_p.o[:, 0].reshape(T, tile), ray_p.o[:, 1].reshape(T, tile),
         ray_p.o[:, 2].reshape(T, tile), ray_p.d[:, 0].reshape(T, tile),
         ray_p.d[:, 1].reshape(T, tile), ray_p.d[:, 2].reshape(T, tile),
         ray_p.mint.reshape(T, tile), ray_p.maxt.reshape(T, tile)], axis=1)
    mask_j, te_j, tp_j, oct_j = tl._tile_cluster_mask(swept, ray_p, tile)

    C = swept.cl_lo.shape[0]
    c_pad = -(-C // CULL_CH) * CULL_CH
    bounds = jnp.full((8, c_pad), 3e37, jnp.float32).at[3:6].set(-3e37)
    bounds = bounds.at[0:3, :C].set(swept.cl_lo.T)
    bounds = bounds.at[3:6, :C].set(swept.cl_hi.T)
    te_p, tp_p, oct_p = cull_phase_a(rays8, bounds, interpret=True,
                                     emit_oct=True)
    te_p = np.asarray(te_p)[:, :C]

    m_j = np.asarray(mask_j)
    np.testing.assert_array_equal(np.isfinite(te_p), m_j)
    np.testing.assert_allclose(te_p[m_j], np.asarray(te_j)[m_j],
                               rtol=1e-6, atol=1e-6)
    # octet bits: pallas == jnp exactly
    np.testing.assert_array_equal(np.asarray(oct_p)[:, :C],
                                  np.asarray(oct_j))
    # union consistency: OR of octet bits == the tile mask
    assert ((np.asarray(oct_j) != 0) == m_j).all()
    tp_p = np.asarray(tp_p).reshape(-1)
    tp_j = np.asarray(tp_j)
    close = np.isclose(tp_p, tp_j, rtol=1e-5, atol=1e-5)
    assert close.mean() > 0.95   # fp-marginal grazing hits only
    # padded ray slots never contribute (maxt < mint ⇒ dead)
    assert np.all(np.isfinite(te_p[m_j]))


def test_tiled_nonresident_unrolled_dma_matches_resident():
    """The unrolled DMA pipeline (non-resident segment table, k-slot
    unroll with n_buf > unroll prefetch buffers) must produce the same
    hits as the VMEM-resident path.

    resident is passed EXPLICITLY (not via HAIRPT_FORCE_NONRESIDENT):
    it is a static arg of the jitted kernel wrapper, so resident=True
    and resident=False are guaranteed distinct compilations — the DMA
    path genuinely executes (ADVICE r2: the env-var form was a silent
    jit-cache hit on the resident path)."""
    (p0, p1, n0, n1, rad), rays = _geom_and_rays()
    K = 32
    swept = sw.build_swept_hair(p0, p1, n0, n1, rad, K=K)
    C = int(swept.seg_rows.shape[0]) // K

    t_res, prim_res = tl.tiled_closest_hit(swept, rays, C, K, q_max=192,
                                           resident=True)
    t_dma, prim_dma = tl.tiled_closest_hit(swept, rays, C, K, q_max=192,
                                           resident=False, unroll=4)

    np.testing.assert_array_equal(np.asarray(prim_dma) >= 0,
                                  np.asarray(prim_res) >= 0)
    m = np.asarray(prim_res) >= 0
    np.testing.assert_allclose(np.asarray(t_dma)[m], np.asarray(t_res)[m],
                               rtol=1e-6, atol=1e-7)
    assert (np.asarray(prim_dma)[m] == np.asarray(prim_res)[m]).all()

    occ_r = tl.tiled_any_hit(swept, rays, C, K, q_max=192, resident=False,
                             unroll=4)
    np.testing.assert_array_equal(np.asarray(occ_r), m)


def _adversarial_pencil(n_decoy=2000, K=32):
    """A grazing pencil through MANY near-collinear decoy clusters: every
    decoy fiber's AABB straddles the ray (slab test hits, so its cluster
    lands in the tile's candidate set) but the cylinder itself is offset
    so the ray misses; the ONLY true hit sits at the far end. With a tiny
    q_max the router overflows and, without exact completion, drops the
    far cluster containing the real hit — the VERDICT-r2 missable-hit
    scenario (reference contract: hair.cpp:485-542, no dropped hits)."""
    r = 0.01
    xs = 0.1 + 0.05 * np.arange(n_decoy)
    # decoy fibers: vertical, tilted in z from -1.5r to +5r so the AABB
    # spans z=0 (slab hit for a z=0 ray) but at the y=0 crossing the
    # axis sits at z=1.75r > r (cylinder miss)
    p0 = np.stack([xs, np.full_like(xs, -0.5),
                   np.full_like(xs, -1.5 * r)], -1)
    p1 = np.stack([xs, np.full_like(xs, 0.5),
                   np.full_like(xs, 5.0 * r)], -1)
    # the one REAL hit: a fiber crossing the ray axis exactly, far end
    x_hit = 0.1 + 0.05 * n_decoy + 1.0
    p0 = np.concatenate([p0, [[x_hit, -0.5, 0.0]]]).astype(np.float32)
    p1 = np.concatenate([p1, [[x_hit, 0.5, 0.0]]]).astype(np.float32)
    axis = p1 - p0
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    n0 = n1 = axis.astype(np.float32)
    rad = np.full(len(p0), r, np.float32)
    swept = sw.build_swept_hair(p0, p1, n0, n1, rad, K=K)
    C = int(swept.seg_rows.shape[0]) // K
    # a full 64-ray tile of identical grazing rays down the +x axis
    n_rays = 64
    o = np.zeros((n_rays, 3), np.float32)
    d = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (n_rays, 1))
    rays = Ray(o=jnp.asarray(o), d=jnp.asarray(d),
               mint=jnp.zeros(n_rays), maxt=jnp.full(n_rays, np.inf))
    return swept, C, rays, x_hit, len(p0) - 1


def test_tiled_overflow_exact_completion():
    """q_max overflow must not drop true hits (closest AND any mode)."""
    K = 32
    swept, C, rays, x_hit, hit_seg = _adversarial_pencil(K=K)
    assert C > 8

    t, p, ovf = tl.tiled_closest_hit(swept, rays, C, K, q_max=8,
                                     return_overflow=True)
    assert int(ovf) > 0   # the trap genuinely overflows the router
    # exact completion: every ray finds the far hit
    np.testing.assert_allclose(np.asarray(t), x_hit - 0.01, atol=1e-3)
    assert np.all(np.asarray(p) == hit_seg)
    occ = tl.tiled_any_hit(swept, rays, C, K, q_max=8)
    assert np.all(np.asarray(occ))

    # the naive router (exact_overflow=False) DROPS the hit — the trap
    # is real, and the completion pass is what fixes it
    t_naive, p_naive = tl.tiled_closest_hit(swept, rays, C, K, q_max=8,
                                            exact_overflow=False)
    assert not np.any(np.asarray(p_naive) >= 0)


def test_tiled_overflow_exact_matches_large_q_random():
    """On ordinary geometry a small q_max with exact completion must
    reproduce the large-q_max (no overflow) result bit-for-bit."""
    (p0, p1, n0, n1, rad), rays = _geom_and_rays(n_fibers=300,
                                                 n_rays=1024)
    K = 32
    swept = sw.build_swept_hair(p0, p1, n0, n1, rad, K=K)
    C = int(swept.seg_rows.shape[0]) // K
    t_big, p_big = tl.tiled_closest_hit(swept, rays, C, K, q_max=192)
    t_sm, p_sm, ovf = tl.tiled_closest_hit(swept, rays, C, K, q_max=8,
                                           return_overflow=True)
    assert int(ovf) > 0
    np.testing.assert_array_equal(np.asarray(p_sm) >= 0,
                                  np.asarray(p_big) >= 0)
    m = np.asarray(p_big) >= 0
    np.testing.assert_allclose(np.asarray(t_sm)[m], np.asarray(t_big)[m],
                               rtol=1e-6, atol=1e-7)


def test_streams_matches_dense_and_bruteforce():
    """Windowed octet-stream phase B (streams=True) against both the
    dense kernel and the brute-force oracle, closest + any-hit."""
    (p0, p1, n0, n1, rad), rays = _geom_and_rays()
    n_seg = len(p0)
    K = 32
    swept = sw.build_swept_hair(p0, p1, n0, n1, rad, K=K)
    C = int(swept.seg_rows.shape[0]) // K

    t_d, p_d = tl.tiled_closest_hit(swept, rays, C, K, q_max=192)
    t_s, p_s, ovf = tl.tiled_closest_hit(swept, rays, C, K, q_max=192,
                                         streams=True, stream_qo=256,
                                         stream_w=32,
                                         return_overflow=True)
    np.testing.assert_array_equal(np.asarray(p_s) >= 0,
                                  np.asarray(p_d) >= 0)
    m = np.asarray(p_d) >= 0
    np.testing.assert_allclose(np.asarray(t_s)[m], np.asarray(t_d)[m],
                               rtol=1e-6, atol=1e-7)
    assert (np.asarray(p_s)[m] == np.asarray(p_d)[m]).mean() > 0.999

    geom = isec.HairGeom(p0=jnp.asarray(p0), p1=jnp.asarray(p1),
                         n0=jnp.asarray(n0), n1=jnp.asarray(n1),
                         radius=jnp.asarray(rad))
    t_ref, prim_ref = isec.brute_force_closest(geom,
                                               isec.hair_intersect_block,
                                               n_seg, rays)
    hit_ref = np.asarray(prim_ref) >= 0
    np.testing.assert_array_equal(np.asarray(p_s) >= 0, hit_ref)

    occ_s = tl.tiled_any_hit(swept, rays, C, K, q_max=192, streams=True,
                             stream_qo=256, stream_w=32)
    np.testing.assert_array_equal(np.asarray(occ_s), hit_ref)


def test_streams_truncation_exact_completion():
    """Stream truncation (stream_qo smaller than per-octet candidate
    counts) and window splits must complete exactly — bit-identical to
    the dense large-q result, including the adversarial pencil."""
    K = 32
    swept, C, rays, x_hit, hit_seg = _adversarial_pencil(K=K)
    t_s, p_s, ovf = tl.tiled_closest_hit(swept, rays, C, K, q_max=8,
                                         streams=True, stream_qo=4,
                                         stream_w=4,
                                         return_overflow=True)
    assert int(ovf) > 0
    np.testing.assert_allclose(np.asarray(t_s), x_hit - 0.01, atol=1e-3)
    assert np.all(np.asarray(p_s) == hit_seg)
    occ = tl.tiled_any_hit(swept, rays, C, K, q_max=8, streams=True,
                           stream_qo=4, stream_w=4)
    assert np.all(np.asarray(occ))

    # random geometry, sorted + compacted path, tiny caps
    (p0, p1, n0, n1, rad), rays2 = _geom_and_rays(n_fibers=300,
                                                  n_rays=1024)
    swept2 = sw.build_swept_hair(p0, p1, n0, n1, rad, K=K)
    C2 = int(swept2.seg_rows.shape[0]) // K
    t_big, p_big = tl.tiled_closest_hit(swept2, rays2, C2, K, q_max=192)
    t_sm, p_sm, ov2 = tl.tiled_closest_hit(swept2, rays2, C2, K, q_max=16,
                                           streams=True, stream_qo=8,
                                           stream_w=8, sort_rays=True,
                                           return_overflow=True)
    assert int(ov2) > 0
    np.testing.assert_array_equal(np.asarray(p_sm) >= 0,
                                  np.asarray(p_big) >= 0)
    m = np.asarray(p_big) >= 0
    np.testing.assert_allclose(np.asarray(t_sm)[m], np.asarray(t_big)[m],
                               rtol=1e-6, atol=1e-7)
