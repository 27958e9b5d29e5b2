import numpy as np
import jax
import jax.numpy as jnp

from hairpt.core.math import Ray
from hairpt.ops import intersect as isec
from hairpt.ops import intersect_swept as sw
from hairpt.scene import hairgen


def _geom_and_rays(n_fibers=400, n_rays=2048, seed=0):
    fs = hairgen.gen_furball(n_fibers=n_fibers, n_segs=8, radius=0.01,
                             seed=seed, center=(0, 0, 0), core_r=0.8,
                             fiber_len=1.0)
    segs = hairgen.segments(fs)
    p0, p1, n0, n1, rad = (segs[k] for k in ("p0", "p1", "n0", "n1",
                                             "radius"))
    rng = np.random.default_rng(seed + 1)
    o = rng.uniform(-1, 1, (n_rays, 3)) * 0.5 + np.array([0, 0.2, -4.0])
    tgt = rng.uniform(-1.5, 1.5, (n_rays, 3))
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Ray(o=jnp.asarray(o, jnp.float32), d=jnp.asarray(d, jnp.float32),
               mint=jnp.zeros(n_rays), maxt=jnp.full(n_rays, np.inf))
    return (p0, p1, n0, n1, rad), rays


def test_swept_matches_bruteforce():
    (p0, p1, n0, n1, rad), rays = _geom_and_rays()
    n_seg = len(p0)
    K = 32
    swept = sw.build_swept_hair(p0, p1, n0, n1, rad, K=K)
    n_clusters = int(swept.seg_rows.shape[0]) // K

    t_sw, prim_sw = sw.swept_closest_hit(swept, rays, n_clusters, K,
                                         p_max=48, chunk=8)

    geom = isec.HairGeom(p0=jnp.asarray(p0), p1=jnp.asarray(p1),
                         n0=jnp.asarray(n0), n1=jnp.asarray(n1),
                         radius=jnp.asarray(rad))
    t_ref, prim_ref = isec.brute_force_closest(geom,
                                               isec.hair_intersect_block,
                                               n_seg, rays)
    hit_sw = np.asarray(prim_sw) >= 0
    hit_ref = np.asarray(prim_ref) >= 0
    # identical hit classification and t values
    agree = hit_sw == hit_ref
    assert agree.mean() > 0.999, agree.mean()
    m = hit_ref & agree
    np.testing.assert_allclose(np.asarray(t_sw)[m], np.asarray(t_ref)[m],
                               rtol=2e-4, atol=1e-5)
    match = (np.asarray(prim_sw)[m] == np.asarray(prim_ref)[m])
    assert match.mean() > 0.999, match.mean()

    occ = sw.swept_any_hit(swept, rays, n_clusters, K, p_max=48, chunk=8)
    np.testing.assert_array_equal(np.asarray(occ)[agree], hit_ref[agree])


def test_swept_render_matches_packed():
    """Full render with traversal='swept' matches traversal='packed'."""
    import dataclasses
    import jax.numpy as jnp
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
                    sampler=1, swept_pmax=64, swept_k=32)
    img_packed = np.asarray(path_int.render(scene, spp=2))
    scene_sw = scene._replace(config=dataclasses.replace(
        scene.config, traversal="swept"))
    img_swept = np.asarray(path_int.render(scene_sw, spp=2))
    np.testing.assert_allclose(img_swept, img_packed, rtol=2e-3, atol=2e-3)


def test_swept_pallas_interpret_matches_xla():
    """Pallas phase-B kernel (interpret mode on CPU) == XLA phase B."""
    (p0, p1, n0, n1, rad), rays = _geom_and_rays(n_fibers=120, n_rays=512)
    K = 32
    swept = sw.build_swept_hair(p0, p1, n0, n1, rad, K=K)
    C = int(swept.seg_rows.shape[0]) // K
    t_x, p_x = sw.swept_closest_hit(swept, rays, C, K, p_max=48, chunk=8,
                                    impl="xla")
    t_p, p_p = sw.swept_closest_hit(swept, rays, C, K, p_max=48, chunk=8,
                                    impl="pallas")
    np.testing.assert_array_equal(np.asarray(p_x), np.asarray(p_p))
    m = np.asarray(p_x) >= 0
    np.testing.assert_allclose(np.asarray(t_x)[m], np.asarray(t_p)[m],
                               rtol=1e-5)
