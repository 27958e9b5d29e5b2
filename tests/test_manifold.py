"""Specular-manifold walk tests (reference: bidir/manifold.h, Jakob &
Marschner 2012). Oracles: Fermat's principle on an analytic sphere
(reflection) and Snell's law on a plane (refraction)."""
import numpy as np
import jax.numpy as jnp

from hairpt.core.math import Ray, normalize, dot
from hairpt.film.film import Film
from hairpt.integrators.common import scene_intersect
from hairpt.integrators.manifold import walk, generalized_g
from hairpt.integrators.aux_integrators import _swept_params
from hairpt.models import shapes as shp
from hairpt.models.bsdf import registry as mat
from hairpt.models.sensors import Camera
from hairpt.scene.scene import SceneBuilder


def _scene_with(mesh):
    b = SceneBuilder()
    mid = b.add_material(kind=mat.DIFFUSE, diffuse=(0.5, 0.5, 0.5))
    b.add_mesh(mesh, mid)
    cam = Camera.perspective(np.eye(4), 60.0, 8, 8)
    return b.build(cam, Film.make(8, 8, "box"), spp=1, max_depth=2)


def _initial_hit(scene, a, d):
    ray = Ray(o=jnp.asarray(a, jnp.float32), d=jnp.asarray(d, jnp.float32),
              mint=jnp.zeros(a.shape[0]), maxt=jnp.full(a.shape[0], np.inf))
    return scene_intersect(scene.arrays, ray, scene.config.traversal,
                           scene.config.block,
                           _swept_params(scene.config))


def _sphere_reflection_oracle(a, b):
    """Fermat: minimize |a−x|+|b−x| over the unit sphere (dense grid +
    local refinement)."""
    best = None
    th = np.linspace(0, np.pi, 400)
    ph = np.linspace(-np.pi, np.pi, 800)
    T, P = np.meshgrid(th, ph, indexing="ij")
    x = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P),
                  np.cos(T)], -1)
    # reflection point must face both endpoints
    vis = (x @ a > 0) & (x @ b > 0)
    cost = np.linalg.norm(x - a, axis=-1) + np.linalg.norm(x - b, axis=-1)
    cost[~vis] = np.inf
    i, j = np.unravel_index(np.argmin(cost), cost.shape)
    # refine
    for _ in range(40):
        dth = th[1] - th[0]
        th2 = np.linspace(T[i, j] - dth, T[i, j] + dth, 21)
        ph2 = np.linspace(P[i, j] - dth, P[i, j] + dth, 21)
        T, P = np.meshgrid(th2, ph2, indexing="ij")
        x = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P),
                      np.cos(T)], -1)
        cost = np.linalg.norm(x - a, axis=-1) + np.linalg.norm(x - b,
                                                               axis=-1)
        i, j = np.unravel_index(np.argmin(cost), cost.shape)
        th = th2
    best = x[i, j]
    return best


def test_manifold_mirror_sphere():
    scene = _scene_with(shp.sphere(1.0, 96, 192))
    a_np = np.array([0.0, 0.0, -3.0], np.float32)
    b_np = np.array([2.0, 1.0, -2.5], np.float32)
    n_l = 8
    a = jnp.broadcast_to(jnp.asarray(a_np), (n_l, 3))
    b = jnp.broadcast_to(jnp.asarray(b_np), (n_l, 3))
    # initial guesses: rays from a toward jittered directions at the sphere
    rs = np.random.RandomState(0)
    tgt = np.array([0.15, 0.1, 1.0]) + rs.randn(n_l, 3) * 0.05
    d0 = tgt / np.linalg.norm(tgt, axis=-1, keepdims=True)
    hit0 = _initial_hit(scene, np.tile(a_np, (n_l, 1)).astype(np.float32),
                        d0.astype(np.float32))
    assert int(hit0.valid.sum()) >= n_l - 2

    x, n, ok = walk(scene.arrays, scene.config, a, b, hit0)
    assert bool(ok.any())
    x_np = np.asarray(x)[np.asarray(ok)]
    n_w = np.asarray(n)[np.asarray(ok)]
    # reflection law at the solution
    wa = a_np - x_np
    wa /= np.linalg.norm(wa, axis=-1, keepdims=True)
    wb = b_np - x_np
    wb /= np.linalg.norm(wb, axis=-1, keepdims=True)
    r = 2 * np.sum(wa * n_w, -1, keepdims=True) * n_w - wa
    align = np.sum(r * wb, -1)
    assert (align > 0.9999).all(), align.min()
    # matches the analytic Fermat point up to mesh discretization
    oracle = _sphere_reflection_oracle(a_np, b_np)
    assert (np.linalg.norm(x_np - oracle, axis=-1) < 0.03).all()
    # generalized G is finite and positive on solved lanes
    g = np.asarray(generalized_g(a, b, x, n))[np.asarray(ok)]
    assert np.isfinite(g).all() and (g > 0).all()


def test_manifold_refraction_plane():
    # plane z=0 (rectangle spans [-1,1]²); a above, b below; relative IOR
    # (transmitted/incident as seen at the boundary) η
    scene = _scene_with(shp.rectangle())
    eta_v = 1.5
    a_np = np.array([0.0, 0.0, 1.0], np.float32)
    b_np = np.array([0.8, 0.0, -1.0], np.float32)
    n_l = 4
    a = jnp.broadcast_to(jnp.asarray(a_np), (n_l, 3))
    b = jnp.broadcast_to(jnp.asarray(b_np), (n_l, 3))
    rs = np.random.RandomState(1)
    tgt = np.array([0.3, 0.0, -1.0]) + rs.randn(n_l, 3) * 0.1
    d0 = tgt / np.linalg.norm(tgt, axis=-1, keepdims=True)
    hit0 = _initial_hit(scene, np.tile(a_np, (n_l, 1)).astype(np.float32),
                        d0.astype(np.float32))
    assert bool(hit0.valid.all())

    eta = jnp.full((n_l,), eta_v, jnp.float32)
    x, n, ok = walk(scene.arrays, scene.config, a, b, hit0, eta=eta)
    assert bool(ok.any())
    x_np = np.asarray(x)[np.asarray(ok)]
    # Snell oracle in the xz-plane: h = ŵa + η·ŵb ∥ ẑ  ⇒ tangential
    # components cancel: sinθa = η·sinθb with both measured from ẑ
    def resid(t):
        x_ = np.array([t, 0.0, 0.0])
        wa = a_np - x_
        wa /= np.linalg.norm(wa)
        wb = b_np - x_
        wb /= np.linalg.norm(wb)
        h = wa + eta_v * wb
        return h[0]
    ts = np.linspace(0.0, 0.8, 20001)
    rr = np.array([resid(t) for t in ts])
    sgn = np.where(np.diff(np.sign(rr)) != 0)[0]
    assert len(sgn) >= 1
    t_star = ts[sgn[0]]
    assert (np.abs(x_np[:, 0] - t_star) < 2e-3).all(), (x_np[:, 0], t_star)
    assert (np.abs(x_np[:, 2]) < 1e-4).all()
