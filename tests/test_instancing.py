"""Two-level BVH instancing (reference: src/shapes/{shapegroup,
instance}.cpp) — VERDICT round-1 item 10: shared-geometry instances must
render identically to flattened copies without duplicating geometry."""
import numpy as np
import jax.numpy as jnp

from hairpt.film.film import Film
from hairpt.film import film as film_mod
from hairpt.models import emitters as em, shapes as shp
from hairpt.models.bsdf import registry as mat
from hairpt.models.sensors import Camera
from hairpt.core.math import matrix_lookat
from hairpt.scene.scene import SceneBuilder
from hairpt.integrators import path as path_int


def _render(scene):
    li = path_int.make_li_fn(scene)
    n = scene.config.width * scene.config.height
    image, weight = film_mod.zeros(scene.film)
    pix = jnp.arange(n, dtype=jnp.uint32)
    for s in range(scene.config.spp):
        rad, pos, _ = li(scene.arrays, pix, jnp.full((n,), s, jnp.uint32))
        image, weight = film_mod.splat_samples(
            scene.film, jnp.nan_to_num(pos), jnp.nan_to_num(rad), image,
            weight)
    return np.asarray(film_mod.develop(image, weight))


def _floor_tw():
    return np.diag([4.0, 4.0, 1.0, 1.0]) @ np.array(
        [[1, 0, 0, 0], [0, 0, 1, -0.6], [0, -1, 0, 0], [0, 0, 0, 1.0]])


def _build(instanced: bool, rotate_last=False):
    b = SceneBuilder()
    m = b.add_material(kind=mat.DIFFUSE, diffuse=(0.6, 0.4, 0.3))
    sph = shp.compute_smooth_normals(shp.sphere(0.5, 16, 32))
    Ts = []
    for k, x in enumerate((-1.2, 0.0, 1.2)):
        t = np.eye(4)
        t[:3, 3] = (x, 0, 0)
        if rotate_last and k == 2:
            c, s = np.cos(0.7), np.sin(0.7)
            t[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            t[:3, :3] *= 1.3        # non-uniform-free scale too
        Ts.append(t)
    if instanced:
        p = b.add_prototype(sph, m)
        for t in Ts:
            b.add_instance(p, t)
    else:
        for t in Ts:
            b.add_mesh(sph, m, to_world=t)
    m2 = b.add_material(kind=mat.DIFFUSE, diffuse=(0.3,) * 3)
    b.add_mesh(shp.rectangle(), m2, to_world=_floor_tw())
    b.env = em.make_constant((1.0,) * 3)
    cam = Camera.perspective(matrix_lookat((0, 1.0, -4), (0, 0, 0),
                                           (0, 1, 0)), 50.0, 48, 32)
    return b.build(cam, Film.make(48, 32, "box"), spp=8, max_depth=4,
                   sampler=0)


def test_instanced_matches_flattened():
    img_f = _render(_build(False))
    img_i = _render(_build(True))
    # same sampler stream + same geometry ⇒ bitwise-equal paths
    np.testing.assert_allclose(img_i, img_f, atol=2e-5)


def test_instanced_with_rotation_scale():
    img_f = _render(_build(False, rotate_last=True))
    img_i = _render(_build(True, rotate_last=True))
    np.testing.assert_allclose(img_i, img_f, atol=2e-5)


def test_instancing_memory_shared():
    scene = _build(True)
    inst = scene.arrays.inst
    assert inst is not None
    assert len(inst.protos) == 1              # ONE copy of the sphere
    assert len(inst.proto_id) == 3            # three instances of it
    assert scene.arrays.tri.p0.shape[0] < 100  # only the floor flattened


def test_animated_instance_repose_matches_static():
    """repose_instanced at time t must equal a fresh build with the
    instance statically placed at T(t) (instance.cpp AnimatedTransform
    semantics), and render() under motion blur must differ from the
    static frame (the instance actually moves)."""
    from hairpt.core.track import AnimatedTransform
    from hairpt.ops import instancing as inst_mod

    def tr(x):
        t = np.eye(4)
        t[:3, 3] = (x, 0, 0)
        return t

    anim = AnimatedTransform([(0.0, tr(-1.0)), (1.0, tr(1.0))])

    def build(static_at=None, shutter=None, anim_=None):
        b = SceneBuilder()
        m = b.add_material(kind=mat.DIFFUSE, diffuse=(0.6, 0.4, 0.3))
        sph = shp.compute_smooth_normals(shp.sphere(0.5, 12, 24))
        p = b.add_prototype(sph, m)
        if static_at is not None:
            b.add_instance(p, tr(static_at))
        else:
            b.add_instance(p, anim_.eval(shutter[0]), anim=anim_)
            b.shutter = shutter
        b.env = em.make_constant((1.0,) * 3)
        cam = Camera.perspective(matrix_lookat((0, 1.0, -4), (0, 0, 0),
                                               (0, 1, 0)), 50.0, 32, 24)
        return b.build(cam, Film.make(32, 24, "box"), spp=4, max_depth=3,
                       sampler=1)

    sc_anim = build(shutter=(0.0, 1.0), anim_=anim)
    assert sc_anim.repose_inst is not None
    # transform parity at t=0.75 against a static build at x=0.5
    arr_t = sc_anim.repose_inst(sc_anim.arrays, 0.75)
    sc_static = build(static_at=0.5)
    np.testing.assert_allclose(np.asarray(arr_t.inst.w2o),
                               np.asarray(sc_static.arrays.inst.w2o),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(arr_t.inst.aabb_lo),
                               np.asarray(sc_static.arrays.inst.aabb_lo),
                               rtol=1e-5, atol=1e-6)
    # e2e: blurred render is finite and differs from the frozen frame
    img_blur = path_int.render(sc_anim)
    sc_frozen = build(static_at=-1.0)
    img_frozen = path_int.render(sc_frozen)
    assert np.isfinite(img_blur).all()
    assert np.abs(np.asarray(img_blur) - np.asarray(img_frozen)).max() \
        > 1e-3
