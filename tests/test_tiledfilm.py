"""Out-of-core banded rendering (tiledhdrfilm parity): the streamed EXR
must match the monolithic render, including across band seams (the apron
re-renders boundary samples so every pixel gets full filter support)."""
import os
import tempfile

import numpy as np

from hairpt.film.film import Film
from hairpt.film.tiled import render_tiled_exr
from hairpt.integrators import path as path_int
from hairpt.models import emitters as em
from hairpt.models import shapes as shp
from hairpt.models.bsdf import registry as mat
from hairpt.models.sensors import Camera
from hairpt.scene.scene import SceneBuilder
from hairpt.utils.exr import read_exr


def _scene(W=48, H=40):
    b = SceneBuilder()
    mid = b.add_material(kind=mat.DIFFUSE, diffuse=(0.6, 0.4, 0.3))
    t = np.eye(4)
    t[:3, 3] = [0, 0, 3]
    b.add_mesh(shp.sphere(1.0, 12, 24), mid, to_world=t)
    b.env = em.make_constant((0.8, 0.9, 1.0))
    cam = Camera.perspective(np.eye(4), 60.0, W, H)
    return b.build(cam, Film.make(W, H, "tent"), spp=2, max_depth=3)


def test_banded_matches_monolithic():
    scene = _scene()
    ref = np.asarray(path_int.render(scene, seed=0))
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "out.exr")
        render_tiled_exr(scene, path, band_rows=16, seed=0, half=False)
        got = read_exr(path)[..., :3]
    assert got.shape == ref.shape
    # identical samples, identical filter support → only scatter-add
    # float ordering differs
    assert np.allclose(got, ref, rtol=2e-5, atol=2e-6), \
        float(np.abs(got - ref).max())


def test_banded_band_larger_than_image():
    scene = _scene(W=32, H=24)
    ref = np.asarray(path_int.render(scene, seed=0))
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "out.exr")
        render_tiled_exr(scene, path, band_rows=64, seed=0, half=False)
        got = read_exr(path)[..., :3]
    assert np.allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_checkpoint_resume_exact():
    """Film checkpointing (reference analogs: -r partial flush +
    InstanceManager state shipping): resuming from a mid-render
    accumulator checkpoint reproduces the uninterrupted render exactly."""
    import jax.numpy as jnp
    from hairpt.integrators.common import block_swizzle

    scene = _scene(W=24, H=20)
    ref = np.asarray(path_int.render(scene, seed=0, spp=4))
    with tempfile.TemporaryDirectory() as td:
        ck = os.path.join(td, "film.npz")
        # accumulate waves 0-1 out-of-band, store as a checkpoint,
        # then resume waves 2-3 through render()
        from hairpt.film import film as film_mod
        li = path_int.make_li_fn(scene)
        swz = block_swizzle(24, 20)
        npix = 24 * 20
        img_acc, w_acc = film_mod.zeros(scene.film)
        for s in range(2):
            pix = swz if swz is not None else jnp.arange(npix,
                                                         dtype=jnp.uint32)
            rad, pos, _ = li(scene.arrays, pix,
                             jnp.full((npix,), s, jnp.uint32))
            rad = jnp.nan_to_num(rad, nan=0.0, posinf=0.0, neginf=0.0)
            img_acc, w_acc = film_mod.splat_samples(scene.film, pos, rad,
                                                    img_acc, w_acc)
        np.savez(ck, image=np.asarray(img_acc), weight=np.asarray(w_acc),
                 next_sample=2, spp=4)
        resumed = np.asarray(path_int.render(scene, seed=0, spp=4,
                                             checkpoint=ck))
    assert np.allclose(resumed, ref, rtol=1e-6, atol=1e-6)
