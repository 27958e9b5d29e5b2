"""Multi-chip / multi-host scaling via jax.sharding.Mesh + shard_map.

TPU-native replacement for the reference's entire distribution stack
(src/libcore/sched.cpp LocalWorker pool, sched_remote.cpp RemoteWorker +
StreamBackend TCP/SSH wire protocol): the image-space data parallelism
("blocks across cores/machines", SURVEY §2.4 P1/P2) becomes a pixel
wavefront sharded over a device mesh axis; scene geometry/material tables
are replicated; the film accumulator is combined with one `psum` per wave —
XLA compiles the collectives onto ICI/DCN, no hand-written protocol.

Multi-host: call `jax.distributed.initialize()` before building the mesh;
the same code then spans all hosts' devices.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..film import film as film_mod
from ..integrators import path as path_int
from ..integrators import inverse as inverse_mod
from ..scene.scene import Scene


def default_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("tiles",))


def multihost_mesh(n_hosts: int, chips_per_host: int,
                   devices=None) -> Mesh:
    """2-D (hosts × chips) mesh: pixels shard over BOTH axes, so the film
    reduction becomes a hierarchical psum — XLA rides ICI within a host
    and DCN across hosts (the TPU-native replacement for the reference's
    node tree of RemoteWorkers, sched_remote.cpp). Under
    jax.distributed the device array is globally ordered host-major, so
    rows of the mesh align with physical hosts."""
    devs = list(devices) if devices is not None else jax.devices()
    need = n_hosts * chips_per_host
    if len(devs) < need:
        raise RuntimeError(f"need {need} devices, have {len(devs)}")
    return Mesh(np.array(devs[:need]).reshape(n_hosts, chips_per_host),
                ("hosts", "chips"))


def _padded_pixels(n_pix: int, n_dev: int):
    pad = (-n_pix) % n_dev
    return n_pix + pad


def make_sharded_wave(scene: Scene, mesh: Mesh, differentiable: bool = False):
    """Returns wave(sample_id, image, weight) -> (image, weight) with pixels
    sharded over the mesh's 'tiles' axis and films psum-reduced."""
    cfg = scene.config
    n_pix = cfg.width * cfg.height
    n_dev = mesh.devices.size
    n_padded = _padded_pixels(n_pix, n_dev)
    li = path_int.make_li_fn(scene, differentiable=differentiable)
    fl = scene.film
    arr_specs = jax.tree.map(lambda _: P(), scene.arrays)
    axes = tuple(mesh.axis_names)   # 1-D ("tiles",) or 2-D (hosts, chips)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(arr_specs, P(axes), P(axes)),
             out_specs=(P(), P()), check_vma=False)
    def wave_shard(arr, pixel_idx, sample_idx):
        radiance, pos, _ = li(arr, pixel_idx, sample_idx)
        radiance = jnp.nan_to_num(radiance, nan=0.0, posinf=0.0, neginf=0.0)
        # padded lanes carry pixel_idx == 0xffffffff → zero weight
        valid = pixel_idx != jnp.uint32(0xFFFFFFFF)
        radiance = jnp.where(valid[..., None], radiance, 0.0)
        pos = jnp.where(valid[..., None], pos, -1e6)
        image, weight = film_mod.zeros(fl)
        image, weight = film_mod.splat_samples(fl, pos, radiance, image,
                                               weight)
        image = jax.lax.psum(image, axes)
        weight = jax.lax.psum(weight, axes)
        return image, weight

    def wave(sample_id, image, weight):
        pixel_idx = jnp.concatenate([
            jnp.arange(n_pix, dtype=jnp.uint32),
            jnp.full((n_padded - n_pix,), 0xFFFFFFFF, jnp.uint32)])
        sample_idx = jnp.full((n_padded,), sample_id, jnp.uint32)
        img_w, wt_w = wave_shard(scene.arrays, pixel_idx, sample_idx)
        return image + img_w, weight + wt_w

    return jax.jit(wave), n_padded


def render_sharded(scene: Scene, mesh: Mesh | None = None, spp=None, seed=0):
    """Full-frame render with the pixel wavefront sharded across devices."""
    mesh = mesh or default_mesh()
    spp = spp if spp is not None else scene.config.spp
    wave, _ = make_sharded_wave(scene, mesh)
    image, weight = film_mod.zeros(scene.film)
    for s in range(spp):
        image, weight = wave(jnp.uint32(s + seed * 65536), image, weight)
    return film_mod.develop(image, weight)


def make_train_step(scene: Scene, mesh: Mesh, target, spp: int = 1,
                    lr: float = 0.05):
    """Sharded inverse-rendering step: renders with pixels sharded over the
    mesh, computes the image loss, backpropagates to material parameters
    (σ_a, β_R, diffuse), all-reduces the gradients (inside shard_map's
    autodiff of psum) and applies SGD. This is the 'full training step' the
    multichip dryrun compiles."""
    cfg = scene.config
    n_pix = cfg.width * cfg.height
    n_dev = mesh.devices.size
    n_padded = _padded_pixels(n_pix, n_dev)
    fl = scene.film

    li = path_int.make_li_fn(scene, differentiable=True)
    arr_specs = jax.tree.map(lambda _: P(), scene.arrays)
    axes = tuple(mesh.axis_names)

    def loss(params, seed):
        arrays = inverse_mod.apply_params(scene, params)

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(arr_specs, P(axes), P(axes)),
                 out_specs=(P(), P()), check_vma=False)
        def wave_shard(arr, pixel_idx, sample_idx):
            radiance, pos, _ = li(arr, pixel_idx, sample_idx)
            valid = pixel_idx != jnp.uint32(0xFFFFFFFF)
            radiance = jnp.where(valid[..., None], radiance, 0.0)
            pos = jnp.where(valid[..., None], pos, -1e6)
            image, weight = film_mod.zeros(fl)
            image, weight = film_mod.splat_samples(fl, pos, radiance, image,
                                                   weight)
            return jax.lax.psum(image, axes), jax.lax.psum(weight, axes)

        image, weight = film_mod.zeros(fl)
        for s in range(spp):
            pixel_idx = jnp.concatenate([
                jnp.arange(n_pix, dtype=jnp.uint32),
                jnp.full((n_padded - n_pix,), 0xFFFFFFFF, jnp.uint32)])
            sample_idx = jnp.full((n_padded,), seed * 131 + s, jnp.uint32)
            iw = wave_shard(arrays, pixel_idx, sample_idx)
            image = image + iw[0]
            weight = weight + iw[1]
        img = film_mod.develop(image, weight)
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def train_step(params, seed):
        l, g = jax.value_and_grad(loss)(params, seed)
        params = jax.tree.map(lambda x, u: x - lr * u, params, g)
        return params, l

    return train_step
