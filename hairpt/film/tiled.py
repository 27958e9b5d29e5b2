"""Out-of-core banded rendering → streamed scanline EXR.

Counterpart of the reference's tiledhdrfilm (src/films/tiledhdrfilm.cpp):
there, ImageBlocks are merged into an out-of-core EXR via IlmImf's
TiledOutputFile so a huge film never has to be resident. Here the same
capability is expressed wavefront-style: the image is rendered in
horizontal scanline BANDS — one jitted wave per (band, sample) over just
that band's pixels — and each finished band is compressed and appended to
the EXR through ExrScanlineWriter. Peak film memory is one band (plus a
filter-radius apron), independent of the output resolution.

Correctness at band seams: samples within `apron = ceil(filter_radius)`
rows of a band boundary also contribute to the neighbouring band, so each
band *renders* rows [y0-apron, y1+apron) (deterministic stateless sampler
→ the overlapping rows produce identical samples in both bands) and
*writes* rows [y0, y1). Every written pixel therefore receives exactly the
same filtered contributions as a monolithic render.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from . import film as film_mod
from ..utils.exr import ExrScanlineWriter


def render_tiled_exr(scene, path: str, band_rows: int = 64, seed: int = 0,
                     spp: int | None = None, compression: str = "zip",
                     half: bool = True):
    """Render `scene` band-by-band, streaming scanlines to `path` (EXR).
    Returns nothing — the image goes straight to disk."""
    from ..integrators.path import make_li_fn

    cfg = scene.config
    fl = scene.film
    W, H = cfg.width, cfg.height
    spp = spp if spp is not None else cfg.spp
    apron = int(math.ceil(fl.filter_radius))
    writer = ExrScanlineWriter(path, H, W, 3, half=half,
                               compression=compression)
    # EXR zip blocks span 16 rows — align bands so write_band accepts them
    band_rows = max(writer.lpb, (band_rows // writer.lpb) * writer.lpb)

    li_fn = make_li_fn(scene)
    n_band = band_rows + 2 * apron           # fixed wave shape (one compile)

    @jax.jit
    def band_wave(arr, ya, sample_id, image, weight):
        # pixel rows [ya, ya + n_band) clamped into the image; clamped
        # duplicates land outside the band film and are dropped
        rows = ya + jnp.arange(n_band, dtype=jnp.int32)
        ok = (rows >= 0) & (rows < H)
        rows_c = jnp.clip(rows, 0, H - 1)
        pix = (rows_c[:, None] * W
               + jnp.arange(W, dtype=jnp.int32)[None, :]).reshape(-1)
        pix = pix.astype(jnp.uint32)
        sample_idx = jnp.full(pix.shape, sample_id, jnp.uint32)
        radiance, pos, _ = li_fn(arr, pix, sample_idx)
        radiance = jnp.nan_to_num(radiance, nan=0.0, posinf=0.0, neginf=0.0)
        # shift to band-local y; clamped rows get pushed far off-film
        local = pos.at[:, 1].add(-ya.astype(jnp.float32))
        dead = jnp.broadcast_to(~ok[:, None], (n_band, W)).reshape(-1)
        local = jnp.where(dead[:, None], -1e6, local)
        band_film = fl._replace(height=n_band)
        return film_mod.splat_samples(band_film, local, radiance, image,
                                      weight)

    for y0 in range(0, H, band_rows):
        y1 = min(y0 + band_rows, H)
        ya = y0 - apron
        image = jnp.zeros((n_band, W, 3), jnp.float32)
        weight = jnp.zeros((n_band, W), jnp.float32)
        for s in range(spp):
            image, weight = band_wave(scene.arrays, jnp.int32(ya),
                                      jnp.uint32(s + seed * 65536),
                                      image, weight)
        band = np.asarray(film_mod.develop(image, weight))
        writer.write_band(y0, band[apron:apron + (y1 - y0)])
    writer.close()
