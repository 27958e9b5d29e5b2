"""Golden-image validation against the reference's committed renders
(VERDICT round-1 item 4 / SURVEY §4 tier (c)).

The reference ships per-scene renders (/root/reference/models/*/scene*.png)
plus Tungsten cross-renderer ground truth. Two validation levels:

- teapot: the geometry (OBJ meshes + rectangle) is bit-identical to the
  reference input, so a direct downsampled-pixel MSE applies.
- hair scenes: the `.mitshair` fiber files were never committed upstream
  (SURVEY §2.5), so geometry is a procedural stand-in and pixel equality
  is unattainable; lighting/BSDF response is validated through
  hair-region tone statistics instead. `tools/golden_report.py` renders
  the full set and commits quantitative diffs under artifacts/golden/.
"""
import os

import numpy as np
import pytest

REF = "/root/reference/models"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference models not present")


def downsample(img, h, w):
    H, W = img.shape[:2]
    fy, fx = H // h, W // w
    return img[:h * fy, :w * fx].reshape(h, fy, w, fx, 3).mean((1, 3))


def render(xml, defines=None, spp=64, res_scale=0.05, quality=0.4,
           depth=6):
    from hairpt.scene.xml_loader import load_scene
    from hairpt.integrators import path as path_int
    from hairpt.utils import io as io_utils
    scene = load_scene(xml, defines or {}, spp_override=spp,
                       res_scale=res_scale, hair_quality=quality,
                       max_depth_override=depth)
    img = np.asarray(path_int.render(scene))
    return io_utils.tonemap_srgb(img, scene.film.gamma)


def test_golden_teapot_pixel_mse():
    """Identical input geometry ⇒ the 64×36 render must match the
    reference 1280×720 PNG (box-downsampled) to MSE < 0.012 in
    gamma-encoded [0,1] space (calibrated headroom ~2.4× over the
    measured 0.005; the pre-fix checkerboard bug scored 0.022)."""
    from hairpt.utils import io as io_utils
    tm = render(f"{REF}/teapot/scene.xml", spp=64, res_scale=0.05,
                depth=6)
    ref = downsample(io_utils.read_png(f"{REF}/teapot/scene.png"),
                     *tm.shape[:2])
    mse = float(((tm - ref) ** 2).mean())
    mae = float(np.abs(tm - ref).mean())
    assert np.isfinite(tm).all()
    assert mse < 0.012, (mse, mae)
    # global tone within 5%
    assert abs(tm.mean() - ref.mean()) < 0.05 * ref.mean()


@pytest.mark.parametrize("xml,png", [
    ("straight-hair/scene_kkay.xml", "straight-hair/scene_kkay.png"),
    ("straight-hair/scene_marschner.xml",
     "straight-hair/scene_marschner.png"),
])
def test_golden_straight_hair_tone(xml, png):
    """Procedural fiber stand-in ⇒ validate the hair-region lighting/BSDF
    response: per-channel mean within 2.2× of the reference and the same
    warm hue ordering (R > G > B). Catches sunsky/BSDF-scale breakage
    while tolerating the geometry mismatch."""
    from hairpt.utils import io as io_utils
    tm = render(f"{REF}/{xml}", {"marschner_faithful": "true"}, spp=8,
                res_scale=0.0625, quality=0.4, depth=6)
    ref = downsample(io_utils.read_png(f"{REF}/{png}"), *tm.shape[:2])
    lum_o = tm.mean(-1)
    lum_r = ref.mean(-1)
    mask = (lum_o > 0.08) & (lum_r > 0.08)
    assert mask.mean() > 0.1, "hair regions do not even overlap"
    mo = tm[mask].mean(0)
    mr = ref[mask].mean(0)
    ratio = mo / np.maximum(mr, 1e-6)
    # r3 tightening (VERDICT r2 #5): measured ratios after the Cook
    # radius compensation are [0.86,0.88,0.87] (kkay) and
    # [0.79,0.74,0.70] (marschner) at the report config — gate at
    # [0.62, 1.5] (was [0.45, 2.2]); the residual deficit is the
    # procedural stand-in's coverage (see artifacts/golden/ANALYSIS.md:
    # sky regions match mitsuba's own renders to 0.96-1.00 per channel,
    # exonerating sunsky/film; hair_curl's roughplastic matches
    # mitsuba's own render at 1.01-1.06)
    assert (ratio > 0.62).all() and (ratio < 1.5).all(), (mo, mr)
    assert mo[0] > mo[1] > mo[2], mo     # warm hue ordering, ours
    assert mr[0] > mr[1] > mr[2], mr     # …and the reference's

    # sky region (top rows): OUR sunsky vs MITSUBA's committed render —
    # this is the strong radiometric gate (same renderer, same model);
    # measured 0.96-0.98 per channel
    sky_o = tm[:tm.shape[0] // 8].reshape(-1, 3).mean(0)
    sky_r = ref[:ref.shape[0] // 8].reshape(-1, 3).mean(0)
    sky_ratio = sky_o / np.maximum(sky_r, 1e-6)
    assert (np.abs(sky_ratio - 1.0) < 0.1).all(), (sky_o, sky_r)


def test_golden_hair_curl_roughplastic_tone():
    """hair-curl vs MITSUBA's own committed render (same renderer class
    as ours): roughplastic + sunsky response must match closely — the
    measured report ratios are 1.01-1.06 per channel. Gate at ±25%
    per channel AND near-channel-neutrality (the ratio spread across
    channels < 0.2), the signature that the remaining difference is
    geometric, not spectral."""
    from hairpt.utils import io as io_utils
    tm = render(f"{REF}/hair-curl/scene.xml", spp=8, res_scale=0.05,
                quality=0.4, depth=6)
    ref = downsample(io_utils.read_png(f"{REF}/hair-curl/scene.png"),
                     *tm.shape[:2])
    lum_o = tm.mean(-1)
    lum_r = ref.mean(-1)
    mask = (lum_o > 0.08) & (lum_r > 0.08)
    mo = tm[mask].mean(0)
    mr = ref[mask].mean(0)
    ratio = mo / np.maximum(mr, 1e-6)
    assert (ratio > 0.75).all() and (ratio < 1.35).all(), (mo, mr)
    assert ratio.max() - ratio.min() < 0.2, ratio
    # sky parity vs mitsuba's own render
    sky_o = tm[:tm.shape[0] // 8].reshape(-1, 3).mean(0)
    sky_r = ref[:ref.shape[0] // 8].reshape(-1, 3).mean(0)
    assert (np.abs(sky_o / np.maximum(sky_r, 1e-6) - 1.0) < 0.12).all()


def _erode(m, k):
    for _ in range(k):
        m = m & np.roll(m, 1, 0) & np.roll(m, -1, 0) \
            & np.roll(m, 1, 1) & np.roll(m, -1, 1)
    return m


@pytest.mark.parametrize("xml,png,sky1,erode,lo,hi", [
    # Tungsten cross-renderer ground truth + procedural stand-in
    # geometry. r5 findings (ANALYSIS.md §5): (a) Tungsten's conversion
    # IGNORED the fork's skyScale=5 — rendering furball with skyScale=1
    # drops the blue ratio 1.98 → 1.47; (b) the remaining blue rides
    # the silhouette (partial-coverage pixels mix sky) — a 2-px
    # interior erosion gives [1.16, 1.04, 1.38]. Together the furball
    # envelope tightens [0.8, 2.15] → [0.8, 1.45] (r4 VERDICT item 4).
    # Curly's stand-in densified 0.3 → 1.0 (ratios 0.77/0.60/0.80 →
    # 0.86/0.66/0.86); its green deficit is Tungsten's rough_plastic
    # interior-absorption difference (ANALYSIS.md §2: our roughplastic
    # matches mitsuba's own render 1.01-1.06 channel-neutral).
    ("furball/scene.xml", "furball/TungstenRender.png", True, 2,
     0.80, 1.45),
    ("curly-hair/scene.xml", "curly-hair/TungstenRender.png", False, 0,
     0.55, 1.1),
])
def test_golden_tungsten_hair_tone_envelope(xml, png, sky1, erode, lo,
                                            hi):
    """Regression envelope for the Tungsten-compared hair scenes: the
    per-channel hair-region tone ratio must stay inside the measured r5
    window — catches radiometry regressions while acknowledging the
    (now-diagnosed) cross-renderer floor (ANALYSIS.md §5)."""
    import tempfile
    from hairpt.utils import io as io_utils
    src = f"{REF}/{xml}"
    if sky1:
        with open(src) as f:
            txt = f.read()
        # keep the scene-dir basename: the fiber stand-in generator is
        # keyed on it (xml_loader._standin_fibers)
        td = os.path.join(tempfile.mkdtemp(), os.path.dirname(xml))
        os.makedirs(td, exist_ok=True)
        src = os.path.join(td, "scene.xml")
        with open(src, "w") as f:
            f.write(txt.replace('<float name="skyScale" value="5"/>',
                                '<float name="skyScale" value="1"/>'))
    tm = render(src, spp=8, res_scale=0.0625, quality=1.0, depth=6)
    ref = downsample(io_utils.read_png(f"{REF}/{png}"), *tm.shape[:2])
    lum_o = tm.mean(-1)
    lum_r = ref.mean(-1)
    mask = _erode((lum_o > 0.08) & (lum_r > 0.08), erode)
    assert mask.sum() > 200
    mo = tm[mask].mean(0)
    mr = ref[mask].mean(0)
    ratio = mo / np.maximum(mr, 1e-6)
    assert (ratio > lo).all() and (ratio < hi).all(), (ratio, mo, mr)
    # the residual difference must keep the documented Tungsten
    # signature — not an arbitrary channel skew
    assert ratio.max() - ratio.min() < 0.45, ratio
