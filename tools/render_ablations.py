"""Per-lobe Marschner ablation renders vs the reference's committed
ablation ground truth (VERDICT r4 item 3).

The reference ships R-only/TT-only/TRT-only renders of the straight-hair
scene (/root/reference/models/straight-hair/results/
scene_marschner_diffuse_{8_R,9_TT,10_TRT}_only.png + the full
scene_marschner_diffuse.png) — the strongest BSDF-level ground truth
that does not depend on the never-committed .mitshair geometry.

hairpt's ablation needs no code knob: the Marschner eval is LINEAR in
the azimuthal tables (hair.py _azimuthal_eval_lanes), so zeroing the
other two lobes' table planes and rebuilding the sampling tables gives
the exact per-lobe integrand; sampling re-importance-samples the
surviving lobe.

Renders the 4 variants on the same stand-in geometry/camera as the
reference XML, then compares (a) the per-lobe tone ratio
mean(lobe)/mean(full) over the hair region and (b) the vertical
highlight-band centroid, against the same statistics of the reference
PNGs. Geometry differences largely cancel in these *relative* measures.

Writes artifacts/golden/ablations/{full,r,tt,trt}.png + metrics.json.
Usage: python tools/render_ablations.py [--res-scale 0.25 --spp 16]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

REF_DIR = "/root/reference/models/straight-hair"
OUT = os.path.join(REPO, "artifacts", "golden", "ablations")


def mask_tables(ht, lobe):
    """Zero all azimuthal-table lobes except `lobe` (0=R, 1=TT, 2=TRT;
    None = full) and rebuild the sampling tables."""
    import jax.numpy as jnp
    from hairpt.models.bsdf import hair as hair_bsdf
    if lobe is None:
        return ht
    mask = jnp.zeros((1, 3, 1, 1, 1), jnp.float32).at[0, lobe].set(1.0)
    vals = ht.values * mask
    ws, lws = [], []
    for k in range(vals.shape[0]):
        w, lw = hair_bsdf.azimuthal_sampling_tables(vals[k])
        ws.append(w), lws.append(lw)
    return ht._replace(values=vals, weights=jnp.stack(ws),
                       lobe_weight=jnp.stack(lws),
                       values_quad=hair_bsdf.quad_pack(vals))


def hair_stats(disp, sky_quantile=0.8):
    """(mean DISPLAY-domain luminance over the hair region, vertical
    band centroid in [0,1]). disp is a gamma-encoded 0..1 image (the
    reference artifacts are LDR PNGs with a clipped sky, so both sides
    are compared in the same display domain). Hair region = pixels
    darker than the sky."""
    lum = disp @ np.array([0.212671, 0.715160, 0.072169])
    thresh = np.quantile(lum, sky_quantile)
    hair = lum < thresh
    m = float(lum[hair].mean()) if hair.any() else 0.0
    rows = np.where(hair, lum, 0.0).sum(axis=1)
    tot = rows.sum()
    cent = float((rows * np.arange(len(rows))).sum() / tot
                 / max(len(rows) - 1, 1)) if tot > 0 else 0.5
    return m, cent


def to_display(linear_img):
    """Linear radiance → the reference ldrfilm's display encoding
    (gamma 2.2, clipped to [0, 1] — scene_marschner.xml ldrfilm)."""
    return np.clip(np.asarray(linear_img, np.float64),
                   0.0, 1.0) ** (1.0 / 2.2)


def load_ref_png(name):
    from hairpt.utils import io as io_utils
    # read_png returns 0..1 display-domain floats
    return io_utils.read_png(os.path.join(REF_DIR, "results",
                                          name))[..., :3]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res-scale", type=float, default=0.25)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--hair-quality", type=float, default=0.4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--recompute", action="store_true",
                    help="recompute metrics from the saved .npy renders")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    import dataclasses
    import jax.numpy as jnp
    from hairpt.scene.xml_loader import load_scene
    from hairpt.integrators import path as path_int
    from hairpt.utils import io as io_utils

    os.makedirs(OUT, exist_ok=True)
    scene = None
    if not args.recompute:
        t0 = time.time()
        scene = load_scene(os.path.join(REF_DIR, "scene_marschner.xml"),
                           res_scale=args.res_scale,
                           hair_quality=args.hair_quality)
        scene = scene._replace(config=dataclasses.replace(
            scene.config, max_depth=args.depth, spp=args.spp))
        print(f"[ablate] scene built in {time.time()-t0:.0f}s "
              f"({scene.config.width}x{scene.config.height})", flush=True)

    variants = {"full": None, "r": 0, "tt": 1, "trt": 2}
    ours = {}
    for name, lobe in variants.items():
        npy_path = os.path.join(OUT, f"{name}.npy")
        if args.recompute and os.path.exists(npy_path):
            img = np.load(npy_path)
        else:
            ht = mask_tables(scene.arrays.hair_tables, lobe)
            sc = scene._replace(
                arrays=scene.arrays._replace(hair_tables=ht))
            t0 = time.time()
            img = np.asarray(path_int.render(sc, spp=args.spp))
            print(f"[ablate] {name}: rendered in {time.time()-t0:.0f}s "
                  f"mean {img.mean():.4f}", flush=True)
            io_utils.write_png(os.path.join(OUT, f"{name}.png"),
                               io_utils.tonemap_srgb(img))
            np.save(npy_path, img.astype(np.float32))
        ours[name] = hair_stats(to_display(img))

    ref_names = {"full": "scene_marschner_diffuse.png",
                 "r": "scene_marschner_diffuse_8_R_only.png",
                 "tt": "scene_marschner_diffuse_9_TT_only.png",
                 "trt": "scene_marschner_diffuse_10_TRT_only.png"}
    ref = {k: hair_stats(load_ref_png(v)) for k, v in ref_names.items()}

    metrics = {"config": vars(args)}
    for k in variants:
        ours_ratio = ours[k][0] / max(ours["full"][0], 1e-9)
        ref_ratio = ref[k][0] / max(ref["full"][0], 1e-9)
        metrics[k] = {
            "hair_mean": ours[k][0],
            "band_centroid": ours[k][1],
            "tone_ratio_vs_full": ours_ratio,
            "ref_tone_ratio_vs_full": ref_ratio,
            "ref_band_centroid": ref[k][1],
            "ratio_rel_err": abs(ours_ratio - ref_ratio)
            / max(ref_ratio, 1e-9),
            "band_abs_err": abs(ours[k][1] - ref[k][1]),
        }
    with open(os.path.join(OUT, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics, indent=1))


if __name__ == "__main__":
    main()
