"""Golden-image report: render the five reference scenes at matched
configs, compare against the committed reference renders, and write
ours/ref/diff PNGs + metrics to artifacts/golden/.

  python tools/golden_report.py            # CPU, ~10-20 min
  GOLDEN_RES=0.1 GOLDEN_SPP=32 python tools/golden_report.py

Comparison targets: /root/reference/models/*/scene*.png (the fork's own
renders). teapot compares pixel-wise (same input geometry); the hair
scenes use procedural fiber stand-ins (the .mitshair files were never
committed upstream) so their MSE is dominated by geometry mismatch —
reported alongside hair-region tone ratios, which isolate lighting/BSDF
response.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

REF = "/root/reference/models"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "golden")

SCENES = [
    # name, scene xml, reference png, res_scale, spp, depth, quality
    ("teapot", "teapot/scene.xml", "teapot/scene.png", 0.1, 64, 8, 1.0),
    ("straight_kkay", "straight-hair/scene_kkay.xml",
     "straight-hair/scene_kkay.png", 0.125, 16, 8, 0.6),
    ("straight_marschner", "straight-hair/scene_marschner.xml",
     "straight-hair/scene_marschner.png", 0.125, 16, 8, 0.6),
    ("hair_curl", "hair-curl/scene.xml", "hair-curl/scene.png",
     0.1, 16, 8, 0.4),
    ("curly", "curly-hair/scene.xml", "curly-hair/TungstenRender.png",
     0.125, 16, 8, 0.3),
    ("furball", "furball/scene.xml", "furball/TungstenRender.png",
     0.125, 16, 8, 0.3),
]


def downsample(img, h, w):
    H, W = img.shape[:2]
    fy, fx = max(H // h, 1), max(W // w, 1)
    return img[:h * fy, :w * fx].reshape(h, fy, w, fx, 3).mean((1, 3))


def main():
    import jax
    if os.environ.get("GOLDEN_CPU", "1") == "1":
        jax.config.update("jax_platforms", "cpu")
    from hairpt.scene.xml_loader import load_scene
    from hairpt.integrators import path as path_int
    from hairpt.utils import io as io_utils

    os.makedirs(OUT, exist_ok=True)
    rs_mul = float(os.environ.get("GOLDEN_RES", "1.0"))
    metrics = {}
    for name, xml, png, rs, spp, depth, quality in SCENES:
        t0 = time.time()
        try:
            scene = load_scene(f"{REF}/{xml}",
                               {"marschner_faithful": "true"},
                               spp_override=spp, res_scale=rs * rs_mul,
                               hair_quality=quality,
                               max_depth_override=depth)
            img = np.asarray(path_int.render(scene))
            tm = io_utils.tonemap_srgb(img, scene.film.gamma)
        except Exception as e:  # keep the report going
            print(f"[golden] {name} FAILED: {e}", flush=True)
            metrics[name] = {"error": str(e)}
            continue
        ref = downsample(io_utils.read_png(f"{REF}/{png}"), *tm.shape[:2])
        d = np.abs(tm - ref)
        mse = float((d ** 2).mean())
        mae = float(d.mean())
        lum_o = tm.mean(-1)
        lum_r = ref.mean(-1)
        mask = (lum_o > 0.08) & (lum_r > 0.08)
        tone = (tm[mask].mean(0) / np.maximum(ref[mask].mean(0), 1e-6)) \
            if mask.any() else np.zeros(3)
        metrics[name] = {
            "resolution": list(tm.shape[:2]), "spp": spp, "depth": depth,
            "hair_quality": quality,
            "mse": round(mse, 5), "mae": round(mae, 5),
            "tone_ratio_rgb": [round(float(x), 3) for x in tone],
            "seconds": round(time.time() - t0, 1),
            "note": ("pixel-comparable (same input geometry)"
                     if name == "teapot" else
                     "procedural fiber stand-in: MSE dominated by "
                     "geometry mismatch; tone ratio isolates "
                     "lighting/BSDF response"),
        }
        io_utils.write_png(f"{OUT}/{name}_ours.png", tm)
        io_utils.write_png(f"{OUT}/{name}_ref.png", ref)
        io_utils.write_png(f"{OUT}/{name}_diff.png",
                           np.clip(d * 4.0, 0, 1))
        print(f"[golden] {name}: mse {mse:.4f} mae {mae:.4f} tone "
              f"{np.round(tone,2)} ({time.time()-t0:.0f}s)", flush=True)
    with open(f"{OUT}/metrics.json", "w") as f:
        json.dump(metrics, f, indent=1)
    print(f"[golden] wrote {OUT}/metrics.json", flush=True)


if __name__ == "__main__":
    sys.exit(main())
