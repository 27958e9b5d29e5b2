"""Full-resolution renders of the five north-star scenes (VERDICT r4
item 7) — the product demo: real configs (full film resolution, the
scenes' own integrator settings), 64 spp, wall-times recorded.

Writes artifacts/fullres/<scene>.png (+ .npy) and a README.md table.
Usage: python tools/render_fullres.py [--spp 64] [--scenes a,b,...]
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

REF = "/root/reference/models"
OUT = os.path.join(REPO, "artifacts", "fullres")

SCENES = {
    "teapot": ("teapot/scene.xml", 1.0),
    "straight_marschner": ("straight-hair/scene_marschner.xml", 1.0),
    "hair_curl": ("hair-curl/scene.xml", 1.0),
    "curly": ("curly-hair/scene.xml", 1.0),
    "furball": ("furball/scene.xml", 1.0),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--scenes", type=str, default=",".join(SCENES))
    ap.add_argument("--hair-quality", type=float, default=1.0)
    ap.add_argument("--depth", type=int, default=None,
                    help="override maxDepth (default: scene value)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hairpt.scene.xml_loader import load_scene
    from hairpt.integrators import path as path_int
    from hairpt.utils import io as io_utils

    os.makedirs(OUT, exist_ok=True)
    rows = []
    for name in args.scenes.split(","):
        xml, q = SCENES[name.strip()]
        t0 = time.time()
        kw = {}
        if args.depth is not None:
            kw["max_depth_override"] = args.depth
        scene = load_scene(os.path.join(REF, xml), {},
                           spp_override=args.spp,
                           hair_quality=args.hair_quality * q, **kw)
        t_build = time.time() - t0
        cfg = scene.config
        print(f"[fullres] {name}: {cfg.width}x{cfg.height}@{args.spp}spp "
              f"depth {cfg.max_depth} (built {t_build:.0f}s)", flush=True)
        t0 = time.time()
        img, stats = path_int.render(scene, return_stats=True)
        img = np.asarray(img)
        t_render = time.time() - t0
        mrays = stats["rays"] / t_render / 1e6
        io_utils.write_png(os.path.join(OUT, f"{name}.png"),
                           io_utils.tonemap_srgb(img, scene.film.gamma))
        np.save(os.path.join(OUT, f"{name}.npy"), img.astype(np.float16))
        rows.append(dict(scene=name, res=f"{cfg.width}x{cfg.height}",
                         spp=args.spp, depth=cfg.max_depth,
                         build_s=round(t_build, 1),
                         render_s=round(t_render, 1),
                         mrays_per_s=round(mrays, 3),
                         mean=float(img.mean())))
        print(f"[fullres] {name}: {t_render:.0f}s render "
              f"({mrays:.2f} Mrays/s, mean {img.mean():.4f})", flush=True)

    # merge with prior runs (a --scenes subset must not drop the rest)
    metrics_path = os.path.join(OUT, "metrics.json")
    merged = {}
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            for r in json.load(f):
                merged[r["scene"]] = r
    for r in rows:
        merged[r["scene"]] = r
    rows = [merged[k] for k in SCENES if k in merged]
    with open(metrics_path, "w") as f:
        json.dump(rows, f, indent=1)
    with open(os.path.join(OUT, "README.md"), "w") as f:
        f.write("# Full-resolution renders (north-star scenes)\n\n"
                "Real configs from the reference XMLs (procedural fiber "
                "stand-ins for the never-committed .mitshair assets), "
                "rendered on one TPU v5e chip.\n\n")
        f.write("| scene | resolution | spp | depth | build (s) | "
                "render (s) | Mrays/s |\n|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['scene']} | {r['res']} | {r['spp']} | "
                    f"{r['depth']} | {r['build_s']} | {r['render_s']} | "
                    f"{r['mrays_per_s']} |\n")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
