"""Headless renderer CLI — counterpart of the `mitsuba` executable
(reference: src/mitsuba/mitsuba.cpp).

    python -m hairpt.cli render scene.xml -o out.png [-D key=value]
        [--spp N] [--res-scale S] [--hair-quality Q] [--depth D]

Outputs PNG (gamma per the scene's ldrfilm), plus .npy and .pfm of linear
radiance (covering the fork's mfilm .npy capability, src/films/mfilm.cpp:347).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def _read_any(path):
    from .utils import io as io_utils
    p = path.lower()
    if p.endswith(".npy"):
        return np.load(path).astype(np.float32)
    if p.endswith(".pfm"):
        return io_utils.read_pfm(path)
    if p.endswith(".hdr"):
        return io_utils.read_hdr(path)
    if p.endswith(".exr"):
        from .utils import exr as exr_utils
        return exr_utils.read_exr(path)[..., :3]
    raise ValueError(f"unsupported input format: {path}")


def _write_any(path, img):
    from .utils import io as io_utils
    p = path.lower()
    if p.endswith(".npy"):
        np.save(path, img)
    elif p.endswith(".pfm"):
        io_utils.write_pfm(path, img)
    elif p.endswith(".exr"):
        from .utils import exr as exr_utils
        exr_utils.write_exr(path, img)
    else:
        io_utils.write_png(path, img)


def _util_main(args):
    """mtsutil-parity image tools: tonemap (HDR→gamma PNG), addimages
    (weighted blend), joinrgb (three single-channel images → RGB)."""
    from .utils import io as io_utils
    imgs = [_read_any(p) for p in args.inputs]
    if args.tool == "tonemap":
        out = io_utils.tonemap_srgb(imgs[0], args.gamma)
        io_utils.write_png(args.output, out)
    elif args.tool == "addimages":
        w = [float(x) for x in args.weights.split(",")] \
            if args.weights else [1.0] * len(imgs)
        out = sum(wi * im for wi, im in zip(w, imgs))
        _write_any(args.output, np.asarray(out, np.float32))
    elif args.tool == "resample":
        # Bitmap::resample parity (bitmap.h:1066): filtered rescale with
        # any reconstruction filter + boundary mode, MXU matmul form
        from .utils.resample import resample
        w, h = (int(x) for x in args.size.split("x"))
        out = resample(imgs[0], w, h, filter_name=args.filter,
                       boundary=args.boundary,
                       clamp="auto" if args.clamp else None)
        _write_any(args.output, np.asarray(out, np.float32))
    else:  # joinrgb
        assert len(imgs) == 3, "joinrgb needs R, G, B inputs"
        chans = [im if im.ndim == 2 else im[..., 0] for im in imgs]
        _write_any(args.output, np.stack(chans, -1).astype(np.float32))
    print(f"[hairpt] wrote {args.output}", file=sys.stderr)
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="hairpt")
    sub = ap.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("render")
    r.add_argument("scene")
    r.add_argument("-o", "--output", default=None)
    r.add_argument("-D", "--define", action="append", default=[])
    r.add_argument("--spp", type=int, default=None)
    r.add_argument("--res-scale", type=float, default=1.0)
    r.add_argument("--hair-quality", type=float, default=1.0)
    r.add_argument("--depth", type=int, default=None)
    r.add_argument("--seed", type=int, default=0)
    r.add_argument("--stats", action="store_true",
                   help="print the render-statistics table at exit "
                        "(Statistics::printStats parity)")
    r.add_argument("-v", "--verbose", action="count", default=0,
                   help="-v debug, -vv trace (mitsuba -v parity)")
    r.add_argument("-q", "--quiet", action="store_true",
                   help="warnings and errors only")
    r.add_argument("-l", "--log", default=None,
                   help="also append the log to this file")
    r.add_argument("-w", "--warn-error", action="store_true",
                   help="treat warnings as errors (mitsuba -w)")
    r.add_argument("--cpu", action="store_true",
                   help="force the CPU backend")
    r.add_argument("-r", "--refresh", type=float, default=0.0,
                   help="write the partial image every N seconds "
                        "(mitsuba -r parity)")
    r.add_argument("--checkpoint", default=None,
                   help="npz film checkpoint: saved per wave, resumed if "
                        "present (exact accumulator resume)")
    r.add_argument("-x", "--skip-existing", action="store_true",
                   help="skip the render if the output exists "
                        "(mitsuba -x)")
    r.add_argument("--progress", action="store_true",
                   help="per-wave progress + ETA (ProgressReporter)")
    r.add_argument("--profile", default=None,
                   help="write a jax.profiler trace to this directory")
    r.add_argument("--bands", type=int, default=0,
                   help="out-of-core: render N-row bands streamed to the "
                        "output EXR (tiledhdrfilm parity; path only)")
    r.add_argument("--spectral", type=int, default=0, metavar="N",
                   help="render with N spectral bins (multiple of 3) "
                        "instead of RGB (SPECTRUM_SAMPLES>3 parity)")
    r.add_argument("--dispersion", type=float, default=0.0,
                   help="Cauchy B coefficient (um^2) for dielectric "
                        "dispersion in --spectral mode (e.g. 0.0042=BK7)")
    r.add_argument("--integrator", default=None,
                   help="override: path | direct | ao | field:<name> "
                        "(field names: distance, position, geoNormal, "
                        "shNormal, uv, albedo, primIndex)")
    # utility subcommands (reference: mtsutil plugins src/utils/{tonemap,
    # addimages,joinrgb}.cpp)
    u = sub.add_parser("util")
    u.add_argument("tool", choices=["tonemap", "addimages", "joinrgb",
                                    "resample"])
    u.add_argument("inputs", nargs="+",
                   help="input images (.npy/.pfm/.exr/.hdr)")
    u.add_argument("-o", "--output", required=True)
    u.add_argument("--gamma", type=float, default=2.2)
    u.add_argument("--weights", default=None,
                   help="comma-separated blend weights (addimages)")
    u.add_argument("--size", default="256x256",
                   help="WxH output size (resample)")
    u.add_argument("--filter", default="lanczos",
                   choices=["box", "tent", "gaussian", "mitchell",
                            "catmullrom", "lanczos"])
    u.add_argument("--boundary", default="clamp",
                   choices=["clamp", "wrap", "mirror", "zero"])
    u.add_argument("--clamp", action="store_true",
                   help="clamp output to source range (anti-ringing)")

    # converter subcommand (reference: mtsimport, src/converter/collada.cpp
    # — COLLADA → mesh files + scene XML)
    imp = sub.add_parser("import")
    imp.add_argument("dae", help="input COLLADA .dae file")
    imp.add_argument("output", help="output scene .xml path")
    imp.add_argument("--obj-dir", default=None,
                     help="directory for the extracted OBJ meshes "
                          "(default: next to the XML)")

    args = ap.parse_args(argv)
    if args.cmd == "util":
        return _util_main(args)
    if args.cmd == "import":
        from .scene.collada import convert
        out = convert(args.dae, args.output, obj_dir=args.obj_dir)
        print(f"wrote {out}")
        return 0

    from .utils import log as log_mod
    logger = log_mod.setup(verbosity=args.verbose, quiet=args.quiet,
                           logfile=args.log,
                           warnings_as_errors=args.warn_error)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from .scene.xml_loader import load_scene
    from .integrators import path as path_int
    from .utils import io as io_utils

    defines = dict(d.split("=", 1) for d in args.define)
    t0 = time.time()
    scene = load_scene(args.scene, defines, spp_override=args.spp,
                       res_scale=args.res_scale,
                       hair_quality=args.hair_quality,
                       max_depth_override=args.depth)
    t1 = time.time()
    logger.info("scene built in %.2fs (%dx%d @ %dspp, depth %d)",
                t1 - t0, scene.config.width, scene.config.height,
                scene.config.spp, scene.config.max_depth)

    from .models.bsdf import registry as _mat
    if _mat.DIPOLE in scene.active_kinds:
        from .integrators.sss import attach_dipole
        scene = attach_dipole(scene)
        logger.info("dipole irradiance prepass done")

    # no CLI override → the scene XML's integrator type (mitsuba parity)
    integ = args.integrator or scene.config.integrator or "path"
    integ = {"volpath_simple": "volpath", "photonmapper": "ppm"}.get(integ,
                                                                     integ)
    if args.spectral:
        from .integrators.spectral import render_spectral
        img = np.asarray(render_spectral(scene, n_bins=args.spectral,
                                         spp=scene.config.spp,
                                         seed=args.seed,
                                         cauchy_b=args.dispersion))
    elif integ == "ao":
        from .integrators import aux_integrators as aux
        img = np.asarray(aux.render_ao(scene, spp=scene.config.spp))
    elif integ == "direct":
        from .integrators import aux_integrators as aux
        img = np.asarray(aux.render_direct(scene, seed=args.seed))
    elif integ == "irrcache":
        from .integrators import irrcache as ic_int
        img = np.asarray(ic_int.render_irrcache(scene,
                                                spp=scene.config.spp,
                                                seed=args.seed))
    elif integ == "erpt":
        from .integrators import erpt as erpt_int
        img = np.asarray(erpt_int.render_erpt(scene, seed=args.seed))
    elif integ == "ptracer":
        from .integrators import ptracer as pt_int
        img = np.asarray(pt_int.render_ptracer(scene, seed=args.seed))
    elif integ == "pssmlt":
        from .integrators import pssmlt as pssmlt_int
        img = np.asarray(pssmlt_int.render_pssmlt(scene, seed=args.seed))
    elif integ == "mlt":
        from .integrators import mlt as mlt_int
        img = np.asarray(mlt_int.render_mlt(scene, seed=args.seed))
    elif integ == "bdpt":
        from .integrators import bdpt as bdpt_int
        img = np.asarray(bdpt_int.render_bdpt(scene, spp=scene.config.spp,
                                              seed=args.seed))
    elif integ == "vpl":
        from .integrators import vpl as vpl_int
        img = np.asarray(vpl_int.render_vpl(scene, spp=scene.config.spp,
                                            seed=args.seed))
    elif integ == "volpath":
        from .integrators import volpath as vp
        img = np.asarray(vp.render_volpath(scene, spp=scene.config.spp,
                                           seed=args.seed))
    elif integ == "ppm":
        from .integrators import photonmap as pm_int
        if scene.medium is not None:
            # media present → volumetric photon mapping with the beam
            # radiance estimate (reference: photonmapper/bre.cpp)
            img = np.asarray(pm_int.render_volumetric_photonmap(
                scene, seed=args.seed))
        else:
            img = np.asarray(pm_int.render_ppm(scene, seed=args.seed))
    elif integ == "sppm":
        from .integrators import photonmap as pm_int
        img = np.asarray(pm_int.render_sppm(scene, seed=args.seed))
    elif integ == "motion":
        from .integrators import motion as motion_int
        img = np.asarray(motion_int.render_motion(scene))
    elif integ == "adaptive":
        from .integrators import aux_integrators as aux
        img = np.asarray(aux.render_adaptive(scene, seed=args.seed))
    elif integ == "multichannel":
        from .integrators import aux_integrators as aux
        chans = aux.render_multichannel(scene, spp=scene.config.spp,
                                        seed=args.seed)
        out = args.output or "output.png"
        base_m = out.rsplit(".", 1)[0]
        for name, im in chans.items():
            if name != "radiance":
                io_utils.write_npy(f"{base_m}.{name}.npy",
                                   np.asarray(im))
        img = np.asarray(chans["radiance"])
    elif integ.startswith("field"):
        from .integrators import aux_integrators as aux
        name = integ.split(":", 1)[1] if ":" in integ else "shNormal"
        img = np.asarray(aux.render_field(scene, name))
    elif args.bands > 0 or scene.config.tiled_film:
        # out-of-core banded path render streamed straight to EXR
        from .film.tiled import render_tiled_exr
        out = args.output or "output.exr"
        base = out.rsplit(".", 1)[0]
        render_tiled_exr(scene, base + ".exr",
                         band_rows=args.bands or 64, seed=args.seed)
        logger.info("streamed %s.exr (%dx%d)", base,
                    scene.config.width, scene.config.height)
        return
    else:
        out_path = args.output or "output.png"
        if args.skip_existing and os.path.exists(out_path):
            logger.info("output %s exists, skipping (-x)", out_path)
            return

        def _progress(done, total, elapsed):
            eta = elapsed / max(done, 1) * (total - done)
            logger.info("wave %d/%d (%.1fs elapsed, ETA %.1fs)",
                        done, total, elapsed, eta)

        def _flush(partial):
            base_p = out_path.rsplit(".", 1)[0]
            io_utils.write_png(base_p + ".partial.png",
                               io_utils.tonemap_srgb(np.asarray(partial),
                                                     scene.film.gamma))
            logger.info("flushed partial image (-r)")

        kw = dict(seed=args.seed,
                  progress=_progress if args.progress else None,
                  flush_every=args.refresh,
                  flush_cb=_flush if args.refresh > 0 else None,
                  checkpoint=args.checkpoint)
        if args.profile:
            import jax.profiler
            with jax.profiler.trace(args.profile):
                img = np.asarray(path_int.render(scene, **kw))
        else:
            img = np.asarray(path_int.render(scene, **kw))
    t2 = time.time()
    n_rays_lb = scene.config.width * scene.config.height * scene.config.spp
    logger.info("rendered in %.2fs (≥%.2f Mprimary-rays/s)", t2 - t1,
                n_rays_lb / max(t2 - t1, 1e-9) / 1e6)
    if getattr(args, "stats", False):
        # counter report at exit (reference: Statistics::printStats,
        # mitsuba.cpp:408)
        from .utils import stats as stats_mod
        stats_mod.print_stats()

    out = args.output or "output.png"
    base = out.rsplit(".", 1)[0]
    from .utils import exr as exr_utils
    ext = out.rsplit(".", 1)[-1].lower()

    def _maybe_annotate(ldr):
        fl_ = scene.film
        if not fl_.annotations and not fl_.banner:
            return ldr
        subst = {"scene.renderTime": time.time() - t1,
                 "film.width": scene.config.width,
                 "film.height": scene.config.height,
                 "sampler.sampleCount": scene.config.spp,
                 "integrator.maxDepth": scene.config.max_depth}
        return io_utils.annotate_image(ldr, fl_.annotations, subst,
                                       fl_.banner)
    _tm = io_utils.tonemap_srgb
    io_utils_tonemap = lambda im, g: _maybe_annotate(_tm(im, g))  # noqa: E731
    if ext == "exr":
        exr_utils.write_exr(out, img)
        io_utils.write_png(base + ".png",
                           io_utils_tonemap(img, scene.film.gamma))
    elif ext in ("jpg", "jpeg"):
        io_utils.write_jpg(out, io_utils_tonemap(img, scene.film.gamma))
        exr_utils.write_exr(base + ".exr", img)
    elif ext == "bmp":
        io_utils.write_bmp(out, io_utils_tonemap(img, scene.film.gamma))
        exr_utils.write_exr(base + ".exr", img)
    elif ext == "tga":
        io_utils.write_tga(out, io_utils_tonemap(img, scene.film.gamma))
        exr_utils.write_exr(base + ".exr", img)
    else:
        io_utils.write_png(out, io_utils_tonemap(img, scene.film.gamma))
        exr_utils.write_exr(base + ".exr", img)
    io_utils.write_npy(base + ".npy", img)
    io_utils.write_pfm(base + ".pfm", img)
    logger.info("wrote %s.{%s,exr,npy,pfm}", base, ext)


if __name__ == "__main__":
    main()
