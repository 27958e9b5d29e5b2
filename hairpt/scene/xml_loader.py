"""Mitsuba scene-XML loader.

Parses the subset of the Mitsuba 0.5/0.6 scene format used by the reference
scenes (reference: src/librender/scenehandler.cpp — SAX + XSD there, plain
ElementTree here since scenes are small) and assembles a Scene via
SceneBuilder. Supports $key substitution from CLI defines like `mitsuba -D`.

Missing geometry assets (the reference repo commits neither the .mitshair
fiber files nor the teapot OBJs) resolve to procedural stand-ins keyed by
the scene directory name.
"""
from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import numpy as np

from ..film.film import Film
from ..models import emitters as em
from ..models import shapes as shp
from ..models.bsdf import registry as mat
from ..models.sensors import Camera
from ..utils import io as io_utils
from . import hairgen
from .scene import SceneBuilder, Scene

BSDF_KINDS = {
    "diffuse": mat.DIFFUSE,
    "roughdiffuse": mat.ROUGHDIFFUSE,
    "conductor": mat.CONDUCTOR,
    "mirror": mat.CONDUCTOR,
    "roughconductor": mat.ROUGHCONDUCTOR,
    "dielectric": mat.DIELECTRIC,
    "thindielectric": mat.THINDIELECTRIC,
    "plastic": mat.PLASTIC,
    "roughplastic": mat.ROUGHPLASTIC,
    "roughdielectric": mat.ROUGHDIELECTRIC,
    "difftrans": mat.DIFFTRANS,
    "mixturebsdf": mat.MIXTURE,
    "blendbsdf": mat.MIXTURE,
    "phong": mat.PHONG,
    "ward": mat.WARD,
    "null": mat.NULL,
    "kajiyakay": mat.KAJIYAKAY,
    # "marschner" = the fork's MarschnerDiffuse build; corrected mode is
    # the default here, faithful quirks behind <boolean name="faithful">
    "marschner": mat.MARSCHNER_PURE,
    # alias used by some fork scene files (hair_curl_diffuse.xml names
    # the class, not the SConscript plugin name)
    "marschner_diffuse": mat.MARSCHNER_PURE,
    "marschnerdielectric": mat.MARSCHNERDIELECTRIC,
    "hk": mat.HK,
    "irawan": mat.CLOTH,
    "mask": mat.MASK,
    "coating": mat.COATING,
    "roughcoating": mat.ROUGHCOATING,
}

# named IOR lookups used by the reference (src/bsdfs/ior.h data subset)
IOR_NAMES = {"air": 1.000277, "water": 1.3330, "bk7": 1.5046,
             "benzene": 1.501, "diamond": 2.419, "glass": 1.5046,
             "polypropylene": 1.49}


def _parse_rgb(s: str):
    parts = [float(x) for x in re.split(r"[,\s]+", s.strip()) if x]
    if len(parts) == 1:
        parts = parts * 3
    return tuple(parts[:3])


def _subst(s: str, defines: dict) -> str:
    for k, v in defines.items():
        s = s.replace(f"${k}", str(v))
    return s


def _collect_props(node, defines):
    """Collect typed children (<float>, <rgb>, ...) into a dict."""
    props = {}
    for ch in node:
        name = ch.get("name")
        if ch.tag == "float":
            props[name] = float(_subst(ch.get("value"), defines))
        elif ch.tag == "integer":
            props[name] = int(float(_subst(ch.get("value"), defines)))
        elif ch.tag == "boolean":
            props[name] = _subst(ch.get("value"), defines).lower() == "true"
        elif ch.tag == "string":
            props[name] = _subst(ch.get("value"), defines)
        elif ch.tag in ("rgb", "spectrum", "srgb"):
            val = _subst(ch.get("value"), defines)
            if ch.tag == "spectrum" and ":" in val:
                # 'λ1:v1 λ2:v2 …' — InterpolatedSpectrum integrated to
                # RGB via the CIE CMFs (scenehandler.cpp spectrum tag +
                # spectrum.cpp InterpolatedSpectrum/toLinearRGB)
                from ..core.spectrum import InterpolatedSpectrum
                props[name] = tuple(
                    InterpolatedSpectrum.from_string(val).to_rgb())
            else:
                props[name] = _parse_rgb(val)
        elif ch.tag == "blackbody":
            # <blackbody name="radiance" temperature="5000" [scale=..]/>
            # — exact Planck integrated against the CIE CMFs
            # (spectrum.cpp:1528 BlackBodySpectrum)
            from ..core.spectrum import blackbody_rgb_exact
            temp = float(_subst(ch.get("temperature"), defines))
            sc = float(_subst(ch.get("scale", "1.0"), defines))
            props[name] = tuple(blackbody_rgb_exact(temp, scale=sc))
        elif ch.tag == "vector":
            props[name] = (float(ch.get("x", 0)), float(ch.get("y", 0)),
                           float(ch.get("z", 0)))
        elif ch.tag == "point":
            props[name] = (float(ch.get("x", 0)), float(ch.get("y", 0)),
                           float(ch.get("z", 0)))
    return props


def _parse_animation(node):
    """<animation name="toWorld"> with <transform time="t"> keyframes →
    AnimatedTransform (reference: AnimatedTransform XML syntax,
    src/librender/scenehandler.cpp 'animation' tag + core/track.h)."""
    if node is None:
        return None
    keys = [(float(tr.get("time", 0.0)), _parse_transform(tr))
            for tr in node.findall("transform")]
    if not keys:
        return None
    from ..core.track import AnimatedTransform
    return AnimatedTransform(keys)


def _parse_transform(node) -> np.ndarray:
    """Compose <matrix>/<translate>/<rotate>/<scale>/<lookat> children
    (applied in document order, like the reference's Transform stack)."""
    m = np.eye(4)
    for ch in node:
        if ch.tag == "matrix":
            vals = [float(x) for x in ch.get("value").split()]
            t = np.array(vals, np.float64).reshape(4, 4)
        elif ch.tag == "translate":
            t = np.eye(4)
            t[:3, 3] = [float(ch.get(a, 0)) for a in "xyz"]
        elif ch.tag == "scale":
            t = np.eye(4)
            if ch.get("value") is not None:
                s = float(ch.get("value"))
                sv = [s, s, s]
            else:
                sv = [float(ch.get(a, 1)) for a in "xyz"]
            t[0, 0], t[1, 1], t[2, 2] = sv
        elif ch.tag == "rotate":
            ax = np.array([float(ch.get(a, 0)) for a in "xyz"])
            ax = ax / np.linalg.norm(ax)
            ang = np.radians(float(ch.get("angle", 0)))
            K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]],
                          [-ax[1], ax[0], 0]])
            R = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K
            t = np.eye(4)
            t[:3, :3] = R
        elif ch.tag == "lookat":
            from ..core.math import matrix_lookat
            origin = _parse_rgb(ch.get("origin"))
            target = _parse_rgb(ch.get("target"))
            up = _parse_rgb(ch.get("up", "0, 1, 0"))
            t = matrix_lookat(origin, target, up)
        else:
            continue
        m = t @ m
    return m


def _material_row_from_bsdf(node, defines, builder: SceneBuilder,
                            scene_dir: str = ""):
    """Translate a <bsdf> element (possibly twosided-wrapped) into a
    material row + optional checkerboard texture."""
    twosided = False
    nrm = None  # (kind 0=normalmap 1=bumpmap, texture element, scale)
    while node.get("type") in ("twosided", "normalmap", "bumpmap"):
        ntype = node.get("type")
        if ntype == "twosided":
            twosided = True
        else:
            p_w = _collect_props(node, defines)
            nrm = (0 if ntype == "normalmap" else 1, node.find("texture"),
                   float(p_w.get("scale", 1.0)))
        inner = node.find("bsdf")
        if inner is None:
            break
        node = inner
    btype = node.get("type")
    kind = BSDF_KINDS.get(btype)
    if kind is None:
        kind = mat.DIFFUSE  # graceful fallback for exotic plugins
    p = _collect_props(node, defines)

    # "marschner" defaults to the corrected mode (true pdf, MIS-compatible,
    # SURVEY §7.6); the fork's quirky MarschnerDiffuse behavior is kept
    # behind <boolean name="faithful" value="true"/> (or a
    # -D marschner_faithful=true define) for pixel parity runs
    faithful = p.get("faithful",
                     str(defines.get("marschner_faithful",
                                     "false")).lower() == "true")
    if btype == "marschner" and bool(faithful):
        kind = mat.MARSCHNER

    if kind == mat.MIXTURE:
        children = node.findall("bsdf")[:2]
        sub_ids = [builder.add_material(
            **_material_row_from_bsdf(c, defines, builder, scene_dir))
            for c in children]
        while len(sub_ids) < 2:
            sub_ids.append(builder.add_material(kind=mat.DIFFUSE))
        weights = [float(x) for x in str(p.get("weights", "0.5, 0.5"))
                   .replace(",", " ").split()] if "weights" in p else None
        w = weights[0] if weights else p.get("weight", 0.5)
        return dict(kind=mat.MIXTURE, twosided=twosided,
                    mix_a=sub_ids[0], mix_b=sub_ids[1], mix_w=w)

    if kind in (mat.MASK, mat.COATING, mat.ROUGHCOATING):
        inner = node.find("bsdf")
        nested_id = builder.add_material(
            **_material_row_from_bsdf(inner, defines, builder, scene_dir)) \
            if inner is not None else builder.add_material(kind=mat.DIFFUSE)
        if kind == mat.MASK:
            return dict(kind=mat.MASK, twosided=twosided, mix_a=nested_id,
                        diffuse=p.get("opacity", (0.5, 0.5, 0.5)))
        int_ior = p.get("intIOR", "bk7")
        ext_ior = p.get("extIOR", "air")
        if isinstance(int_ior, str):
            int_ior = IOR_NAMES.get(int_ior, 1.5046)
        if isinstance(ext_ior, str):
            ext_ior = IOR_NAMES.get(ext_ior, 1.000277)
        thickness = float(p.get("thickness", 1.0))
        sa = np.asarray(p.get("sigmaA", (0.0, 0.0, 0.0)), np.float32)
        return dict(kind=kind, twosided=twosided, mix_a=nested_id,
                    eta=float(int_ior) / float(ext_ior),
                    sigma_a=tuple(sa * thickness),
                    alpha=float(p.get("alpha", 0.1)),
                    dist=0 if p.get("distribution", "ggx") != "beckmann"
                    else 1,
                    specular=p.get("specularReflectance", (1.0, 1.0, 1.0)))

    if kind == mat.CLOTH:
        # irawan woven cloth (src/bsdfs/irawan.cpp): weave DSL file (or a
        # built-in name) + repeatU/repeatV + $var props forwarded to the
        # pattern grammar
        from ..models.bsdf import cloth as cloth_bsdf
        fname = str(p.get("filename", "plain"))
        if fname in cloth_bsdf.BUILTIN_WEAVES:
            text = cloth_bsdf.BUILTIN_WEAVES[fname]
        else:
            import os
            with open(os.path.join(scene_dir, fname)) as fh:
                text = fh.read()
        wp = cloth_bsdf.parse_weave(text, p)
        return dict(kind=mat.CLOTH, twosided=twosided, weave=wp,
                    repeat_u=float(p.get("repeatU", 1.0)),
                    repeat_v=float(p.get("repeatV", 1.0)))

    row = dict(kind=kind, twosided=twosided)
    int_ior = p.get("intIOR", "bk7")
    ext_ior = p.get("extIOR", "air")
    if isinstance(int_ior, str):
        int_ior = IOR_NAMES.get(int_ior, 1.5046)
    if isinstance(ext_ior, str):
        ext_ior = IOR_NAMES.get(ext_ior, 1.000277)
    defaults_eta = {"marschner": 1.55, "marschnerdielectric": 1.501}
    row["eta"] = float(int_ior) / float(ext_ior) if "intIOR" in p or \
        "extIOR" in p else defaults_eta.get(btype, 1.5046)

    if "reflectance" in p:
        row["diffuse"] = p["reflectance"]
    if "diffuseReflectance" in p:
        row["diffuse"] = p["diffuseReflectance"]
    if "specularReflectance" in p:
        row["specular"] = p["specularReflectance"]
    if "specularTransmittance" in p:
        row["transmit"] = p["specularTransmittance"]
    if "exponent" in p:
        row["exponent"] = p["exponent"]
    if "alpha" in p:
        row["alpha"] = p["alpha"]
    if "nonlinear" in p:
        row["nonlinear"] = p["nonlinear"]
    if btype == "hk":
        # σs → transmit, σa → sigma_a, thickness → alpha, HG g → beta_r
        row["transmit"] = p.get("sigmaS", (2.0, 2.0, 2.0))
        row["sigma_a"] = p.get("sigmaA", (0.05, 0.05, 0.05))
        row["alpha"] = float(p.get("thickness", 1.0))
        row["beta_r"] = float(p.get("g", 0.0))
    row["dist"] = 0 if p.get("distribution", "ggx") != "beckmann" else 1
    if btype == "marschner":
        # hardcoded in the reference ctor (marschner_diffuse.cpp:125,152-157)
        row["sigma_a"] = (0.5, 0.5, 0.5)
        row["beta_r"] = 0.1
        row["scale_tilt"] = -0.1
        row.setdefault("specular", (0.5, 0.5, 0.5))
        row.setdefault("transmit", (0.5, 0.5, 0.5))
    if btype in ("conductor", "mirror", "roughconductor"):
        # named conductor presets: (eta_avg, k rgb) sampled at R/G/B
        # wavelengths (reference ships spectral .spd tables; these are the
        # standard rgb-averaged values)
        presets = {
            "Cu": (0.95, (3.9, 2.45, 2.14)),
            "Au": (0.40, (2.82, 2.35, 1.77)),
            "Ag": (0.14, (4.16, 3.44, 2.56)),
            "Al": (1.35, (7.47, 6.40, 5.30)),
            "Cr": (3.18, (3.33, 3.33, 3.33)),
            "none": (1e4, (0.0, 0.0, 0.0)),
        }
        name = p.get("material", "Cu")
        eta_c, k_c = presets.get(name, presets["Cu"])
        row["eta"] = eta_c
        row["k"] = k_c
        if btype == "mirror":
            row["eta"] = 1e4  # F → 1
            row["k"] = (0.0, 0.0, 0.0)

    # texture children (teapot floor checkerboard; bitmap textures)
    tex = node.find("texture")
    tex_gain = 1.0
    if tex is not None and tex.get("type") == "scale":
        # scale texture (src/textures/scale.cpp): constant × nested texture
        sp_ = _collect_props(tex, defines)
        tex_gain = float(np.mean(sp_.get("scale", sp_.get("value", 1.0))))
        inner_tex = tex.find("texture")
        if inner_tex is not None:
            tex = inner_tex
    if tex is not None and tex.get("type") == "wireframe":
        tp = _collect_props(tex, defines)
        row["tex_id"] = builder.add_wireframe_texture(
            color0=np.asarray(tp.get("interiorColor", (0.5,) * 3))
            * tex_gain,
            color1=np.asarray(tp.get("edgeColor", (0.1,) * 3)) * tex_gain,
            line_width=tp.get("lineWidth", 0.05))
    elif tex is not None and tex.get("type") == "vertexcolors":
        row["tex_id"] = builder.add_vertexcolor_texture()
    elif tex is not None and tex.get("type") == "curvature":
        tp = _collect_props(tex, defines)
        row["tex_id"] = builder.add_vertexcolor_texture()
        builder.curvature_scale = float(tp.get("scale", 1.0))
        row["__curvature__"] = True
    elif tex is not None and tex.get("type") == "gridtexture":
        tp = _collect_props(tex, defines)
        row["tex_id"] = builder.add_gridtexture(
            color0=np.asarray(tp.get("color0", (0.2,) * 3)) * tex_gain,
            color1=np.asarray(tp.get("color1", (0.4,) * 3)) * tex_gain,
            line_width=tp.get("lineWidth", 0.01),
            uscale=tp.get("uscale", 1.0), vscale=tp.get("vscale", 1.0),
            uoffset=tp.get("uoffset", 0.0), voffset=tp.get("voffset", 0.0))
    elif tex is not None and tex.get("type") == "checkerboard":
        tp = _collect_props(tex, defines)
        tid = builder.add_checkerboard(
            color0=np.asarray(tp.get("color0", (0.4,) * 3)) * tex_gain,
            color1=np.asarray(tp.get("color1", (0.2,) * 3)) * tex_gain,
            uscale=tp.get("uscale", 1.0), vscale=tp.get("vscale", 1.0),
            uoffset=tp.get("uoffset", 0.0), voffset=tp.get("voffset", 0.0))
        row["tex_id"] = tid
    elif tex is not None and tex.get("type") == "bitmap":
        tp = _collect_props(tex, defines)
        fname = tp.get("filename", "")
        img = None
        if fname and not os.path.isabs(fname):
            cand = os.path.join(scene_dir, fname)
            if os.path.exists(cand):
                fname = cand
        if fname and os.path.exists(fname):
            if fname.lower().endswith(".hdr"):
                img = io_utils.read_hdr(fname)
            elif fname.lower().endswith(".pfm"):
                img = io_utils.read_pfm(fname)
            elif fname.lower().endswith(".exr"):
                from ..utils import exr as exr_utils
                img = exr_utils.read_exr(fname)[..., :3]
            else:
                try:
                    from PIL import Image
                    arr = np.asarray(Image.open(fname).convert("RGB"),
                                     np.float32) / 255.0
                    img = arr ** 2.2
                except Exception:
                    img = None
        if img is not None:
            row["tex_id"] = builder.add_bitmap_texture(
                np.asarray(img) * tex_gain, uscale=tp.get("uscale", 1.0),
                vscale=tp.get("vscale", 1.0),
                uoffset=tp.get("uoffset", 0.0),
                voffset=tp.get("voffset", 0.0))

    if nrm is not None and nrm[1] is not None:
        # normal/bump texture: loaded WITHOUT sRGB de-gamma (vector data)
        ntp = _collect_props(nrm[1], defines)
        nimg = _read_texture_image(ntp.get("filename", ""), scene_dir,
                                   gamma=1.0)
        if nimg is not None:
            row["nrm_tex_id"] = builder.add_bitmap_texture(
                nimg, uscale=ntp.get("uscale", 1.0),
                vscale=ntp.get("vscale", 1.0),
                uoffset=ntp.get("uoffset", 0.0),
                voffset=ntp.get("voffset", 0.0))
            row["nrm_kind"] = nrm[0]
            row["nrm_scale"] = nrm[2]
    return row


def _read_texture_image(fname: str, scene_dir: str, gamma: float = 2.2):
    """Load a texture image (hdr/pfm/exr linear; ldr with the given
    de-gamma). Returns None when missing."""
    if fname and not os.path.isabs(fname):
        cand = os.path.join(scene_dir, fname)
        if os.path.exists(cand):
            fname = cand
    if not fname or not os.path.exists(fname):
        return None
    if fname.lower().endswith(".hdr"):
        return io_utils.read_hdr(fname)
    if fname.lower().endswith(".pfm"):
        return io_utils.read_pfm(fname)
    if fname.lower().endswith(".exr"):
        from ..utils import exr as exr_utils
        return exr_utils.read_exr(fname)[..., :3]
    try:
        from PIL import Image
        arr = np.asarray(Image.open(fname).convert("RGB"),
                         np.float32) / 255.0
        return arr ** gamma if gamma != 1.0 else arr
    except Exception:
        return None


def _standin_fibers(scene_dir: str, filename: str, radius: float,
                    quality: float):
    """Procedural replacement for missing .mitshair files, keyed by the
    scene directory / file name.

    quality < 1 reduces the fiber count; the radius is enlarged by
    1/sqrt(quality) — the reference's own Cook-style stochastic
    `reduction` semantics (hair.cpp:620-628), which conserves projected
    coverage. Without it, low-quality stand-ins leak background sky
    through inter-fiber gaps the real dense asset doesn't have — the
    measured source of the furball golden-image blue skew (7.7% of hair
    bbox pixels were sky-dominant vs 0% in the reference render)."""
    key = (os.path.basename(os.path.normpath(scene_dir)) + " "
           + os.path.basename(filename)).lower()
    q = quality
    radius = radius / np.sqrt(min(max(q, 1e-6), 1.0))
    if "furball" in key:
        return hairgen.gen_furball(n_fibers=int(6000 * q), radius=radius)
    if "curly" in key:
        return hairgen.gen_curly_hair(n_fibers=int(500 * q), radius=radius)
    if "black_hair" in key or "red_hair" in key or "brown_hair" in key \
            or "blonde_hair" in key:
        idx = ["black_hair", "red_hair", "brown_hair",
               "blonde_hair"].index(key.split()[-1].split(".")[0])
        clumps = hairgen.gen_hair_curl(n_fibers_per_clump=int(220 * q),
                                       radius=radius)
        return clumps[idx]
    return hairgen.gen_straight_hair(n_fibers=int(800 * q), radius=radius)


def load_scene(path: str, defines: dict | None = None,
               spp_override: int | None = None,
               res_scale: float = 1.0,
               hair_quality: float = 1.0,
               max_depth_override: int | None = None,
               validate: bool = True) -> Scene:
    defines = defines or {}
    scene_dir = os.path.dirname(os.path.abspath(path))
    root = ET.parse(path).getroot()
    if validate:
        # early structured errors instead of a late KeyError mid-build
        # (reference: XSD validation, scenehandler.cpp:197)
        from .xml_validate import validate as _validate_xml
        _validate_xml(root, path)
    b = SceneBuilder()

    # integrator
    max_depth = 65
    integrator_type = "path"
    motion_time = 1.0
    motion_cfg = "d"
    for integ in root.findall("integrator"):
        p = _collect_props(integ, defines)
        max_depth = p.get("maxDepth", 65)
        integrator_type = integ.get("type") or "path"
        if integrator_type == "direct":
            max_depth = 2
        elif integrator_type == "motion":
            # the reference overloads `time`: a float is the target-frame
            # time, a string is the path configuration (motion.cpp docs)
            t = p.get("time", 1.0)
            if isinstance(t, str) and not t.replace(".", "", 1).isdigit():
                motion_cfg = t
            else:
                motion_time = float(t)
            motion_cfg = p.get("config", motion_cfg)
    if max_depth_override is not None:
        max_depth = max_depth_override

    # sensor + film + sampler
    cam = None
    film = None
    spp = 16
    sampler_kind = 1
    shutter_open = 0.0
    sensor_anim = None
    tiled_film = False
    for sensor in root.findall("sensor"):
        p = _collect_props(sensor, defines)
        fov = p.get("fov", 35.0)
        shutter_open = float(p.get("shutterOpen", 0.0))
        b.shutter = (shutter_open,
                     float(p.get("shutterClose", shutter_open)))
        to_world = np.eye(4)
        tr = sensor.find("transform")
        if tr is not None:
            to_world = _parse_transform(tr)
        sensor_anim = _parse_animation(sensor.find("animation"))
        if sensor_anim is not None:
            to_world = sensor_anim.eval(shutter_open)
            b.camera_anim = sensor_anim  # camera motion blur when the
            #                              shutter is open for a duration
        sam = sensor.find("sampler")
        if sam is not None:
            sp = _collect_props(sam, defines)
            spp = sp.get("sampleCount", 16)
            stype_s = sam.get("type", "independent")
            if stype_s in ("halton", "hammersley"):
                sampler_kind = 2
            elif stype_s == "sobol":
                sampler_kind = "sobol"  # true Sobol'; resolved once the
                #                         film resolution is known below
            elif stype_s == "ldsampler":
                sampler_kind = 1
            elif stype_s == "stratified":
                sampler_kind = (3, int(spp))  # exact for pow2 spp
            else:
                sampler_kind = 0
        fm = sensor.find("film")
        w, h, gamma, rfilter = 768, 576, 2.2, "tent"
        tiled_film = fm is not None and fm.get("type") == "tiledhdrfilm"
        if fm is not None:
            fp = _collect_props(fm, defines)
            w = fp.get("width", 768)
            h = fp.get("height", 576)
            gamma = fp.get("gamma", 2.2)
            rf = fm.find("rfilter")
            if rf is not None:
                rfilter = rf.get("type", "tent")
                if rfilter == "gaussian":
                    rfilter = "gaussian"
        w = max(8, int(round(w * res_scale)))
        h = max(8, int(round(h * res_scale)))
        # label[x, y] annotations + banner flag
        # (src/films/annotations.h, banner.h)
        annotations = []
        banner = False
        if fm is not None:
            fp2 = _collect_props(fm, defines)
            banner = bool(fp2.get("banner", False))
            for k, v in fp2.items():
                ks = k.replace(" ", "")
                m_lab = re.match(r"^label\[(-?\d+),(-?\d+)\]$", ks)
                if m_lab and isinstance(v, str):
                    annotations.append((int(m_lab.group(1)),
                                        int(m_lab.group(2)), v))
        film = Film.make(w, h, rfilter, gamma, annotations=annotations,
                         banner=banner)
        from ..models import sensors as sens_mod
        skind = {"perspective": sens_mod.PERSPECTIVE,
                 "thinlens": sens_mod.THINLENS,
                 "orthographic": sens_mod.ORTHOGRAPHIC,
                 "spherical": sens_mod.SPHERICAL,
                 "telecentric": sens_mod.TELECENTRIC,
                 "radiancemeter": sens_mod.RADIANCEMETER,
                 "fluencemeter": sens_mod.FLUENCEMETER,
                 "irradiancemeter": sens_mod.IRRADIANCEMETER,
                 "perspective_rdist": sens_mod.PERSPECTIVE_RDIST,
                 }.get(sensor.get("type", "perspective"),
                       sens_mod.PERSPECTIVE)
        kc = [float(x) for x in str(p.get("kc", "0, 0")).replace(
            ",", " ").split()[:2]] if "kc" in p else [0.0, 0.0]
        cam = Camera.perspective(
            to_world, fov, w, h, fov_axis=p.get("fovAxis", "x"),
            kind=skind,
            aperture_radius=float(p.get("apertureRadius", 0.0)),
            focus_distance=float(p.get("focusDistance", 1.0)))
        cam = cam._replace(kc0=kc[0], kc1=kc[1] if len(kc) > 1 else 0.0)
        if sensor_anim is not None:
            import jax.numpy as jnp
            b.camera1 = cam._replace(to_world=jnp.asarray(
                sensor_anim.eval(motion_time), jnp.float32))
    if spp_override is not None:
        spp = spp_override

    # materials by id
    mat_ids = {}
    for bsdf in root.findall("bsdf"):
        row = _material_row_from_bsdf(bsdf, defines, b, scene_dir)
        mat_ids[bsdf.get("id")] = b.add_material(**row)

    # shapes
    shape_groups = {}
    sss_single = False
    sss_g = 0.0
    for shape in root.findall("shape"):
        stype = shape.get("type")
        p = _collect_props(shape, defines)
        tr = shape.find("transform")
        to_world = _parse_transform(tr) if tr is not None else np.eye(4)
        shape_anim = _parse_animation(shape.find("animation"))
        motion_m = None
        if shape_anim is not None:
            to_world = shape_anim.eval(shutter_open)
            # world-space relative motion frame→target (motion integrator)
            motion_m = (shape_anim.eval(motion_time)
                        @ np.linalg.inv(to_world)).astype(np.float32)
        pre_mesh_count = len(b.tri_meshes)
        # subsurface dipole attached to the shape → DIPOLE material
        ss_el = shape.find("subsurface")
        dipole_mat = None
        if ss_el is not None and ss_el.get("type") in ("dipole",
                                                       "singlescatter"):
            sp2 = _collect_props(ss_el, defines)
            int_ior = sp2.get("intIOR", 1.5)
            if isinstance(int_ior, str):
                int_ior = IOR_NAMES.get(int_ior, 1.5)
            dipole_mat = b.add_material(
                kind=mat.DIPOLE,
                transmit=sp2.get("sigmaS", (2.6, 3.2, 3.9)),
                sigma_a=sp2.get("sigmaA", (0.0021, 0.0041, 0.0071)),
                eta=float(int_ior), mix_w=float(sp2.get("scale", 1.0)))
            if ss_el.get("type") == "singlescatter":
                # single scattering through the refractive boundary
                # (reference: src/subsurface/singlescatter.cpp)
                sss_single = True
                sss_g = float(sp2.get("g", 0.0))
        # material: <ref id> or inline bsdf
        mid = None
        ref = shape.find("ref")
        if ref is not None and ref.get("id") in mat_ids:
            mid = mat_ids[ref.get("id")]
        else:
            inline = shape.find("bsdf")
            if inline is not None:
                mid = b.add_material(
                    **_material_row_from_bsdf(inline, defines, b,
                                              scene_dir))
        if dipole_mat is not None:
            mid = dipole_mat  # subsurface overrides the surface BSDF
        # shape-bounded participating media (reference:
        # Shape::setInterior/ExteriorMedium; <medium name="interior">)
        med_int = med_ext = 0
        for md_el in shape.findall("medium"):
            mp2 = _collect_props(md_el, defines)
            med_id = b.add_medium(mp2.get("sigmaS", (0.5, 0.5, 0.5)),
                                  mp2.get("sigmaA", (0.1, 0.1, 0.1)),
                                  g=float(mp2.get("g", 0.0)))
            if md_el.get("name") == "exterior":
                med_ext = med_id
            else:
                med_int = med_id
        if mid is None and (med_int or med_ext):
            # medium boundary without a BSDF = index-matched transparent
            # interface (the reference's implicit null boundary)
            mid = b.add_material(kind=mat.NULL)
        if mid is None:
            mid = b.add_material(kind=mat.DIFFUSE)
        # emissive?
        radiance = None
        for emit in shape.findall("emitter"):
            ep = _collect_props(emit, defines)
            radiance = ep.get("radiance", (1.0, 1.0, 1.0))

        if stype == "hair":
            radius = p.get("radius", 0.025)
            fname = os.path.join(scene_dir, p.get("filename", ""))
            if os.path.exists(fname):
                fs = hairgen.load_hair_file(
                    fname, radius,
                    angle_threshold_deg=p.get("angleThreshold", 1.0),
                    reduction=p.get("reduction", 0.0))
            else:
                fs = _standin_fibers(scene_dir, p.get("filename", ""),
                                     radius, hair_quality)
            if not np.allclose(to_world, np.eye(4)):
                verts = fs.vertices @ to_world[:3, :3].T + to_world[:3, 3]
                # radius scales with the transform (hair.cpp:632-633)
                sc = np.cbrt(abs(np.linalg.det(to_world[:3, :3])))
                fs = hairgen.FiberSet(verts, fs.vertex_starts_fiber,
                                      fs.radius * sc)
            b.add_fibers(fs, mid)
        elif stype in ("obj", "ply", "serialized"):
            fname = os.path.join(scene_dir, p.get("filename", ""))
            if os.path.exists(fname):
                if stype == "obj":
                    mesh = shp.load_obj(fname)
                elif stype == "ply":
                    mesh = shp.load_ply_ascii(fname)
                else:
                    mesh = shp.load_serialized(fname,
                                               p.get("shapeIndex", 0))
                if mesh.normals is None and p.get("faceNormals", False) \
                        is False:
                    mesh = shp.compute_smooth_normals(mesh)
            else:
                mesh = shp.teapot_standin()
                mesh = shp.compute_smooth_normals(mesh)
            b.add_mesh(mesh, mid, to_world=to_world, radiance=radiance)
        elif stype == "shapegroup":
            # collect child meshes for later instancing
            group = []
            for child in shape.findall("shape"):
                cp = _collect_props(child, defines)
                ctype = child.get("type")
                cmesh = None
                if ctype == "rectangle":
                    cmesh = shp.rectangle()
                elif ctype == "sphere":
                    cmesh = shp.sphere(cp.get("radius", 1.0))
                elif ctype == "cube":
                    cmesh = shp.cube()
                elif ctype in ("obj", "ply", "serialized"):
                    fn = os.path.join(scene_dir, cp.get("filename", ""))
                    if os.path.exists(fn):
                        cmesh = shp.load_obj(fn) if ctype == "obj" else (
                            shp.load_ply_ascii(fn) if ctype == "ply"
                            else shp.load_serialized(fn))
                if cmesh is not None:
                    ctr = child.find("transform")
                    if ctr is not None:
                        cmesh = shp.transform_mesh(cmesh,
                                                   _parse_transform(ctr))
                    if cmesh.normals is None:
                        cmesh = shp.compute_smooth_normals(cmesh)
                    cref = child.find("ref")
                    cmid = mat_ids.get(cref.get("id")) if cref is not None \
                        else mid
                    # shared prototype: geometry is stored ONCE; instances
                    # reference it through the two-level BVH
                    # (src/shapes/{shapegroup,instance}.cpp)
                    group.append(b.add_prototype(
                        cmesh, cmid if cmid is not None else mid))
            shape_groups[shape.get("id")] = group
        elif stype == "instance":
            gref = shape.find("ref")
            group = shape_groups.get(gref.get("id") if gref is not None
                                     else None, [])
            for pidx in group:
                # animated instances (instance.cpp AnimatedTransform):
                # to_world is already shape_anim.eval(shutter_open) above;
                # the track re-poses the transform table per shutter time
                b.add_instance(pidx, to_world, anim=shape_anim)
        elif stype == "rectangle":
            b.add_mesh(shp.rectangle(), mid, to_world=to_world,
                       radiance=radiance)
        elif stype == "sphere":
            r = p.get("radius", 1.0)
            t2 = to_world.copy()
            if "center" in p:
                t2[:3, 3] += np.asarray(p["center"])
            b.add_mesh(shp.sphere(r), mid, to_world=t2, radiance=radiance)
        elif stype == "disk":
            b.add_mesh(shp.disk(), mid, to_world=to_world, radiance=radiance)
        elif stype == "cube":
            b.add_mesh(shp.cube(), mid, to_world=to_world, radiance=radiance)
        elif stype == "cylinder":
            b.add_mesh(shp.cylinder(p.get("radius", 1.0)), mid,
                       to_world=to_world, radiance=radiance)
        elif stype == "heightfield":
            img = _read_texture_image(p.get("filename", ""), scene_dir,
                                      gamma=1.0)
            if img is not None:
                hs = img.mean(-1)
            else:
                # procedural fallback: gentle ripples
                g = 65
                yy, xx = np.meshgrid(np.linspace(0, 4 * np.pi, g),
                                     np.linspace(0, 4 * np.pi, g))
                hs = 0.1 * np.sin(xx) * np.cos(yy)
            b.add_mesh(shp.heightfield(hs, scale_z=float(p.get("scale",
                                                               1.0))),
                       mid, to_world=to_world, radiance=radiance)
        elif stype == "deformable":
            # keyframe morph (reference: src/shapes/deformable.cpp —
            # vertices lerped at the ray's time). Registered as a morph
            # pair: still renders evaluate at `time` (-D time=t); with
            # an open shutter the pair re-lerps per stratified wave time
            # — true deformation motion blur (scene.add_morph_mesh)
            f0 = os.path.join(scene_dir, p.get("filename", ""))
            f1 = os.path.join(scene_dir, p.get("filename2",
                                               p.get("filename", "")))
            t_anim = float(defines.get("time", p.get("time", 0.0)))
            if os.path.exists(f0):
                m0 = shp.load_obj(f0) if f0.endswith(".obj") \
                    else shp.load_serialized(f0)
                m1 = m0
                if os.path.exists(f1) and f1 != f0:
                    m1 = shp.load_obj(f1) if f1.endswith(".obj") \
                        else shp.load_serialized(f1)
                b.add_morph_mesh(m0, m1, mid, to_world=to_world,
                                 radiance=radiance, time=t_anim)
        if motion_m is not None:
            for k in range(pre_mesh_count, len(b.tri_meshes)):
                b.mesh_motion[k] = motion_m
                # animated shapes also drive shutter-time re-posing
                # (motion blur when shutterClose > shutterOpen)
                b.animated_meshes[k] = shape_anim
        if med_int or med_ext:
            for k in range(pre_mesh_count, len(b.tri_meshes)):
                b.mesh_media[k] = (med_int, med_ext)

    # emitters
    for emit in root.findall("emitter"):
        etype = emit.get("type")
        p = _collect_props(emit, defines)
        tr = emit.find("transform")
        to_world = _parse_transform(tr) if tr is not None else np.eye(4)
        if etype == "sunsky" or etype == "sky" or etype == "sun":
            b.env = em.bake_sunsky(
                p.get("sunDirection", (0.0, 1.0, 0.0)),
                turbidity=p.get("turbidity", 3.0),
                sky_scale=p.get("skyScale", 1.0),
                sun_scale=p.get("sunScale", 1.0),
                sun_radius_scale=p.get("sunRadiusScale", 1.0),
                with_sun=(etype != "sky"), with_sky=(etype != "sun"))
        elif etype == "envmap":
            fname = os.path.join(scene_dir, p.get("filename", ""))
            if os.path.exists(fname):
                if fname.lower().endswith(".hdr"):
                    img = io_utils.read_hdr(fname)
                elif fname.lower().endswith(".pfm"):
                    img = io_utils.read_pfm(fname)
                elif fname.lower().endswith(".exr"):
                    from ..utils import exr as exr_utils
                    img = exr_utils.read_exr(fname)[..., :3]
                else:
                    from PIL import Image
                    arr = np.asarray(Image.open(fname).convert("RGB"),
                                     np.float32) / 255.0
                    img = arr ** 2.2
            else:
                img = np.full((64, 128, 3), 0.8, np.float32)
            b.env = em.make_envmap(img, to_world[:3, :3],
                                   scale=p.get("scale", 1.0))
        elif etype == "constant":
            b.env = em.make_constant(p.get("radiance", (1.0, 1.0, 1.0)))
        elif etype in ("point", "spot", "directional", "collimated"):
            kind = {"point": em.POINT, "spot": em.SPOT,
                    "directional": em.DIRECTIONAL,
                    "collimated": em.COLLIMATED}[etype]
            pos = p.get("position", tuple(to_world[:3, 3]))
            ddir = p.get("direction", tuple(to_world[:3, :3] @ [0, 0, 1]))
            inten = p.get("intensity",
                          p.get("irradiance", p.get("power",
                                                    (1.0, 1.0, 1.0))))
            b.delta_lights.append(dict(
                kind=kind, position=pos, direction=ddir, intensity=inten,
                cutoff_deg=p.get("cutoffAngle", 20.0),
                beam_deg=p.get("beamWidth", p.get("cutoffAngle", 20.0)
                               * 0.75)))

    # scene-level participating media (reference: src/medium/*.cpp) —
    # <medium type="homogeneous|heterogeneous"> at scene scope; rendered
    # by the volpath integrator (--integrator volpath)
    for md in root.findall("medium"):
        from ..models import media as med_mod
        mp = _collect_props(md, defines)
        ph_el = md.find("phase")
        pk = med_mod.HG
        g_val = float(mp.get("g", 0.0))
        PHASE_KINDS = {"isotropic": med_mod.ISOTROPIC, "hg": med_mod.HG,
                       "rayleigh": med_mod.RAYLEIGH,
                       "kkay": med_mod.KKAY,
                       "kkay_is": med_mod.KKAY_IS,
                       "microflake": med_mod.MICROFLAKE,
                       "mixturephase": med_mod.MIXTURE_PHASE}
        if ph_el is not None:
            pp = _collect_props(ph_el, defines)
            pk = PHASE_KINDS.get(ph_el.get("type", "isotropic"),
                                 med_mod.HG)
            g_val = float(pp.get("g", g_val))
            kkay_p = dict(ks=float(pp.get("ks", 0.4)),
                          kd=float(pp.get("kd", 0.2)),
                          exponent=float(pp.get("exponent", 4.0)))
            if pk == med_mod.MICROFLAKE:
                # src/phase/microflake.cpp: stddev + fiber orientation
                kkay_p = dict(stddev=float(pp.get("stddev", 0.3)),
                              orientation=tuple(np.asarray(
                                  pp.get("orientation", (0.0, 0.0, 1.0)),
                                  np.float32)))
            if pk == med_mod.MIXTURE_PHASE:
                # src/phase/mixturephase.cpp: comma-separated weights +
                # nested <phase> children (non-nested kinds only)
                ws = [float(x) for x in re.split(
                    r"[,\s]+", str(pp.get("weights", "")).strip()) if x]
                mix = []
                for i, ch in enumerate(ph_el.findall("phase")):
                    cp = _collect_props(ch, defines)
                    ck = PHASE_KINDS.get(ch.get("type", "isotropic"),
                                         med_mod.ISOTROPIC)
                    cw = ws[i] if i < len(ws) else 1.0 / max(
                        len(ph_el.findall("phase")), 1)
                    mix.append((ck, cw, float(cp.get("g", 0.0))))
                kkay_p = dict(mix=tuple(mix))
        sig_s = mp.get("sigmaS", (0.5, 0.5, 0.5))
        sig_a = mp.get("sigmaA", (0.1, 0.1, 0.1))
        if md.get("type") == "heterogeneous":
            vol = None
            for ve in md.findall("volume"):
                vp = _collect_props(ve, defines)
                if ve.get("type") == "gridvolume" and "filename" in vp:
                    fname = vp["filename"]
                    if not os.path.isabs(fname):
                        fname = os.path.join(scene_dir, fname)
                    vol = med_mod.load_vol(fname)
                elif ve.get("type") == "constvolume":
                    val = float(np.mean(vp.get("value", 1.0)))
                    vol = med_mod.make_grid_volume(
                        np.full((2, 2, 2), val, np.float32),
                        (-1e3, -1e3, -1e3), (1e3, 1e3, 1e3))
            if vol is None:
                raise ValueError("heterogeneous medium needs a gridvolume")
            b.medium = med_mod.make_hetero_medium(
                vol, sig_s, sig_a, g=g_val, phase_kind=pk,
                density_scale=float(mp.get("scale", 1.0)))
        else:
            kk = kkay_p if ph_el is not None else {}
            # finite fog slab sized from the scene geometry: a ray to the
            # environment traverses ~4 bbox diagonals of medium (the
            # reference bounds media by shapes; a global fog with the
            # default 1e4 depth would be fully opaque)
            pts = [np.asarray(m.positions).reshape(-1, 3)
                   for m, _, _ in b.tri_meshes]
            pts += [np.asarray(fs.vertices).reshape(-1, 3)
                    for fs, _ in b.fibers]
            if pts:
                allp = np.concatenate(pts, 0)
                diag = float(np.linalg.norm(allp.max(0) - allp.min(0)))
            else:
                diag = 10.0
            b.medium = med_mod.make_medium(
                sig_s, sig_a, g=g_val, phase_kind=pk,
                fog_depth=float(mp.get("fogDepth", max(4.0 * diag, 1.0))),
                **kk)

    if sampler_kind == "sobol":
        # true high-dim Sobol' with the per-pixel elementary-interval
        # lookup (src/samplers/sobol.cpp:183-211) at resolution 2^m
        import math
        from ..core import rng as rng_mod
        m_res = max(1, math.ceil(math.log2(max(film.width, film.height))))
        sampler_kind = (rng_mod.SOBOL_QMC, m_res, film.width)

    return b.build(cam, film, spp=int(spp), max_depth=int(max_depth),
                   sampler=sampler_kind, gamma=film.gamma,
                   integrator=integrator_type, tiled_film=tiled_film,
                   sss_single=sss_single, sss_g=sss_g,
                   motion_config=motion_cfg)
