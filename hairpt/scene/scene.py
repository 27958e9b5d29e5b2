"""Scene assembly: host-side build → SoA device arrays + static config.

TPU-native replacement of the reference's Scene object graph
(src/librender/scene.cpp:322 Scene::initialize + ShapeKDTree): all triangle
meshes are flattened into one global SoA triangle pool and all hair fibers
into one segment pool, each under its own flattened BVH; materials/emitters
become tables. Static facts (which BSDF families exist, resolution, depth)
stay python-side so jit specializes the megakernel per scene.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..models import emitters as em
from ..models import shapes as shp
from ..models.bsdf import registry as mat
from ..models.bsdf import hair as hair_bsdf
from ..models.bsdf import tables as rt_tables
from ..models.sensors import Camera
from ..film.film import Film
from ..ops import bvh as bvh_mod
from ..ops import intersect as isec
from ..ops import intersect_packed as ipk
from ..ops import intersect_swept as iswept
from . import hairgen


class TriShading(NamedTuple):
    """Per-triangle shading attributes, sorted in BVH order."""
    n0: jnp.ndarray      # [N, 3] vertex normals
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray     # [N, 2]
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    mat_id: jnp.ndarray  # [N]
    emitter_id: jnp.ndarray  # [N] index into area light table, -1 = none
    uv_density: jnp.ndarray  # [N] sqrt(uv area / world area) — mip LOD
    vc0: jnp.ndarray     # [N, 3] per-vertex colors (vertexcolors/curvature)
    vc1: jnp.ndarray
    vc2: jnp.ndarray


class MotionTables(NamedTuple):
    """Per-object rigid motion for the `motion` integrator (reference:
    src/integrators/misc/motion.cpp). obj_m[k] maps a world-space point on
    object k at the frame time to its world position at the target time
    (T(t1)·T(t0)⁻¹); cam1 is the sensor at the target time."""
    tri_obj: Optional[jnp.ndarray]  # [Ntri] BVH-sorted object id
    obj_m: jnp.ndarray              # [O, 4, 4] relative motion transforms
    cam1: object                    # Camera at the target time


class SceneArrays(NamedTuple):
    """Everything the integrator needs on device (a jit-able pytree)."""
    tri: Optional[isec.TriGeom]
    tri_shading: Optional[TriShading]
    tri_bvh: Optional[isec.BVHArrays]
    tri_packed: Optional[ipk.PackedBVH]
    hair: Optional[isec.HairGeom]
    hair_mat_id: Optional[jnp.ndarray]
    hair_bvh: Optional[isec.BVHArrays]
    hair_packed: Optional[ipk.PackedBVH]
    hair_swept: Optional[iswept.SweptHair]
    materials: mat.MaterialTable
    checkers: Optional[mat.CheckerboardTable]
    hair_tables: Optional[mat.HairTables]
    env: Optional[em.EnvMap]
    area: Optional[em.AreaLights]
    delta: Optional[em.DeltaLights]
    inst: object = None     # Optional[instancing.InstancedGeo]: two-level
    #                         BVH instances (shapegroup/instance scenes)
    sss: object = None      # Optional[subsurface.SSSSamples] (dipole)
    tri_med: object = None  # Optional [Ntri, 2] int32 (interior, exterior)
    #                         medium ids per triangle (0 = vacuum)
    media: object = None    # Optional med.MediumTable (shape-bounded)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render parameters (closed over by the jitted megakernel)."""
    width: int
    height: int
    spp: int
    max_depth: int = 65
    rr_depth: int = 5
    strict_normals: bool = True
    sampler: int = 1           # rng.SOBOL
    rfilter: str = "tent"
    gamma: float = 2.2
    ray_eps: float = 1e-3      # self-intersection offset (scene scale units)
    env_prob: float = 1.0      # NEE probability of picking the environment
    traversal: str = "packed"  # 'packed'|'swept'|'tiled'|'perray'|'blocked'
    block: int = 256           # rays per block ('blocked' mode only)
    swept_k: int = 128         # segments per cluster ('swept' hair mode)
    swept_c: int = 0           # cluster count (filled at build)
    swept_pmax: int = 24       # phase-A candidate clusters per ray
    swept_chunk: int = 64      # pairs per phase-B chunk
    tiled_q: int = 128         # candidate clusters per 64-ray tile ('tiled')
    tiled_short: float = 0.0   # short-ray-first clamp for bounce/shadow
    #                            queries (0 = off; set at build to a few
    #                            cluster diameters for hair scenes)
    nee_probs: tuple = (1.0, 0.0, 0.0)  # (env, area, delta) selection probs
    nee_rr: float = 0.0        # shadow-ray Russian roulette luminance
    #                            threshold (0 = trace every shadow ray):
    #                            NEE samples whose full pre-visibility
    #                            contribution is dimmer than this are
    #                            traced with p = lum/nee_rr and reweighted
    #                            1/p — unbiased; cuts the any-hit load of
    #                            deep-bounce/dim-sky samples
    integrator: str = "path"   # scene-XML integrator type (CLI default)
    tiled_film: bool = False   # tiledhdrfilm: stream bands to disk
    sss_single: bool = False   # subsurface: single scattering (vs dipole)
    sss_g: float = 0.0         # HG anisotropy for single scattering
    motion_config: str = "d"   # motion integrator path config (d | rd)


class Scene(NamedTuple):
    arrays: SceneArrays
    camera: Camera
    film: Film
    config: RenderConfig
    active_kinds: tuple        # static: BSDF families present
    marschner_rows: tuple = ()  # material-row index per hair-table aux_id
    has_normal_maps: bool = False  # static: any normal/bump-mapped material
    medium: object = None      # Medium/HeteroMedium for volpath (optional)
    motion: object = None      # MotionTables (motion-vector integrator)
    rebuild_geo: object = None  # callable t → SceneArrays (motion blur);
    #                             shapes match `arrays`, so one jit serves
    #                             every shutter time
    shutter: tuple = (0.0, 0.0)  # (open, close) — close > open ⇒ blur
    camera_anim: object = None  # AnimatedTransform of the sensor (blur)
    repose_inst: object = None  # callable (arrays, t) → arrays: animated
    #                             instance transforms re-posed in-place
    #                             (no geometry rebuild)


def _uv_density(uv0, uv1, uv2, e1, e2):
    """sqrt(uv area / world area) per triangle — converts a world-space
    footprint into uv units for mip LOD selection."""
    a = uv1 - uv0
    b = uv2 - uv0
    uv_area = 0.5 * np.abs(a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0])
    w_area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
    return np.sqrt(uv_area / np.maximum(w_area, 1e-20))


def _build_mips(bitmaps: np.ndarray, levels: int = 4) -> np.ndarray:
    """Pre-blurred pyramid for trilinear filtering: level k = 2^k box
    average, stored at full resolution (uniform shapes keep the lookup a
    single fused gather on TPU; a few textures × 4 levels is cheap)."""
    t, r, _, _ = bitmaps.shape
    out = np.zeros((t, levels, r, r, 3), np.float32)
    out[:, 0] = bitmaps
    cur = bitmaps
    for k in range(1, levels):
        rr = max(r >> k, 1)
        small = cur.reshape(t, rr, cur.shape[1] // rr,
                            rr, cur.shape[2] // rr, 3).mean((2, 4))
        out[:, k] = np.repeat(np.repeat(small, r // rr, axis=1),
                              r // rr, axis=2)
        cur = out[:, k]
    return out


class SceneBuilder:
    """Imperative host-side builder used by the XML loader and tests."""

    def __init__(self):
        self.tri_meshes = []       # (Mesh(world), mat_id, emitter_id)
        self.fibers = []           # (FiberSet, mat_id)
        self.materials = []        # material row dicts
        self.checkers = []
        self.hair_aux = []         # (sigma_a, beta_r, eta) per marschner mat
        self.cloth = []            # (WeavePattern, repeatU, repeatV) rows
        self.env: Optional[em.EnvMap] = None
        self.delta_lights = []     # dict entries for em.make_delta_lights
        self.area_lights = []      # (mesh index ...) resolved at finalize
        self.camera: Optional[Camera] = None
        self.film: Optional[Film] = None
        self.medium = None         # optional Medium/HeteroMedium (volpath)
        self.mesh_motion = {}      # mesh index → 4x4 relative motion (world)
        self.camera1 = None        # Camera at the motion target time
        self.animated_meshes = {}  # mesh index → AnimatedTransform
        self.morph_meshes = {}     # mesh index → (mesh@t0, mesh@t1) world
        #                            keyframe pair (deformable.cpp): the
        #                            vertex lerp re-evaluates per shutter
        #                            time under motion blur
        self.shutter = (0.0, 0.0)  # (open, close); close > open ⇒ blur
        self.media_rows = []       # shape-bounded media (1-based ids)
        self.mesh_media = {}       # mesh index → (interior_id, exterior_id)
        self.curvature_mats = set()  # mat ids whose texture is curvature
        self.curvature_scale = 1.0
        self.config_kwargs = {}
        self.protos = []           # (Mesh, mat_id) shared prototypes
        self.instances = []        # (proto_idx, to_world 4×4)
        self.instance_anims = {}   # instance idx → AnimatedTransform

    # -- materials ---------------------------------------------------------

    def add_material(self, **row) -> int:
        is_curv = row.pop("__curvature__", False)
        kind = row.get("kind", mat.DIFFUSE)
        # per-material precomputed transmittance slices
        if kind in (mat.ROUGHPLASTIC, mat.MARSCHNER, mat.MARSCHNER_PURE,
                    mat.ROUGHCOATING):
            dist = row.get("dist", 0)
            eta = row.get("eta", 1.5)
            alpha = row.get("alpha", 0.1)
            rt = rt_tables.get(dist, eta)
            cosg = (np.arange(mat.N_COS) + 0.5) / mat.N_COS
            row["ext_trans"] = rt.eval_np(cosg, np.full(mat.N_COS, alpha))
            row["int_fdr"] = 1.0 - rt_tables.get(dist, 1.0 / eta) \
                .eval_diffuse_np(alpha)
        if kind in (mat.COATING, mat.ROUGHCOATING):
            # specularSamplingWeight from the layer's average absorption
            # (reference: coating.cpp configure(): 1/(avgAbsorption+1))
            sa = np.asarray(row.get("sigma_a", (0.0,) * 3), np.float64)
            avg_absorb = float(np.mean(np.exp(-2.0 * sa)))
            row.setdefault("spec_weight", 1.0 / (avg_absorb + 1.0))
        if kind == mat.PLASTIC:
            from ..models.bsdf.fresnel import fresnel_diffuse_reflectance
            row["int_fdr"] = fresnel_diffuse_reflectance(
                1.0 / row.get("eta", 1.5))
        if kind in (mat.MARSCHNER, mat.MARSCHNER_PURE):
            row["aux_id"] = len(self.hair_aux)
            self.hair_aux.append((row.get("sigma_a", (0.5, 0.5, 0.5)),
                                  row.get("beta_r", 0.1),
                                  row.get("eta", 1.55)))
        if kind == mat.CLOTH:
            # irawan woven cloth: weave pattern rides a side table
            # (ClothTable); pattern scalars ride the row (see bsdf/cloth.py)
            wp = row.pop("weave")
            ru = row.pop("repeat_u", 1.0)
            rv = row.pop("repeat_v", 1.0)
            row["aux_id"] = len(self.cloth)
            self.cloth.append((wp, ru, rv))
            row["transmit"] = (wp.alpha, wp.beta, wp.ss)
            row["k"] = (wp.h_width, 0.0, 0.0)
            kds = np.mean([y["kd"] for y in wp.yarns], axis=0)
            kss = np.mean([y["ks"] for y in wp.yarns], axis=0)
            row.setdefault("diffuse", tuple(kds))
            row.setdefault("specular", tuple(kss))
        # luminance-based lobe weights (reference: configure() of each BSDF)
        lum = np.array([0.212671, 0.715160, 0.072169])
        d = float(np.dot(np.asarray(row.get("diffuse", (0.5,) * 3)), lum))
        s = float(np.dot(np.asarray(row.get("specular", (1.0,) * 3)), lum))
        t = float(np.dot(np.asarray(row.get("transmit", (1.0,) * 3)), lum))
        if "spec_weight" not in row:
            if kind == mat.MARSCHNERDIELECTRIC:
                row["spec_weight"] = (s + t) / max(d + s + t, 1e-9)
            else:
                row["spec_weight"] = s / max(d + s, 1e-9)
        self.materials.append(mat.default_material_row(**row))
        if is_curv:
            self.curvature_mats.add(len(self.materials) - 1)
        return len(self.materials) - 1

    def add_checkerboard(self, color0, color1, uscale=1.0, vscale=1.0,
                         uoffset=0.0, voffset=0.0) -> int:
        self.checkers.append((0, color0, color1, (uscale, vscale),
                              (uoffset, voffset), None))
        return len(self.checkers) - 1

    def add_gridtexture(self, color0, color1, line_width=0.01, uscale=1.0,
                        vscale=1.0, uoffset=0.0, voffset=0.0) -> int:
        """reference: src/textures/gridtexture.cpp"""
        self.checkers.append((2, color0, color1, (uscale, vscale),
                              (uoffset, voffset), None, line_width))
        return len(self.checkers) - 1

    def add_wireframe_texture(self, color0=(0.1,) * 3, color1=(0.6,) * 3,
                              line_width=0.05) -> int:
        """reference: src/textures/wireframe.cpp (edge distance in
        barycentric units here — resolution-independent)"""
        self.checkers.append((3, color0, color1, (1.0, 1.0), (0.0, 0.0),
                              None, line_width))
        return len(self.checkers) - 1

    def add_vertexcolor_texture(self) -> int:
        """reference: src/textures/vertexcolors.cpp"""
        self.checkers.append((4, (1, 1, 1), (1, 1, 1), (1.0, 1.0),
                              (0.0, 0.0), None))
        return len(self.checkers) - 1

    def add_bitmap_texture(self, image, uscale=1.0, vscale=1.0,
                           uoffset=0.0, voffset=0.0, res=256) -> int:
        """image: [H, W, 3] linear float; resampled to res x res."""
        img = np.asarray(image, np.float32)
        ys = (np.arange(res) + 0.5) / res * img.shape[0]
        xs = (np.arange(res) + 0.5) / res * img.shape[1]
        img_r = img[np.clip(ys.astype(int), 0, img.shape[0] - 1)][
            :, np.clip(xs.astype(int), 0, img.shape[1] - 1)]
        self.checkers.append((1, (0, 0, 0), (0, 0, 0), (uscale, vscale),
                              (uoffset, voffset), img_r))
        return len(self.checkers) - 1

    # -- geometry ----------------------------------------------------------

    def add_mesh(self, mesh: shp.Mesh, mat_id: int, to_world=None,
                 radiance=None, motion=None):
        if motion is not None:
            # world-space relative motion T(t1)·T(t0)⁻¹ for this object
            self.mesh_motion[len(self.tri_meshes)] = \
                np.asarray(motion, np.float32)
        if to_world is not None:
            mesh = shp.transform_mesh(mesh, to_world)
        emitter_id = -1
        if radiance is not None:
            emitter_id = len(self.area_lights)
            self.area_lights.append(np.asarray(radiance, np.float32))
        mesh = self._curvature_fixup(mesh, mat_id)
        self.tri_meshes.append((mesh, mat_id, emitter_id))

    def _curvature_fixup(self, mesh: "shp.Mesh", mat_id: int) -> "shp.Mesh":
        """Bake the curvature texture's vertex colors (|K|
        tanh-compressed; negative K red, positive green). Shared by
        add_mesh and the motion-blur rebuild hook so per-wave re-lerped
        morph meshes keep the same pytree structure/shading as the
        build-time mesh (ADVICE r3)."""
        if mat_id in getattr(self, "curvature_mats", set()) \
                and mesh.colors is None:
            k = shp.vertex_gaussian_curvature(mesh)
            v = np.tanh(np.abs(k) * self.curvature_scale)
            cols = np.zeros((len(k), 3), np.float32)
            cols[:, 0] = np.where(k < 0, v, 0.0)
            cols[:, 1] = np.where(k >= 0, v, 0.0)
            mesh = mesh._replace(colors=cols)
        return mesh

    def add_morph_mesh(self, m0: shp.Mesh, m1: shp.Mesh, mat_id: int,
                       to_world=None, radiance=None, time: float = 0.0):
        """Keyframe-morph mesh (reference: src/shapes/deformable.cpp —
        vertices lerped at the intersection's ray time). The scene is
        built at `time`; under an open shutter the rebuild_geo hook
        re-lerps the WORLD-space keyframe pair at each wave's stratified
        shutter time, hairpt's per-ray-time equivalent (render() stratifies
        time over sample indices; see integrators/path.render)."""
        k = len(self.tri_meshes)
        self.add_mesh(shp.lerp_mesh(m0, m1, float(np.clip(time, 0, 1))),
                      mat_id, to_world=to_world, radiance=radiance)
        w0 = shp.transform_mesh(m0, to_world) if to_world is not None \
            else m0
        w1 = shp.transform_mesh(m1, to_world) if to_world is not None \
            else m1
        self.morph_meshes[k] = (w0, w1)

    def add_fibers(self, fs: hairgen.FiberSet, mat_id: int):
        self.fibers.append((fs, mat_id))

    def add_prototype(self, mesh: shp.Mesh, mat_id: int) -> int:
        """Register a shared object-space prototype (shapegroup child,
        reference: src/shapes/shapegroup.cpp). Returns its index."""
        self.protos.append((mesh, mat_id))
        return len(self.protos) - 1

    def add_instance(self, proto_idx: int, to_world, anim=None):
        """Instance a prototype (reference: src/shapes/instance.cpp) —
        geometry is SHARED through a two-level BVH, not flattened.
        anim: optional AnimatedTransform of to_world; under motion blur
        the instance table is re-posed per shutter time (transforms are
        traced leaves — no geometry/BVH rebuild, one jit for all times)."""
        self.instances.append((proto_idx,
                               np.asarray(to_world, np.float64)))
        if anim is not None:
            self.instance_anims[len(self.instances) - 1] = anim

    def add_medium(self, sigma_s, sigma_a, g=0.0) -> int:
        """Register a shape-boundable homogeneous medium; returns its
        1-based id (0 = vacuum) for add_mesh-era mesh_media entries."""
        self.media_rows.append(dict(sigma_s=sigma_s, sigma_a=sigma_a, g=g))
        return len(self.media_rows)

    # -- finalize ----------------------------------------------------------

    def build(self, camera: Camera, film: Film, **config_kwargs) -> Scene:
        # hair scenes on TPU default to the tile-routed Pallas
        # intersector (the north-star fast path); CPU keeps the packed
        # BVH (the tiled kernel would run in interpret mode). Explicit
        # traversal kwargs always win.
        if "traversal" not in config_kwargs and self.fibers:
            import jax
            if jax.default_backend() in ("tpu", "axon"):
                config_kwargs["traversal"] = "tiled"
                config_kwargs.setdefault("tiled_q", 2048)
        cfg = RenderConfig(width=film.width, height=film.height,
                           **config_kwargs)

        # wrapper materials (mixture/mask/coating) support ONE level of
        # nesting — a nested wrapper would silently shade black, so fail
        # loudly here instead
        for i, r in enumerate(self.materials):
            if r["kind"] in mat.WRAPPER_KINDS:
                refs = (r["mix_a"], r["mix_b"]) if r["kind"] == mat.MIXTURE \
                    else (r["mix_a"],)
                for ref in refs:
                    if self.materials[ref]["kind"] in mat.WRAPPER_KINDS \
                            and ref != i:
                        raise ValueError(
                            f"material {i}: wrapper materials (mixture/"
                            f"mask/coating) cannot nest another wrapper "
                            f"(row {ref}); flatten the hierarchy")

        # triangles
        tri = tri_shading = tri_bvh = tri_packed = None
        tri_obj_sorted = None
        tri_med_sorted = None
        if self.tri_meshes:
            v0l, v1l, v2l, n0l, n1l, n2l = [], [], [], [], [], []
            uv0l, uv1l, uv2l, midl, eidl = [], [], [], [], []
            vc0l, vc1l, vc2l = [], [], []
            for mesh, mid, eid in self.tri_meshes:
                f = mesh.faces
                p = mesh.positions
                v0, v1, v2 = p[f[:, 0]], p[f[:, 1]], p[f[:, 2]]
                v0l.append(v0); v1l.append(v1); v2l.append(v2)
                if mesh.normals is not None:
                    nn = mesh.normals
                    n0l.append(nn[f[:, 0]]); n1l.append(nn[f[:, 1]])
                    n2l.append(nn[f[:, 2]])
                else:
                    gn = np.cross(v1 - v0, v2 - v0)
                    gn /= np.maximum(np.linalg.norm(gn, axis=-1,
                                                    keepdims=True), 1e-20)
                    n0l.append(gn); n1l.append(gn); n2l.append(gn)
                if mesh.uvs is not None:
                    uv = mesh.uvs
                    uv0l.append(uv[f[:, 0]]); uv1l.append(uv[f[:, 1]])
                    uv2l.append(uv[f[:, 2]])
                else:
                    z = np.zeros((len(f), 2))
                    uv0l.append(z); uv1l.append(z); uv2l.append(z)
                midl.append(np.full(len(f), mid, np.int32))
                eidl.append(np.full(len(f), eid, np.int32))
                if mesh.colors is not None:
                    cc = mesh.colors
                    vc0l.append(cc[f[:, 0]]); vc1l.append(cc[f[:, 1]])
                    vc2l.append(cc[f[:, 2]])
                else:
                    one = np.ones((len(f), 3), np.float32)
                    vc0l.append(one); vc1l.append(one); vc2l.append(one)
            v0 = np.concatenate(v0l); v1 = np.concatenate(v1l)
            v2 = np.concatenate(v2l)
            fb = bvh_mod.build(np.minimum(np.minimum(v0, v1), v2),
                               np.maximum(np.maximum(v0, v1), v2))
            o = fb.prim_order
            tri = isec.TriGeom(p0=jnp.asarray(v0[o], jnp.float32),
                               e1=jnp.asarray((v1 - v0)[o], jnp.float32),
                               e2=jnp.asarray((v2 - v0)[o], jnp.float32))
            tri_rows = ipk.tri_pack_rows(v0[o].astype(np.float32),
                                         v1[o].astype(np.float32),
                                         v2[o].astype(np.float32),
                                         np.arange(len(o), dtype=np.int32))
            tri_packed = ipk.pack_bvh(fb, tri_rows)
            cat = np.concatenate
            tri_shading = TriShading(
                n0=jnp.asarray(cat(n0l)[o], jnp.float32),
                n1=jnp.asarray(cat(n1l)[o], jnp.float32),
                n2=jnp.asarray(cat(n2l)[o], jnp.float32),
                uv0=jnp.asarray(cat(uv0l)[o], jnp.float32),
                uv1=jnp.asarray(cat(uv1l)[o], jnp.float32),
                uv2=jnp.asarray(cat(uv2l)[o], jnp.float32),
                mat_id=jnp.asarray(cat(midl)[o]),
                emitter_id=jnp.asarray(cat(eidl)[o]),
                uv_density=jnp.asarray(_uv_density(
                    cat(uv0l)[o], cat(uv1l)[o], cat(uv2l)[o],
                    (v1 - v0)[o], (v2 - v0)[o]), jnp.float32),
                vc0=jnp.asarray(cat(vc0l)[o], jnp.float32),
                vc1=jnp.asarray(cat(vc1l)[o], jnp.float32),
                vc2=jnp.asarray(cat(vc2l)[o], jnp.float32))
            tri_bvh = isec.bvh_to_device(fb)
            if self.mesh_motion or self.camera1 is not None:
                obj = np.concatenate(
                    [np.full(len(mesh.faces), k, np.int32)
                     for k, (mesh, _, _) in enumerate(self.tri_meshes)])
                tri_obj_sorted = obj[o]
            if self.mesh_media:
                tm = np.concatenate(
                    [np.tile(np.asarray(self.mesh_media.get(k, (0, 0)),
                                        np.int32), (len(mesh.faces), 1))
                     for k, (mesh, _, _) in enumerate(self.tri_meshes)])
                tri_med_sorted = tm[o]

        # hair segments
        hair = hair_mat_id = hair_bvh = hair_packed = hair_swept = None
        if self.fibers:
            segs = [hairgen.segments(fs) for fs, _ in self.fibers]
            p0 = np.concatenate([s["p0"] for s in segs])
            p1 = np.concatenate([s["p1"] for s in segs])
            n0 = np.concatenate([s["n0"] for s in segs])
            n1 = np.concatenate([s["n1"] for s in segs])
            rad = np.concatenate([s["radius"] for s in segs])
            mid = np.concatenate([np.full(len(s["p0"]), m, np.int32)
                                  for s, (_, m) in zip(segs, self.fibers)])
            # conservative AABBs: expand by radius / steepest miter angle
            # (reference: HairKDTree::getAABB, hair.cpp:445-464)
            tang = p1 - p0
            tang = tang / np.maximum(np.linalg.norm(tang, axis=-1,
                                                    keepdims=True), 1e-20)
            c0 = np.abs(np.sum(n0 * tang, -1))
            c1 = np.abs(np.sum(n1 * tang, -1))
            expand = rad / np.maximum(np.minimum(c0, c1), 0.3)
            lo = np.minimum(p0, p1) - expand[:, None]
            hi = np.maximum(p0, p1) + expand[:, None]
            fb = bvh_mod.build(lo, hi)
            o = fb.prim_order
            hair = isec.HairGeom(p0=jnp.asarray(p0[o]),
                                 p1=jnp.asarray(p1[o]),
                                 n0=jnp.asarray(n0[o]),
                                 n1=jnp.asarray(n1[o]),
                                 radius=jnp.asarray(rad[o]))
            hair_mat_id = jnp.asarray(mid[o])
            hair_bvh = isec.bvh_to_device(fb)
            hair_rows = ipk.hair_pack_rows(p0[o], p1[o], n0[o], n1[o],
                                           rad[o],
                                           np.arange(len(o), dtype=np.int32))
            hair_packed = ipk.pack_bvh(fb, hair_rows)
            # cluster-sweep structure over the *sorted* arrays so returned
            # prim ids index arr.hair directly
            hair_swept = iswept.build_swept_hair(p0[o], p1[o], n0[o], n1[o],
                                                 rad[o], K=cfg.swept_k)
            # short-ray-first clamp (intersect_tiled short_t) stays
            # OPT-IN: measured ~4% slower than plain q=2048 on the
            # furball e2e wave — escaping rays are common enough in fur
            # that the compacted long-ray pass dominates anyway. A
            # positive tiled_short enables it; <0 disables explicitly.
            short = cfg.tiled_short
            if short == 0.0:
                short = -1.0
            cfg = dataclasses.replace(
                cfg, swept_c=int(hair_swept.seg_rows.shape[0]) // cfg.swept_k,
                tiled_short=short)

        cloth_table = None
        if self.cloth:
            from ..models.bsdf import cloth as cloth_bsdf
            cloth_table = cloth_bsdf.pack_cloth(
                [c[0] for c in self.cloth],
                [(c[1], c[2]) for c in self.cloth])
        materials = mat.pack_materials(self.materials or
                                       [mat.default_material_row()],
                                       cloth=cloth_table)
        checkers = None
        if self.checkers:
            res = max([c[5].shape[0] for c in self.checkers
                       if c[5] is not None], default=4)
            bitmaps = np.zeros((len(self.checkers), res, res, 3),
                               np.float32)
            for i, c in enumerate(self.checkers):
                if c[5] is not None:
                    bitmaps[i] = c[5]
            checkers = mat.CheckerboardTable(
                kind=jnp.asarray([c[0] for c in self.checkers], jnp.int32),
                color0=jnp.asarray([c[1] for c in self.checkers],
                                   jnp.float32),
                color1=jnp.asarray([c[2] for c in self.checkers],
                                   jnp.float32),
                uv_scale=jnp.asarray([c[3] for c in self.checkers],
                                     jnp.float32),
                uv_offset=jnp.asarray([c[4] for c in self.checkers],
                                      jnp.float32),
                bitmaps=jnp.asarray(bitmaps),
                aux=jnp.asarray([(c[6] if len(c) > 6 else 0.01)
                                 for c in self.checkers], jnp.float32),
                mips=jnp.asarray(_build_mips(bitmaps)))

        hair_tables = None
        if self.hair_aux:
            vals, ws, lws = [], [], []
            for sigma_a, beta_r, eta in self.hair_aux:
                v = hair_bsdf.precompute_azimuthal(
                    jnp.asarray(sigma_a, jnp.float32), beta_r, eta)
                w, lw = hair_bsdf.azimuthal_sampling_tables(v)
                vals.append(v); ws.append(w); lws.append(lw)
            stacked = jnp.stack(vals)
            hair_tables = mat.HairTables(
                values=stacked, weights=jnp.stack(ws),
                lobe_weight=jnp.stack(lws),
                values_quad=hair_bsdf.quad_pack(stacked))

        # area lights: collect emissive triangles (post-sort indices)
        area = None
        if self.area_lights and tri_shading is not None:
            eid = np.asarray(tri_shading.emitter_id)
            sel = np.nonzero(eid >= 0)[0]
            p0 = np.asarray(tri.p0)[sel]
            e1 = np.asarray(tri.e1)[sel]
            e2 = np.asarray(tri.e2)[sel]
            nrm = np.cross(e1, e2)
            area_sz = 0.5 * np.linalg.norm(nrm, axis=-1)
            nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=-1,
                                                  keepdims=True), 1e-20)
            rad = np.stack([self.area_lights[e] for e in eid[sel]])
            power = area_sz * (rad @ np.array([0.212671, 0.715160, 0.072169]))
            cdf = np.cumsum(power + 1e-12)
            cdf /= cdf[-1]
            area = em.AreaLights(p0=jnp.asarray(p0), e1=jnp.asarray(e1),
                                 e2=jnp.asarray(e2), n=jnp.asarray(nrm),
                                 radiance=jnp.asarray(rad, jnp.float32),
                                 area=jnp.asarray(area_sz, jnp.float32),
                                 cdf=jnp.asarray(cdf, jnp.float32),
                                 tri_index=jnp.asarray(sel.astype(np.int32)))

        delta = em.make_delta_lights(self.delta_lights) \
            if self.delta_lights else None

        # static NEE source selection probabilities (equal among present)
        present = [self.env is not None, area is not None, delta is not None]
        n_src = max(sum(present), 1)
        probs = tuple((1.0 / n_src) if p else 0.0 for p in present)
        cfg = dataclasses.replace(cfg, nee_probs=probs)

        media_table = None
        if self.media_rows and tri_med_sorted is not None:
            from ..models import media as med_mod
            media_table = med_mod.make_medium_table(self.media_rows)

        inst_geo = None
        repose_inst = None
        if self.instances:
            from ..ops import instancing as inst_mod
            built = [inst_mod.build_proto(m_, mid_)
                     for m_, mid_ in self.protos]
            inst_geo = inst_mod.build_instanced(built, self.instances)
            if self.instance_anims:
                # animated instances: per-shutter-time transform re-pose
                # INSIDE the traversal tables (no geometry rebuild)
                base = list(self.instances)
                anims = dict(self.instance_anims)

                def repose_inst(arrays, t, _base=base, _anims=anims,
                                _mod=inst_mod):
                    insts = list(_base)
                    for k, an in _anims.items():
                        insts[k] = (insts[k][0], an.eval(float(t)))
                    return arrays._replace(
                        inst=_mod.repose_instanced(arrays.inst, insts))

        arrays = SceneArrays(tri=tri, tri_shading=tri_shading,
                             tri_bvh=tri_bvh, tri_packed=tri_packed,
                             hair=hair,
                             hair_mat_id=hair_mat_id, hair_bvh=hair_bvh,
                             hair_packed=hair_packed, hair_swept=hair_swept,
                             materials=materials, checkers=checkers,
                             hair_tables=hair_tables, env=self.env,
                             area=area, delta=delta,
                             tri_med=(jnp.asarray(tri_med_sorted)
                                      if tri_med_sorted is not None
                                      else None),
                             media=media_table,
                             inst=inst_geo)
        active = tuple(sorted({int(r["kind"]) for r in self.materials}))
        marschner_rows = tuple(
            i for i, r in enumerate(self.materials)
            if r["kind"] in (mat.MARSCHNER, mat.MARSCHNER_PURE))
        # motion blur: a host-side geometry re-pose for an arbitrary
        # shutter time. Meshes are stored in shutter-open world space, so
        # time t applies the relative rigid motion T(t)·T(open)⁻¹; the
        # rebuilt arrays have identical shapes, letting one jitted wave
        # serve every shutter time (reference counterpart: per-ray
        # AnimatedTransform evaluation during traversal, trimesh/instance
        # animation — here time is stratified per sample index instead).
        rebuild = None
        if self.animated_meshes or self.morph_meshes:
            cam_b, film_b = camera, film
            kwargs_b = dict(config_kwargs)
            t_open = float(self.shutter[0])

            def rebuild(t, _b=self):
                import copy
                b2 = copy.copy(_b)
                b2.tri_meshes = list(_b.tri_meshes)
                b2.animated_meshes = {}
                b2.mesh_motion = {}
                b2.morph_meshes = {}
                b2.camera1 = None
                # deformable keyframe morph at this shutter time
                # (deformable.cpp per-ray-time vertex lerp; identical
                # shapes ⇒ one jitted wave serves every time)
                for k, (w0, w1) in _b.morph_meshes.items():
                    _, mid, eid = _b.tri_meshes[k]
                    lerped = shp.lerp_mesh(w0, w1,
                                           float(np.clip(t, 0.0, 1.0)))
                    # same post-processing as add_mesh (curvature
                    # vertex-color bake) — a re-lerped morph mesh must
                    # keep the build-time pytree structure (ADVICE r3)
                    b2.tri_meshes[k] = (_b._curvature_fixup(lerped, mid),
                                        mid, eid)
                for k, anim in _b.animated_meshes.items():
                    rel = (anim.eval(float(t))
                           @ np.linalg.inv(anim.eval(t_open)))
                    mesh0, mid, eid = b2.tri_meshes[k]
                    b2.tri_meshes[k] = (shp.transform_mesh(mesh0, rel),
                                        mid, eid)
                return b2.build(cam_b, film_b, **kwargs_b).arrays

        motion = None
        if self.mesh_motion or self.camera1 is not None:
            n_obj = max(len(self.tri_meshes), 1)
            obj_m = np.tile(np.eye(4, dtype=np.float32), (n_obj, 1, 1))
            for k, m4 in self.mesh_motion.items():
                obj_m[k] = m4
            motion = MotionTables(
                tri_obj=(jnp.asarray(tri_obj_sorted)
                         if tri_obj_sorted is not None else None),
                obj_m=jnp.asarray(obj_m, jnp.float32),
                cam1=self.camera1 if self.camera1 is not None else camera)

        return Scene(arrays=arrays, camera=camera, film=film, config=cfg,
                     active_kinds=active, marschner_rows=marschner_rows,
                     has_normal_maps=any(
                         int(r.get("nrm_tex_id", -1)) >= 0
                         for r in self.materials),
                     medium=getattr(self, "medium", None),
                     motion=motion, rebuild_geo=rebuild,
                     shutter=tuple(self.shutter),
                     camera_anim=getattr(self, "camera_anim", None),
                     repose_inst=repose_inst)
