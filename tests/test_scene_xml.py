"""Load + render each reference scene XML at tiny size (integration)."""
import os

import numpy as np
import pytest

from hairpt.scene.xml_loader import load_scene
from hairpt.integrators import path as path_int

REF = "/root/reference/models"

SCENES = [
    ("teapot/scene.xml", {}),
    ("straight-hair/scene_kkay.xml", {}),
    ("straight-hair/scene_marschner.xml", {}),
    ("furball/scene.xml", {}),
    ("hair-curl/scene.xml", {}),
    ("curly-hair/scene.xml", {}),
]


@pytest.mark.parametrize("rel,defines", SCENES)
@pytest.mark.slow
def test_reference_scene_renders(rel, defines):
    path = os.path.join(REF, rel)
    if not os.path.exists(path):
        pytest.skip("reference scene missing")
    scene = load_scene(path, defines, spp_override=2, res_scale=0.03125,
                       hair_quality=0.02, max_depth_override=4)
    assert scene.camera is not None
    img = np.asarray(path_int.render(scene))
    assert np.isfinite(img).all(), rel
    assert img.mean() > 1e-4, (rel, img.mean())  # not black
    assert img.shape[0] >= 8 and img.shape[2] == 3


@pytest.mark.slow
def test_determinism_same_seed():
    """Stateless sampling: two renders of the same scene are bit-identical."""
    path = os.path.join(REF, "straight-hair/scene_kkay.xml")
    if not os.path.exists(path):
        pytest.skip("reference scene missing")
    scene = load_scene(path, spp_override=2, res_scale=0.02,
                       hair_quality=0.01, max_depth_override=3)
    a = np.asarray(path_int.render(scene))
    b = np.asarray(path_int.render(scene))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_instancing_and_serialized(tmp_path):
    import io, zlib
    from hairpt.models import shapes as shp
    # write a .serialized sphere and reference it via instancing
    mesh = shp.sphere(0.5, 6, 12)
    body = bytearray()
    body += np.uint32(0x0001 | 0x1000).tobytes()
    body += np.uint64(len(mesh.positions)).tobytes()
    body += np.uint64(len(mesh.faces)).tobytes()
    body += mesh.positions.astype("<f4").tobytes()
    body += mesh.normals.astype("<f4").tobytes()
    body += mesh.faces.astype("<u4").tobytes()
    ser = tmp_path / "ball.serialized"
    ser.write_bytes(np.uint16(0x041C).tobytes() + np.uint16(3).tobytes()
                    + zlib.compress(bytes(body)))
    xml = f'''<scene version="0.6.0">
    <integrator type="path"><integer name="maxDepth" value="2"/></integrator>
    <sensor type="perspective"><float name="fov" value="45"/>
     <transform name="toWorld">
       <lookat origin="0, 0, -5" target="0, 0, 0" up="0, 1, 0"/>
     </transform>
     <sampler type="halton"><integer name="sampleCount" value="2"/></sampler>
     <film type="ldrfilm"><integer name="width" value="12"/>
       <integer name="height" value="12"/><rfilter type="box"/></film>
    </sensor>
    <bsdf type="conductor" id="gold"><string name="material" value="Au"/></bsdf>
    <shape type="shapegroup" id="grp">
      <shape type="serialized">
        <string name="filename" value="{ser}"/><ref id="gold"/>
      </shape>
    </shape>
    <shape type="instance"><ref id="grp"/>
      <transform name="toWorld"><translate x="-0.8"/></transform></shape>
    <shape type="instance"><ref id="grp"/>
      <transform name="toWorld"><translate x="0.8"/></transform></shape>
    <emitter type="constant"><rgb name="radiance" value="1.0"/></emitter>
    </scene>'''
    scene_path = tmp_path / "scene.xml"
    scene_path.write_text(xml)
    scene = load_scene(str(scene_path))
    img = np.asarray(path_int.render(scene, spp=2))
    assert np.isfinite(img).all()
    # gold spheres tint the center pixels
    assert img[6, 3, 0] != img[6, 3, 2] or img[6, 9, 0] != img[6, 9, 2]


def test_xml_validation_accepts_reference_scenes():
    """Every parseable reference scene XML passes structural validation
    (parity: they all load under the reference's XSD)."""
    import glob
    import xml.etree.ElementTree as ET
    from hairpt.scene.xml_validate import validate
    n = 0
    for f in sorted(glob.glob("/root/reference/models/*/*.xml")):
        try:
            root = ET.parse(f).getroot()
        except ET.ParseError:
            continue   # scene_dielectric2.xml is malformed upstream
        validate(root, f)
        n += 1
    assert n >= 10


def test_xml_validation_rejects_malformed_early():
    """Structural problems raise ONE SceneXMLError listing all of them
    (reference: XSD + PluginManager errors before any build work)."""
    import xml.etree.ElementTree as ET
    import pytest
    from hairpt.scene.xml_validate import validate, SceneXMLError

    bad = ET.fromstring("""
    <scene version="0.5.0">
      <integrator type="warpfield"/>
      <sensor type="perspective">
        <float name="fov"/>
        <rgb name="tint" value="0.1, 0.2"/>
      </sensor>
      <film type="hdrfilm"/>
      <bsdf type="nosuchbsdf" id="m"/>
      <shape type="sphere"><ref/></shape>
      <frobnicate/>
    </scene>""")
    with pytest.raises(SceneXMLError) as exc:
        validate(bad)
    msgs = "\n".join(exc.value.errors)
    assert "unknown integrator type 'warpfield'" in msgs
    assert "missing required attribute 'value'" in msgs
    assert "needs 1 or 3 components" in msgs
    assert "<film> not allowed under <scene>" in msgs
    assert "unknown bsdf type 'nosuchbsdf'" in msgs
    assert "<ref> missing required attribute 'id'" in msgs
    # unknown elements are a WARNING, not an error (vendor/extension
    # tags the loader ignores must not break scene loading, ADVICE r3)
    assert "frobnicate" not in msgs
    assert len(exc.value.errors) >= 6

    # missing version attribute
    with pytest.raises(SceneXMLError):
        validate(ET.fromstring("<scene><shape type='sphere'/></scene>"))

    # $var placeholders are structural wildcards (resolved at load time)
    ok = ET.fromstring("""
    <scene version="0.5.0">
      <integrator type="$kind"><integer name="maxDepth" value="$d"/>
      </integrator>
    </scene>""")
    validate(ok)


def test_load_scene_validates_by_default(tmp_path):
    import pytest
    from hairpt.scene.xml_loader import load_scene
    from hairpt.scene.xml_validate import SceneXMLError
    p = tmp_path / "bad.xml"
    p.write_text("<scene version='0.5.0'><bsdf type='nope'/></scene>")
    with pytest.raises(SceneXMLError):
        load_scene(str(p))
