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
