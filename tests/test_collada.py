"""COLLADA import (scene/collada.py — mtsimport parity,
reference src/converter/collada.cpp): geometry sources, polylist
triangulation, node transform stacks, Z_UP/unit normalization, material
diffuse binding, and the convert→XML→render round trip."""
import os

import numpy as np

from hairpt.scene.collada import load_collada, convert

DAE = """<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema"
         version="1.4.1">
  <asset><unit meter="0.01"/><up_axis>Z_UP</up_axis></asset>
  <library_effects>
    <effect id="red-fx"><profile_COMMON><technique sid="common">
      <lambert><diffuse><color>0.8 0.1 0.2 1</color></diffuse></lambert>
    </technique></profile_COMMON></effect>
  </library_effects>
  <library_materials>
    <material id="red-mat" name="red">
      <instance_effect url="#red-fx"/>
    </material>
  </library_materials>
  <library_geometries>
    <geometry id="quad-geo" name="quad">
      <mesh>
        <source id="quad-pos">
          <float_array id="quad-pos-arr" count="12">
            0 0 0  1 0 0  1 1 0  0 1 0</float_array>
          <technique_common>
            <accessor source="#quad-pos-arr" count="4" stride="3">
              <param name="X" type="float"/><param name="Y" type="float"/>
              <param name="Z" type="float"/>
            </accessor>
          </technique_common>
        </source>
        <source id="quad-nrm">
          <float_array id="quad-nrm-arr" count="3">0 0 1</float_array>
          <technique_common>
            <accessor source="#quad-nrm-arr" count="1" stride="3"/>
          </technique_common>
        </source>
        <vertices id="quad-vtx">
          <input semantic="POSITION" source="#quad-pos"/>
        </vertices>
        <polylist material="red" count="1">
          <input semantic="VERTEX" source="#quad-vtx" offset="0"/>
          <input semantic="NORMAL" source="#quad-nrm" offset="1"/>
          <vcount>4</vcount>
          <p>0 0 1 0 2 0 3 0</p>
        </polylist>
      </mesh>
    </geometry>
  </library_geometries>
  <library_visual_scenes>
    <visual_scene id="vscene">
      <node id="n1">
        <translate>100 0 0</translate>
        <node id="n2">
          <scale>2 2 2</scale>
          <instance_geometry url="#quad-geo">
            <bind_material><technique_common>
              <instance_material symbol="red" target="#red-mat"/>
            </technique_common></bind_material>
          </instance_geometry>
        </node>
      </node>
    </visual_scene>
  </library_visual_scenes>
  <scene><instance_visual_scene url="#vscene"/></scene>
</COLLADA>
"""


def _write_dae(tmp_path):
    p = os.path.join(str(tmp_path), "t.dae")
    with open(p, "w") as f:
        f.write(DAE)
    return p


def test_collada_geometry_and_transforms(tmp_path):
    meshes, cams = load_collada(_write_dae(tmp_path))
    assert len(meshes) == 1
    im = meshes[0]
    m = im.mesh
    # polylist quad → 2 triangles, corner-indexed
    assert m.faces.shape == (2, 3)
    assert m.positions.shape[0] == 6
    # transforms: translate(100,0,0) ∘ scale(2) on object coords, then
    # unit 0.01 and Z_UP→Y_UP ((x,y,z) → (x, z, -y)) outermost.
    # object corner (1,1,0) → node (102, 2, 0) → world (1.02, 0, -0.02)
    want = np.array([1.02, 0.0, -0.02])
    d = np.linalg.norm(m.positions - want, axis=-1)
    assert d.min() < 1e-9, m.positions
    # normals: object +z (the Z_UP up axis) maps to world +y, unit length
    n = m.normals
    assert n is not None
    assert np.allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-6)
    assert np.allclose(n[0], [0, 1, 0]), n[0]
    # material binding
    assert im.diffuse is not None
    assert np.allclose(im.diffuse, (0.8, 0.1, 0.2))


def test_collada_convert_renders(tmp_path):
    """convert() output loads through the scene XML loader and renders."""
    dae = _write_dae(tmp_path)
    out_xml = os.path.join(str(tmp_path), "scene.xml")
    convert(dae, out_xml)
    assert os.path.exists(out_xml)
    # the converted XML has no sensor (no camera in the .dae): graft one
    # in front of the imported quad and render a few pixels
    txt = open(out_xml).read()
    sensor = (
        '<sensor type="perspective">'
        '<float name="fov" value="60"/>'
        '<transform name="toWorld">'
        '<lookat origin="1.01, 0.04, -0.01" target="1.01, 0, -0.01" '
        'up="0, 0, 1"/></transform>'
        '<sampler type="independent">'
        '<integer name="sampleCount" value="4"/></sampler>'
        '<film type="hdrfilm"><integer name="width" value="16"/>'
        '<integer name="height" value="16"/>'
        '<rfilter type="box"/></film></sensor>')
    emitter = '<emitter type="constant"><spectrum name="radiance" ' \
              'value="1.0"/></emitter>'
    txt = txt.replace('</scene>', sensor + emitter + '</scene>')
    open(out_xml, 'w').write(txt)

    from hairpt.scene.xml_loader import load_scene
    from hairpt.integrators import path as path_int
    scene = load_scene(out_xml)
    img = np.asarray(path_int.render(scene, spp=4))
    assert np.isfinite(img).all()
    # the red quad must be visible: red channel dominates somewhere
    assert (img[..., 0] > img[..., 2] + 0.05).any()
