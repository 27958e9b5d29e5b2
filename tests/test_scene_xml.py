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
