"""Statistics registry (reference: include/mitsuba/core/statistics.h
StatsCounter/Statistics::printStats)."""
import numpy as np

from hairpt.utils import stats


def test_stats_kinds_and_format():
    stats.reset()
    stats.record("Geometry", "Rays traced", 1000)
    stats.record("Geometry", "Rays traced", 500)
    stats.record("Geometry", "Shadow hits", 30, 100, kind="percentage")
    stats.record("Geometry", "Depth", 12, 4, kind="average")
    stats.record("Memory", "Segment table", 18.4 * 2 ** 20, kind="memory")
    out = stats.format_stats()
    assert "Rays traced" in out and "1,500" in out
    assert "30 / 100 (30.00 %)" in out
    assert "3.000 avg" in out
    assert "18.40 MiB" in out
    stats.reset()
    assert "no statistics" in stats.format_stats()


def test_render_records_counters():
    from hairpt.film.film import Film
    from hairpt.models import emitters as em
    from hairpt.models.bsdf import registry as mat
    from hairpt.models.sensors import Camera
    from hairpt.core.math import matrix_lookat
    from hairpt.scene.scene import SceneBuilder
    from hairpt.integrators import path as path_int
    from hairpt.models.shapes import rectangle

    stats.reset()
    b = SceneBuilder()
    m = b.add_material(kind=mat.DIFFUSE, diffuse=(0.5, 0.5, 0.5))
    b.add_mesh(rectangle(), m)
    b.env = em.make_constant((1.0, 1.0, 1.0))
    cam = Camera.perspective(matrix_lookat((0, 0, 3), (0, 0, 0), (0, 1, 0)),
                             45.0, 16, 16)
    scene = b.build(cam, Film.make(16, 16, "box"), spp=2, max_depth=3,
                    sampler=1)
    img = np.asarray(path_int.render(scene, spp=2))
    assert np.isfinite(img).all()
    out = stats.format_stats()
    assert "Path tracer" in out
    assert "Rays traced" in out
    assert "Camera samples" in out
    assert "render rate (rays/s)" in out
    stats.reset()
