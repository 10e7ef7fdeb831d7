"""Parser tests: grammar, defaults, LIFO reversal, padding (cpu/parser.c,
cpu/parse_obj.c semantics)."""

import numpy as np
import pytest

from raytracing_gpu_tpu.models.parser import SvatiParseError, parse_scene, parse_scene_text
from raytracing_gpu_tpu.models.scene import AMBIENT, DIRECTIONAL, POINT

from oracle import oracle_available, scene_path

MINI = """
# a comment line that should be skipped entirely
camera 16 8 0.0 0.0 -4.0 1.0 0.0 0.0 0.0 -1.0 0.0 90.0
a_light 0.65 0.65 0.65
d_light 1.0 1.0 1.0 0.5 -1.0 1.0
p_light 0.5 0.5 0.5 1.0 2.0 3.0
object 3
Ns 96.078431
Kd 0.8 0.0 0.0
Ka 0.8 0.0 0.0
Ks 0.1 0.2 0.3
Nr 0.5
v 1.0 2.0 0.0
v -1.0 -1.0 0.0
v 1.0 -1.0 0.0
vn 0.0 0.0 -1.0
vn 0.0 0.0 -0.5
vn 0.0 0.0 -0.25
"""


def test_mini_scene():
    s = parse_scene_text(MINI, pad_triangles=8, pad_objects=4)
    assert s.camera.width == 16 and s.camera.height == 8
    np.testing.assert_allclose(s.camera.position, [0, 0, -4])
    assert s.camera.fov == np.float32(90)
    assert s.lights.kind == (AMBIENT, DIRECTIONAL, POINT)
    np.testing.assert_allclose(s.lights.rgb[1], [1, 1, 1])
    np.testing.assert_allclose(s.lights.v[2], [1, 2, 3])
    assert s.n_triangles == 1 and s.n_objects == 1
    g = s.geometry
    assert g.vertices.shape == (8, 3, 3)
    assert g.valid.sum() == 1
    # LIFO reversal (cpu/parse_obj.c:82-88): file (v1,v2,v3) -> stored (v3,v2,v1)
    np.testing.assert_allclose(g.vertices[0, 0], [1.0, -1.0, 0.0])
    np.testing.assert_allclose(g.vertices[0, 1], [-1.0, -1.0, 0.0])
    np.testing.assert_allclose(g.vertices[0, 2], [1.0, 2.0, 0.0])
    np.testing.assert_allclose(g.normals[0, 0], [0.0, 0.0, -0.25])
    m = s.materials
    np.testing.assert_allclose(m.kd[0], [0.8, 0, 0])
    np.testing.assert_allclose(m.ks[0], [0.1, 0.2, 0.3])
    assert m.ns[0] == np.float32(96.078431)
    assert m.nr[0] == np.float32(0.5)
    # defaults (cpu/parse_obj.c:3-20)
    assert m.ni[0] == 1.0 and m.d[0] == 1.0
    # padded material rows keep defaults
    assert m.ni[3] == 1.0 and m.nr[3] == 0.0


def test_material_defaults_and_multi_object():
    text = """camera 4 4 0 0 -1 1 0 0 0 -1 0 90
object 3
v 0 0 0
v 1 0 0
v 0 1 0
vn 0 0 1
vn 0 0 1
vn 0 0 1
object 6
Kd 0.5 0.5 0.5
v 0 0 0
v 1 0 0
v 0 1 0
v 0 0 1
v 1 0 1
v 0 1 1
vn 0 0 1
vn 0 0 1
vn 0 0 1
vn 0 0 1
vn 0 0 1
vn 0 0 1
"""
    s = parse_scene_text(text, pad_triangles=4, pad_objects=2)
    assert s.n_objects == 2 and s.n_triangles == 3
    assert s.geometry.tri_obj[0] == 0
    assert s.geometry.tri_obj[1] == 1 and s.geometry.tri_obj[2] == 1
    # second object's triangles reversed: file tris (v1v2v3),(v4v5v6) ->
    # stored ((v6,v5,v4),(v3,v2,v1))
    np.testing.assert_allclose(s.geometry.vertices[1, 0], [0, 1, 1])
    assert np.all(s.materials.kd[0] == 0) and np.all(s.materials.kd[1] == 0.5)


def test_unknown_keyword_raises():
    with pytest.raises(SvatiParseError):
        parse_scene_text("camera 4 4 0 0 -1 1 0 0 0 -1 0 90\nbogus 1 2 3")


def test_comment_to_eol():
    text = "# camera 9 9 junk junk\ncamera 4 4 0 0 -1 1 0 0 0 -1 0 90\n"
    s = parse_scene_text(text)
    assert s.camera.width == 4


@pytest.mark.skipif(not oracle_available(), reason="reference not mounted")
def test_parse_full_corpus():
    """Every corpus scene parses with plausible counts (SURVEY §4 census)."""
    expected = {
        "triangle": (1, 1, 2),
        "cube": (4, 12, 2),
        "spheres": (4, 4812, 6),
        "island_smooth": (50, None, None),
        "susan": (4, None, None),
    }
    for name, (n_obj, n_tri, n_lights) in expected.items():
        s = parse_scene(scene_path(name), native="never")
        assert s.n_objects == n_obj, name
        if n_tri is not None:
            assert s.n_triangles == n_tri, name
        if n_lights is not None:
            assert s.lights.count == n_lights, name
