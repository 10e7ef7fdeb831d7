"""Native (C++) component tests: every native path must be bit/byte-identical
to its Python twin across the reference scene corpus."""

import os
import shutil

import numpy as np
import pytest

from raytracing_gpu_tpu.models.parser import (
    SvatiParseError,
    parse_scene,
    parse_scene_text,
)

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)

REF_SCENES = os.path.join(
    os.environ.get("RGT_REFERENCE", "/root/reference"), "tests"
)


def _native():
    from raytracing_gpu_tpu.native import svati

    assert svati.available(), "native build failed"
    return svati


CORPUS = ["triangle", "cube", "dir-light-shadows", "point-light",
          "susan", "susans_smooth", "spheres", "car-on-road",
          "island_smooth", "dark-night", "lighthouse", "sphere-spec"]


@pytest.mark.parametrize("name", CORPUS)
def test_native_parser_matches_python(name):
    path = os.path.join(REF_SCENES, name + ".svati")
    if not os.path.exists(path):
        pytest.skip("reference corpus not mounted")
    sv = _native()
    with open(path) as f:
        py = parse_scene_text(f.read())
    nat = sv.parse_scene_native(path)
    assert nat.camera.width == py.camera.width
    assert nat.camera.height == py.camera.height
    np.testing.assert_array_equal(nat.camera.position, py.camera.position)
    np.testing.assert_array_equal(nat.camera.u, py.camera.u)
    np.testing.assert_array_equal(nat.camera.v, py.camera.v)
    assert nat.camera.fov == py.camera.fov
    assert nat.lights.kind == py.lights.kind
    np.testing.assert_array_equal(nat.lights.rgb, py.lights.rgb)
    np.testing.assert_array_equal(nat.lights.v, py.lights.v)
    assert nat.n_triangles == py.n_triangles
    assert nat.n_objects == py.n_objects
    for field in ("vertices", "normals", "tri_obj", "valid"):
        np.testing.assert_array_equal(
            getattr(nat.geometry, field), getattr(py.geometry, field),
            err_msg=f"{name}.{field}",
        )
    for field in ("ka", "kd", "ks", "ns", "ni", "nr", "d"):
        np.testing.assert_array_equal(
            getattr(nat.materials, field), getattr(py.materials, field),
            err_msg=f"{name}.{field}",
        )


def test_native_parser_error_message(tmp_path):
    sv = _native()
    bad = tmp_path / "bad.svati"
    bad.write_text("camera 4 4 0 0 0 1 0 0 0 1 0 90\nbogus_keyword 1 2 3\n")
    with pytest.raises(SvatiParseError, match="bogus_keyword"):
        sv.parse_scene_native(str(bad))
    # same error from the Python path
    with pytest.raises(SvatiParseError, match="bogus_keyword"):
        parse_scene_text(bad.read_text())


def test_parse_scene_auto_uses_native(tmp_path):
    """parse_scene(native='auto') and native='never' agree."""
    path = os.path.join(REF_SCENES, "cube.svati")
    if not os.path.exists(path):
        pytest.skip("reference corpus not mounted")
    a = parse_scene(path, native="auto")
    b = parse_scene(path, native="never")
    np.testing.assert_array_equal(a.geometry.vertices, b.geometry.vertices)


def test_native_ppm_writer_byte_exact(tmp_path):
    sv = _native()
    rng = np.random.RandomState(0)
    img = (rng.rand(33, 17, 3) * 255.9).astype(np.float32)
    p_native = str(tmp_path / "n.ppm")
    p_python = str(tmp_path / "p.ppm")
    assert sv.write_ppm_native(p_native, img)
    # force the pure-Python path
    import raytracing_gpu_tpu.utils.image as image_io

    h, w = img.shape[:2]
    vals = img.astype(np.int32)
    with open(p_python, "w") as f:
        f.write(f"P3\n{w} {h}\n255\n")
        f.write("".join(f"{r} {g} {b} " for r, g, b in vals.reshape(-1, 3)))
    assert open(p_native, "rb").read() == open(p_python, "rb").read()


def test_native_png_byte_identical(tmp_path):
    """rgt_write_png produces byte-identical files to the Python zlib
    writer (same library, same level-9 stream, same chunk layout)."""
    import struct
    import zlib

    import numpy as np

    from raytracing_gpu_tpu.native import svati as native
    from raytracing_gpu_tpu.utils import image as image_mod

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(33, 47, 3), dtype=np.uint8)
    rgba = np.concatenate(
        [img, np.full((33, 47, 1), 255, np.uint8)], axis=2
    )
    p_native = tmp_path / "n.png"
    assert native.write_png_native(str(p_native), rgba)

    raw = b"".join(b"\x00" + rgba[r].tobytes() for r in range(33))

    def chunk(tag, payload):
        out = struct.pack(">I", len(payload)) + tag + payload
        return out + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", 47, 33, 8, 6, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw, 9)) + chunk(b"IEND", b""))
    assert p_native.read_bytes() == png
    # and the public writer (which routes through the native path) matches
    image_mod.write_png(str(tmp_path / "pub.png"), img)
    assert (tmp_path / "pub.png").read_bytes() == png
