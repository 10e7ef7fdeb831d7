"""ctypes bindings for the native .svati parser and image writer."""

from __future__ import annotations

import ctypes as ct

import numpy as np

from raytracing_gpu_tpu.native.build import ensure_built


class _RgtScene(ct.Structure):
    _fields_ = [
        ("ok", ct.c_int32),
        ("error", ct.c_char * 512),
        ("width", ct.c_int32),
        ("height", ct.c_int32),
        ("position", ct.c_float * 3),
        ("u", ct.c_float * 3),
        ("v", ct.c_float * 3),
        ("fov", ct.c_float),
        ("n_lights", ct.c_int64),
        ("light_kind", ct.POINTER(ct.c_int32)),
        ("light_rgb", ct.POINTER(ct.c_float)),
        ("light_v", ct.POINTER(ct.c_float)),
        ("n_objects", ct.c_int64),
        ("ka", ct.POINTER(ct.c_float)),
        ("kd", ct.POINTER(ct.c_float)),
        ("ks", ct.POINTER(ct.c_float)),
        ("ns", ct.POINTER(ct.c_float)),
        ("ni", ct.POINTER(ct.c_float)),
        ("nr", ct.POINTER(ct.c_float)),
        ("d", ct.POINTER(ct.c_float)),
        ("tri_count", ct.POINTER(ct.c_int64)),
        ("n_triangles", ct.c_int64),
        ("vertices", ct.POINTER(ct.c_float)),
        ("normals", ct.POINTER(ct.c_float)),
    ]


_lib = None


def _load():
    global _lib
    if _lib is None:
        path = ensure_built()
        if path is None:
            raise ImportError("native library not available")
        lib = ct.CDLL(path)
        lib.rgt_parse.restype = ct.POINTER(_RgtScene)
        lib.rgt_parse.argtypes = [ct.c_char_p, ct.c_int64]
        lib.rgt_scene_free.argtypes = [ct.POINTER(_RgtScene)]
        lib.rgt_write_ppm.restype = ct.c_int32
        lib.rgt_write_ppm.argtypes = [
            ct.c_char_p, ct.POINTER(ct.c_float), ct.c_int64, ct.c_int64,
        ]
        lib.rgt_write_png.restype = ct.c_int32
        lib.rgt_write_png.argtypes = [
            ct.c_char_p, ct.POINTER(ct.c_uint8), ct.c_int64, ct.c_int64,
        ]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except ImportError:
        return False


def _as_np(ptr, shape, dtype):
    if not shape[0]:
        return np.zeros(shape, dtype)
    return np.ctypeslib.as_array(ptr, shape=shape).astype(dtype, copy=True)


def parse_scene_native(path: str, pad_triangles: int = 128, pad_objects: int = 8):
    """Native-parser twin of models.parser.parse_scene_text."""
    from raytracing_gpu_tpu.models.parser import SvatiParseError
    from raytracing_gpu_tpu.models.scene import Camera, build_scene

    lib = _load()
    with open(path, "rb") as f:
        data = f.read()
    sp = lib.rgt_parse(data, len(data))
    try:
        s = sp.contents
        if not s.ok:
            raise SvatiParseError(s.error.decode())
        camera = Camera(
            width=int(s.width),
            height=int(s.height),
            position=np.array(s.position[:], np.float32),
            u=np.array(s.u[:], np.float32),
            v=np.array(s.v[:], np.float32),
            fov=np.float32(s.fov),
        )
        L = int(s.n_lights)
        kinds = _as_np(s.light_kind, (L,), np.int32)
        rgb = _as_np(s.light_rgb, (L * 3,), np.float32).reshape(L, 3)
        lv = _as_np(s.light_v, (L * 3,), np.float32).reshape(L, 3)
        lights = [(int(kinds[i]), rgb[i], lv[i]) for i in range(L)]

        O = int(s.n_objects)
        ka = _as_np(s.ka, (O * 3,), np.float32).reshape(O, 3)
        kd = _as_np(s.kd, (O * 3,), np.float32).reshape(O, 3)
        ks = _as_np(s.ks, (O * 3,), np.float32).reshape(O, 3)
        ns = _as_np(s.ns, (O,), np.float32)
        ni = _as_np(s.ni, (O,), np.float32)
        nr = _as_np(s.nr, (O,), np.float32)
        dd = _as_np(s.d, (O,), np.float32)
        tc = _as_np(s.tri_count, (O,), np.int64)
        T = int(s.n_triangles)
        verts = _as_np(s.vertices, (T * 9,), np.float32).reshape(T, 3, 3)
        norms = _as_np(s.normals, (T * 9,), np.float32).reshape(T, 3, 3)

        objects = []
        pos = 0
        for i in range(O):
            t = int(tc[i])
            objects.append({
                "vertices": verts[pos:pos + t],
                "normals": norms[pos:pos + t],
                "ka": ka[i], "kd": kd[i], "ks": ks[i],
                "ns": ns[i], "ni": ni[i], "nr": nr[i], "d": dd[i],
            })
            pos += t
        return build_scene(camera, lights, objects, pad_triangles, pad_objects)
    finally:
        lib.rgt_scene_free(sp)


def write_ppm_native(path: str, image: np.ndarray) -> bool:
    """Byte-exact twin of utils.image.write_ppm; returns False if the native
    library is unavailable (caller falls back)."""
    try:
        lib = _load()
    except ImportError:
        return False
    img = np.ascontiguousarray(np.asarray(image), dtype=np.float32)
    h, w = img.shape[:2]
    rc = lib.rgt_write_ppm(
        path.encode(), img.ctypes.data_as(ct.POINTER(ct.c_float)), w, h
    )
    if rc != 0:
        raise OSError(f"rgt_write_ppm failed for {path}")
    return True


def write_png_native(path: str, image: np.ndarray) -> bool:
    """Byte-exact twin of utils.image.write_png (same zlib, same level);
    expects (H,W,4) uint8 RGBA. Returns False when unavailable."""
    try:
        lib = _load()
    except ImportError:
        return False
    img = np.ascontiguousarray(np.asarray(image, dtype=np.uint8))
    h, w = img.shape[:2]
    rc = lib.rgt_write_png(
        path.encode(), img.ctypes.data_as(ct.POINTER(ct.c_uint8)), w, h
    )
    if rc != 0:
        raise OSError(f"rgt_write_png failed for {path}")
    return True
