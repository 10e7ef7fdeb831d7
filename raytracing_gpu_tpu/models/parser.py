"""`.svati` scene parser.

Reproduces the reference grammar and its quirks exactly:

- Whitespace-token stream (`fscanf("%s")`) with keywords `camera`, `a_light`,
  `d_light`, `p_light`, `object`, and `#` comment-to-end-of-line
  (cpu/parser.c:73-111).
- `camera w h pos(3) u(3) v(3) fov` (cpu/parser.c:5-21).
- `a_light r g b`; `d_light r g b dir(3)`; `p_light r g b pos(3)`
  (cpu/parser.c:24-60).
- `object N` where **N is the vertex count**; the object body is read until
  N*2 `v`/`vn` lines have been consumed (material keys `Ka Kd Ks` (vec3) and
  `Ns Ni Nr d` (scalar) may interleave); triangle_count = N/3
  (cpu/parse_obj.c:42-91).
- Vertices/normals are pushed on LIFO stacks and triangles rebuilt by popping
  three at a time (cpu/parse_obj.c:29-40, 82-88): file triangle k of m becomes
  stored triangle m-1-k with its vertices in reversed order (a,b,c)->(c,b,a).
  We replicate the reversal so barycentric parametrization — and therefore
  every intermediate float of the interpolated-normal computation
  (cpu/hit.c:38-40) — matches the oracle exactly.
- Material defaults per init_object (cpu/parse_obj.c:3-20).
- Unknown keywords are an error, like the reference's errx calls.

A native C++ tokenizer fast path (raytracing_gpu_tpu/native) is used for large
scenes when the shared library has been built; the pure-Python path is always
available and is the semantic definition.
"""

from __future__ import annotations

import numpy as np

from raytracing_gpu_tpu.models.scene import (
    AMBIENT,
    DIRECTIONAL,
    POINT,
    Camera,
    Scene,
    build_scene,
)


class SvatiParseError(ValueError):
    pass


def _tokenize(text: str):
    """Yield whitespace-separated tokens, dropping `#`-to-EOL comments.

    Mirrors fscanf("%s") + the `#` handler (cpu/parser.c:108-109). The
    reference consumes the comment with `fscanf(" %[^\n]")` — everything to
    end of line.
    """
    i = 0
    n = len(text)
    while i < n:
        while i < n and text[i].isspace():
            i += 1
        if i >= n:
            return
        j = i
        while j < n and not text[j].isspace():
            j += 1
        tok = text[i:j]
        i = j
        if tok == "#":
            while i < n and text[i] != "\n":
                i += 1
        else:
            yield tok


class _TokenStream:
    def __init__(self, text: str):
        self._it = _tokenize(text)
        self._peeked = None
        self.exhausted = False

    def next(self):
        if self._peeked is not None:
            tok, self._peeked = self._peeked, None
            return tok
        try:
            return next(self._it)
        except StopIteration:
            self.exhausted = True
            return None

    def floats(self, k: int):
        out = []
        for _ in range(k):
            tok = self.next()
            if tok is None:
                raise SvatiParseError("unexpected EOF while reading numbers")
            out.append(float(tok))
        return out


def _parse_object(ts: _TokenStream) -> dict:
    """Parse one object body (cpu/parse_obj.c:42-91)."""
    tok = ts.next()
    if tok is None:
        raise SvatiParseError("unexpected EOF after 'object'")
    vertex_count = int(tok)
    obj = {
        # init_object defaults (cpu/parse_obj.c:3-20)
        "ka": np.zeros(3, np.float32),
        "kd": np.zeros(3, np.float32),
        "ks": np.zeros(3, np.float32),
        "ns": 0.0,
        "ni": 1.0,
        "nr": 0.0,
        "d": 1.0,
    }
    vs: list[list[float]] = []
    vns: list[list[float]] = []
    cpt = 0
    while cpt < vertex_count * 2:
        tok = ts.next()
        if tok is None:
            break  # fscanf EOF ends the loop in the reference too
        if tok == "Ka":
            obj["ka"] = np.array(ts.floats(3), np.float32)
        elif tok == "Kd":
            obj["kd"] = np.array(ts.floats(3), np.float32)
        elif tok == "Ks":
            obj["ks"] = np.array(ts.floats(3), np.float32)
        elif tok == "Ns":
            obj["ns"] = ts.floats(1)[0]
        elif tok == "Ni":
            obj["ni"] = ts.floats(1)[0]
        elif tok == "Nr":
            obj["nr"] = ts.floats(1)[0]
        elif tok == "d":
            obj["d"] = ts.floats(1)[0]
        elif tok == "v":
            cpt += 1
            vs.append(ts.floats(3))
        elif tok == "vn":
            cpt += 1
            vns.append(ts.floats(3))
        else:
            raise SvatiParseError(f"Error during parsing {tok}")

    # LIFO rebuild (cpu/parse_obj.c:82-88): pop 3 at a time from the top.
    # With file order v_1..v_N pushed in order, popped triangles are
    # (v_N, v_{N-1}, v_{N-2}), (v_{N-3}, ...), ...
    nv = min(len(vs), len(vns))
    # The reference pops while v-stack is non-empty and pops vn in lockstep;
    # well-formed scenes have len(vs) == len(vns) == vertex_count.
    varr = np.array(vs[:nv], np.float32) if nv else np.zeros((0, 3), np.float32)
    narr = np.array(vns[:nv], np.float32) if nv else np.zeros((0, 3), np.float32)
    varr = varr[::-1]
    narr = narr[::-1]
    ntri = nv // 3
    obj["vertices"] = varr[: ntri * 3].reshape(ntri, 3, 3)
    obj["normals"] = narr[: ntri * 3].reshape(ntri, 3, 3)
    # Note the reference sets triangle_count = vertex_count/3
    # (cpu/parse_obj.c:89) which for well-formed files equals ntri.
    return obj


def parse_scene_text(
    text: str, pad_triangles: int = 128, pad_objects: int = 8
) -> Scene:
    """Parse `.svati` source text into a Scene pytree (host NumPy arrays)."""
    ts = _TokenStream(text)
    camera = None
    lights: list[tuple[int, np.ndarray, np.ndarray]] = []
    objects: list[dict] = []
    while True:
        tok = ts.next()
        if tok is None:
            break
        if tok == "camera":
            vals = ts.floats(12)
            camera = Camera(
                width=int(vals[0]),
                height=int(vals[1]),
                position=np.array(vals[2:5], np.float32),
                u=np.array(vals[5:8], np.float32),
                v=np.array(vals[8:11], np.float32),
                fov=np.float32(vals[11]),
            )
        elif tok == "a_light":
            vals = ts.floats(3)
            lights.append((AMBIENT, np.array(vals, np.float32), np.zeros(3, np.float32)))
        elif tok == "d_light":
            vals = ts.floats(6)
            lights.append((DIRECTIONAL, np.array(vals[:3], np.float32), np.array(vals[3:], np.float32)))
        elif tok == "p_light":
            vals = ts.floats(6)
            lights.append((POINT, np.array(vals[:3], np.float32), np.array(vals[3:], np.float32)))
        elif tok == "object":
            objects.append(_parse_object(ts))
        else:
            raise SvatiParseError(f"Error during the parsing {tok}")

    if camera is None:
        raise SvatiParseError("scene has no camera")
    return build_scene(camera, lights, objects, pad_triangles, pad_objects)


def parse_scene(
    path: str, pad_triangles: int = 128, pad_objects: int = 8, native: str = "auto"
) -> Scene:
    """Parse a `.svati` file. `native` in {"auto","never","force"} selects the
    C++ tokenizer fast path when the shared library is built."""
    if native != "never":
        try:
            from raytracing_gpu_tpu.native import svati as native_svati

            if native_svati.available():
                return native_svati.parse_scene_native(path, pad_triangles, pad_objects)
        except ImportError:
            pass
        if native == "force":
            raise RuntimeError("native parser requested but not available")
    with open(path, "r") as f:
        text = f.read()
    return parse_scene_text(text, pad_triangles, pad_objects)
