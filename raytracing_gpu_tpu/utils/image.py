"""Image I/O: PPM (P3) byte-matching the reference writer, PPM reader, PNG.

The CPU reference writes ASCII P3 with `"%d %d %d "` per pixel after an
`int` truncation of the float color (cpu/printer.c:3-18). The GPU reference
writes RGBA8 PNG via libpng (gpu/rt.cpp:14-52). Here: PPM matches the CPU
writer byte-for-byte; PNG is produced with zlib (no external deps).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def write_ppm(path: str, image: np.ndarray) -> None:
    """Write an (H,W,3) image as ASCII P3, matching cpu/printer.c exactly.

    `image` may be float (values in [0,255], truncated like the C `int` cast)
    or integer.
    """
    img = np.asarray(image)
    try:  # native fast path (byte-exact twin, tests/test_native.py)
        from raytracing_gpu_tpu.native import svati as _native

        if _native.write_ppm_native(path, img):
            return
    except ImportError:
        pass
    h, w = img.shape[:2]
    vals = img.astype(np.int32)  # C float->int cast truncates toward zero
    with open(path, "w") as f:
        f.write(f"P3\n{w} {h}\n255\n")
        flat = vals.reshape(-1, 3)
        f.write("".join(f"{r} {g} {b} " for r, g, b in flat))


def ppm_bytes(image: np.ndarray) -> bytes:
    img = np.asarray(image).astype(np.int32)
    h, w = img.shape[:2]
    body = "".join(f"{r} {g} {b} " for r, g, b in img.reshape(-1, 3))
    return (f"P3\n{w} {h}\n255\n" + body).encode()


def read_ppm(path: str) -> np.ndarray:
    """Read ASCII P3 (as written by the reference) into (H,W,3) uint8."""
    with open(path, "rb") as f:
        data = f.read()
    toks = data.split()
    if toks[0] != b"P3":
        raise ValueError(f"not a P3 PPM: {path}")
    w, h, maxval = int(toks[1]), int(toks[2]), int(toks[3])
    pix = np.array(toks[4 : 4 + w * h * 3], dtype=np.int64)
    if maxval > 255:
        raise ValueError("only 8-bit PPM supported")
    return pix.reshape(h, w, 3).astype(np.uint8)


def write_png(path: str, image: np.ndarray) -> None:
    """Write (H,W,3) or (H,W,4) uint8 as PNG (RGBA like gpu/rt.cpp:14-52)."""
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    h, w = img.shape[:2]
    if img.shape[2] == 3:
        img = np.concatenate([img, np.full((h, w, 1), 255, np.uint8)], axis=2)
    try:  # native fast path (byte-exact twin, tests/test_native.py)
        from raytracing_gpu_tpu.native import svati as _native

        if _native.write_png_native(path, img):
            return
    except ImportError:
        pass
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        out = struct.pack(">I", len(payload)) + tag + payload
        return out + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)
