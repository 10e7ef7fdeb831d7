"""Build the native library with g++ (no cmake needed for 2 TUs).

The .so is cached next to the sources and rebuilt when any source is newer
(the runtime analog of the reference's Makefile/CMake layer — SURVEY L9).
Set RGT_NATIVE=0 to disable the native paths entirely.
"""

from __future__ import annotations

import os
import subprocess
import threading

HERE = os.path.dirname(os.path.abspath(__file__))
SOURCES = ["svati_parser.cpp", "image_io.cpp"]
SO_PATH = os.path.join(HERE, "_rgt_native.so")

_lock = threading.Lock()
_build_error: str | None = None


def _needs_build() -> bool:
    if not os.path.exists(SO_PATH):
        return True
    so_mtime = os.path.getmtime(SO_PATH)
    return any(
        os.path.getmtime(os.path.join(HERE, s)) > so_mtime for s in SOURCES
    )


def ensure_built() -> str | None:
    """Compile if needed; returns the .so path or None when unavailable."""
    global _build_error
    if os.environ.get("RGT_NATIVE", "1") == "0":
        return None
    with _lock:
        if _build_error is not None:
            return None
        if not _needs_build():
            return SO_PATH
        cmd = [
            "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
            "-o", SO_PATH,
        ] + [os.path.join(HERE, s) for s in SOURCES] + ["-lz"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError) as e:
            _build_error = str(e)
            return None
        return SO_PATH


def available() -> bool:
    return ensure_built() is not None


if __name__ == "__main__":
    path = ensure_built()
    print(path or f"native build unavailable: {_build_error}")
