"""CPU-reference oracle harness.

The reference ships no golden images or assertions (SURVEY §4) — its `cpu/`
tree is plain C99 + pthreads, so we compile it once into a scratch dir and
use its renders as golden targets. Scenes can be re-rendered at reduced
resolution by rewriting the `camera w h ...` line, keeping oracle runtime
bounded (the CPU reference is brute-force O(pixels * triangles)).

Nothing from /root/reference is copied into this repo; the oracle binary and
golden images live under tests/_oracle_cache (gitignored) and are rebuilt on
demand.
"""

from __future__ import annotations

import hashlib
import os
import re
import subprocess

import numpy as np

REF = os.environ.get("RGT_REFERENCE", "/root/reference")
HERE = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(HERE, "_oracle_cache")
SCENES = os.path.join(REF, "tests")


def scene_path(name: str) -> str:
    return os.path.join(SCENES, name if name.endswith(".svati") else name + ".svati")


def oracle_available() -> bool:
    return os.path.isdir(os.path.join(REF, "cpu"))


def build_oracle() -> str:
    """Compile the reference CPU renderer; returns path to the binary."""
    os.makedirs(CACHE, exist_ok=True)
    binary = os.path.join(CACHE, "rt_oracle")
    if os.path.exists(binary):
        return binary
    srcs = sorted(
        os.path.join(REF, "cpu", f)
        for f in os.listdir(os.path.join(REF, "cpu"))
        if f.endswith(".c")
    )
    subprocess.run(
        ["gcc", "-O2", "-std=c99", f"-I{REF}/cpu/headers", "-o", binary]
        + srcs
        + ["-lm", "-pthread"],
        check=True,
        capture_output=True,
    )
    return binary


def scene_text(name: str, width: int | None = None, height: int | None = None) -> str:
    """Scene source, optionally with the camera resolution rewritten."""
    with open(scene_path(name)) as f:
        text = f.read()
    if width is not None:
        text = re.sub(
            r"camera\s+\d+\s+\d+", f"camera {width} {height or width}", text, count=1
        )
    return text


GOLDENS = os.path.join(HERE, "goldens")


def oracle_render(name: str, width: int | None = None, height: int | None = None) -> np.ndarray:
    """Golden render of a corpus scene via the reference binary, cached.

    Returns (H, W, 3) uint8.

    Two cache layers: tests/goldens/ holds COMMITTED renders (the full-res
    ones cost tens of minutes of 4-thread C time each — spheres at 960x540
    alone exceeds 10 minutes — so they ship with the repo, keyed by the
    sha1 of the exact scene text; regenerate with tests/gen_goldens.py);
    tests/_oracle_cache/ is the gitignored scratch layer for everything
    rendered on the fly.
    """
    from raytracing_gpu_tpu.utils.image import read_ppm

    text = scene_text(name, width, height)
    key = hashlib.sha1(text.encode()).hexdigest()[:16]
    base = name.replace(".svati", "")
    committed = os.path.join(GOLDENS, f"{base}-{key}.npz")
    if os.path.exists(committed):
        return np.load(committed)["img"]
    ppm = os.path.join(CACHE, f"{base}-{key}.ppm")
    if not os.path.exists(ppm):
        binary = build_oracle()
        svati = os.path.join(CACHE, f"{base}-{key}.svati")
        with open(svati, "w") as f:
            f.write(text)
        try:
            subprocess.run([binary, svati, ppm], check=True,
                           capture_output=True, timeout=7200)
        except BaseException:
            if os.path.exists(ppm):
                os.unlink(ppm)  # never cache a partial render
            raise
    return read_ppm(ppm)
