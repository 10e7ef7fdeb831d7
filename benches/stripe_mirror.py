"""CLI for the bit-exact C-semantics mirror tracer (tests/c_mirror.py).

Renders individual pixels through the mirror (reference-exact numpy f32,
cpu/raytracer.c operation order) and diffs them against the oracle golden —
the tool that root-caused the spheres center-column stripe (VERDICT r3 weak
#3): winner selection between seam-adjacent mirrored triangles is decided
by the 0-1 ulp difference between the reference's |fl(o + nd*(t*|d|)) - o|
distance (cpu/hit.c:36-38,57) and a t*|d| shortcut.

Usage: python benches/stripe_mirror.py [scene] [w] [h] [row col ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from c_mirror import MirrorScene, render_pixel  # noqa: E402


def main():
    from oracle import oracle_render, scene_text
    from raytracing_gpu_tpu.models.parser import parse_scene_text

    name = sys.argv[1] if len(sys.argv) > 1 else "spheres"
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 960
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 540
    pix = [int(x) for x in sys.argv[4:]]
    pixels = list(zip(pix[0::2], pix[1::2])) or [(339, 480), (350, 480),
                                                 (454, 480), (100, 480),
                                                 (339, 400)]
    golden = oracle_render(name, w, h)
    scene = parse_scene_text(scene_text(name, w, h))
    sc = MirrorScene(scene)
    for (r, c) in pixels:
        mref = render_pixel(sc, w, h, r, c, "ref")
        mt = render_pixel(sc, w, h, r, c, "t")
        g = golden[r, c]
        mark = ("OK " if np.array_equal(np.trunc(mref).astype(np.uint8), g)
                else "DIFF")
        print(f"({r},{c}) golden={g.tolist()} "
              f"mirror_ref={np.trunc(mref).tolist()} [{mark}] "
              f"mirror_tdist={np.trunc(mt).tolist()}")


if __name__ == "__main__":
    main()
