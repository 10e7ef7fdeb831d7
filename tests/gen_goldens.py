"""Regenerate the COMMITTED full-resolution oracle goldens (tests/goldens/).

Each golden is the reference CPU renderer's output at the scene's native
resolution, stored as a compressed .npz keyed by the sha1 of the exact scene
text (so any change to the scene file or the requested resolution forces a
re-render instead of silently comparing against a stale image). These cost
tens of minutes of 4-thread C time each — that's why they're committed.

Usage: python tests/gen_goldens.py
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(HERE))

import numpy as np

from oracle import GOLDENS, oracle_render, scene_text

# must match tests/test_render_match.py FULLRES — the whole 20-scene corpus
# at each scene's declared native resolution (camera line 1)
FULLRES = [
    ("triangle", 512, 512),
    ("triangle-ambient", 512, 512),
    ("triangle-left-ambient", 512, 512),
    ("cube", 512, 512),
    ("cube-ambient", 512, 512),
    ("susan", 512, 512),
    ("secret", 512, 512),
    ("secret2", 512, 512),
    ("sphere-spec", 512, 512),
    ("sphere-spec_smooth", 512, 512),
    ("sphere-specular", 512, 512),
    ("point-light", 960, 540),
    ("dir-light-shadows", 960, 540),
    ("lighthouse", 960, 540),
    ("car", 960, 540),
    ("spheres", 960, 540),
    ("car-on-road", 960, 540),
    ("dark-night", 960, 540),
    ("island_smooth", 960, 540),
    ("susans_smooth", 960, 540),
]


def main() -> None:
    os.makedirs(GOLDENS, exist_ok=True)
    for name, w, h in FULLRES:
        key = hashlib.sha1(scene_text(name, w, h).encode()).hexdigest()[:16]
        out = os.path.join(GOLDENS, f"{name}-{key}.npz")
        if os.path.exists(out):
            print(f"{name}-{key}: exists", flush=True)
            continue
        t0 = time.time()
        img = oracle_render(name, w, h)  # renders into the scratch cache
        np.savez_compressed(out, img=img)
        kb = os.path.getsize(out) // 1024
        print(f"{name}-{key}: {time.time() - t0:.0f}s, {kb} KB", flush=True)


if __name__ == "__main__":
    main()
