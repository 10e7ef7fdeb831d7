"""Sweep-kernel saturation bench: measured pairs/s vs the chip's ceiling.

Runs each intersection sweep kernel with a DENSE worklist (mask = ones) so
the executed-pair count is exact by construction (R x T per call), at sizes
large enough that the axon dispatch floor (~2.4 ms) is noise. Reports pair
throughput, achieved arithmetic rate under the kernel's own op accounting,
and the fraction of the v5e VPU ceiling (see BASELINE.md roofline section
for the derivation of the per-pair op counts and the peak estimate).

Usage: python benches/kernel_roofline.py
Writes benches/kernel_roofline.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracing_gpu_tpu.ops import pallas_intersect as pk
    from raytracing_gpu_tpu.utils.compile_cache import (
        begin_device_claim, enable_persistent_cache)

    enable_persistent_cache()
    claim = begin_device_claim()

    R = int(os.environ.get("RGT_KR_RAYS", str(65536)))
    T = int(os.environ.get("RGT_KR_TRIS", str(16384)))
    reps = int(os.environ.get("RGT_KR_REPS", "10"))
    rng = np.random.default_rng(0)

    # random triangle soup + rays that mostly miss (the accept path is
    # branch-free — executed work is mask-independent)
    verts = rng.uniform(-1.0, 1.0, (T, 3, 3)).astype(np.float32)
    valid = np.ones((T,), bool)
    v0, e1, e2 = pk.pack_triangles(jnp.asarray(verts), jnp.asarray(valid))
    origins = rng.uniform(-2.0, 2.0, (R, 3)).astype(np.float32)
    dirs = rng.uniform(-1.0, 1.0, (R, 3)).astype(np.float32)
    op, dp, _ = pk.pack_rays(jnp.asarray(origins), jnp.asarray(dirs))
    nt, nr = T // pk.TILE_T, R // pk.TILE_R
    mask = jnp.ones((nt, nr), jnp.int32)
    rayf = pk.ray_features_mxu(op, dp)
    g = pk.pack_tri_features(v0, e1, e2)

    def hard_sync(x):
        jax.block_until_ready(x)
        np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))

    hard_sync(claim)
    pairs = R * T

    # (name, fn, ops_per_pair) — op accounting per BASELINE.md roofline
    cases = [
        ("vpu_nearest(ref_dist)", lambda: pk.nearest_hit_pallas(
            op, dp, v0, e1, e2, mask, 1e-7, 0.01), 75),
        ("vpu_dist", lambda: pk.nearest_dist_pallas(
            op, dp, v0, e1, e2, mask, 1e-7, 0.01), 60),
        ("mxu_nearest(ref_dist)", lambda: pk.nearest_hit_mxu(
            rayf, g, mask, 1e-7, 0.01), 148),
        ("mxu_dist", lambda: pk.nearest_dist_mxu(
            rayf, g, mask, 1e-7, 0.01), 148),
    ]
    out = {"rays": R, "triangles": T, "pairs_per_call": pairs, "results": []}
    for name, fn, ops in cases:
        hard_sync(fn())  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        hard_sync(r)
        dt = (time.perf_counter() - t0) / reps
        gpairs = pairs / dt / 1e9
        tops = gpairs * ops / 1e3
        row = {"kernel": name, "ms_per_call": round(dt * 1e3, 3),
               "gpairs_per_s": round(gpairs, 2),
               "ops_per_pair": ops,
               "achieved_tops": round(tops, 3)}
        out["results"].append(row)
        print(json.dumps(row), flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "kernel_roofline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
