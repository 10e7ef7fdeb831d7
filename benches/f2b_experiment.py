"""Front-to-back cutoff x block-swizzle experiment (VERDICT r4 #7).

Round 4 measured the two-round front-to-back sweep as a LOSS at the 983k
tier — but on the COLLIDE pass with row-major rays (a 256-ray tile is a
64x1 pixel strip, so nearly every tile contains a sky ray whose +inf
nearest-hit poisons the tile's occlusion cutoff). The e2e render path
block-swizzles rays into compact 2D pixel blocks at this scale
(render.py _pick_block), where sky is spatially coherent: blocks are
mostly all-geometry or all-sky, so the per-tile cutoff should survive.
This measures the FULL frame at the 983k tier for f2b_tiles in
{0, 8, 16, 32} with swizzle auto (on), closing the "was granularity the
blocker?" question with the cross experiment round 4 did not run.

Usage: python benches/f2b_experiment.py   (on the TPU host)
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

    cache = os.path.join(HERE, "tests", "_oracle_cache", "jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import numpy as np

    from raytracing_gpu_tpu.config import RenderConfig
    from raytracing_gpu_tpu.models.procedural import make_sphere_grid_scene
    from raytracing_gpu_tpu.models.scene import scene_to_device
    from raytracing_gpu_tpu.render import _render_cpu_mode, required_depth
    from raytracing_gpu_tpu.utils.compile_cache import begin_device_claim

    claim = begin_device_claim()
    res = int(os.environ.get("RGT_F2B_RES", "128"))
    reps = int(os.environ.get("RGT_F2B_REPS", "5"))
    scene = make_sphere_grid_scene(width=res, height=res, nx=16, ny=16, nz=4)
    dev = scene_to_device(scene)
    T = int(np.asarray(dev.geometry.valid).sum())
    max_nr = float(np.max(np.asarray(scene.materials.nr)))

    def hard_sync(x):
        jax.block_until_ready(x)
        np.asarray(jax.device_get(x.ravel()[0]))

    hard_sync(claim)
    base_img = None
    for k in (0, 8, 16, 32):
        cfg = RenderConfig(mode="cpu", quantize="match", backend="pallas",
                           partitioning="octree", ray_chunk=res * res * 4,
                           f2b_tiles=k)
        depth = required_depth(max_nr, cfg.reflect_cutoff, cfg.cpu_max_depth)
        tc = time.perf_counter()
        compiled = _render_cpu_mode.lower(dev, cfg, depth, res, res).compile()
        t_compile = time.perf_counter() - tc
        img = compiled(dev)
        hard_sync(img)
        t0 = time.perf_counter()
        for _ in range(reps):
            img = compiled(dev)
        hard_sync(img)
        ms = (time.perf_counter() - t0) / reps * 1e3
        a = np.asarray(img)
        if base_img is None:
            base_img = a
        else:
            # the cutoff is exact by construction: images must be identical
            np.testing.assert_array_equal(base_img, a)
        print(json.dumps({
            "bench": "f2b_swizzle", "triangles": T, "res": res,
            "f2b_tiles": k, "ms_per_frame": round(ms, 2),
            "compile_s": round(t_compile, 1), "bit_identical": True,
        }), flush=True)


if __name__ == "__main__":
    main()
