"""Acceleration-layer scaling bench: collide cost vs triangle count.

The reference's stress axis is object/triangle count (gpu/bench.cu:14 uses
island_smooth, its octree stress scene; the largest corpus mesh is
spheres.svati at 4,812 triangles). This bench goes 20x beyond that with
procedural sphere grids (models/procedural.make_sphere_grid_scene) and
measures the Pallas collide pass per partitioning mode:

  - none   = brute force: every (ray tile, triangle tile) pair is swept,
             cost grows linearly in T.
  - octree = hierarchical morton-tile culling: surviving pair tiles track
             the geometry a ray can actually reach, so cost grows
             sublinearly in T (the gpu/hit.cu:120-169 DFS scaling story).

Usage:  python benches/scale_bench.py            (on the TPU host)
        RGT_SCALE_RAYS=65536 RGT_SCALE_REPS=10 python benches/scale_bench.py
        RGT_SCALE_BIG=1  adds the 246k/492k/983k tiers
        RGT_SCALE_E2E=1  also times FULL renders (primary + shadow passes +
                         bounce loop + shading, the whole render_scene
                         program) per tier and partitioning — the
                         whole-frame scaling story the octree exists for
                         (gpu/hit.cu:120-169), not just the collide pass

Prints one JSON line per (scene, mode) measurement, then a summary table.
"""

from __future__ import annotations

import functools
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
    import jax.numpy as jnp
    import numpy as np

    from raytracing_gpu_tpu.models.procedural import make_sphere_grid_scene
    from raytracing_gpu_tpu.models.scene import scene_to_device
    from raytracing_gpu_tpu.ops import camera as camera_ops
    from raytracing_gpu_tpu.ops import pallas_intersect as pk
    from raytracing_gpu_tpu.ops.intersect import collide
    from raytracing_gpu_tpu.utils.compile_cache import begin_device_claim

    claim = begin_device_claim()  # overlap the pool's claim with compiles

    R = int(os.environ.get("RGT_SCALE_RAYS", "65536"))
    reps = int(os.environ.get("RGT_SCALE_REPS", "10"))
    res = int(np.sqrt(R / 4))

    grids = [
        ("11.5k", dict(nx=2, ny=2, nz=3)),
        ("26k", dict(nx=3, ny=3, nz=3)),
        ("61k", dict(nx=4, ny=4, nz=4)),
        ("96k", dict(nx=5, ny=5, nz=4)),
    ]
    if os.environ.get("RGT_SCALE_BIG"):
        grids.append(("246k", dict(nx=8, ny=8, nz=4)))
        grids.append(("492k", dict(nx=8, ny=8, nz=8)))
        grids.append(("983k", dict(nx=16, ny=16, nz=4)))
    if os.environ.get("RGT_SCALE_TIERS"):  # comma-separated tier filter
        keep = set(os.environ["RGT_SCALE_TIERS"].split(","))
        grids = [g for g in grids if g[0] in keep]
    if os.environ.get("RGT_SCALE_SMOKE"):  # CPU smoke test of the harness
        grids = [("2.7k", dict(nx=2, ny=2, nz=1, n_lat=8, n_lon=16)),
                 ("5.4k", dict(nx=2, ny=2, nz=2, n_lat=8, n_lon=16))]

    def hard_sync(x):
        jax.block_until_ready(x)
        np.asarray(jax.device_get(x.ravel()[0]))

    @functools.partial(jax.jit, static_argnames=("partitioning",))
    def collide_pass(origins, dirs, geo, pack, partitioning):
        hit = collide(origins, dirs, geo, backend="pallas", pack=pack,
                      partitioning=partitioning)
        return hit.dist

    rows = []
    for label, g in grids:
        scene = make_sphere_grid_scene(width=res, height=res, **g)
        dev = scene_to_device(scene)
        geo = dev.geometry
        T = int(np.asarray(geo.valid).sum())
        u, v, C = camera_ops.camera_basis(dev.camera)
        pos = jnp.asarray(dev.camera.position, jnp.float32)
        coords = jnp.asarray(
            camera_ops.cpu_subpixel_coords(res, res)).reshape(-1, 2)[:R]
        origins, dirs = camera_ops.make_rays(u, v, C, pos, coords)
        pack = jax.jit(pk.pack_geometry)(
            geo.vertices, geo.valid, geo.normals, geo.tri_obj, dev.materials)
        pack = jax.block_until_ready(pack)

        for mode in ("none", "octree"):
            d0 = collide_pass(origins, dirs, geo, pack, mode)
            hard_sync(d0)
            t0 = time.perf_counter()
            for _ in range(reps):
                d0 = collide_pass(origins, dirs, geo, pack, mode)
            hard_sync(d0)
            ms = (time.perf_counter() - t0) / reps * 1e3
            rows.append((label, T, mode, ms))
            print(json.dumps({
                "bench": "collide_scale", "scene": label, "triangles": T,
                "partitioning": mode, "ms_per_collide": round(ms, 3),
                "rays": R,
            }), flush=True)

        if os.environ.get("RGT_SCALE_E2E"):
            # FULL frame: primary collide + per-light shadow passes + bounce
            # loop + shading + image assembly — render_scene's exact device
            # program, AOT-compiled and dispatched directly
            from raytracing_gpu_tpu.config import RenderConfig
            from raytracing_gpu_tpu.render import (
                _render_cpu_mode,
                required_depth,
            )

            for mode in ("none", "octree"):
                cfg = RenderConfig(mode="cpu", quantize="match",
                                   backend="pallas", partitioning=mode,
                                   ray_chunk=R)
                max_nr = float(np.max(np.asarray(scene.materials.nr)))
                depth = required_depth(max_nr, cfg.reflect_cutoff,
                                       cfg.cpu_max_depth)
                tc = time.perf_counter()
                compiled = _render_cpu_mode.lower(
                    dev, cfg, depth, res, res).compile()
                t_compile = time.perf_counter() - tc
                img = compiled(dev)
                hard_sync(img)
                t0 = time.perf_counter()
                for _ in range(max(3, reps // 2)):
                    img = compiled(dev)
                hard_sync(img)
                ms = (time.perf_counter() - t0) / max(3, reps // 2) * 1e3
                rows.append((label, T, "e2e-" + mode, ms))
                print(json.dumps({
                    "bench": "render_scale_e2e", "scene": label,
                    "triangles": T, "partitioning": mode,
                    "ms_per_frame": round(ms, 3), "res": res,
                    "rays": res * res * 4,
                    "compile_s": round(t_compile, 1),
                }), flush=True)

    print(f"\n{'scene':>8} {'tris':>8} {'brute ms':>10} {'octree ms':>10} "
          f"{'speedup':>8}", file=sys.stderr)
    by = {}
    for label, T, mode, ms in rows:
        by.setdefault((label, T), {})[mode] = ms
    base_t, base_ms = None, None
    for (label, T), m in by.items():
        sp = m["none"] / m["octree"]
        print(f"{label:>8} {T:>8} {m['none']:>10.2f} {m['octree']:>10.2f} "
              f"{sp:>7.1f}x", file=sys.stderr)
        if base_t is None:
            base_t, base_ms = T, m["octree"]
        else:
            growth = (m["octree"] / base_ms) / (T / base_t)
            print(f"         octree growth vs linear-in-T: {growth:.2f} "
                  f"(1.0 = linear, <1 = sublinear)", file=sys.stderr)


if __name__ == "__main__":
    main()
