"""Per-stage micro-benchmarks — the gpu/bench.cu analog.

The reference times parser / AABB / scene-scale / position keys / radix sort
/ prefix sum / octree creation with Google Benchmark over four scenes
(gpu/bench.cu:13-22,435-442) but never times the render kernel itself
(SURVEY §2.4). This suite mirrors every stage AND adds the two numbers that
matter most: the intersection kernel and the end-to-end render.

Usage:  python benches/stage_bench.py [--scenes cube,spheres] [--json out.json]
Each stage reports best-of-N wall time with inputs on device and
block_until_ready bracketing (jax.profiler-compatible; add --profile DIR).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

REF = os.environ.get("RGT_REFERENCE", "/root/reference")

# gpu/bench.cu:13-22: cube, island_smooth ("high objects count"), dark-night,
# spheres
DEFAULT_SCENES = ["cube", "island_smooth", "dark-night", "spheres"]


def _sync(out):
    """block_until_ready + a 1-element host read: block_until_ready alone is
    unreliable over the axon TPU tunnel (returns before the device is idle)."""
    import jax
    import numpy as np

    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    if hasattr(leaf, "ravel"):
        np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(fn, repeats=5, warmup=1, inner=1):
    """Best-of-`repeats` mean time of `inner` back-to-back calls.

    One hard sync per batch, not per call: a sync costs a full axon-tunnel
    round trip (~46 ms measured), which would swamp every microsecond-scale
    device stage. Back-to-back dispatches serialize on the chip, so
    total/inner is the true per-call device cost (the reference's Google
    Benchmark amortizes over its timed loop the same way, bench.cu)."""
    for _ in range(warmup):
        _sync(fn())
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(inner):
            out = fn()
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def bench_scene(name: str, repeats: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracing_gpu_tpu.config import RenderConfig
    from raytracing_gpu_tpu.models.parser import parse_scene_text
    from raytracing_gpu_tpu.models.scene import scene_to_device
    from raytracing_gpu_tpu.ops import camera as camera_ops
    from raytracing_gpu_tpu.ops import pallas_intersect as pk
    from raytracing_gpu_tpu.ops.intersect import collide
    from raytracing_gpu_tpu.partition.aabb import (
        compute_object_aabbs,
        compute_scene_aabb,
    )
    from raytracing_gpu_tpu.partition.octree import build_octree, position_keys
    from raytracing_gpu_tpu.render import render_scene

    path = os.path.join(REF, "tests", name + ".svati")
    with open(path) as f:
        src = f.read()
    rows = {}

    # --- BM_parser (gpu/bench.cu:31-35): Python and native C++ paths
    t0 = time.perf_counter()
    scene_host = parse_scene_text(src)
    rows["parser_py"] = time.perf_counter() - t0
    try:
        from raytracing_gpu_tpu.models.parser import parse_scene

        t0 = time.perf_counter()
        parse_scene(path, native="force")
        rows["parser_native"] = time.perf_counter() - t0
    except Exception:
        pass

    scene = scene_to_device(scene_host)
    geo = scene.geometry
    n_obj = scene.materials.padded_count

    # --- BM_aabb_object (gpu/bench.cu:41-57)
    aabb_fn = jax.jit(
        lambda: compute_object_aabbs(geo.vertices, geo.tri_obj, geo.valid, n_obj)
    )
    rows["aabb_build"] = timeit(aabb_fn, repeats, inner=20)
    aabbs = aabb_fn()
    obj_valid = (
        jax.ops.segment_sum(geo.valid.astype(jnp.int32), geo.tri_obj,
                            num_segments=n_obj) > 0
    )

    # --- BM_find_scene_scale (gpu/bench.cu:63-111)
    scale_fn = jax.jit(lambda: compute_scene_aabb(aabbs, obj_valid))
    rows["scene_scale"] = timeit(scale_fn, repeats, inner=20)
    scene_box = scale_fn()

    # --- BM_position_object (gpu/bench.cu:117-128)
    pos_fn = jax.jit(lambda: position_keys(aabbs, scene_box, obj_valid))
    rows["position_keys"] = timeit(pos_fn, repeats, inner=20)
    keys, _, _ = pos_fn()

    # --- BM_parallel_radix_sort analog (gpu/bench.cu:224-257: 1e6 u32 keys)
    rng = np.random.RandomState(0)
    mkeys = jnp.asarray(rng.randint(0, 2**32, size=1_000_000, dtype=np.uint64)
                        .astype(np.uint32))
    sort_fn = jax.jit(lambda: jnp.sort(mkeys))
    rows["sort_1e6_u32"] = timeit(sort_fn, repeats, inner=20)

    # --- BM_prefix_sum analog (gpu/bench.cu:309-376: 1e5 elems)
    vals = jnp.asarray(rng.randint(0, 1000, size=100_000).astype(np.int32))
    scan_fn = jax.jit(lambda: jnp.cumsum(vals))
    rows["prefix_sum_1e5"] = timeit(scan_fn, repeats, inner=20)

    # --- BM_octree_creation (gpu/bench.cu:382-432)
    oct_fn = jax.jit(lambda: build_octree(aabbs, scene_box, obj_valid))
    rows["octree_build"] = timeit(oct_fn, repeats, inner=20)

    # --- intersection kernel (NOT in the reference's bench suite)
    R = 16384
    u, v, C = camera_ops.camera_basis(scene.camera)
    coords = jnp.asarray(
        camera_ops.cpu_subpixel_coords(scene.camera.width, scene.camera.height)
    ).reshape(-1, 2)[:R]
    o, d = camera_ops.make_rays(u, v, C, jnp.asarray(scene.camera.position), coords)
    o, d = jax.block_until_ready((o, d))
    for backend in ("jnp", "pallas", "mxu"):
        f = jax.jit(lambda o=o, d=d, b=backend: collide(o, d, geo, backend=b).dist)
        rows[f"collide_{backend}_{R // 1000}k"] = timeit(f, repeats, inner=10)
    pairs = R * geo.vertices.shape[0]
    rows["collide_pallas_gpairs_per_s"] = (
        pairs / rows[f"collide_pallas_{R // 1000}k"] / 1e9
    )

    # --- end-to-end renders (numbers bench.cu never measured).
    # render_cpu_mode_64px times the PUBLIC render_scene() API: host scene
    # upload, geometry packing, device render, image download — the
    # single-shot CLI cost. render_device_64px times the jitted device
    # program alone with a resident scene (the per-frame cost in a loop,
    # same methodology as bench.py's sustained headline number).
    import re as _re

    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    small = _re.sub(r"camera \d+ \d+", "camera 64 64", src, count=1)
    sh = parse_scene_text(small)
    rows["render_cpu_mode_64px"] = timeit(
        lambda: render_scene(sh, RenderConfig(mode="cpu", quantize="match",
                                              backend=backend)),
        max(2, repeats // 2), inner=5,
    )
    from raytracing_gpu_tpu.partition.apply import with_accel
    from raytracing_gpu_tpu.render import _render_cpu_mode, required_depth
    from raytracing_gpu_tpu.utils.compile_cache import aot_compiled

    dcfg = RenderConfig(mode="cpu", quantize="match", backend=backend)
    dsc = scene_to_device(sh)
    if dcfg.partitioning != "none":
        dsc, _ = with_accel(dsc, dcfg.partitioning)  # same program as
        # render_scene builds, so the persistent cache / prewarm is shared
    ddepth = required_depth(
        float(np.max(np.asarray(sh.materials.nr))), dcfg.reflect_cutoff,
        dcfg.cpu_max_depth)
    import jax as _jax

    # key includes the geometry shapes tuple (mirrors render_scene's key)
    # so a same-named scene with different shapes can't alias the prewarm
    dshapes = tuple(_jax.tree.map(lambda a: a.shape, _jax.tree.leaves(dsc)))
    _compiled = aot_compiled(_render_cpu_mode,
                             ("stage", name, dcfg, ddepth, dshapes),
                             dsc, dcfg, ddepth, 64, 64)
    _call = ((lambda: _compiled(dsc)) if _compiled is not None
             else (lambda: _render_cpu_mode(dsc, dcfg, ddepth, 64, 64)))
    rows["render_device_64px"] = timeit(
        _call,
        max(2, repeats // 2), inner=10,
    )
    # gpu-mode: aliasing=3 -> one ray per hi-res pixel, 9x the rays, box
    # downscale + bounce cap (gpu/rt.cpp:67-96)
    rows["render_gpu_mode_64px_a3"] = timeit(
        lambda: render_scene(sh, RenderConfig(mode="gpu", quantize="match",
                                              backend=backend)),
        max(2, repeats // 2), inner=5,
    )

    # --- train step: forward + backward + psum'd grads + adam on the mesh
    from raytracing_gpu_tpu.parallel import (
        extract_params,
        make_mesh,
        make_train_step,
    )
    from raytracing_gpu_tpu.parallel.render import split_scene

    W = 32
    small32 = _re.sub(r"camera \d+ \d+", f"camera {W} {W}", src, count=1)
    sh32 = scene_to_device(parse_scene_text(small32))
    tcfg = RenderConfig(mode="cpu", quantize="smooth", backend=backend,
                        ray_chunk=4096, diff_max_depth=2)
    mesh = make_mesh(min(len(jax.devices()), 4), 1)
    init_state, step_fn = make_train_step(mesh, tcfg, sh32)
    state = init_state(extract_params(sh32))
    geo32, rest32 = split_scene(sh32)
    coords = jnp.asarray(camera_ops.cpu_subpixel_coords(W, W).reshape(-1, 2))
    target = jnp.zeros((W * W, 3), jnp.float32)

    def train_once(state=state):
        s2, loss = step_fn(state, geo32, rest32, coords, target, W * W)
        return loss

    rows[f"train_step_{W}px_fwd_bwd"] = timeit(train_once,
                                               max(2, repeats // 2), inner=5)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default=",".join(DEFAULT_SCENES))
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--json", default=None)
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="jax.profiler trace output dir")
    args = ap.parse_args()

    import jax

    from raytracing_gpu_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache(os.path.join(ROOT, "tests", "_oracle_cache",
                                         "jax_cache"))
    print(f"platform: {jax.devices()[0].platform}", file=sys.stderr)
    results = {}
    ctx = jax.profiler.trace(args.profile) if args.profile else None
    if ctx:
        ctx.__enter__()
    try:
        for name in args.scenes.split(","):
            results[name] = bench_scene(name, args.repeats)
            for k, v in results[name].items():
                unit = "" if "per_s" in k else " s"
                print(f"{name:16s} {k:28s} {v:>12.6f}{unit}")
    finally:
        if ctx:
            ctx.__exit__(None, None, None)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.json}", file=sys.stderr)


if __name__ == "__main__":
    main()
