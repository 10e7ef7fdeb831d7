"""Per-op device-time breakdown of the 256² training step (VERDICT r3 #2).

Runs the same step as benches/train_bench.py (spheres 256x256, depth-4
unroll, pallas backend, remat on) under jax.profiler and aggregates device
time per XLA op from the perfetto trace — where do the ~6.35 s/step go
(sweep recompute under remat? shadow passes? fetch-adjoint scatter?).

Usage: python benches/train_profile.py
Writes benches/roofline_train.json + benches/hlo_train.txt.
"""

from __future__ import annotations

import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("RGT_REFERENCE", "/root/reference")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from roofline import _collect_device_events, profile_fn
    from raytracing_gpu_tpu.config import RenderConfig
    from raytracing_gpu_tpu.models.parser import parse_scene_text
    from raytracing_gpu_tpu.models.scene import scene_to_device
    from raytracing_gpu_tpu.ops import camera as camera_ops
    from raytracing_gpu_tpu.parallel.mesh import make_mesh
    from raytracing_gpu_tpu.parallel.render import split_scene
    from raytracing_gpu_tpu.parallel.train import (extract_params,
                                                   make_train_step)
    from raytracing_gpu_tpu.utils.compile_cache import (
        begin_device_claim, enable_persistent_cache)

    enable_persistent_cache()
    claim = begin_device_claim()

    scene_name = os.environ.get("RGT_TRAIN_SCENE", "spheres")
    res = int(os.environ.get("RGT_TRAIN_RES", "256"))
    depth = int(os.environ.get("RGT_TRAIN_DEPTH", "4"))
    backend = os.environ.get("RGT_TRAIN_BACKEND", "pallas")

    with open(os.path.join(REF, "tests", scene_name + ".svati")) as f:
        src = f.read()
    src = re.sub(r"camera \d+ \d+", f"camera {res} {res}", src, count=1)
    scene_host = parse_scene_text(src)
    dev = scene_to_device(scene_host)
    W = H = res
    n_pixels = W * H
    coords = jnp.asarray(
        np.asarray(camera_ops.cpu_subpixel_coords(W, H)).reshape(-1, 2))
    target = jnp.asarray(np.full((n_pixels, 3), 0.25, np.float32))

    mesh = make_mesh(1, 1)
    cfg = RenderConfig(mode="cpu", quantize="smooth", backend=backend,
                       partitioning="octree", diff_max_depth=depth,
                       ray_chunk=65536, remat=True)
    init_state, step_fn = make_train_step(mesh, cfg, dev)
    state = init_state(extract_params(dev))
    geo, rest = split_scene(dev)
    jax.block_until_ready(claim)

    holder = {"state": state}

    def one_step():
        s, loss = step_fn(holder["state"], geo, rest, coords, target,
                          n_pixels)
        holder["state"] = s
        return loss

    n = 2
    events, wall, tdir = profile_fn(one_step, n)
    print(f"wall/step: {wall:.2f} s   trace: {tdir}")

    agg = {}
    for name, dur, track in events:
        if "TPU" not in track and "xla" not in track.lower():
            continue
        agg.setdefault((track, name), 0.0)
        agg[(track, name)] += dur
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:80]
    print("=== top device events (us, all steps) ===")
    for (t, nm), d in top[:50]:
        print(f"{d / n:12.1f}  {t:32s}  {nm[:100]}")
    out = {
        "meta": {"scene": scene_name, "res": res, "depth": depth,
                 "backend": backend, "rays": n_pixels * 4},
        "wall_per_step_s": wall,
        "top_events_us_per_step": [
            {"track": t, "name": nm, "us": d / n} for (t, nm), d in top],
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "roofline_train.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
