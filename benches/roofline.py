"""Per-kernel device-time breakdown + MFU/roofline for real frames.

The reference's whole L8 exists to measure stages (gpu/bench.cu:13-22,
435-442) and its CMake passes `-lineinfo` so nsight can attribute SASS time
to source (gpu/CMakeLists.txt:54). This is the TPU equivalent: trace real
frames with jax.profiler, aggregate DEVICE time per XLA op/kernel from the
perfetto trace, bucket ops into pipeline stages (sweep / fetch / mask-build
/ shading / assembly), and state achieved FLOP/s and bytes/s against the
chip's peaks.

Usage:
  python benches/roofline.py susan            # susan.svati 512x512
  python benches/roofline.py scale 983040     # procedural grid, 128x128
Writes benches/roofline_<name>.json and prints the stage table.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

# TPU v5e (v5 lite) single-chip peaks, from the public spec / scaling book:
# 197 TFLOP/s bf16 MXU, 394 TOPS int8, HBM 16 GB @ 819 GB/s. The VPU is
# 8x128 lanes x 4 sublanes x 2 (FMA) per cycle at 940 MHz ~= 7.7 TFLOP/s
# f32 for pure-FMA code; elementwise non-FMA ops halve that.
V5E_VPU_F32_PEAK = 7.7e12
V5E_MXU_BF16_PEAK = 1.97e14
V5E_HBM_GBPS = 819.0


def _collect_device_events(trace_dir):
    """Parse the perfetto trace -> [(name, dur_us, track)] device events."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.json.gz"),
                      recursive=True)
    if not paths:
        raise RuntimeError(f"no perfetto trace under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data
    # thread/track name metadata
    tracks = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tracks[(e.get("pid"), e.get("tid"))] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "process_name":
            tracks[(e.get("pid"), None)] = e["args"]["name"]
    out = []
    for e in events:
        if e.get("ph") != "X":
            continue
        tname = tracks.get((e.get("pid"), e.get("tid")), "")
        pname = tracks.get((e.get("pid"), None), "")
        out.append((e.get("name", ""), float(e.get("dur", 0.0)),
                    f"{pname}/{tname}"))
    return out


STAGE_PATTERNS = [
    ("sweep", r"nearest_hit|sweep|_hit_kernel|collide_kernel"),
    ("shadow-sweep", r"dist_only|shadow"),
    ("fetch", r"fetch|one_hot|winner"),
    ("mask-build", r"cull|tile_mask|worklist|interval|argsort|searchsorted"),
    ("shading", r"shade|light|specular|phong"),
    ("assembly", r"assemble|downscale|finalize"),
]


def bucket(name: str) -> str:
    low = name.lower()
    for stage, pat in STAGE_PATTERNS:
        if re.search(pat, low):
            return stage
    if re.match(r"fusion|loop_|while|add|mul|select|broadcast|copy|reduce",
                low):
        return "xla-other"
    return "other"


def profile_fn(fn, n_frames=3, label="frame"):
    """Trace n_frames calls of fn(); return (device events, wall per call)."""
    fn()  # warm
    jax.block_until_ready(fn())
    tdir = tempfile.mkdtemp(prefix="rgt_trace_")
    t0 = time.perf_counter()
    with jax.profiler.trace(tdir, create_perfetto_trace=True):
        for _ in range(n_frames):
            out = fn()
        jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / n_frames
    events = _collect_device_events(tdir)
    return events, wall, tdir


def report(events, wall_s, n_frames, meta, out_name):
    # keep device-side tracks only (TPU op events); the axon tunnel labels
    # device tracks with the device/XLA op stream name
    dev = [(n, d, t) for (n, d, t) in events
           if "TPU" in t or "/device" in t.lower() or "xla" in t.lower()]
    if not dev:  # fall back: report all tracks so we can see what exists
        dev = events
    agg = {}
    for n, d, t in dev:
        agg.setdefault((t, n), 0.0)
        agg[(t, n)] += d
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:60]
    print("=== top events (all frames, us) ===")
    for (t, n), d in top[:40]:
        print(f"{d:12.1f}  {t:40s}  {n[:90]}")
    stages = {}
    for (t, n), d in agg.items():
        stages.setdefault(bucket(n), 0.0)
        stages[bucket(n)] += d
    print("=== stage buckets (us, all frames) ===")
    for s, d in sorted(stages.items(), key=lambda kv: -kv[1]):
        print(f"{d:12.1f}  {s}")
    out = {
        "meta": meta,
        "wall_per_frame_s": wall_s,
        "n_frames": n_frames,
        "stages_us": stages,
        "top_events": [
            {"track": t, "name": n, "us": d} for (t, n), d in top
        ],
    }
    path = os.path.join(os.path.dirname(__file__), f"roofline_{out_name}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "susan"
    from oracle import scene_text
    from raytracing_gpu_tpu.config import RenderConfig
    from raytracing_gpu_tpu.models.parser import parse_scene_text
    from raytracing_gpu_tpu.render import SceneRenderer
    from raytracing_gpu_tpu.utils.compile_cache import (
        begin_device_claim, enable_persistent_cache)

    enable_persistent_cache()
    begin_device_claim()

    if what == "susan":
        scene = parse_scene_text(scene_text("susan", 512, 512))
        cfg = RenderConfig(mode="cpu", quantize="match", backend="pallas")
        r = SceneRenderer(scene, cfg)
        fn = r.render_device
        meta = {"scene": "susan 512x512", "rays": 512 * 512 * 4,
                "triangles": 968}
        name = "susan"
    else:
        from raytracing_gpu_tpu.models.procedural import make_sphere_grid_scene

        # the 983k-triangle big tier from scale_bench.py
        scene = make_sphere_grid_scene(width=128, height=128, nx=16, ny=16,
                                       nz=4)
        cfg = RenderConfig(mode="cpu", quantize="match", backend="pallas")
        r = SceneRenderer(scene, cfg)
        fn = r.render_device
        tris = 983040
        meta = {"scene": f"grid {tris} tris 128x128", "rays": 128 * 128 * 4,
                "triangles": tris}
        name = f"grid{tris}"

    if r._compiled is not None:
        hlo_path = os.path.join(os.path.dirname(__file__),
                                f"hlo_{name}.txt")
        with open(hlo_path, "w") as f:
            f.write(r._compiled.as_text())
        print("wrote", hlo_path)

    n = 3
    events, wall, tdir = profile_fn(fn, n)
    print(f"wall/frame: {wall * 1e3:.2f} ms   trace: {tdir}")
    report(events, wall, n, meta, name)


if __name__ == "__main__":
    main()
