"""Reproduce / bisect the spheres 960x540 center-column stripe.

VERDICT r3 weak #3: the full-res TPU sweep tolerates a 2-8-unit stripe on
the exact center column (camera-ray u component crossing 0) of reflective
multi-light scenes. This script renders ONLY the suspect columns through a
chosen backend and diffs them against the committed oracle golden, so the
artifact can be bisected off-TPU (jnp on host CPU) and on-TPU per backend.

Usage: python benches/stripe_repro.py [backend] [scene] [w] [h] [cols...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

# the axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start; honor an explicit platform request (default: host CPU bisection)
jax.config.update("jax_platforms", os.environ.get("RGT_PLATFORM", "cpu"))

import jax.numpy as jnp

from oracle import oracle_render, scene_text
from raytracing_gpu_tpu.config import RenderConfig
from raytracing_gpu_tpu.models.parser import parse_scene_text
from raytracing_gpu_tpu.models.scene import scene_to_device
from raytracing_gpu_tpu.ops import camera as camera_ops
from raytracing_gpu_tpu.ops.colors import ColorOps
from raytracing_gpu_tpu.partition.apply import with_accel
from raytracing_gpu_tpu.render import required_depth, trace_rays


def render_columns(scene_host, cfg, cols, w, h):
    """(H, len(cols), 3) uint8 image slice for the given printed columns."""
    scene = scene_to_device(scene_host)
    if cfg.partitioning != "none":
        scene, _ = with_accel(scene, cfg.partitioning)
    max_nr = float(np.max(np.asarray(scene_host.materials.nr)))
    depth = required_depth(max_nr, cfg.reflect_cutoff, cfg.cpu_max_depth)
    halfw, halfh = w // 2, h // 2
    offs = np.array([[0, 0], [0, 0.5], [0.5, 0], [0.5, 0.5]], np.float32)
    p = np.arange(h)
    lbase = (h - halfh - p).astype(np.float32)  # (H,)
    u, v, C = camera_ops.camera_basis(scene_host.camera)
    pos = jnp.asarray(scene_host.camera.position, jnp.float32)

    pack = None
    if cfg.backend in ("pallas", "mxu"):
        from raytracing_gpu_tpu.ops import pallas_intersect as pk

        pack = pk.pack_geometry(
            scene.geometry.vertices, scene.geometry.valid,
            scene.geometry.normals, scene.geometry.tri_obj, scene.materials)

    @jax.jit
    def one_column(kbase):
        # coords (H,4,2) for one printed column
        k = kbase + offs[None, :, 0]  # (1,4) -> broadcast (H,4)
        k = jnp.broadcast_to(k, (h, 4))
        l = lbase[:, None] + offs[None, :, 1]
        coords = jnp.stack([k, l], axis=-1).reshape(-1, 2)
        o, d = camera_ops.make_rays(u, v, C, pos, coords)
        colors = trace_rays(scene, o, d, cfg, depth, pack=pack)
        cops = ColorOps(cfg.quantize)
        sub = colors.reshape(h, 4, 3)
        acc = cops.zeros((h,))
        for s in range(4):
            acc = cops.add(acc, cops.mul(sub[:, s, :], 0.25))
        return cops.finalize(acc)

    out = []
    for q in cols:
        kbase = jnp.float32(w - halfw - q)
        out.append(np.asarray(one_column(kbase)))
        print(f"  col {q} done", flush=True)
    return np.trunc(np.stack(out, axis=1)).astype(np.uint8)


def main():
    backend = sys.argv[1] if len(sys.argv) > 1 else "jnp"
    name = sys.argv[2] if len(sys.argv) > 2 else "spheres"
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 960
    h = int(sys.argv[4]) if len(sys.argv) > 4 else 540
    cols = ([int(c) for c in sys.argv[5:]] if len(sys.argv) > 5
            else list(range(w // 2 - 3, w // 2 + 4)))
    golden = oracle_render(name, w, h)
    scene_host = parse_scene_text(scene_text(name, w, h))
    cfg = RenderConfig(backend=backend)
    ours = render_columns(scene_host, cfg, cols, w, h)
    gold = golden[:, cols].astype(np.int32)
    d = np.abs(ours.astype(np.int32) - gold).max(axis=-1)  # (H, C)
    print(f"backend={backend} scene={name} {w}x{h} cols={cols}")
    for ci, q in enumerate(cols):
        bad = np.nonzero(d[:, ci] > 1)[0]
        print(f"col {q}: n>1 = {len(bad)}, max|d| = {d[:, ci].max()}"
              + (f", rows {bad[:12].tolist()}..." if len(bad) else ""))
    # dump a few example pixels on the worst column
    ci = int(d.sum(axis=0).argmax())
    rows = np.nonzero(d[:, ci] > 1)[0][:8]
    for r in rows:
        print(f"  ({r},{cols[ci]}) ours={ours[r, ci].tolist()} "
              f"golden={gold[r, ci].tolist()}")


if __name__ == "__main__":
    main()
