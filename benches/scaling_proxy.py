"""Scaling-efficiency proxy: per-frame/step collective cost vs compute.

The ≥85% 1→N-host scaling north star (BASELINE.md) cannot be measured on
single-chip hardware, but it CAN be bounded: the sharded render/train
programs' collectives are enumerable (what shard_map inserts), their byte
volumes follow from shapes, and dividing by published link bandwidths gives
the communication time a pod slice would pay per frame/step. Efficiency
bound = compute / (compute + comm), with compute taken from the measured
single-chip numbers (BASELINE.md).

Collectives in this framework (and nothing else — verified by grepping the
jaxprs for psum/all_gather/ppermute):

- Forward render, tiles-only sharding: NONE inside the frame. Rays are
  embarrassingly parallel (each device renders its tile block against a
  replicated scene); the only transfer is the final per-device image-block
  gather to the host that writes the file.
- Forward render, tiles x scene sharding: one all_gather of the per-shard
  Hit pytree over the scene axis per collide (ops/intersect.py
  _combine_shard_hits: point 3 + normal 3 + obj 1 + dist 1 + mask 1 + pad
  = 13 f32/ray/shard burst) and one pmin (4 B/ray) per shadow pass.
- Train step: everything above (per bounce, per light) + ONE psum of the
  replicated-parameter grads + loss over the tiles axis per step
  (parallel/train.py:168-171); vertex/normal grads stay sharded (zero
  bytes). Optimizer state is replicated; no ZeRO-style resharding exists
  to add traffic.

Bandwidth constants (public, per chip): TPU v5e ICI 1.6 Tbit/s/chip
(3 links x 400 Gbps, bidirectional) ≈ 186 GiB/s usable one-direction on a
ring; DCN ≈ 25 GB/s/host (200 Gbps NIC). Sources: Google Cloud TPU v5e
docs / the public scaling-book tables.

Usage: python benches/scaling_proxy.py   (pure arithmetic, no devices)
"""

from __future__ import annotations

import json
import os

ICI_GBPS = 186.0  # GiB/s one-direction per v5e chip (3x400Gbps links)
DCN_GBPS = 25.0   # GB/s per host NIC


def all_gather_bytes(n_shards: int, bytes_per_shard: float) -> float:
    """Ring all-gather: each chip receives (S-1)/S of the full buffer."""
    return (n_shards - 1) / n_shards * (n_shards * bytes_per_shard)


def fmt(x):
    for unit in ("B", "KB", "MB", "GB"):
        if x < 1024:
            return f"{x:.1f} {unit}"
        x /= 1024
    return f"{x:.1f} TB"


def analyze(name, rays_per_dev, n_scene, n_lights_point_dir, depth,
            collide_ms, frame_ms, n_tiles, train=False, n_params=0):
    """One config's comm bill. collide passes per bounce = 1 + lights."""
    passes = (1 + n_lights_point_dir) * depth
    comm = 0.0
    if n_scene > 1:
        hit_bytes = rays_per_dev * 13 * 4  # per-shard Hit burst
        comm += depth * all_gather_bytes(n_scene, hit_bytes)
        comm += depth * n_lights_point_dir * rays_per_dev * 4  # pmin
    if train:
        comm += 2 * 4 * n_params  # psum = reduce-scatter + all-gather
    comm_ms = comm / (ICI_GBPS * 2**30) * 1e3
    eff = frame_ms / (frame_ms + comm_ms)
    return {
        "config": name,
        "collective_bytes_per_frame": int(comm),
        "collective_readable": fmt(comm),
        "comm_ms_ici": round(comm_ms, 4),
        "compute_ms": frame_ms,
        "efficiency_bound_ici": round(eff, 5),
        "efficiency_bound_dcn": round(
            frame_ms / (frame_ms + comm / (DCN_GBPS * 1e9) * 1e3), 5),
    }


def main():
    rows = []
    # susan 512x512 cpu-mode on 8 chips: 1.05M rays -> 131k rays/chip,
    # 17.1 ms/frame single-chip => ~2.14 ms/chip-frame of compute at
    # perfect split. tiles-only: zero in-frame collectives.
    rows.append(analyze("render susan 512² 8x(tiles) [NO collectives]",
                        rays_per_dev=131072, n_scene=1,
                        n_lights_point_dir=2, depth=1,
                        collide_ms=0, frame_ms=17.1 / 8, n_tiles=8))
    # spheres-class mirror scene, tiles=4 x scene=2, 960x540 -> 2.07M rays
    # over 4 tile groups = 518k rays/dev; depth ~4 live bounces.
    rows.append(analyze("render spheres 960x540 4x(tiles) x 2(scene)",
                        rays_per_dev=518400, n_scene=2,
                        n_lights_point_dir=6, depth=4,
                        collide_ms=0, frame_ms=140.0 / 4, n_tiles=4))
    # train step spheres 256² (BASELINE: 6354 ms single-chip, remat):
    # 8 tile devices, replicated-param grads: lights 6x6 + materials 5x11
    # + camera 10 + loss ~ O(100) floats. vertices/normals stay sharded.
    rows.append(analyze("train spheres 256² 8x(tiles), psum grads",
                        rays_per_dev=32768, n_scene=1,
                        n_lights_point_dir=6, depth=4,
                        collide_ms=0, frame_ms=6354.0 / 8, n_tiles=8,
                        train=True, n_params=6 * 6 + 5 * 11 + 10 + 1))
    # train with scene sharding too (4x2): the all_gather bill at depth 4
    rows.append(analyze("train spheres 256² 4x(tiles) x 2(scene)",
                        rays_per_dev=65536, n_scene=2,
                        n_lights_point_dir=6, depth=4,
                        collide_ms=0, frame_ms=6354.0 / 4, n_tiles=4,
                        train=True, n_params=6 * 6 + 5 * 11 + 10 + 1))
    for r in rows:
        print(json.dumps(r), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "scaling_proxy.json")
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
