"""Scene / acceleration-structure inspection dumpers — the L8 dev harness.

The reference ships `gpu/test.cu` (403 LoC of display_* printf dumpers:
scene, AABBs, position keys, node differences, octree recursive/iterative —
test.cu:44-219) driven by editing main() and rebuilding. Here the same
introspection is a library + CLI:

    python -m raytracing_gpu_tpu.utils.inspect scene.svati [--octree] [--keys]
"""

from __future__ import annotations

import sys

import numpy as np


def describe_scene(scene) -> str:
    """display_scene analog (gpu/test.cu:44-100)."""
    g = scene.geometry
    m = scene.materials
    lines = [
        f"camera {scene.camera.width}x{scene.camera.height} "
        f"pos={np.asarray(scene.camera.position).tolist()} "
        f"fov={float(scene.camera.fov)}",
        f"lights: {len(scene.lights.kind)} "
        f"(kinds={list(scene.lights.kind)})",
        f"objects: {scene.n_objects} (padded {m.padded_count}); "
        f"triangles: {scene.n_triangles} (padded {g.padded_count})",
    ]
    for i in range(scene.n_objects):
        tri = int(np.sum(np.asarray(g.tri_obj)[np.asarray(g.valid)] == i))
        lines.append(
            f"  obj {i}: {tri} tris  ka={np.asarray(m.ka[i]).tolist()} "
            f"kd={np.asarray(m.kd[i]).tolist()} ks={np.asarray(m.ks[i]).tolist()} "
            f"ns={float(m.ns[i])} nr={float(m.nr[i])}"
        )
    return "\n".join(lines)


def describe_aabbs(aabbs, obj_valid) -> str:
    """display_aabbs analog (gpu/test.cu)."""
    lines = []
    a = np.asarray(aabbs)
    for i in range(a.shape[0]):
        if not bool(np.asarray(obj_valid)[i]):
            continue
        lines.append(f"  aabb {i}: min={a[i, 0].tolist()} max={a[i, 1].tolist()}")
    return "\n".join(lines)


def describe_keys(keys, levels) -> str:
    """display position keys analog: 24-bit path (octal groups) + level."""
    k = np.asarray(keys)
    lv = np.asarray(levels)
    lines = []
    for i in range(k.shape[0]):
        if k[i] == 0xFFFFFFFF:
            continue
        path = int(k[i]) >> 8
        groups = [(path >> (3 * (7 - d))) & 7 for d in range(8)]
        lines.append(
            f"  key[{i}] = {int(k[i]):#010x} path={''.join(map(str, groups))} "
            f"level={int(lv[i])}"
        )
    return "\n".join(lines)


def describe_octree(tree) -> str:
    """display_octree_rec analog (gpu/test.cu:150-219): indented tree walk
    over the flat node tables."""
    nv = np.asarray(tree.node_valid)
    lvl = np.asarray(tree.node_level)
    start, end = np.asarray(tree.node_start), np.asarray(tree.node_end)
    sub_s, sub_e = np.asarray(tree.node_sub_start), np.asarray(tree.node_sub_end)
    kids = np.asarray(tree.node_children)
    box = np.asarray(tree.node_box)
    perm = np.asarray(tree.perm)
    rows = np.flatnonzero(nv)
    roots = [r for r in rows if lvl[r] == 0]
    out = [f"octree: {int(tree.n_nodes)} nodes"]

    def walk(r, indent):
        owned = [int(perm[s]) for s in range(start[r], end[r])]
        out.append(
            f"{'  ' * indent}node[{r}] d={lvl[r]} "
            f"box=[{box[r, 0].round(3).tolist()}, {box[r, 1].round(3).tolist()}] "
            f"objs={owned} subtree=[{sub_s[r]},{sub_e[r]})"
        )
        for c in kids[r]:
            if c >= 0:
                walk(int(c), indent + 1)

    for r in roots:
        walk(int(r), 1)
    return "\n".join(out)


def describe_device_memory() -> str:
    """display_GPU_memory analog (gpu/test.cu:35-42, cudaMemGetInfo):
    per-device HBM usage from the runtime's memory_stats (best-effort —
    some backends, e.g. the CPU emulator, report nothing)."""
    import jax

    lines = []
    for dev in jax.local_devices():
        stats = dev.memory_stats() or {}
        used = stats.get("bytes_in_use")
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if used is None:
            lines.append(f"{dev}: memory stats unavailable")
        else:
            mb = used / 1e6
            if limit:
                lines.append(f"{dev}: {mb:.1f} MB in use / {limit / 1e6:.1f} MB")
            else:
                lines.append(f"{dev}: {mb:.1f} MB in use")
    return "\n".join(lines)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(prog="raytracing_gpu_tpu.utils.inspect")
    ap.add_argument("scene")
    ap.add_argument("--aabbs", action="store_true")
    ap.add_argument("--keys", action="store_true")
    ap.add_argument("--octree", action="store_true")
    ap.add_argument("--memory", action="store_true",
                    help="device memory usage (display_GPU_memory analog)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from raytracing_gpu_tpu.models.parser import parse_scene
    from raytracing_gpu_tpu.models.scene import scene_to_device

    scene = scene_to_device(parse_scene(args.scene))
    print(describe_scene(scene))
    if args.memory:
        print(describe_device_memory())
    if args.aabbs or args.keys or args.octree:
        import jax

        from raytracing_gpu_tpu.partition.aabb import (
            compute_object_aabbs,
            compute_scene_aabb,
        )
        from raytracing_gpu_tpu.partition.octree import build_octree, position_keys

        g = scene.geometry
        n_obj = scene.materials.padded_count
        obj_valid = (
            jax.ops.segment_sum(
                g.valid.astype(jnp.int32), g.tri_obj, num_segments=n_obj
            )
            > 0
        )
        aabbs = compute_object_aabbs(g.vertices, g.tri_obj, g.valid, n_obj)
        scene_box = compute_scene_aabb(aabbs, obj_valid)
        if args.aabbs:
            print("aabbs:")
            print(describe_aabbs(aabbs, obj_valid))
            print(f"scene box: {np.asarray(scene_box).tolist()}")
        if args.keys:
            keys, levels, _ = position_keys(aabbs, scene_box, obj_valid)
            print("position keys:")
            print(describe_keys(keys, levels))
        if args.octree:
            print(describe_octree(build_octree(aabbs, scene_box, obj_valid)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
